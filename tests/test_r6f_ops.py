"""Round-6 batch-7 tests (B70): source-centroid embedding outliers."""

from __future__ import annotations

import pytest

import math
import os

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


@pytest.mark.slow
def test_centroid_outliers_planted(spark, tmp_path):
    """Planted fixture: one source whose vectors cluster tightly around
    +u except a single flipped vector — the flipped one must be the
    rank-1 outlier with cosine ~ -1 to the centroid."""
    import numpy as np

    rng = np.random.RandomState(3)
    u = rng.randn(64)
    u /= np.linalg.norm(u)
    vecs = [u * 3.0 + rng.randn(64) * 0.05 for _ in range(20)]
    vecs[7] = -u * 3.0 + rng.randn(64) * 0.05  # the planted outlier
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
    spark.createDataFrame(
        [(i, "s0", "t", 1) for i in range(20)],
        "doc_id long, source string, text string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    rows = QUERIES["q_source_centroid_outliers"](spark, sf).collect()
    by_rank = {r["outlier_rank"]: r for r in rows if r["source"] == "s0"}
    assert by_rank[1]["vec_id"] == 7
    assert by_rank[1]["cos6"] < -0.9
    assert by_rank[2]["cos6"] > 0.9  # everyone else hugs the centroid


def test_centroid_outliers_matches_numpy(spark, sf_dir):
    """On the real fixture the reported cosines recompute from numpy
    centroids to within the 1e-6 quantization, and ranks are the
    bottom-3 per source."""
    import numpy as np

    docs = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    embs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    by_src: dict[str, list] = {}
    for vid, v in embs.items():
        if vid in docs:
            by_src.setdefault(docs[vid], []).append((vid, v))
    expect_bottom = {}
    for src, items in by_src.items():
        # quantized-component centroid, as the operator defines it
        qsum = np.zeros(64, dtype=object)
        for _, v in items:
            qsum += np.array(
                [math.floor(x * 1e9 + 0.5) for x in v], dtype=object
            )
        cent = np.array([float(s) / 1e9 / len(items) for s in qsum])
        scored = sorted(
            (
                float(v @ cent)
                / (np.linalg.norm(v) * np.linalg.norm(cent)),
                vid,
            )
            for vid, v in items
        )
        expect_bottom[src] = [vid for _, vid in scored[:3]]
    got = {}
    for r in QUERIES["q_source_centroid_outliers"](spark, sf_dir).collect():
        got.setdefault(r["source"], {})[r["outlier_rank"]] = (
            r["vec_id"], r["cos6"]
        )
    assert set(got) == set(expect_bottom)
    for src, bottom in expect_bottom.items():
        ranks = got[src]
        assert sorted(ranks) == [1, 2, 3]
        # rank-1 matches numpy's bottom doc (1e-6 ties aside)
        assert ranks[1][0] == bottom[0]


def test_centroid_outliers_plan_pins(spark, sf_dir):
    """Centroids broadcast back onto the scoring pass; no Python, no
    cartesian; the only window partitions by source."""
    spark.catalog.clearCache()
    plan = (
        QUERIES["q_source_centroid_outliers"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if line.lstrip().startswith(("Window", "+- Window", ":- Window")):
            assert "source" in line, line
