"""Round-6 batch-9 tests (B72): probe calibration reliability diagram."""

from __future__ import annotations

import pytest

import math

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


def test_calibration_matches_pure_python(spark, sf_dir):
    """Full replay: train the probe in pure Python (the test_r6c GD
    reference), score, cut at numpy's linear-interpolation deciles
    (= quantile_cont), bin by strict-greater count, and compare every
    per-bin mean to the operator's output."""
    import numpy as np

    from etl_data_processor_spark.queries_r6c import _GD_LR, _GD_REF

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "n_chars", "text")
        .collect()
    )
    feats = []
    for r in docs:
        w = [t for t in r["text"].split() if t]
        if not w:
            continue
        feats.append(
            (
                r["n_chars"] / 500.0,
                len(w) / 100.0,
                len(set(w)) / len(w),
                1.0 if r["source"] == _GD_REF else 0.0,
            )
        )
    n = len(feats)
    ws = [0.0, 0.0, 0.0, 0.0]
    for _ in range(3):
        g = [0, 0, 0, 0]
        for x1, x2, x3, y in feats:
            r_ = (ws[0] + ws[1] * x1 + ws[2] * x2 + ws[3] * x3) - y
            for j, xj in enumerate((1.0, x1, x2, x3)):
                t = r_ if j == 0 else xj * r_
                g[j] += math.floor(t * 1e9 + 0.5)
        ws = [ws[j] - _GD_LR * ((g[j] / 1e9) / n) for j in range(4)]

    preds = [
        (ws[0] + ws[1] * x1 + ws[2] * x2 + ws[3] * x3, y)
        for x1, x2, x3, y in feats
    ]
    cuts = np.quantile(
        [p for p, _ in preds], [i / 10 for i in range(1, 10)],
        method="linear",
    )
    acc: dict[int, list] = {}
    for p, y in preds:
        b = sum(1 for c in cuts if p > c)
        a = acc.setdefault(b, [0, 0, 0])
        a[0] += 1
        a[1] += math.floor(p * 1e9 + 0.5)
        a[2] += int(y)
    expect = {
        b: (
            a[0],
            math.floor(a[1] / 1e3 / a[0] + 0.5) / 1e6,
            math.floor(a[2] / a[0] * 1e6 + 0.5) / 1e6,
        )
        for b, a in acc.items()
    }
    got = {
        r["bin"]: (r["n"], r["mean_pred6"], r["mean_label6"])
        for r in QUERIES["q_probe_calibration"](spark, sf_dir).collect()
    }
    assert got == expect
    # reliability semantics: mean prediction rises with the bin index,
    # and every doc lands in exactly one bin
    bins = sorted(got)
    mp = [got[b][1] for b in bins]
    assert mp == sorted(mp)
    assert sum(got[b][0] for b in bins) == n


def test_calibration_plan_pins(spark, sf_dir):
    """Scoring + binning stay JVM-side; cuts broadcast; no cartesian
    beyond the 1-row cuts cross join."""
    spark.catalog.clearCache()
    plan = (
        QUERIES["q_probe_calibration"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_dup_source_matrix_consistency(spark, sf_dir):
    """Cell counts sum to the total verified pair count; cells are
    unordered (src_lo <= src_hi) and Jaccard means stay in [0.8, 1]."""
    from etl_data_processor_spark.queries_north import q_dedup_minhash

    total_pairs = q_dedup_minhash(spark, sf_dir).count()
    rows = QUERIES["q_dup_source_matrix"](spark, sf_dir).collect()
    assert sum(r["n_pairs"] for r in rows) == total_pairs
    for r in rows:
        assert r["src_lo"] <= r["src_hi"]
        assert 0.8 <= r["avg_jaccard6"] <= 1.0 + 1e-9


@pytest.mark.slow
def test_dup_source_matrix_planted(spark, tmp_path):
    """Planted cross-source copies land in the right cell with the
    right count."""
    import os

    from pyspark.sql import functions as F

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, "a", base),
        (1, "b", base),                      # a-b dup
        (2, "b", base + " extra"),           # near-dup of both
        (3, "c", "totally different words entirely here now ok fine yes"),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        rows, ["doc_id", "source", "text"]
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{sf}/documents.parquet")
    got = {
        (r["src_lo"], r["src_hi"]): r["n_pairs"]
        for r in QUERIES["q_dup_source_matrix"](spark, sf).collect()
    }
    assert got.get(("a", "b"), 0) >= 1       # the planted cross-source dup
    assert ("c", "c") not in got
    assert all(lo <= hi for lo, hi in got)
