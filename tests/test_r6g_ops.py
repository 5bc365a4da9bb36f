"""Round-6 batch-8 tests (B71): n-gram novelty + ABTT debias."""

from __future__ import annotations

import pytest

import math
import os

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


def _mini_docs(spark, tmp_path, rows):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"]).withColumn(
        "n_chars", F.length("text")
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


@pytest.mark.slow
def test_novelty_hand_checked(spark, tmp_path):
    """First doc is 100% novel; an exact copy later is 0% novel; a
    partial overlap scores the exact fraction; repeats inside a doc
    count once (distinct grams)."""
    rows = [
        (0, "s", "a b c d"),          # grams {a b c, b c d} -> 2/2 novel
        (1, "s", "a b c d"),          # exact copy -> 0/2
        (2, "s", "b c d e f"),        # {b c d, c d e, d e f} -> 2/3
        (3, "s", "x y z x y z x y"),  # {x y z, y z x, z x y} all novel
    ]
    sf = _mini_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty6"])
        for r in QUERIES["q_ngram_novelty"](spark, sf).collect()
    }
    assert got == {
        0: (2, 2, 1.0),
        1: (2, 0, 0.0),
        2: (3, 2, math.floor(2 / 3 * 1e6 + 0.5) / 1e6),
        3: (3, 3, 1.0),
    }


def test_novelty_totals_match_distinct_grams(spark, sf_dir):
    """Corpus-wide sum of n_novel equals the number of DISTINCT trigrams
    (every gram is novel exactly once) — the conservation law."""
    rows = QUERIES["q_ngram_novelty"](spark, sf_dir).collect()
    total_novel = sum(r["n_novel"] for r in rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text").collect()
    grams = set()
    for r in docs:
        w = [t for t in r["text"].split() if t]
        for i in range(len(w) - 2):
            grams.add((w[i], w[i + 1], w[i + 2]))
    assert total_novel == len(grams)
    assert all(0.0 <= r["novelty6"] <= 1.0 for r in rows)


def test_abtt_debias_semantics(spark, sf_dir):
    """Norm can only shrink when a direction is removed; the removed
    mass is consistent: after^2 + proj^2 ~ before^2 on averages can't be
    asserted directly (means of sqrts), but per-source after <= before
    holds, and mean_absproj > 0 (the corpus HAS a dominant direction)."""
    rows = QUERIES["q_emb_debias_abtt"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["mean_norm_after6"] <= r["mean_norm_before6"] + 1e-9, r
        assert r["mean_absproj6"] >= 0.0
    assert any(r["mean_absproj6"] > 0.0 for r in rows)


def test_abtt_matches_numpy(spark, sf_dir):
    """Per-source means recompute from numpy + the operator's own
    quantization discipline, using the q_power_iteration direction."""
    import numpy as np

    pi = {
        r["dim"]: r["loading6"]
        for r in QUERIES["q_power_iteration"](spark, sf_dir).collect()
    }
    # loading6 is the quantized REPORT; recompute the exact v like the op
    from etl_data_processor_spark.queries_r6e import _power_gq
    from etl_data_processor_spark.registry import cat

    emb_df = cat(spark, sf_dir).embeddings
    gq, nrm = _power_gq(emb_df)
    v = np.array([float(gq[d]) / nrm for d in range(1, 65)])
    # sanity: quantized v matches the PI report
    assert all(
        math.floor(v[d - 1] * 1e6 + 0.5) / 1e6 == pi[d] for d in pi
    )

    docs = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    acc: dict[str, list] = {}
    for r in emb_df.collect():
        src = docs.get(r["vec_id"])
        if src is None:
            continue
        x = [float(t) for t in r["embedding"]]
        proj = 0.0
        nsq = 0.0
        for xi, vi in zip(x, v):
            proj = proj + xi * vi
        for xi in x:
            nsq = nsq + xi * xi
        a = acc.setdefault(src, [0, 0, 0, 0])
        a[0] += 1
        a[1] += math.floor(abs(proj) * 1e9 + 0.5)
        a[2] += math.floor(math.sqrt(nsq) * 1e9 + 0.5)
        a[3] += math.floor(
            math.sqrt(max(nsq - proj * proj, 0.0)) * 1e9 + 0.5
        )
    expect = {
        s: (
            a[0],
            math.floor(a[1] / 1e3 / a[0] + 0.5) / 1e6,
            math.floor(a[2] / 1e3 / a[0] + 0.5) / 1e6,
            math.floor(a[3] / 1e3 / a[0] + 0.5) / 1e6,
        )
        for s, a in acc.items()
    }
    got = {
        r["source"]: (
            r["n"], r["mean_absproj6"],
            r["mean_norm_before6"], r["mean_norm_after6"],
        )
        for r in QUERIES["q_emb_debias_abtt"](spark, sf_dir).collect()
    }
    assert got == expect


def test_round6_batch8_plan_pins(spark, sf_dir):
    """q_ngram_novelty: no Python, no cartesian, no window (ingest-order
    novelty costs one min-agg, not an ordered scan); the gram self-join
    is an equi-join. q_emb_debias_abtt: broadcast-joined report pass."""
    spark.catalog.clearCache()
    plan = (
        QUERIES["q_ngram_novelty"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "Join" in plan  # gram-key equi-join (strategy AQE-decided)

    spark.catalog.clearCache()
    plan = (
        QUERIES["q_emb_debias_abtt"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
