"""Round-6 batch-10 tests (B73): char-entropy gate + stopword discovery."""

from __future__ import annotations

import pytest

import math
import os
from collections import Counter

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
def test_entropy_hand_checked(spark, tmp_path):
    """'aaaa' has entropy exactly 0 (gibberish); a uniform 4-char doc
    scores exactly 2 bits (the threshold boundary: 2.0 < 2.0 is false,
    so NOT flagged under the strict integer compare); natural-ish text
    clears the gate."""
    rows = [
        (0, "s", "aaaa"),
        (1, "s", "abcd"),                     # 4 distinct -> exactly 2 bits
        (2, "s", "the quick brown fox jumps"),
    ]
    sf = _mini_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["entropy6"], r["gibberish"])
        for r in QUERIES["q_char_entropy_filter"](spark, sf).collect()
    }
    assert got[0] == (0.0, 1)
    assert got[1] == (2.0, 0)     # strict <: the boundary is NOT gibberish
    assert got[2][0] > 3.0 and got[2][1] == 0


def test_entropy_matches_pure_python(spark, sf_dir):
    """Exact quantized-term entropy replays in pure Python on the real
    fixture."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    expect = {}
    for r in docs:
        cnt = Counter(r["text"])
        n = sum(cnt.values())
        s = 0
        for k in cnt.values():
            p = k / n
            s += math.floor(-p * math.log2(p) * 1e12 + 0.5)
        expect[r["doc_id"]] = (
            math.floor(s / 1e6 + 0.5) / 1e6,
            1 if s < 2.0 * 1e12 else 0,
        )
    got = {
        r["doc_id"]: (r["entropy6"], r["gibberish"])
        for r in QUERIES["q_char_entropy_filter"](spark, sf_dir).collect()
    }
    assert got == expect


def test_stopword_discovery_hand_checked(spark, tmp_path):
    """A token in every doc has ratio 1.0; one in half the docs is NOT a
    stopword under the strict > 0.5 gate; per-doc repeats count once."""
    rows = [
        (0, "s", "the the cat"),
        (1, "s", "the dog"),
        (2, "s", "the bird cat"),
        (3, "s", "the fish"),
    ]
    sf = _mini_docs(spark, tmp_path, rows)
    got = {
        r["token"]: (r["df"], r["df_ratio6"])
        for r in QUERIES["q_stopword_discovery"](spark, sf).collect()
    }
    assert got == {"the": (4, 1.0)}  # cat: 2/4 = 0.5, strict > excludes


def test_round6_batch10_plan_pins(spark, sf_dir):
    """Plan pins, cartesian-free (1-row count cross join allowed), no
    windows. q_stopword_discovery stays pure-JVM; q_char_entropy_filter
    is, since r10, ONE vectorized ArrowEvalPython pass over the scan
    (ops.text.char_entropy_q12 — replaced the char explode + two hash
    aggregates + join, 8 executor-cpu-seconds at sf0.1) with NO
    shuffle beyond the width-guard round-robin and NO row-at-a-time
    BatchEvalPython."""
    for key in ("q_char_entropy_filter", "q_stopword_discovery"):
        spark.catalog.clearCache()
        plan = (
            QUERIES[key](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan, key
        assert "Window" not in plan, key
        if key == "q_char_entropy_filter":
            assert plan.count("ArrowEvalPython") == 1, key
            assert "BatchEvalPython" not in plan, key
            # the only exchange is the width guard; the explode-era
            # hash-agg exchanges are gone
            assert "hashpartitioning" not in plan, key
            assert "Generate" not in plan, key
        else:
            assert "EvalPython" not in plan, key
