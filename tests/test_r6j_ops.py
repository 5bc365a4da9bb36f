"""Round-6 capstone tests (B74): the composed selection pipeline."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from pyspark.sql import functions as F

QUERIES = entry_mod.queries()


@pytest.mark.slow
def test_selection_pipeline_stage_consistency(spark, sf_dir):
    """The capstone's output is consistent with its standalone stages:
    every selected doc passes the entropy gate, is its own exact-dedup
    keeper, is not the reference source, is under the contamination
    threshold, and ranks are dense with the shard derived from doc_id."""
    from etl_data_processor_spark.ops.sampling import hash32
    from etl_data_processor_spark.queries_r6j import (
        _SEL_REF,
        _SEL_SHARDS,
        _SEL_TOP_K,
    )

    rows = QUERIES["q_selection_pipeline"](spark, sf_dir).collect()
    assert 0 < len(rows) <= _SEL_TOP_K
    ranks = sorted(r["sel_rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    assert all(r["source"] != _SEL_REF for r in rows)

    ids = [r["doc_id"] for r in rows]
    # shard recomputes from doc_id with the portable hash
    shard_of = {
        x["doc_id"]: x["s"]
        for x in spark.createDataFrame([(i,) for i in ids], "doc_id long")
        .select(
            "doc_id",
            F.pmod(hash32(F.col("doc_id")), F.lit(_SEL_SHARDS))
            .cast("int")
            .alias("s"),
        )
        .collect()
    }
    assert all(r["shard"] == shard_of[r["doc_id"]] for r in rows)

    # entropy gate: every selected doc clears it in the standalone key
    ent = {
        r["doc_id"]: r["gibberish"]
        for r in QUERIES["q_char_entropy_filter"](spark, sf_dir).collect()
    }
    assert all(ent[i] == 0 for i in ids)

    # contamination: every selected doc is at/under tau in the standalone
    # report (trigram rule there too)
    contam = {
        r["doc_id"]: r["contaminated"]
        for r in QUERIES["q_contamination_ngrams"](spark, sf_dir).collect()
    }
    assert all(contam.get(i, 0) == 0 for i in ids)

    # selection weights are sorted with doc_id tiebreaks
    by_rank = sorted(rows, key=lambda r: r["sel_rank"])
    lws = [r["lw6"] for r in by_rank]
    assert all(lws[i] >= lws[i + 1] for i in range(len(lws) - 1))


def test_selection_pipeline_plan_pins(spark, sf_dir):
    """Single DAG; model tables broadcast; the final top-k is
    TakeOrderedAndProject with rank recovered on the <=k rows — no
    single-partition Window anywhere (VERDICT r6 #1). Since r10 the
    entropy gate is ONE vectorized ArrowEvalPython pass
    (ops.text.char_entropy_q12 — replaced the char explode + two hash
    aggregates + join); everything else stays JVM-side, so the pin is
    exactly one Arrow boundary and zero row-at-a-time BatchEvalPython."""
    spark.catalog.clearCache()
    plan = (
        QUERIES["q_selection_pipeline"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the entropy gate's Arrow boundary (the pre-execution tree inlines
    # the cached gate subtree under each consumer, so presence — not a
    # node count — is the stable pin here; the runtime executes it once
    # into the cached skinny frame)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan  # never a single-partition rank window
