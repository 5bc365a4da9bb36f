"""Streaming twin of q_selection_pipeline (VERDICT r6 next-round item 6):
the batch capstone's gate chain run as a LIVE foreachBatch pipeline —
file-stream ingest with replayed/overlapping files, per-epoch FROZEN
model state (length cuts, benchmark trigram set, DSIR LM), stateful
exact dedup through a seen-norms table, exactly-once score appends, and
a terminal top-k — asserted EQUAL to the batch q_selection_pipeline
row for row."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from etl_data_processor_spark.io import Catalog
from etl_data_processor_spark.streaming.selection import (
    finalize_selection,
    frozen_selection_models,
    selection_gate_sink,
)
from etl_data_processor_spark.streaming.windows import streaming_dedup

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_streaming_selection_matches_batch(spark, sf_dir, tmp_path):
    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", "source", "text", "n_chars"
    )

    # epoch freeze: the corpus-relative model state, derived once (in
    # production: from yesterday's epoch; here: the same fixture the
    # batch capstone reads, so the twin must match it exactly)
    models = frozen_selection_models(spark, docs, ref_source="src0")

    # stream input in ASCENDING doc_id ranges with OVERLAPS (replayed
    # rows) — at-least-once ingest; ascending order is what makes
    # first-batch-wins dedup equal the batch keep-min rule
    src = str(tmp_path / "incoming")
    cuts = [(0, 120), (80, 250), (200, 10_000_000)]
    full = Catalog(spark, sf_dir).documents
    for lo, hi in cuts:
        full.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)

    seen_table = str(tmp_path / "seen_norms")
    scores_table = str(tmp_path / "scores")
    apply = selection_gate_sink(models, seen_table, scores_table)

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src)
        .withColumn("__ts", F.timestamp_micros(F.col("doc_id")))
    )
    deduped = streaming_dedup(
        stream, keys=["doc_id"], ts_col="__ts", watermark="1 hour"
    )
    q = (
        deduped.drop("__ts")
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(
        map(tuple, finalize_selection(spark, scores_table).collect())
    )
    want = sorted(
        map(
            tuple,
            entry_mod.queries()["q_selection_pipeline"](spark, sf_dir).collect(),
        )
    )
    assert len(want) == 100
    assert got == want
