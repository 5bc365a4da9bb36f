"""Streaming drift monitor: per-micro-batch PSI against a FROZEN
reference distribution (the streaming twin of q_quality_drift_psi,
completing the pattern streaming/selection.py set: corpus-relative
state freezes per epoch; per-batch work is stateless expression math
against broadcast state).

A production ingest pipeline scores every arriving batch's
quality-score distribution against the last epoch's reference bins and
alerts on PSI > 0.25 — exactly the batch key's semantics, evaluated
incrementally. Per batch the corpus work is ONE aggregate to <= 10 bin
counts; the PSI arithmetic runs on those 10 rows with the same
1e-12-integer term quantization as the batch key, so a micro-batch over
rows R yields bit-identical PSI to the batch computation over R
(asserted by tests/test_streaming_drift.py). Results append
exactly-once per batch id through the log-structured table format.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_data_processor_spark.ops.text import quality_score

_BINS = 10


def _bin_counts(docs: DataFrame) -> DataFrame:
    qs = quality_score(F.col("text"))
    return (
        docs.select(
            F.least(F.floor(qs * _BINS).cast("int"), F.lit(_BINS - 1)).alias(
                "bin"
            )
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def frozen_reference_bins(docs: DataFrame) -> dict[int, int]:
    """Epoch freeze: the reference quality-score bin counts, collected as
    10 integers of broadcastable model state."""
    return {r["bin"]: r["c"] for r in _bin_counts(docs).collect()}


def psi_of_counts(counts: dict[int, int], ref: dict[int, int]) -> float:
    """The batch key's exact PSI arithmetic on two bin-count dicts:
    +1/+10 Laplace smoothing, each (p-r)*ln(p/r) term floored to a
    1e-12 integer BEFORE the sum, final 1e-6 rounding — bit-identical
    to q_quality_drift_psi on the same counts."""
    n = sum(counts.values())
    rn = sum(ref.values())
    acc = 0
    for b in range(_BINS):
        p = (counts.get(b, 0) + 1.0) / (n + 10.0)
        r = (ref.get(b, 0) + 1.0) / (rn + 10.0)
        acc += math.floor((p - r) * math.log(p / r) * 1e12 + 0.5)
    return math.floor(acc / 1e6 + 0.5) / 1e6


def drift_monitor_sink(ref: dict[int, int], out_table: str):
    """foreachBatch closure: per micro-batch, aggregate the quality-score
    bins (the only corpus-sized work), compute PSI against the frozen
    reference on the driver (10 integers of state), and append
    (batch_id, n_docs, psi6, alert) exactly-once."""
    from etl_data_processor_spark import tableformat as TF

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        counts = {
            r["bin"]: r["c"] for r in _bin_counts(batch_df).collect()
        }
        n = sum(counts.values())
        if n == 0:
            return
        psi6 = psi_of_counts(counts, ref)
        row = spark.createDataFrame(
            [(batch_id, n, psi6, psi6 > 0.25)],
            "batch_id long, n_docs long, psi6 double, alert boolean",
        )
        TF.append_idempotent(row, out_table, f"psi-{batch_id}")

    return apply
