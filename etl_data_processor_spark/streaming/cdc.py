"""Streaming CDC: a foreachBatch MERGE sink maintaining a parquet snapshot.

The streaming form of ``ops.cdc.apply_changes``: each micro-batch of U/I/D
change rows merges into a versioned snapshot directory —

    target_dir/v=<batch_id>/   (parquet, the snapshot AFTER that batch)

Exactly-once despite foreachBatch's at-least-once contract: the merge for
batch N always reads the latest version STRICTLY BELOW N, so replaying
batch N (same batch_id, same rows — the Structured Streaming failure
semantics) deterministically rewrites v=N from the same base instead of
double-applying. This is the same version-chain idea Delta Lake uses
(commit N = f(commit N-1, batch N)), expressed with plain parquet.

Within a micro-batch several changes can hit one key; ``apply_changes``
requires at most one change per key, so the sink first compacts the batch
last-write-wins by a caller-named sequence column (in CDC feeds: the log
sequence number / change timestamp). Readers use :func:`read_snapshot`,
which resolves the latest version — writers never mutate a version in
place, so concurrent reads are safe.

At 100 TB each merge inherits apply_changes' shape: the snapshot is
scanned, never shuffled; only the (small) micro-batch moves. Version
pruning/compaction is a retention policy left to the caller, as in any
log-structured table format.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_data_processor_spark.ops.cdc import apply_changes


def _versions(target_dir: str) -> list[int]:
    out = []
    for p in glob.glob(os.path.join(target_dir, "v=*")):
        try:
            out.append(int(p.rsplit("=", 1)[1]))
        except ValueError:
            continue
    return sorted(out)


def read_snapshot(spark: SparkSession, target_dir: str) -> DataFrame:
    """The current snapshot = the highest committed version."""
    vs = _versions(target_dir)
    if not vs:
        raise FileNotFoundError(f"no snapshot versions under {target_dir}")
    return spark.read.parquet(os.path.join(target_dir, f"v={vs[-1]}"))


def streaming_upsert_sink(
    target_dir: str,
    key: str,
    op_col: str = "op",
    seq_col: str | None = None,
):
    """Returns the (batch_df, batch_id) callback for
    ``changes.writeStream.foreachBatch(...)``."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        changes = batch_df
        if seq_col is not None:
            # last-write-wins compaction within the batch: highest seq per
            # key survives (ties broken by op to stay deterministic)
            w = Window.partitionBy(key).orderBy(
                F.col(seq_col).desc(), F.col(op_col).desc()
            )
            changes = (
                changes.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        below = [v for v in _versions(target_dir) if v < batch_id]
        if below:
            target = spark.read.parquet(os.path.join(target_dir, f"v={below[-1]}"))
        else:
            target = changes.drop(op_col).limit(0)
        merged = apply_changes(target, changes, key=key, op_col=op_col)
        merged.write.mode("overwrite").parquet(
            os.path.join(target_dir, f"v={batch_id}")
        )

    return apply
