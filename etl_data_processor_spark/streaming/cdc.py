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
scanned, never shuffled; only the (small) micro-batch moves. The snapshot
lifecycle is completed by :func:`expire_versions` (retention: drop old
version directories, Delta's VACUUM) and :func:`compact_snapshot`
(small-file compaction of the live version, Delta's OPTIMIZE) — a
streaming sink that only ever appends versions otherwise accretes one
directory per micro-batch and thousands of tiny files, which at scale
turns every snapshot read into a listing + open storm.
"""

from __future__ import annotations

import glob
import os
import shutil

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


def expire_versions(target_dir: str, keep_last: int = 2) -> list[int]:
    """Retention: delete all but the newest ``keep_last`` version
    directories; returns the versions removed. Readers always resolve the
    LATEST version (read_snapshot), so dropping older ones never changes
    what a reader sees — it only forfeits time travel below the horizon.
    Keep at least 2 so an in-flight replayed batch N (which reads the
    latest version strictly below N) still finds its base."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    vs = _versions(target_dir)
    drop = vs[:-keep_last]
    for v in drop:
        shutil.rmtree(os.path.join(target_dir, f"v={v}"))
    return drop


def compact_snapshot(
    spark: SparkSession, target_dir: str, target_files: int = 1
) -> int:
    """Small-file compaction of the LIVE version: rewrite the newest
    snapshot's many per-batch files into ``target_files`` files, in place.
    Returns the compacted version number.

    foreachBatch sinks write one version per micro-batch, each with
    shuffle-partition-many small files; compaction coalesces narrow (no
    shuffle — ``coalesce`` only merges read splits) and the data is
    byte-equivalent. The swap is copy-on-write: the compacted files land in
    a scratch directory first, then a directory rename replaces the old
    version — readers that already resolved the old path keep a consistent
    (identical) view, new readers see the compacted one. (A crash between
    the two renames below can leave the version briefly absent; a manifest
    commit à la Delta closes even that window — out of scope for plain
    parquet, and the pre-rename snapshot remains under ``.pre`` for manual
    recovery.)"""
    vs = _versions(target_dir)
    if not vs:
        raise FileNotFoundError(f"no snapshot versions under {target_dir}")
    live = vs[-1]
    src = os.path.join(target_dir, f"v={live}")
    scratch = os.path.join(target_dir, f".compact-v={live}")
    backup = os.path.join(target_dir, f".pre-v={live}")
    spark.read.parquet(src).coalesce(target_files).write.mode(
        "overwrite"
    ).parquet(scratch)
    os.rename(src, backup)
    os.rename(scratch, src)
    shutil.rmtree(backup)
    return live
