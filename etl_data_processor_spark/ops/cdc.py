"""Change-data-capture operators: MERGE-style upsert and SCD Type-2 history.

The reference engine has no incremental path (main.py:333-361 rebuilds the
whole output each run); these are the operators that make a pipeline
incremental — apply a change batch to a snapshot, and keep attribute history
as validity intervals.

Scale shape:
- ``apply_changes`` is logically a full-outer join, but Spark cannot
  broadcast a full-outer join (SortMergeJoin shuffles AND sorts both sides —
  at 100 TB that's a full shuffle of the snapshot to merge a 1%-sized change
  batch). So it is decomposed the way Delta/Iceberg MERGE executes:
  a broadcast LEFT-outer join applies updates/deletes in place (snapshot
  scanned, never shuffled), and the insert set is computed small-side-only
  (changes anti-joined against the broadcast-matched key set) and unioned
  on. The plan audit in tests/test_cdc.py pins zero Exchange on the
  snapshot lineage; the oracle differential proves the decomposition equals
  the full-outer semantics.
- ``scd2_history`` is one window (lead over the per-key change sequence) —
  a single shuffle on the key, no self-join, no per-row lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
) -> DataFrame:
    """MERGE the change batch into the snapshot: op 'U' replaces the matched
    row (or inserts when unmatched — upsert), 'I' inserts, 'D' deletes.
    ``changes`` carries the full row image plus ``op_col``; at most one
    change per key (standard CDC compaction precondition — enforce upstream
    with a last-write-wins window on the change stream).

    Row-image semantics (no partial-column updates) keep the merge a pure
    per-column coalesce: source wins where present, deletes drop,
    everything else passes through.
    """
    data_cols = [c for c in target.columns if c != key]
    t = target.alias("t")
    s = changes.alias("s")

    # Pass 1: updates + deletes, in place — broadcast left join, snapshot
    # side is only scanned.
    merged = (
        t.join(F.broadcast(s), key, "left_outer")
        .filter(F.col(f"s.{op_col}").isNull() | (F.col(f"s.{op_col}") != F.lit("D")))
        .select(
            F.col(key),
            *[
                F.when(F.col(f"s.{op_col}").isNotNull(), F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
                for c in data_cols
            ],
        )
    )

    # Pass 2: inserts = non-delete changes whose key is absent from the
    # snapshot. The matched-key set is |changes|-bounded (computed by
    # broadcasting the changes to a snapshot key scan), so the anti join
    # runs entirely on small data.
    matched_keys = target.select(key).join(
        F.broadcast(changes.select(key)), key, "left_semi"
    )
    inserts = (
        changes.filter(F.col(op_col) != F.lit("D"))
        .join(F.broadcast(matched_keys), key, "left_anti")
        .select(key, *data_cols)
    )
    return merged.unionByName(inserts)


def scd2_history(
    changes: DataFrame,
    key: str,
    ts: str,
    attrs: list[str],
    tiebreak: str,
) -> DataFrame:
    """SCD Type-2: each change row becomes a validity interval
    [valid_from_us, valid_to_us) in integer microseconds (engine-exact time
    math; see ops docs on µs arithmetic), closed by the next change of the
    same key; the latest change per key stays open (NULL) with
    is_current = 1. ``tiebreak`` totalizes the order under equal timestamps."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(tiebreak).asc())
    valid_to = F.lead(F.unix_micros(F.col(ts))).over(w)
    return changes.select(
        key,
        tiebreak,
        *attrs,
        F.unix_micros(F.col(ts)).alias("valid_from_us"),
        valid_to.alias("valid_to_us"),
        valid_to.isNull().cast("int").alias("is_current"),
    )
