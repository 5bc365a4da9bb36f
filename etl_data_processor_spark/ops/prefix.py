"""Distributed prefix sums (scalable cumulative aggregation).

A cumulative window `SUM(x) OVER (PARTITION BY series ORDER BY t)`
single-partitions each series: at 100 TB a popular series' billions of
points sort through ONE task. The classic fix is the two-phase
distributed prefix sum (the scan primitive of parallel computing):

  1. chunk each series by a coarse range key (e.g. week(t)) and run
     the cumulative window WITHIN each (series, chunk) — parallel
     across chunks, each chunk sorts only its own points;
  2. aggregate per-chunk totals (series x chunks rows), cumulate THOSE
     with a lag-exclusive window (chunked-frame-sized), and join the
     per-chunk starting offsets back on the same (series, chunk) key.

The result matches the single-window form exactly — including NULL
semantics (a NULL-series partition cumulates like any other; a row
whose whole prefix is NULL stays NULL, while a NULL after values
carries the running value) — pinned by test against the plain window.

Cost notes for the 100 TB regime this exists for:
- the offsets frame is series x chunks rows — small relative to the
  fact but NOT driver-small when series cardinality is huge, so the
  join leaves strategy to the planner (no forced broadcast); its key
  equals the window partition key, so the shuffle aligns with phase 1.
- the input is scanned twice (the window pass and the totals
  aggregate are independent consumers). At raw-table scale two scans
  beat caching the table; if the input is an expensive derived
  subquery, persist it before calling.

No reference counterpart (main.py:1-422 has no window functions);
north-star scale engineering for the sweep-line / running-total family
(q_peak_concurrency, q_win_running, q_ts_cusum at extreme series
cardinality skew).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chunked_cumsum(
    df: DataFrame,
    series_cols: list[str],
    order_cols: list[str],
    val_col: str,
    chunk_col: Column,
    out_col: str = "cumsum",
) -> DataFrame:
    """Cumulative sum of ``val_col`` per series in ``order_cols`` order,
    computed as within-chunk windows + chunk-offset join.
    ``chunk_col`` must be monotone in the order columns within a series
    (e.g. a time bucket of the first order column). Integer-typed
    ``val_col`` recommended (exact, order-independent partials)."""
    d = df.withColumn("__chunk", chunk_col)
    w_in = (
        Window.partitionBy(*series_cols, "__chunk")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn("__local", F.sum(val_col).over(w_in))
    totals = d.groupBy(*series_cols, "__chunk").agg(
        F.sum(val_col).alias("__tot"),
        F.count(val_col).alias("__cnt"),  # non-null count: NULL semantics
    )
    w_off = (
        Window.partitionBy(*series_cols)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *series_cols,
        "__chunk",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"),
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__prior"),
    )
    # null-SAFE join keys: a NULL series (or NULL chunk) partition must
    # cumulate exactly like the plain window, not silently drop.
    # Explicit aliases avoid the same-lineage ambiguity of local[c] vs
    # offsets[c] on a self-derived frame.
    L, O = local.alias("__L"), offsets.alias("__O")
    cond = None
    for c in [*series_cols, "__chunk"]:
        eq = F.col(f"__L.{c}").eqNullSafe(F.col(f"__O.{c}"))
        cond = eq if cond is None else (cond & eq)
    out = (
        F.when(
            F.col("__local").isNotNull(), F.col("__off") + F.col("__local")
        )
        # all-NULL within-chunk prefix: carry the offset if any earlier
        # chunk held a value, else the whole prefix is NULL -> NULL
        .when(F.col("__prior") > 0, F.col("__off"))
        .otherwise(F.lit(None))
    )
    joined = L.join(O, cond)
    keep = [F.col(f"__L.{c}") for c in local.columns] + [
        F.col("__O.__off"), F.col("__O.__prior")
    ]
    return (
        joined.select(*keep)
        .withColumn(out_col, out)
        .drop("__chunk", "__local", "__off", "__prior")
    )
