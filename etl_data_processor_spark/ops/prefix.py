"""Distributed prefix sums (scalable cumulative aggregation).

A cumulative window `SUM(x) OVER (PARTITION BY series ORDER BY t)`
single-partitions each series: at 100 TB a popular series' billions of
points sort through ONE task. The classic fix is the two-phase
distributed prefix sum (the scan primitive of parallel computing):

  1. chunk each series by a coarse range key (e.g. month(t)) and run
     the cumulative window WITHIN each (series, chunk) — parallel
     across chunks, each chunk sorts only its own points;
  2. aggregate per-chunk totals (a tiny frame: series × chunks),
     cumulate THOSE with a lag-exclusive window (chunk-count-sized),
     and broadcast the per-chunk starting offsets back.

The result is bit-identical to the single-window form (integer sums
commute and every point's prefix = its chunk offset + its within-chunk
prefix) — pinned by test against the plain window on the fixture.

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
    computed as within-chunk windows + broadcast chunk offsets.
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
        F.sum(val_col).alias("__tot")
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
    )
    return (
        local.join(F.broadcast(offsets), [*series_cols, "__chunk"])
        .withColumn(out_col, F.col("__off") + F.col("__local"))
        .drop("__chunk", "__local", "__off")
    )
