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


def chunked_rank(
    df: DataFrame,
    order_cols: list,
    chunk_col: Column,
    rank_col: str = "rank",
    total_col: str | None = None,
    series_cols: list[str] | None = None,
) -> DataFrame:
    """Exact row number over a UNIQUE total order — global, or per
    series with ``series_cols`` — without the single-reducer sort of
    ``row_number() OVER ([PARTITION BY series] ORDER BY ...)``. (The
    partitioned form is just as dangerous when the partition column is
    low-cardinality: PARTITION BY segment single-tasks each segment's
    whole slice of the corpus.)

    Same two-phase shape as :func:`chunked_cumsum`: within-(series,
    chunk) ``row_number`` (parallel across chunks) + per-chunk counts
    cumulated into starting offsets (a series x chunks frame; its
    window is chunk-count-bounded per series, never data-sized) joined
    back. ``chunk_col`` must be deterministic and monotone
    non-decreasing along ``order_cols``'s total order within each
    series (rows that compare equal on the leading order expressions
    must share a chunk — derive it from boundary comparisons on the
    FIRST order column only). ``order_cols`` must be a unique total
    order (include a tie-break key) or ranks are ambiguous.

    VERDICT r4 item 4: this is the registered scale path for the global
    NTILE / global-rank family (q_rfm_segments); the plain window forms
    stay as the DuckDB oracle cross-checks. The offsets join is
    broadcast only in the global case — with series_cols the offsets
    frame is series-cardinality-sized, so join strategy stays with the
    planner (the chunked_cumsum cost note).
    """
    series = list(series_cols or [])
    d = df.withColumn("__chunk", chunk_col)
    w_in = Window.partitionBy(*series, "__chunk").orderBy(*order_cols)
    local = d.withColumn("__local", F.row_number().over(w_in))
    counts = d.groupBy(*series, "__chunk").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_off = (
        Window.partitionBy(*series)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *series,
        "__chunk",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(Window.partitionBy(*series)).alias("__tot"),
    )
    if not series:
        offsets = F.broadcast(offsets)
    out = local.join(offsets, [*series, "__chunk"]).withColumn(
        rank_col, F.col("__off") + F.col("__local")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("__tot"))
    return out.drop("__chunk", "__local", "__off", "__tot")


def ntile_expr(rank: Column, total: Column, k: int) -> Column:
    """NTILE(k) reproduced EXACTLY from a 1-based global rank and the row
    count: the first ``total % k`` buckets get ``total div k + 1`` rows,
    the rest ``total div k`` — Spark's (and ANSI's) NTILE contract. Pure
    Column arithmetic, so the tiling runs wherever the rank lives instead
    of inside a single-reducer WindowExec. ``GREATEST(base, 1)`` guards
    the small-N (total < k) division; that branch is then never selected
    because every rank falls in the size-(base+1) prefix."""
    base = F.floor(total / k).cast("long")
    rem = (total % k).cast("long")
    big = base + F.lit(1)
    safe_base = F.greatest(base, F.lit(1).cast("long"))
    return (
        F.when(rank <= big * rem, F.floor((rank - 1) / big) + 1)
        .otherwise(rem + F.floor((rank - 1 - big * rem) / safe_base) + 1)
        .cast("int")
    )


def equidepth_chunk(df: DataFrame, metric_col: str, num_chunks: int = 32):
    """Deterministic equi-depth chunk id for :func:`chunked_rank`: interior
    quantile boundaries of ``metric_col`` via the EXACT ``percentile``
    aggregate (deterministic — an approx sketch's partition-merge order
    could assign a row different chunks in the rank's two consumers),
    broadcast-joined back; the chunk is the count of boundaries strictly
    below the value (q_profile_equidepth's technique), so equal metric
    values always share a chunk. Returns (df_with_boundaries, chunk_col).
    """
    ps = [i / num_chunks for i in range(1, num_chunks)]
    b = df.agg(
        F.percentile(metric_col, F.array(*[F.lit(p) for p in ps])).alias("__bs")
    )
    joined = df.crossJoin(F.broadcast(b))
    chunk = F.size(
        F.filter(F.col("__bs"), lambda x: F.col(metric_col) > x)
    ).cast("int")
    return joined, chunk
