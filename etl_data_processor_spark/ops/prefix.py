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


def equidepth_chunk(
    df: DataFrame,
    metric_col: str,
    num_chunks: int = 32,
    descending: bool = False,
):
    """Deterministic equi-depth chunk id for :func:`chunked_rank`: interior
    quantile boundaries of ``metric_col`` via the EXACT ``percentile``
    aggregate (deterministic — an approx sketch's partition-merge order
    could assign a row different chunks in the rank's two consumers),
    broadcast-joined back; the chunk is the count of boundaries strictly
    below the value (q_profile_equidepth's technique), so equal metric
    values always share a chunk. With ``descending`` the chunk is the
    count of boundaries strictly ABOVE — monotone non-decreasing along a
    ``metric_col DESC`` order, for rank windows that sort descending
    (q_pareto_share's top-spender rank). Returns
    (df_with_boundaries, chunk_col).
    """
    ps = [i / num_chunks for i in range(1, num_chunks)]
    b = df.agg(
        F.percentile(metric_col, F.array(*[F.lit(p) for p in ps])).alias("__bs")
    )
    joined = df.crossJoin(F.broadcast(b))
    if descending:
        pred = lambda x: F.col(metric_col) < x  # noqa: E731
    else:
        pred = lambda x: F.col(metric_col) > x  # noqa: E731
    chunk = F.size(F.filter(F.col("__bs"), pred)).cast("int")
    # MATERIALIZE the chunk id and drop the boundary array BEFORE the
    # caller's shuffles: Catalyst does not reliably prune __bs (an
    # N-double array on every row) below the chunked-rank exchanges —
    # measured on q_pareto_share at sf1 as a 48x shuffle-byte blowup at
    # 10x rows (SCALE_STRESS r8) with the array riding the rank shuffle.
    out = joined.withColumn("__edc", chunk).drop("__bs")
    return out, F.col("__edc")


def bounded_window_frame(
    df: DataFrame,
    series_cols: list[str],
    order_cols: list,
    chunk_col: Column,
    lookback: int = 0,
    lookahead: int = 0,
    width: int = 1024,
):
    """Exact bounded-ROWS-frame windows (rolling aggregates, LAG/LEAD)
    over a low-cardinality series column WITHOUT the per-series
    single-task sort of ``... OVER (PARTITION BY series ORDER BY t ROWS
    BETWEEN lookback PRECEDING AND lookahead FOLLOWING)``.

    Two-phase: (1) an exact dense per-series position via
    :func:`chunked_rank` (itself single-task-free); (2) rows bucket by
    ``(pos-1) div width`` and REPLICATE into the neighbor bucket on the
    side(s) the frame can reach (one extra copy per needed direction),
    so the window runs per (series, bucket) over at most ~3·width
    contiguous-position rows — every global frame of span <= width lies
    entirely inside one such partition, and partition count GROWS with
    the data (rows/width per series), unlike the fixed-fan-out
    PARTITION BY series plan this replaces.

    Returns ``(frame_df, window_spec, emit_col)``: apply any
    offset/frame expression bounded by (lookback, lookahead) over
    ``window_spec`` (e.g. ``F.sum(x).over(spec.rowsBetween(-lookback,
    0))`` or ``F.lead(x).over(spec)``), then filter ``emit_col`` to
    drop the replicas and the helper columns ``__pos/__o/__bkt``.

    Exactness: positions are dense 1..n per series; partition
    (series, b) holds exactly the rows with pos in
    ((b-1)·width, (b+1)·width], each once, ordered by pos — so a ROWS
    frame evaluated there equals the global frame, including the
    clipped frames at series boundaries and NULL lead/lag past the
    series end. Requires lookback <= width and lookahead <= width
    (asserted).

    No reference counterpart; north-star scale engineering for the
    rolling-statistics family (q_bollinger's 20-row bands, q_twap's
    holding-interval lead) — the sibling of chunked_cumsum for frames
    with bounded span instead of unbounded-preceding.
    """
    if lookback > width or lookahead > width:
        raise ValueError(
            f"frame span ({lookback}, {lookahead}) exceeds width {width}"
        )
    pos = chunked_rank(
        df,
        order_cols,
        chunk_col,
        rank_col="__pos",
        series_cols=series_cols,
    )
    offs = [0] + ([1] if lookback > 0 else []) + ([-1] if lookahead > 0 else [])
    rep = (
        pos.select(
            "*",
            F.explode(
                F.array(*[F.lit(o).cast("int") for o in offs])
            ).alias("__o"),
        )
        .withColumn(
            "__bkt",
            F.expr(f"(__pos - 1) div {int(width)}") + F.col("__o"),
        )
        .filter(F.col("__bkt") >= 0)
    )
    spec = Window.partitionBy(*series_cols, "__bkt").orderBy("__pos")
    return rep, spec, F.col("__o") == 0


def chunked_ranks(
    df: DataFrame,
    order_cols: list,
    chunk_col: Column,
    series_cols: list[str] | None = None,
    tie_cols: list | None = None,
    rn_col: str | None = "rn",
    rank_col: str | None = None,
    dense_col: str | None = None,
    cume_count_col: str | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """The full ANSI ranking-function suite — ROW_NUMBER / RANK /
    DENSE_RANK / cumulative row count (CUME_DIST's numerator) / partition
    total — per series, single-task-free: the generalization of
    :func:`chunked_rank` for orders WITH ties.

    Same two-phase shape: ranking windows within (series, chunk) run
    parallel across chunks; per-chunk row and DISTINCT-TIE-GROUP counts
    cumulate into starting offsets over the bounded chunks frame.
    Correctness hinges on tie groups never spanning chunks: rows equal
    on ALL of ``tie_cols`` are equal on the leading order expression,
    and any ``chunk_col`` that is a pure function of that leading
    expression (e.g. :func:`equidepth_chunk`) therefore keeps every tie
    group inside one chunk — so within-chunk RANK/DENSE_RANK offsets by
    plain row / group counts reproduce the global values exactly:

      row_number = rows_before_chunk + local row_number
      rank       = rows_before_chunk + local rank
      dense_rank = tie_groups_before_chunk + local dense_rank
      cume_count = rows_before_chunk + local rank - 1 + tie group size
                   (rows ordered at-or-before current, CUME_DIST * N)

    ``tie_cols`` (plain Columns/names, no asc/desc wrappers) is required
    for rank_col / dense_col / cume_count_col, and must name the SEMANTIC
    sort keys: ``order_cols[:len(tie_cols)]`` must be exactly those keys
    (with their directions), followed by pure tie-break columns — RANK /
    DENSE_RANK / CUME_DIST tie over the semantic keys while ROW_NUMBER
    uses the full deterministic order. PERCENT_RANK, CUME_DIST and NTILE
    derive arithmetically: (rank-1)/(N-1), cume_count/N, and
    :func:`ntile_expr` (rn, N, k). Registered consumers: q_win_rank,
    q_win_dist (B16) — the plain window forms stay as their DuckDB
    oracles."""
    series = list(series_cols or [])
    need_ties = any([rank_col, dense_col, cume_count_col])
    if need_ties and not tie_cols:
        raise ValueError("tie_cols required for rank/dense/cume outputs")
    ties = [F.col(c) if isinstance(c, str) else c for c in (tie_cols or [])]
    d = df.withColumn("__chunk", chunk_col)
    w_in = Window.partitionBy(*series, "__chunk").orderBy(*order_cols)
    # ranks that tie on the semantic keys sort by the order prefix that
    # expresses them (directions included); the trailing order_cols are
    # determinism tie-breaks that must NOT split rank ties
    w_tie = Window.partitionBy(*series, "__chunk").orderBy(
        *order_cols[: len(ties)] if ties else order_cols
    )
    local = d.withColumn("__lrn", F.row_number().over(w_in))
    if rank_col or cume_count_col:
        local = local.withColumn("__lrk", F.rank().over(w_tie))
    if dense_col:
        local = local.withColumn("__ldr", F.dense_rank().over(w_tie))
    if cume_count_col:
        # tie-group size: unordered count over the (series, chunk, tie)
        # partition — tie groups are chunk-local, so this is exact
        local = local.withColumn(
            "__tsz",
            F.count(F.lit(1)).over(
                Window.partitionBy(*series, "__chunk", *ties)
            ),
        )
    aggs = [F.count(F.lit(1)).alias("__cnt")]
    if dense_col:
        aggs.append(F.countDistinct(F.struct(*ties)).alias("__gct"))
    counts = d.groupBy(*series, "__chunk").agg(*aggs)
    w_off = (
        Window.partitionBy(*series)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_cols = [
        *series,
        "__chunk",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(Window.partitionBy(*series)).alias("__tot"),
    ]
    if dense_col:
        off_cols.append(
            F.coalesce(F.sum("__gct").over(w_off), F.lit(0)).alias("__goff")
        )
    offsets = counts.select(*off_cols)
    if not series:
        offsets = F.broadcast(offsets)
    out = local.join(offsets, [*series, "__chunk"])
    if rn_col:
        out = out.withColumn(rn_col, F.col("__off") + F.col("__lrn"))
    if rank_col:
        out = out.withColumn(rank_col, F.col("__off") + F.col("__lrk"))
    if dense_col:
        out = out.withColumn(dense_col, F.col("__goff") + F.col("__ldr"))
    if cume_count_col:
        out = out.withColumn(
            cume_count_col,
            F.col("__off") + F.col("__lrk") - 1 + F.col("__tsz"),
        )
    if total_col:
        out = out.withColumn(total_col, F.col("__tot"))
    drop = [
        c
        for c in ("__chunk", "__lrn", "__lrk", "__ldr", "__tsz", "__off",
                  "__goff", "__tot")
        if c in out.columns
    ]
    return out.drop(*drop)
