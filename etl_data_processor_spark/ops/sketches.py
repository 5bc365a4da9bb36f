"""Mergeable distinct-count sketches (Apache DataSketches HLL via Spark 4
``hll_sketch_agg`` / ``hll_union_agg``).

This is the 100 TB cardinality pattern the exact path can't follow: an exact
COUNT(DISTINCT) over a 100 TB key column shuffles every distinct key once,
while a sketch is a fixed ~KB register array per group — partial per
partition/day/source, then merged associatively at read time. The pattern
that matters operationally: materialize per-slice sketches ONCE (e.g. per
ingest day), answer any later cross-slice cardinality question by unioning
the stored sketches without touching the raw data again.

Engine notes encoded here:
- Sketch updates are register maxima, so results are partition- and
  order-invariant (pinned by test) — safe under AQE re-planning and
  speculative tasks, unlike sampling-based estimators.
- ``lgConfigK`` trades size for error (default 12 → ~1.6% RSE); both the
  partial and the union must agree on it.
- DuckDB's approx_count_distinct uses a different sketch, so these queries
  are rows-only for the oracle; accuracy is asserted in unit tests against
  the exact count (reference has no aggregate surface at all —
  main.py:1-422).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_partial(
    df: DataFrame, group_cols: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group HLL sketches: the materialize-once half of the pattern.
    Plans as partial+final hash agg — sketch registers merge map-side, so
    the exchange carries one ~KB sketch per group per mapper, not keys."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll_sketch")
    )


def hll_merge(
    sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Union stored sketches (optionally re-grouped coarser) and estimate.
    The union is associative and commutative, so any grouping of the same
    underlying slices yields the identical estimate. (The union takes its
    lgConfigK from the sketches themselves; its second parameter is
    allowDifferentLgConfigK, left False so mismatched-precision slices fail
    loudly instead of silently degrading to the coarser sketch.)"""
    grouped = (
        sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    )
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias("distinct_est")
    )


def hll_estimate(sketch: Column) -> Column:
    return F.hll_sketch_estimate(sketch)
