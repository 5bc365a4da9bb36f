"""Deterministic sampling and dataset splitting for training-data pipelines.

A 100 TB corpus job cannot use ``df.sample`` for anything that must be
reproducible across engines, re-runs, or partitionings: Spark's sampler is
seeded per-partition, so the sampled *set* changes whenever the partitioning
does. These operators instead hash a stable key column with a portable
integer mixer (multiply + xor-shift, 32-bit) and compare against fixed
thresholds — the decision for a row depends only on the row, so:

- the sample is reproducible bit-for-bit on any engine that has 64-bit
  integer arithmetic (the DuckDB oracles run the same expressions);
- it is a narrow, shuffle-free map evaluated inside the scan stage's
  codegen — at 100 TB it costs one pass and prunes data *before* any
  exchange;
- disjoint fractions give disjoint sets (train/test splits can never leak),
  and growing a fraction only ever *adds* rows (monotone samples, the
  property LLM-corpus ablations need).

All arithmetic stays below 2^63 under Spark 4's ANSI mode: the mixed value
is < 2^32 and both multipliers are < 2^31, so products are < 2^63.

No reference counterpart (sampling is absent from main.py:1-422); this is
north-star surface (training-data pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M32 = 1 << 32
# odd 31-bit multipliers (LCG + murmur-style finalizer constants, truncated)
_A1 = 0x45D9F3B  # 73244475
_A2 = 0x119DE1F3 % (1 << 29) * 2 + 1  # odd, < 2^30


def hash32(key: Column, seed: int = 0) -> Column:
    """Portable 32-bit mixer of an integer key: two multiply + xor-shift
    rounds (murmur3-finalizer shape) over 64-bit intermediates. Identical
    results from any engine with BIGINT `*`, `%`, `xor`, `>>` — the DuckDB
    side is emitted by :func:`hash32_sql`."""
    h = F.pmod(key.cast("long") + F.lit(seed * 0x9E3779B9), F.lit(M32))
    h = F.pmod(h * F.lit(_A1), F.lit(M32))
    h = h.bitwiseXOR(F.shiftrightunsigned(h, 16))
    h = F.pmod(h * F.lit(_A2), F.lit(M32))
    return h.bitwiseXOR(F.shiftrightunsigned(h, 13))


def hash32_sql(expr: str, seed: int = 0) -> str:
    """The DuckDB expression computing exactly :func:`hash32` (oracle side)."""
    m32 = M32
    h0 = f"(({expr})::BIGINT + {seed * 0x9E3779B9}) % {m32}"
    h1 = f"(({h0}) * {_A1}) % {m32}"
    h2 = f"xor({h1}, ({h1}) >> 16)"
    h3 = f"(({h2}) * {_A2}) % {m32}"
    return f"xor({h3}, ({h3}) >> 13)"


def _threshold(fraction: float) -> int:
    return int(fraction * M32)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep rows whose ``hash32(key) < fraction * 2^32``. Shuffle-free,
    partitioning-independent, monotone in ``fraction``."""
    return df.filter(hash32(F.col(key_col), seed) < F.lit(_threshold(fraction)))


def split_column(
    key: Column, weights: dict[str, float], seed: int = 0
) -> Column:
    """Label each row with a split name by cumulative hash thresholds, e.g.
    ``{"train": 0.8, "val": 0.1, "test": 0.1}``. Deterministic and disjoint;
    the final split absorbs the rounding remainder so every row is labeled."""
    total = sum(weights.values())
    assert abs(total - 1.0) < 1e-9, "split weights must sum to 1"
    h = hash32(key, seed)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = h < F.lit(_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])


def train_test_split(
    df: DataFrame, key_col: str, weights: dict[str, float], seed: int = 0
) -> DataFrame:
    """Add a ``split`` column (see :func:`split_column`). At 100 TB, write
    with ``partitionBy("split")`` so downstream readers partition-prune."""
    return df.withColumn("split", split_column(F.col(key_col), weights, seed))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` made reproducible):
    each stratum gets its own hash threshold. Unlisted strata use
    ``default_fraction``. Still shuffle-free — the per-row decision needs
    only (key, stratum)."""
    h = hash32(F.col(key_col), seed)
    thresh = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        t = F.lit(_threshold(frac))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = (
        F.lit(_threshold(default_fraction))
        if thresh is None
        else thresh.otherwise(F.lit(_threshold(default_fraction)))
    )
    return df.filter(h < thresh)


def weighted_sample(
    df: DataFrame, key_col: str, weight: Column, seed: int = 0
) -> DataFrame:
    """Importance sampling: keep each row with probability equal to its own
    ``weight`` (clamped to [0, 1]) — accept iff
    ``hash32(key) < floor(weight * 2^32)``. Same guarantees as
    :func:`deterministic_sample` (shuffle-free, partitioning-independent,
    engine-reproducible), but the threshold is per-row: the standard
    quality-weighted corpus downsampling step (keep good documents with
    high probability, boilerplate with low) without an RNG. Monotone in the
    weight: raising a row's weight can only add it to the sample."""
    w = F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0))
    thresh = F.floor(w * F.lit(float(M32))).cast("long")
    return df.filter(hash32(F.col(key_col), seed) < thresh)


def shard_assignment(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    shard_seed: int = 11,
    order_seed: int = 23,
) -> DataFrame:
    """Deterministic training-shard placement: adds ``shard`` (which output
    file the row belongs to) and ``order_key`` (its position inside the
    shard) — both pure functions of the key, so the SAME corpus always
    produces the SAME shards in the SAME order, on any engine and any
    partitioning. This is the 'global deterministic shuffle' every training
    run needs: examples must be well-mixed (hash placement breaks source
    locality) yet exactly reproducible for resume/ablation.

    100 TB write path: ``df.repartition(n_shards, 'shard')
    .sortWithinPartitions('order_key').write...`` — ONE exchange keyed by
    the shard id, in-partition sort, no global sort, no driver involvement.
    Distinct seeds keep placement and order independent (same-shard rows
    are not hash-adjacent).
    """
    return df.withColumn(
        "shard", F.pmod(hash32(F.col(key_col), shard_seed), F.lit(n_shards))
    ).withColumn("order_key", hash32(F.col(key_col), order_seed))
