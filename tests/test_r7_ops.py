"""Round-7 tests: PassJoin segment blocking (ops.text.passjoin_*).

Losslessness is the contract: the segment equi-join must find EVERY pair
within lev <= k. The registry key q_fuzzy_passjoin differential-proves it
against the naive all-pairs DuckDB oracle on the part fixture; here a
randomized adversarial corpus (short strings, empty strings, injected
near-pairs) is proven against a pure-Python Levenshtein.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_data_processor_spark.ops import text as T


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _pool(seed: int) -> list[str]:
    rng = random.Random(seed)
    alpha = "abcde"
    pool = set()
    while len(pool) < 150:
        pool.add("".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))))
    for s in list(pool)[:25]:  # inject near-pairs aggressively
        t = list(s)
        if t:
            t[rng.randrange(len(t))] = rng.choice(alpha)
        pool.add("".join(t))
        pool.add(s + rng.choice(alpha))
        if len(s) > 1:
            pool.add(s[1:])
    return sorted(pool)


@pytest.mark.parametrize("seed", [11, 42])
@pytest.mark.parametrize("k", [1, 2])
def test_passjoin_pairs_lossless_vs_naive(spark, seed, k):
    pool = _pool(seed)
    want = sorted(
        (x, y, _lev(x, y))
        for i, x in enumerate(pool)
        for y in pool[i + 1:]
        if _lev(x, y) <= k
    )
    df = spark.createDataFrame([(s,) for s in pool], ["k"])
    got = sorted(
        (r["key_a"], r["key_b"], r["dist"])
        for r in T.fuzzy_key_pairs_passjoin(df, "k", k).collect()
    )
    assert got == want


def test_passjoin_agrees_with_symdelete(spark):
    pool = _pool(7)
    df = spark.createDataFrame([(s,) for s in pool], ["k"])
    pj = sorted(map(tuple, T.fuzzy_key_pairs_passjoin(df, "k", 2).collect()))
    sd = sorted(map(tuple, T.fuzzy_key_pairs_symdelete(df, "k", 2).collect()))
    assert pj == sd


def test_passjoin_probe_volume_bounded(spark):
    """The probe explode is <= (2k+1)^2 * (k+1) keys per string (clipping
    and dedup only shrink it) — the volume claim the docstring makes."""
    df = spark.createDataFrame(
        [("abcdefghijklmnopqr",), ("x" * 40,), ("",)], ["s"]
    )
    k = 2
    sizes = df.select(
        F.size(T.passjoin_probe_keys("s", k)).alias("n")
    ).collect()
    bound = (2 * k + 1) ** 2 * (k + 1)
    assert all(r["n"] <= bound for r in sizes)
    # ... and the index side is exactly k+1 keys
    idx = df.select(F.size(T.passjoin_index_keys("s", k)).alias("n")).collect()
    assert all(r["n"] == k + 1 for r in idx)
