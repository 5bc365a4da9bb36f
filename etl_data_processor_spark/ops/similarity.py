"""Similarity search over embedding columns (north star B32/B33).

Two paths:

- ``cosine_topk_exact`` — brute-force cosine top-k: broadcast the query
  vectors against the corpus, score JVM-side, per-query top-k via window
  rank. The correctness baseline; O(corpus × queries) but embarrassingly
  parallel and shuffle-free until the final per-query top-k.

- ``lsh_cosine_topk`` — random-hyperplane LSH: deterministic signed
  projections bucket the corpus; only same-bucket candidates are scored.
  The 100 TB path: candidate generation is a bucket equi-join instead of a
  cross product. Approximate (recall < 1), so it carries a rows-only oracle.

Exact-decimal scoring: dot products are computed over DECIMAL-cast elements
(exact + order-independent — see ops.exact) so results are engine-stable and
oracle-checkable; the raw double fold in ops.arrays stays available for
throughput-first use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Fixed-point quantization for engine-stable vector math: each float element
# is promoted to double (exact) and quantized to an integer at scale 1e7 via
# floor(x*1e7 + 0.5) — pure IEEE ops, bit-identical on every engine (unlike
# decimal casts: DuckDB's FLOAT->DECIMAL cast is off by 1 ulp on ~3% of
# values, and ROUND(double) half-tie behavior varies). Dot products and
# norms are then exact 64-bit integer arithmetic: order-independent, no
# overflow for unit-scale embeddings up to ~90k dims, and faster than any
# decimal fold.
_Q = 10_000_000.0  # quantization scale (7 decimal digits ≈ float32 precision)


def _quantize(a: Column) -> Column:
    """array<float> -> array<long> at fixed-point scale _Q."""
    return F.transform(
        a, lambda x: F.floor(x.cast("double") * F.lit(_Q) + F.lit(0.5))
    )


def dec_dot(a: Column, b: Column) -> Column:
    """Exact fixed-point dot product -> double (order-independent); value is
    scaled by _Q² relative to the float dot product (cancels in cosine)."""
    return F.aggregate(
        F.zip_with(_quantize(a), _quantize(b), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).cast("double")


def dec_norm(a: Column) -> Column:
    """Fixed-point L2 norm (scaled by _Q)."""
    return F.sqrt(
        F.aggregate(
            F.transform(_quantize(a), lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )


def stable_round6(c: Column) -> Column:
    """Engine-independent 6-decimal rounding of a double: floor(x*1e6+0.5)/1e6
    is pure IEEE arithmetic (multiply, add, floor, divide), so Spark and any
    oracle engine produce the identical double — unlike ROUND(double, n),
    whose half-tie behavior differs across engines.
    SQL mirror: CAST(FLOOR(x * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
    """
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("double") / F.lit(1000000.0)


def dec_cosine(a: Column, b: Column) -> Column:
    return stable_round6(dec_dot(a, b) / (dec_norm(a) * dec_norm(b)))


def cosine_topk_exact(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force cosine top-k per query. ``queries`` is broadcast (queries
    are few; the corpus is the big side), score is computed in codegen, and
    the per-query top-k is a window rank — one shuffle on query_id."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qvec")
        )
    )
    scored = (
        corpus.select(id_col, vec_col)
        .crossJoin(q)
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("cosine", dec_cosine(F.col(vec_col), F.col("__qvec")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (public LCG recipe) — no
    driver-side RNG state, reproducible across runs and engines."""
    planes = []
    state = seed & 0x7FFFFFFF
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            row.append((state / 0x7FFFFFFF) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: one bit per plane = sign of <v, p>,
    packed into a long. Pure expressions — the planes are literals folded
    into codegen."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in p]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return sig


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: bucket corpus and queries by hyperplane
    signature, score only same-bucket candidates. Recall is tunable via
    n_planes (fewer planes = bigger buckets = higher recall & cost). With
    multi-probe (flip one bit), recall rises further — at 100 TB prefer
    8-12 planes and multi-probe over brute force."""
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        id_col, vec_col, lsh_bucket(F.col(vec_col), planes).alias("__bucket")
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(query_id_col),
            F.col(vec_col).alias("__qvec"),
            lsh_bucket(F.col(vec_col), planes).alias("__bucket"),
        )
    )
    scored = (
        c.join(q, "__bucket")
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("cosine", dec_cosine(F.col(vec_col), F.col("__qvec")))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets + exact verify
    (same candidates→verify shape as MinHash dedup)."""
    planes = hyperplanes(dim, n_planes)
    b = df.select(id_col, vec_col, lsh_bucket(F.col(vec_col), planes).alias("__bucket"))
    a2, b2 = b.alias("a"), b.alias("b")
    return (
        a2.join(
            b2,
            (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            dec_cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into ``n_lists``
    inverted lists by nearest centroid, probe only the ``n_probe`` closest
    lists per query.

    Centroids are taken deterministically from the corpus (the ``n_lists``
    smallest ids) rather than trained by k-means — the Spark plan shape is
    identical to a trained IVF (assign = broadcast argmin over centroids;
    search = equi-join on list id) and that plan is what matters at 100 TB:
    candidate generation becomes a bucket join touching ~n_probe/n_lists of
    the corpus instead of a cross product.
    """
    cents = F.broadcast(
        corpus.orderBy(id_col).limit(n_lists).select(
            F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cvec")
        )
    )

    def assign(df: DataFrame, vec: str, out: str, keep_n: int) -> DataFrame:
        """Rank centroid distances per row, keep the top keep_n list ids."""
        scored = df.crossJoin(cents).withColumn(
            "__d", dec_dot(F.col(vec), F.col("__cvec"))
        )
        w = Window.partitionBy(*df.columns).orderBy(
            F.desc("__d"), F.asc("__cid")
        )
        return (
            scored.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= keep_n)
            .select(*df.columns, F.col("__cid").alias(out))
        )

    c_assigned = assign(corpus.select(id_col, vec_col), vec_col, "__list", 1)
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qvec")
    )
    q_assigned = F.broadcast(assign(q, "__qvec", "__list", n_probe))

    scored = (
        c_assigned.join(q_assigned, "__list")
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("cosine", dec_cosine(F.col(vec_col), F.col("__qvec")))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
