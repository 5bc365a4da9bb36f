"""Round-5 extension batch (B62): scale-path fuzzy matching, SemDeDup-style
semantic dedup, and token-budget corpus mixing.

House rules as ever: deterministic (no RNG / wall clock), DuckDB-oracled on
the same parquet, and shaped for 100 TB — candidate generation is an
equi-join on a derived key, sampling decisions depend only on the row, and
every Python boundary is avoided (all three queries are pure Column
expressions + joins).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_processor_spark.ops import sampling as SMP
from etl_data_processor_spark.ops import similarity as SIM
from etl_data_processor_spark.ops import text as T
from etl_data_processor_spark.registry import cat as _cat
from etl_data_processor_spark.registry import q

# =====================================================================
# Fuzzy key matching, symmetric-delete scale path (B50 ext)
# =====================================================================


@q(
    "q_fuzzy_symdelete",
    """
    WITH k AS (SELECT DISTINCT p_name AS key FROM part)
    SELECT a.key AS key_a, b.key AS key_b,
           CAST(levenshtein(a.key, b.key) AS INTEGER) AS dist
    FROM k a JOIN k b ON a.key < b.key
    WHERE levenshtein(a.key, b.key) <= 2
    """,
)
def q_fuzzy_symdelete(spark, sf_dir):
    """q_fuzzy_match's exact output through the SYMMETRIC-DELETE blocking
    (ops.text.fuzzy_key_pairs_symdelete) instead of the length band: the
    oracle is the same NAIVE all-pairs SQL, so a green differential
    PROVES the deletion-variant equi-join lossless for lev <= 2 on a
    real text column — the same primitive that took q_record_linkage
    from 94.8x to 13.1x CPU at 10x data (SCALE_STRESS.json). Both
    blocking strategies stay registered: the band is cheaper per key at
    small scale, the variant join is the one whose candidate count
    survives 100 TB."""
    return T.fuzzy_key_pairs_symdelete(
        _cat(spark, sf_dir).part, "p_name", max_dist=2
    )


# =====================================================================
# SemDeDup-style semantic dedup (B22/B32 ext)
# =====================================================================

# Deterministic coarse clusterer both engines can compute: the sign bits of
# the first 6 embedding coordinates (a random-hyperplane LSH with the
# canonical axes as planes). Float sign comparison is exact in both engines
# on the same stored floats. NOTE the indexer is per-engine: DuckDB list
# subscripts are 1-based, Spark's `arr[i]` is 0-BASED — element_at is
# Spark's 1-based form (a silent one-off bucket skew otherwise).


def _bucket_sql(ix) -> str:
    return (
        "CAST("
        + " + ".join(
            f"CASE WHEN {ix(i)} >= 0 THEN {1 << i} ELSE 0 END"
            for i in range(6)
        )
        + " AS BIGINT)"
    )


_BUCKET_DUCK = _bucket_sql(lambda i: f"embedding[{i + 1}]")
_BUCKET_SPARK = _bucket_sql(lambda i: f"element_at(embedding, {i + 1})")


@q(
    "q_dedup_semantic",
    f"""
    WITH cv AS (
        SELECT vec_id,
               {_BUCKET_DUCK} AS bucket,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE)*10000000.0+0.5) AS BIGINT)) AS ce
        FROM embeddings
    ),
    pair_drops AS (
        SELECT DISTINCT b.vec_id
        FROM cv a JOIN cv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id, range(1, 65) t(i)
        GROUP BY a.vec_id, b.vec_id
        HAVING CAST(FLOOR((CAST(SUM(a.ce[i] * b.ce[i]) AS DOUBLE)
                    / (SQRT(CAST(SUM(a.ce[i] * a.ce[i]) AS DOUBLE))
                       * SQRT(CAST(SUM(b.ce[i] * b.ce[i]) AS DOUBLE))))
                    * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 >= 0.5
    )
    SELECT c.vec_id, c.bucket
    FROM cv c ANTI JOIN pair_drops d ON c.vec_id = d.vec_id
    ORDER BY c.vec_id
    """,
)
def q_dedup_semantic(spark, sf_dir):
    """SemDeDup-shape semantic dedup (Abbas et al. 2023, public): cluster
    the embedding space coarsely, compare pairs ONLY within a cluster,
    and drop every vector that has a higher-priority (lower-id) neighbor
    with cosine >= 0.5 in its cluster — returns the KEPT corpus. The
    registered clusterer is a deterministic 6-bit sign-bucket LSH so the
    DuckDB oracle can replicate it bit-for-bit; the production variant
    swaps in trained k-means centroids (ops.similarity.train_ivf_centroids
    + ivf_assign_argmax, exercised by q_cosine_ivf) — same plan shape,
    cluster count sized so within-cluster pairs fit the task budget. At
    100 TB this is the whole point over q_emb_near_dup's label blocks:
    cluster population is a knob (more buckets/centroids), label
    population is not. One equi-join on the bucket key, codegen cosine
    (dec_cosine's decimal-exact fold), broadcast-able drop set, no
    Python boundary."""
    emb = _cat(spark, sf_dir).embeddings
    bucket = F.expr(_BUCKET_SPARK)
    cv = emb.select("vec_id", bucket.alias("bucket"), "embedding")
    a = cv.select(
        F.col("vec_id").alias("id_a"), "bucket", F.col("embedding").alias("ea")
    )
    b = cv.select(
        F.col("vec_id").alias("id_b"), "bucket", F.col("embedding").alias("eb")
    )
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    # ~64 buckets only -> spread the scoring to full parallelism first
    pairs = pairs.repartition(spark.sparkContext.defaultParallelism)
    drops = (
        pairs.withColumn("cos", SIM.dec_cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cos") >= 0.5)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return (
        cv.join(drops, "vec_id", "left_anti")
        .select("vec_id", "bucket")
        .orderBy("vec_id")
    )


# =====================================================================
# Token-budget corpus mixing (north star: data mixing)
# =====================================================================

_MIX_SEED = 7
_M32 = 1 << 32


@q(
    "q_corpus_mix",
    f"""
    WITH toks AS (
        SELECT doc_id, source,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_toks,
               1 + (CAST(regexp_extract(source, '(\\d+)$', 1) AS BIGINT) % 3) AS w
        FROM documents
    ),
    totals AS (
        SELECT source, ANY_VALUE(w) AS w, SUM(n_toks) AS src_toks, COUNT(*) AS src_docs
        FROM toks GROUP BY source
    ),
    grand AS (
        SELECT CAST(FLOOR(0.6 * SUM(src_toks)) AS BIGINT) AS budget,
               SUM(w * src_docs) / SUM(src_docs) AS _unused,
               SUM(w) AS w_total
        FROM totals
    ),
    rated AS (
        SELECT t.source, t.w, t.src_toks,
               LEAST(1.0, (g.budget * t.w) / (g.w_total * t.src_toks)) AS rate
        FROM totals t, grand g
    ),
    kept AS (
        SELECT k.doc_id, k.source, k.n_toks
        FROM toks k JOIN rated r ON k.source = r.source
        WHERE {SMP.hash32_sql('k.doc_id', seed=_MIX_SEED)}
              < CAST(FLOOR(r.rate * {_M32}) AS BIGINT)
    )
    SELECT r.source, r.w AS weight,
           CAST(FLOOR(r.rate * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS rate6,
           CAST(COALESCE(COUNT(k.doc_id), 0) AS BIGINT) AS kept_docs,
           CAST(COALESCE(SUM(k.n_toks), 0) AS BIGINT) AS kept_tokens
    FROM rated r LEFT JOIN kept k ON r.source = k.source
    GROUP BY r.source, r.w, r.rate
    ORDER BY r.source
    """,
)
def q_corpus_mix(spark, sf_dir):
    """Domain mixing to a token budget (the curriculum/mixture step every
    LLM corpus pipeline runs): integer domain weights -> per-source
    sampling rate min(1, budget*w_s / (W*T_s)) -> DETERMINISTIC hash
    sample (ops.sampling.hash32: the decision depends only on doc_id, so
    the mix is reproducible across engines, re-runs and partitionings,
    and growing the budget only ever adds documents). Returns the mix
    manifest per source: weight, rate, kept docs/tokens. 100 TB shape:
    token totals are ONE small aggregate (or free from table-format
    column stats), rates broadcast back, and the sample itself is a
    shuffle-free scan-stage filter — the corpus is never exchanged."""
    d = _cat(spark, sf_dir).documents
    toks = d.select(
        "doc_id",
        "source",
        T.token_count(F.col("text")).cast("long").alias("n_toks"),
        (
            1
            + F.regexp_extract("source", r"(\d+)$", 1).cast("long") % 3
        ).alias("w"),
    )
    totals = toks.groupBy("source").agg(
        F.first("w").alias("w"),
        F.sum("n_toks").alias("src_toks"),
        F.count("*").alias("src_docs"),
    )
    grand = totals.agg(
        F.floor(0.6 * F.sum("src_toks")).cast("long").alias("budget"),
        F.sum("w").alias("w_total"),
    )
    rated = totals.crossJoin(F.broadcast(grand)).select(
        "source",
        "w",
        "src_toks",
        F.least(
            F.lit(1.0),
            (F.col("budget") * F.col("w"))
            / (F.col("w_total") * F.col("src_toks")),
        ).alias("rate"),
    )
    kept = toks.join(F.broadcast(rated.select("source", "rate")), "source").filter(
        SMP.hash32(F.col("doc_id"), seed=_MIX_SEED)
        < F.floor(F.col("rate") * _M32).cast("long")
    )
    agg = kept.groupBy("source").agg(
        F.count("*").alias("kept_docs"), F.sum("n_toks").alias("kept_tokens")
    )
    return (
        rated.join(agg, "source", "left")
        .select(
            "source",
            F.col("w").alias("weight"),
            (F.floor(F.col("rate") * 1000000.0 + 0.5) / 1000000.0).alias(
                "rate6"
            ),
            F.coalesce(F.col("kept_docs"), F.lit(0)).cast("long").alias(
                "kept_docs"
            ),
            F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("long").alias(
                "kept_tokens"
            ),
        )
        .orderBy("source")
    )
