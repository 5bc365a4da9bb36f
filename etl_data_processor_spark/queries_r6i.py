"""Round-6 extension batch #9 (B73): character-entropy gibberish gate
and corpus-specific stopword discovery — two small quality/lexicon ops
rounding out the text-filter family.

House rules: deterministic, DuckDB-oracled, 1e-12 fixed-point entropy
terms before integer sums, vocabulary-sized model frames.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_processor_spark.ops import similarity as SIM
from etl_data_processor_spark.registry import cat as _cat
from etl_data_processor_spark.registry import q

_SQL_TOKENS = "list_filter(string_split(trim(text), ' '), t -> t <> '')"


# =====================================================================
# Character-entropy gibberish gate (B31 ext — the Shannon-entropy
# low-pass next to q_text_quality's surface ratios)
# =====================================================================

_ENT_MIN = 2.0   # bits; English-like text sits ~4, 'aaaa…' at 0


_ENT_ORACLE = f"""
WITH ch AS (
    SELECT doc_id, unnest(string_split(text, '')) AS c
    FROM documents
),
cnt AS (
    SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS k
    FROM ch GROUP BY doc_id, c
),
tot AS (
    SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n FROM cnt GROUP BY doc_id
),
terms AS (
    SELECT cnt.doc_id,
           CAST(FLOOR(-(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                      * LOG2(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                      * 1000000000000.0 + 0.5) AS BIGINT) AS tq
    FROM cnt JOIN tot USING (doc_id)
)
SELECT doc_id,
       CAST(FLOOR(CAST(SUM(tq) AS DOUBLE) / 1000000.0 + 0.5) AS DOUBLE)
           / 1000000.0 AS entropy6,
       CAST(CASE WHEN SUM(tq) < {_ENT_MIN} * 1000000000000.0
                 THEN 1 ELSE 0 END AS INTEGER) AS gibberish
FROM terms GROUP BY doc_id
"""


@q("q_char_entropy_filter", _ENT_ORACLE)
def q_char_entropy_filter(spark, sf_dir):
    """B73: Shannon character-entropy gate — per document the exact
    entropy of its character distribution (bits) and a gibberish flag
    below 2.0 bits: repeated-character runs, base64 blobs with tiny
    alphabets, and 'aaaa' spam score near 0 while natural text sits
    around 4 — the information-theoretic quality gate next to
    q_text_quality's surface ratios (Gopher-family filtering, public).
    Determinism: each -(p)log2(p) term quantizes to 1e-12 integers
    before the per-doc sum (ops/exact); the flag compares the INTEGER
    sum against the scaled threshold, so the gate can't straddle a
    float ulp. Scale (r10): ONE vectorized Arrow pass per document
    (ops.text.char_entropy_q12 — Counter counts + glibc log2, the
    oracle's own libm) replaces the char explode -> two hash aggs ->
    join chain; no shuffle at all — the entropy is a scan-stage
    column."""
    from etl_data_processor_spark.ops.dedup import _parallelize
    from etl_data_processor_spark.ops.text import char_entropy_q12

    d = _parallelize(
        _cat(spark, sf_dir).documents.select("doc_id", "text")
    )
    s = char_entropy_q12(F.col("text"))
    terms = d.select("doc_id", s.alias("eq"))
    return terms.select(
        "doc_id",
        (
            F.floor(F.col("eq").cast("double") / F.lit(1e6) + F.lit(0.5))
            .cast("double") / F.lit(1e6)
        ).alias("entropy6"),
        F.when(F.col("eq") < F.lit(_ENT_MIN) * F.lit(1e12), 1)
        .otherwise(0)
        .alias("gibberish"),
    )


# =====================================================================
# Corpus-specific stopword discovery (B31 ext — the lexicon builder
# upstream of BM25/TF-IDF: which tokens carry no signal HERE)
# =====================================================================

_SW_DF_MIN = 0.5   # document-frequency ratio threshold


_SW_ORACLE = f"""
WITH toks AS (
    SELECT DISTINCT doc_id, unnest({_SQL_TOKENS}) AS token
    FROM documents
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
df AS (
    SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM toks GROUP BY token
)
SELECT token, df, n.n_docs,
       CAST(FLOOR(CAST(df AS DOUBLE) / CAST(n.n_docs AS DOUBLE)
                  * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS df_ratio6
FROM df, n
WHERE CAST(df AS DOUBLE) / CAST(n.n_docs AS DOUBLE) > {_SW_DF_MIN}
"""


@q("q_stopword_discovery", _SW_ORACLE)
def q_stopword_discovery(spark, sf_dir):
    """B73: corpus-specific stopword discovery — tokens whose document
    frequency exceeds half the corpus (they appear in most documents,
    so they carry no retrieval signal HERE, whatever a generic English
    list says). This is the lexicon builder upstream of BM25/TF-IDF
    pipelines: deploy-time stopword lists come from exactly this query
    over the actual corpus. Plan: one distinct-per-doc token explode ->
    vocabulary-sized df aggregate -> ratio filter; output is stopword-
    list-sized. The 1-row corpus count broadcasts."""
    d = _cat(spark, sf_dir).documents
    from etl_data_processor_spark.ops.text import tokenize

    toks = d.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("token")
    ).distinct()
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    df = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    ratio = F.col("df").cast("double") / F.col("n_docs").cast("double")
    return (
        df.crossJoin(F.broadcast(n))
        .filter(ratio > _SW_DF_MIN)
        .select(
            "token", "df", "n_docs",
            SIM.stable_round6(ratio).alias("df_ratio6"),
        )
    )
