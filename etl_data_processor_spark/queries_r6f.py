"""Round-6 extension batch #6 (B70): embedding-space data quality.

q_source_centroid_outliers is the embedding-side quality gate next to
the text-side ones (quality score, perplexity, length): docs whose
embedding sits far from its own source's centroid are mislabeled /
contaminated / garbage candidates — the standard "centroid distance"
audit an embedding-curation pipeline runs per ingest.

House rules: deterministic, DuckDB-oracled, per-term fixed-point
integer sums (the power-iteration machinery), broadcast model state.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_data_processor_spark.registry import cat as _cat
from etl_data_processor_spark.registry import q

_CO_DIM = 64
_CO_BOTTOM = 3   # outliers reported per source


_CO_ORACLE = f"""
WITH j AS (
    SELECT d.source, e.vec_id, e.embedding
    FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
),
sums AS (
    SELECT source, r.d,
           CAST(SUM(CAST(FLOOR(embedding[r.d]::DOUBLE
                                * 1000000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS sq,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM j, range(1, {_CO_DIM} + 1) r(d)
    GROUP BY source, r.d
),
cent AS (
    SELECT source, d,
           CAST(sq AS DOUBLE) / 1000000000.0 / CAST(n AS DOUBLE) AS c
    FROM sums
),
cl AS (
    SELECT source, list(c ORDER BY d) AS cv FROM cent GROUP BY source
),
scored AS (
    SELECT j.source, j.vec_id,
           list_reduce([j.embedding[i]::DOUBLE * cl.cv[i]
                        for i in range(1, {_CO_DIM} + 1)],
                       (a, b) -> a + b) AS dot,
           SQRT(list_reduce([j.embedding[i]::DOUBLE * j.embedding[i]::DOUBLE
                             for i in range(1, {_CO_DIM} + 1)],
                            (a, b) -> a + b)) AS xn,
           SQRT(list_reduce([cl.cv[i] * cl.cv[i]
                             for i in range(1, {_CO_DIM} + 1)],
                            (a, b) -> a + b)) AS cn
    FROM j JOIN cl USING (source)
),
ranked AS (
    SELECT source, vec_id,
           CAST(FLOOR(dot / (xn * cn) * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS cos6,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY CAST(FLOOR(dot / (xn * cn) * 1000000000000.0
                                   + 0.5) AS BIGINT) ASC, vec_id ASC
           ) AS INTEGER) AS outlier_rank
    FROM scored
)
SELECT source, vec_id, cos6, outlier_rank
FROM ranked WHERE outlier_rank <= {_CO_BOTTOM}
"""


@q("q_source_centroid_outliers", _CO_ORACLE)
def q_source_centroid_outliers(spark, sf_dir):
    """B70: embedding-space quality gate — per source, the 3 documents
    whose embeddings are LEAST cosine-similar to their own source's
    centroid (mislabeled / contaminated / garbage candidates; the
    centroid-distance audit every embedding-curation pipeline runs).
    Determinism: centroids are exact — per-(source, dim) sums of
    1e-9-quantized components as integers (order-free), divided by
    exact counts; per-doc cosines fold in index order (IEEE-identical
    across engines — the q_power_iteration machinery); outlier ranks on
    the 1e-12-quantized cosine with vec_id tiebreaks. Scale: one
    doc⋈embedding join (co-keyed), one (source, dim) hash aggregate
    (|sources|×64 rows — broadcast back), one scoring pass; the only
    window partitions by source."""
    d = _cat(spark, sf_dir).documents.select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    emb = _cat(spark, sf_dir).embeddings
    j = emb.join(d, "vec_id").select("source", "vec_id", "embedding")

    sums = (
        j.select(
            "source",
            F.explode(F.sequence(F.lit(1), F.lit(_CO_DIM))).alias("d"),
            F.col("embedding"),
        )
        .select(
            "source", "d",
            F.floor(
                F.element_at("embedding", F.col("d")).cast("double")
                * F.lit(1e9) + F.lit(0.5)
            ).cast("long").alias("q"),
        )
        .groupBy("source", "d")
        .agg(F.sum("q").alias("sq"), F.count(F.lit(1)).alias("n"))
    )
    cent = sums.select(
        "source", "d",
        (
            F.col("sq").cast("double") / F.lit(1e9) / F.col("n").cast("double")
        ).alias("c"),
    )
    cl = cent.groupBy("source").agg(
        F.array_sort(
            F.collect_list(F.struct("d", "c"))
        ).getField("c").alias("cv")
    )
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(xd, F.col("cv"), lambda x, c: x * c),
        F.lit(0.0), lambda a, x: a + x,
    )
    xn = F.sqrt(
        F.aggregate(
            F.transform(xd, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    cn = F.sqrt(
        F.aggregate(
            F.transform(F.col("cv"), lambda c: c * c),
            F.lit(0.0), lambda a, x: a + x,
        )
    )
    cos = dot / (xn * cn)
    scored = j.join(F.broadcast(cl), "source").select(
        "source", "vec_id",
        (
            F.floor(cos * F.lit(1e6) + F.lit(0.5)).cast("double") / F.lit(1e6)
        ).alias("cos6"),
        F.floor(cos * F.lit(1e12) + F.lit(0.5)).cast("long").alias("cq"),
    )
    w = Window.partitionBy("source").orderBy(F.asc("cq"), F.asc("vec_id"))
    return (
        scored.withColumn("outlier_rank", F.row_number().over(w))
        .filter(F.col("outlier_rank") <= _CO_BOTTOM)
        .select("source", "vec_id", "cos6", "outlier_rank")
    )
