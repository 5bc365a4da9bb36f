"""Round-6 extension batch #8 (B72): model-evaluation layer — the
calibration report for the GD-trained probe.

House rules: deterministic, DuckDB-oracled, fixed-point integer sums,
identical expression trees across engines for all float arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_processor_spark.queries_r6c import (
    _GD_F_SQL,
    _gd_feats,
    _gd_step_sql,
    _gd_train,
)
from etl_data_processor_spark.registry import cat as _cat
from etl_data_processor_spark.registry import q

_CAL_BINS = 10  # decile reliability diagram


_CAL_CUTS = ", ".join(f"{i / 10:.1f}" for i in range(1, _CAL_BINS))

_CAL_ORACLE = (
    f"WITH f AS ({_GD_F_SQL}),\n"
    "c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f),\n"
    "w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),"
    + _gd_step_sql(1, "w0") + ","
    + _gd_step_sql(2, "w1") + ","
    + _gd_step_sql(3, "w2") + ","
    + f"""
scored AS (
    SELECT (w3.w0 + w3.w1 * x1 + w3.w2 * x2 + w3.w3 * x3) AS pred, y
    FROM f, w3
),
cuts AS (
    SELECT quantile_cont(pred, [{_CAL_CUTS}]) AS q FROM scored
),
binned AS (
    SELECT
      CAST(len(list_filter(cuts.q, c -> pred > c)) AS INTEGER) AS bin,
      pred, y
    FROM scored, cuts
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(FLOOR(CAST(SUM(CAST(FLOOR(pred * 1000000000.0 + 0.5)
                                AS BIGINT)) AS DOUBLE)
                  / 1000.0 / CAST(COUNT(*) AS DOUBLE) + 0.5) AS DOUBLE)
           / 1000000.0 AS mean_pred6,
       CAST(FLOOR(CAST(SUM(CAST(y AS BIGINT)) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
           / 1000000.0 AS mean_label6
FROM binned GROUP BY bin
"""
)


@q("q_probe_calibration", _CAL_ORACLE)
def q_probe_calibration(spark, sf_dir):
    """B72: reliability diagram (calibration report) for the GD-trained
    linear probe — train the SAME 3 full-batch steps (shared `_gd_train`
    loop / `_gd_step_sql` CTEs, so model and report can't fork), score
    every document, split predictions at their own deciles
    (quantile_cont on identical doubles — both engines interpolate the
    same sorted list), and report per decile-bin the exact mean
    prediction vs mean observed label — the "is the probe's score a
    probability?" chart every model-based filter ships with.
    Determinism: bin index = count of cut points strictly below pred
    (identical doubles -> identical comparisons); per-bin mean pred
    quantizes per row to 1e-9 integers; labels are exact 0/1 integers.
    Scale: training is 3 shuffle-free corpus aggregates; scoring + the
    bin report is one more pass with the 9 cuts broadcast; output is 10
    rows."""
    import math

    feats = _gd_feats(_cat(spark, sf_dir).documents)
    _steps, ws, _n = _gd_train(feats)
    pred = (
        F.lit(ws[0])
        + F.lit(ws[1]) * F.col("x1")
        + F.lit(ws[2]) * F.col("x2")
        + F.lit(ws[3]) * F.col("x3")
    )
    scored = feats.select(pred.alias("pred"), "y")
    cuts_row = scored.agg(
        F.percentile(
            "pred", F.array(*[F.lit(i / 10) for i in range(1, _CAL_BINS)])
        ).alias("q")
    )
    bin_ = F.size(
        F.filter(F.col("q"), lambda c: F.col("pred") > c)
    ).cast("int")
    q9 = F.floor(F.col("pred") * F.lit(1e9) + F.lit(0.5)).cast("long")
    agg = (
        scored.crossJoin(F.broadcast(cuts_row))
        .select(bin_.alias("bin"), q9.alias("pq"), F.col("y").cast("long").alias("yl"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("pq").alias("spq"),
            F.sum("yl").alias("sy"),
        )
    )
    nd = F.col("n").cast("double")
    mean_pred6 = (
        F.floor(
            F.col("spq").cast("double") / F.lit(1e3) / nd + F.lit(0.5)
        ).cast("double") / F.lit(1e6)
    )
    mean_label6 = (
        F.floor(
            F.col("sy").cast("double") / nd * F.lit(1e6) + F.lit(0.5)
        ).cast("double") / F.lit(1e6)
    )
    return agg.select(
        "bin", "n",
        mean_pred6.alias("mean_pred6"),
        mean_label6.alias("mean_label6"),
    )


# =====================================================================
# Cross-source duplication matrix (B22 ext — WHO copies from WHOM: the
# provenance view of the near-dup pair graph)
# =====================================================================

from etl_data_processor_spark.ops import dedup as D  # noqa: E402
from etl_data_processor_spark.queries_north import (  # noqa: E402
    _DUCK_PREFIX_LEN,
    _DUCK_SHINGLES,
    _lsh_index,
)

_DUPMAT_ORACLE = f"""
WITH sh AS (
    SELECT doc_id, {_DUCK_SHINGLES} AS ss
    FROM (SELECT doc_id, string_split(text, ' ') w FROM documents)
),
pref AS (
    SELECT doc_id,
           UNNEST(list_slice(list_sort(ss), 1, {_DUCK_PREFIX_LEN})) AS tok
    FROM sh
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM pref a JOIN pref b ON a.tok = b.tok AND a.doc_id < b.doc_id
),
pairs AS (
    SELECT c.id_a, c.id_b,
           ROUND(len(list_intersect(a.ss, b.ss))::DOUBLE
                 / len(list_distinct(list_concat(a.ss, b.ss))), 4) AS j
    FROM cand c
    JOIN sh a ON a.doc_id = c.id_a
    JOIN sh b ON b.doc_id = c.id_b
    WHERE len(list_intersect(a.ss, b.ss))::DOUBLE
          / len(list_distinct(list_concat(a.ss, b.ss))) >= 0.8
),
m AS (
    SELECT LEAST(da.source, db.source) AS src_lo,
           GREATEST(da.source, db.source) AS src_hi,
           p.j
    FROM pairs p
    JOIN documents da ON da.doc_id = p.id_a
    JOIN documents db ON db.doc_id = p.id_b
)
SELECT src_lo, src_hi,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(FLOOR(CAST(SUM(CAST(FLOOR(j * 1000000.0 + 0.5) AS BIGINT))
                       AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) + 0.5)
            AS DOUBLE) / 1000000.0 AS avg_jaccard6
FROM m GROUP BY src_lo, src_hi
"""


@q("q_dup_source_matrix", _DUPMAT_ORACLE)
def q_dup_source_matrix(spark, sf_dir):
    """B72 #2: cross-source duplication matrix — the near-dup pair graph
    (q_dedup_minhash's verified >= 0.8-Jaccard pairs, off the session's
    shared persisted LSH index) rolled up to (source, source) cells with
    pair counts and exact mean Jaccard: WHO copies from WHOM, the
    provenance question a curation team asks before deciding which
    source to drop. Unordered cells (least/greatest) so mirror pairs
    collapse. Determinism: the pair relation is exact-verified (perfect
    precision), per-pair Jaccard is the identical 4dp-rounded double on
    both engines, and the cell mean quantizes per pair to 1e-6 integers
    before the sum. Scale: everything downstream of the pair graph is
    |pairs| rows -> |sources|^2 cells; the source labels come from two
    broadcast-able joins against the docs projection (at 100 TB the
    signature index already carries source — a plain column ride-along,
    see _lsh_index)."""
    docs = _cat(spark, sf_dir).documents
    sh, bk = _lsh_index(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(
        docs, threshold=0.8, shingled=sh, buckets=bk
    )
    src = docs.select("doc_id", "source")
    m = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("sa")
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("sb")
            ),
            "id_b",
        )
        .select(
            F.least("sa", "sb").alias("src_lo"),
            F.greatest("sa", "sb").alias("src_hi"),
            F.floor(F.col("jaccard") * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("jq"),
        )
    )
    agg = m.groupBy("src_lo", "src_hi").agg(
        F.count(F.lit(1)).alias("n_pairs"), F.sum("jq").alias("sjq")
    )
    mean6 = (
        F.floor(
            F.col("sjq").cast("double") / F.col("n_pairs").cast("double")
            + F.lit(0.5)
        ).cast("double") / F.lit(1e6)
    )
    return agg.select(
        "src_lo", "src_hi", "n_pairs", mean6.alias("avg_jaccard6")
    )
