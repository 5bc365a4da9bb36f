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
