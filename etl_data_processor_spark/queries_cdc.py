"""CDC / incremental-pipeline queries: MERGE-style upsert and SCD2 history.

The change batch for q_cdc_upsert is derived deterministically from the
customer fixture itself (mod-arithmetic selectors), so both engines build
the identical batch: custkey%7==0 rows are updated (name rewritten, acctbal
+1000.0 — exact IEEE addition), %31==0 among them are deletes, and %13==0
spawn inserts at custkey+1000000.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_processor_spark.registry import q, cat as _cat
from etl_data_processor_spark.ops.cdc import apply_changes, scd2_history

_CDC_CHANGES_SQL = """
    changes AS (
        SELECT c_custkey,
               'CDC#' || CAST(c_custkey AS VARCHAR) AS c_name,
               c_nationkey,
               c_acctbal + 1000.0 AS c_acctbal,
               'CDC_UPD' AS c_mktsegment,
               CASE WHEN c_custkey % 31 = 0 THEN 'D' ELSE 'U' END AS op
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey + 1000000,
               'NEW#' || CAST(c_custkey AS VARCHAR),
               c_nationkey,
               0.0 AS c_acctbal,
               'CDC_NEW' AS c_mktsegment,
               'I' AS op
        FROM customer WHERE c_custkey % 13 = 0
    )
"""


def _changes(customer):
    updates = customer.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.concat(F.lit("CDC#"), F.col("c_custkey").cast("string")).alias("c_name"),
        "c_nationkey",
        (F.col("c_acctbal") + F.lit(1000.0)).alias("c_acctbal"),
        F.lit("CDC_UPD").alias("c_mktsegment"),
        F.when(F.col("c_custkey") % 31 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    inserts = customer.filter(F.col("c_custkey") % 13 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW#"), F.col("c_custkey").cast("string")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("CDC_NEW").alias("c_mktsegment"),
        F.lit("I").alias("op"),
    )
    return updates.unionByName(inserts)


@q(
    "q_cdc_upsert",
    "WITH " + _CDC_CHANGES_SQL + """
    SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
           CASE WHEN s.op IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
           CASE WHEN s.op IS NOT NULL THEN s.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
           CASE WHEN s.op IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
           CASE WHEN s.op IS NOT NULL THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
    FROM customer t FULL OUTER JOIN changes s ON t.c_custkey = s.c_custkey
    WHERE s.op IS NULL OR s.op <> 'D'
    """,
)
def q_cdc_upsert(spark, sf_dir):
    """MERGE INTO semantics (update / insert / delete in one change batch),
    decomposed Delta-style into broadcast left join + small-side insert
    anti-join so the snapshot is scanned but NEVER shuffled (a full-outer
    join — the oracle's formulation — cannot broadcast and would
    sort-merge-shuffle the whole 100 TB snapshot)."""
    customer = _cat(spark, sf_dir).customer
    return apply_changes(customer, _changes(customer), key="c_custkey")


@q(
    "q_cdc_scd2",
    """
    SELECT user_id, event_id, value,
           epoch_us(ts) AS valid_from_us,
           LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to_us,
           CAST(LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                IS NULL AS INTEGER) AS is_current
    FROM events WHERE event_type = 'purchase'
    """,
)
def q_cdc_scd2(spark, sf_dir):
    """SCD Type-2 attribute history: each purchase opens a validity interval
    closed by the user's next purchase (lead window; one shuffle). Interval
    bounds are integer microseconds — engine-exact time math."""
    ev = _cat(spark, sf_dir).events.filter(F.col("event_type") == "purchase")
    return scd2_history(
        ev, key="user_id", ts="ts", attrs=["value"], tiebreak="event_id"
    )
