"""CDC operators: MERGE-style upsert semantics + plan shape, SCD2 history."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_data_processor_spark.io import Catalog
from etl_data_processor_spark.ops.cdc import apply_changes, scd2_history


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, name string, bal double",
    )


def _changes(spark):
    return spark.createDataFrame(
        [
            (2, "b2", 21.0, "U"),   # update matched
            (5, "e", 50.0, "U"),    # upsert: U on absent key inserts
            (6, "f", 60.0, "I"),    # plain insert
            (3, None, 0.0, "D"),    # delete matched
            (9, None, 0.0, "D"),    # delete absent key: no-op
        ],
        "k long, name string, bal double, op string",
    )


@pytest.mark.slow
def test_apply_changes_semantics(spark):
    got = {
        r["k"]: (r["name"], r["bal"])
        for r in apply_changes(_target(spark), _changes(spark), key="k").collect()
    }
    assert got == {
        1: ("a", 10.0),   # untouched
        2: ("b2", 21.0),  # updated
        4: ("d", 40.0),   # untouched
        5: ("e", 50.0),   # upserted
        6: ("f", 60.0),   # inserted
    }


def test_apply_changes_never_shuffles_snapshot(spark, sf_dir):
    # MERGE decomposition: all joins broadcast; the snapshot is scanned but
    # no hash-partitioning exchange may appear anywhere in the plan.
    customer = Catalog(spark, sf_dir).customer
    changes = customer.limit(20).select(
        "c_custkey",
        F.lit("X").alias("c_name"),
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        F.lit("U").alias("op"),
    )
    merged = apply_changes(customer, changes, key="c_custkey")
    merged.collect()
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_scd2_intervals_partition_timeline(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events.filter(F.col("event_type") == "purchase")
    hist = scd2_history(
        ev, key="user_id", ts="ts", attrs=["value"], tiebreak="event_id"
    ).collect()
    by_user: dict[int, list] = {}
    for r in hist:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user, "fixture has purchases"
    for rows in by_user.values():
        rows.sort(key=lambda r: (r["valid_from_us"], r["event_id"]))
        # exactly one open (current) interval per key, and it is the last
        assert sum(r["is_current"] for r in rows) == 1
        assert rows[-1]["is_current"] == 1 and rows[-1]["valid_to_us"] is None
        # intervals chain: each valid_to equals the next valid_from
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]
