#!/usr/bin/env python
"""Measured skew evidence for SCALE.md: a pathological hot-key join at sf0.1.

Builds a skewed fact from lineitem (half of all rows remapped to ONE key)
and times three plans joining it to orders and aggregating:

  plain          — hash join, AQE skew splitting OFF (the naive cluster
                   default a user inherits when AQE is disabled)
  plain+AQE      — hash join with AQE skew-join splitting ON (session
                   default in this engine)
  salted         — ops.relational.salted_join, 8 salts (the explicit
                   mitigation for skew AQE can't split, e.g. a hot key
                   feeding a hash AGGREGATE rather than a join)

Prints one JSON line. Not part of bench.py (the fixture tables are not
skewed); run ad hoc: python scripts/skew_demo.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_data_processor_spark.io import Catalog  # noqa: E402
from etl_data_processor_spark.ops.relational import salted_join  # noqa: E402
from etl_data_processor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HOT_KEY = 1


def timed(fn, spark):
    fn()  # warm (codegen)
    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark(
        "skew-demo", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    cat = Catalog(spark, SF_DIR)
    # Half the fact rows land on one key — the shape AQE's size-based skew
    # splitting handles for joins, and the shape that serializes one reducer
    # when it can't. MULTIPLIER inflates the fact until one reducer's share
    # dominates wall-clock (at sf0.1's raw 600k rows the hot key fits in a
    # fraction of a second and mitigation overhead exceeds the win — that
    # null result is itself recorded in SCALE.md).
    mult = int(os.environ.get("SKEW_DEMO_MULTIPLier".upper(), "25"))
    fact = (
        cat.lineitem.select(
            F.when(F.rand(42) < 0.5, F.lit(HOT_KEY))
            .otherwise(F.col("l_orderkey"))
            .alias("k"),
            "l_quantity",
        )
        .crossJoin(F.broadcast(spark.range(mult).select(F.lit(1).alias("__x"))))
        .drop("__x")
    )
    dim = cat.orders.select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )

    def agg(joined):
        joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
        ).collect()

    def run_plain():
        # no broadcast: force the shuffled-join path a big-big join takes
        agg(fact.hint("shuffle_merge").join(dim, "k"))

    def run_salted():
        agg(salted_join(fact, dim, "k", salt_buckets=8).hint("shuffle_merge"))

    results = {}
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["plain_no_aqe_skew"] = timed(lambda: run_plain(), spark)
    results["salted_no_aqe_skew"] = timed(lambda: run_salted(), spark)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results["plain_aqe_skew_default"] = timed(lambda: run_plain(), spark)
    # Default AQE thresholds (factor 5 AND >256MB) ignore medium skew — a
    # 7.5M-row hot partition is ~120MB and sails under the byte threshold.
    # Lowering it lets AQE split the same plan with no code change.
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    results["plain_aqe_skew_tuned"] = timed(lambda: run_plain(), spark)
    # Even forced, AQE can't win THIS shape: splitting the skewed join
    # partition breaks the partitioning the downstream groupBy needs, so the
    # full join output re-shuffles — which is why OptimizeSkewedJoin skips
    # such plans by default, and why salted_join (spreads the hot key
    # BEFORE the join; the 5-value final agg is cheap) is the right tool for
    # join→agg pipelines with a pathological hot key.
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    results["plain_aqe_skew_forced"] = timed(lambda: run_plain(), spark)
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")

    n_hot = fact.filter(F.col("k") == HOT_KEY).count()
    print(
        json.dumps(
            {
                "metric": "skew_demo_join_agg_seconds",
                "sf_dir": SF_DIR,
                "hot_key_rows": n_hot,
                "total_rows": fact.count(),
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
