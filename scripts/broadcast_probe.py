#!/usr/bin/env python
"""Measured broadcast-join evidence for SCALE.md.

Times the star-join aggregate (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈
region → group by region/nation) over an inflated fact, two ways:

  broadcast — dims broadcast (the engine's default posture): the fact
              crosses the network once, for the final aggregate
  shuffled  — autoBroadcastJoinThreshold=-1 + merge hints: every join
              hash-shuffles BOTH sides, the naive plan a 1000-executor
              cluster pays when broadcast is misconfigured off or dims
              are mis-estimated

Prints one JSON line. Run ad hoc: python scripts/broadcast_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_data_processor_spark.io import Catalog  # noqa: E402
from etl_data_processor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(os.environ.get("BROADCAST_PROBE_MULTIPLIER", "25"))


def timed(fn, spark):
    fn()
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
        "broadcast-probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    cat = Catalog(spark, SF_DIR)
    fact = (
        cat.lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
        .crossJoin(F.broadcast(spark.range(MULT).select(F.lit(1).alias("__x"))))
        .drop("__x")
    )

    def star(df, hint_shuffle: bool):
        def j(left, right, cond):
            return (
                left.hint("shuffle_merge").join(right, cond)
                if hint_shuffle
                else left.join(right, cond)
            )

        out = j(df, cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        out = j(out, cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        n = cat.nation if hint_shuffle else F.broadcast(cat.nation)
        r = cat.region if hint_shuffle else F.broadcast(cat.region)
        out = j(out, n, F.col("c_nationkey") == F.col("n_nationkey"))
        out = j(out, r, F.col("n_regionkey") == F.col("r_regionkey"))
        return out.groupBy("r_name", "n_name").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )

    results = {}
    results["broadcast_dims"] = timed(lambda: star(fact, False).collect(), spark)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        results["all_shuffled"] = timed(lambda: star(fact, True).collect(), spark)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    print(
        json.dumps(
            {
                "metric": "broadcast_probe_star_agg_seconds",
                "sf_dir": SF_DIR,
                "fact_rows": fact.count(),
                "multiplier": MULT,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
