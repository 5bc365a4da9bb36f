#!/usr/bin/env python
"""Measured bucketed-join evidence for SCALE.md.

Times the orders ⋈ lineitem fact-to-fact join (the heaviest join shape on
the fixture schema) two ways:

  plain    — both sides parquet: the join hash-shuffles BOTH facts on
             orderkey every run
  bucketed — both sides written once as bucketed tables on the join key
             (spark_catalog, saveAsTable with bucketBy): reads are already
             co-partitioned, the join plans ZERO exchanges

The one-time bucketed write costs one shuffle; every subsequent join of
these tables amortizes it — the 100 TB pattern for fact-to-fact joins that
recur (daily builds, CDC reconciliation, repeated experiments). Prints one
JSON line with both timings and the exchange counts pulled from the plans.

Run ad hoc: python scripts/bucket_probe.py
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_data_processor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange\b", plan))


def join_agg(o, li):
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
    )


def q18_shape(o, li):
    """TPC-H Q18 (large-volume customer) shape: per-order lineitem
    aggregate, HAVING filter, join back to orders. On bucketed tables BOTH
    the per-order aggregate and the join consume the bucket layout — the
    aggregate needs no exchange (partial==final within a bucket) and the
    join is co-located: the whole query plans zero fact exchanges."""
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"])
        .select("o_orderkey", "o_totalprice", "sum_qty")
    )


def timed(df, reps: int = 3) -> float:
    df.collect()  # warm codegen
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        df.collect()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark("bucket-probe")
    # facts must not broadcast — we are measuring the shuffle-vs-colocated
    # difference, not broadcast rescue
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )

    plain = join_agg(o, li)
    t_plain = timed(plain)
    x_plain = n_exchanges(plain)

    n_buckets = 16
    t0 = time.time()
    (
        o.write.mode("overwrite")
        .bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("probe_orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("probe_lineitem_b")
    )
    t_build = round(time.time() - t0, 3)

    ob = spark.table("probe_orders_b")
    lib = spark.table("probe_lineitem_b")
    bucketed = join_agg(ob, lib)
    t_bucketed = timed(bucketed)
    x_bucketed = n_exchanges(bucketed)

    # correctness: identical results both ways
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in bucketed.collect()}
    assert a == b, "bucketed join changed the result"

    # heavy TPC-H shape: Q18 (agg + HAVING + join-back on the same key) —
    # bucketing serves BOTH the aggregate and the join
    li_full = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (
        li_full.write.mode("overwrite")
        .bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("probe_lineitem_full_b")
    )
    lifb = spark.table("probe_lineitem_full_b")
    q18_plain = q18_shape(o, li_full)
    q18_bucketed = q18_shape(ob, lifb)
    t_q18_plain = timed(q18_plain)
    t_q18_bucketed = timed(q18_bucketed)
    x_q18_plain = n_exchanges(q18_plain)
    x_q18_bucketed = n_exchanges(q18_bucketed)
    a = {tuple(r) for r in q18_plain.collect()}
    b = {tuple(r) for r in q18_bucketed.collect()}
    assert a == b, "bucketed Q18 shape changed the result"

    print(
        json.dumps(
            {
                "plain_sec": t_plain,
                "plain_exchanges": x_plain,
                "bucketed_sec": t_bucketed,
                "bucketed_exchanges": x_bucketed,
                "bucket_build_sec": t_build,
                "n_buckets": n_buckets,
                "q18_plain_sec": t_q18_plain,
                "q18_plain_exchanges": x_q18_plain,
                "q18_bucketed_sec": t_q18_bucketed,
                "q18_bucketed_exchanges": x_q18_bucketed,
                "sf_dir": SF_DIR,
            }
        )
    )
    spark.sql("DROP TABLE IF EXISTS probe_orders_b")
    spark.sql("DROP TABLE IF EXISTS probe_lineitem_b")
    spark.sql("DROP TABLE IF EXISTS probe_lineitem_full_b")


if __name__ == "__main__":
    main()
