"""Flagship end-to-end query (SURVEY.md §7 step 1).

TPC-H-Q3-shaped revenue query over customer ⋈ orders ⋈ lineitem: exercises
scan (A1/B1), filter (A12/B3), inner joins (A6/B4), computed projection (B2),
grouped exact-decimal aggregation (B11), and top-k (B20) in one plan.

Scale notes: the two fact-fact joins shuffle on their join keys once each;
the segment filter and date filters are pushed into the parquet scans
(verify with .explain — PushedFilters on c_mktsegment/o_orderdate/l_shipdate);
top-10 plans as TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_processor_spark.io import Catalog
from etl_data_processor_spark.ops.exact import dsum, revenue, sql_dsum, sql_revenue


def flagship_q3(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cust = cat.customer.filter(F.col("c_mktsegment") == "BUILDING")
    orders = cat.orders.filter(
        F.to_date("o_orderdate") < F.lit("1998-01-01").cast("date")
    )
    li = cat.lineitem.filter(
        F.to_date("l_shipdate") > F.lit("1996-01-01").cast("date")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"))
        .agg(dsum(revenue()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(k)
    )


FLAGSHIP_SQL = f"""
SELECT l.l_orderkey,
       CAST(o.o_orderdate AS DATE) AS o_orderdate,
       {sql_dsum(sql_revenue())} AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
  AND CAST(l.l_shipdate AS DATE) > DATE '1996-01-01'
GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
"""
