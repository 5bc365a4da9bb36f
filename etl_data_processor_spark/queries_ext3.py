"""Round-2 extension batch #3: transactional MERGE into the table format,
multi-source BFS reachability, bloom-pruned joins, exact rolling
correlation — each with a DuckDB oracle.

- table-format MERGE (tableformat.py::merge): CDC batch applied through
  the commit log with stats-based touched-group pruning — the Delta
  MERGE execution model on plain parquet, gate-checked end to end
- multi-source BFS hop distances (ops/graph.py::bfs_hops): frontier
  expansion, oracle = unrolled Bellman-Ford relaxation
- bloom-filter-pruned join (ops/bloom.py): portable no-false-negative
  prefilter, result bit-equal to the plain join
- rolling windowed correlation in EXACT integer moments (the
  q_trend_ols technique applied to a sliding frame)

Reference parity: none of these exist in the reference (main.py:1-422);
north-star scope (SURVEY.md §2 Part B extensions).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_data_processor_spark.registry import q, cat as _cat
from etl_data_processor_spark.ops.similarity import stable_round6

_CENTS_SQL = "CAST(FLOOR({c} * 100.0 + 0.5) AS BIGINT)"
_ROUND6 = "CAST(FLOOR(({x}) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0"


def _cents(col: str):
    return F.floor(F.col(col) * F.lit(100.0) + F.lit(0.5)).cast("long")


# =====================================================================
# Transactional MERGE into the log-structured table format
# =====================================================================

@q(
    "q_tableformat_merge",
    """
    WITH cut AS (SELECT MAX(c_custkey) // 3 AS cut FROM customer),
    changes AS (
        SELECT c_custkey,
               'MRG#' || CAST(c_custkey AS VARCHAR) AS c_name,
               c_nationkey,
               c_acctbal + 1000.0 AS c_acctbal,
               'MRG_UPD' AS c_mktsegment,
               CASE WHEN c_custkey % 31 = 0 THEN 'D' ELSE 'U' END AS op
        FROM customer, cut WHERE c_custkey % 7 = 0 AND c_custkey <= cut
        UNION ALL
        SELECT c_custkey + 1000000,
               'NEWM#' || CAST(c_custkey AS VARCHAR),
               c_nationkey,
               0.0 AS c_acctbal,
               'MRG_NEW' AS c_mktsegment,
               'I' AS op
        FROM customer, cut WHERE c_custkey % 13 = 0 AND c_custkey <= cut
    )
    SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
           CASE WHEN s.op IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
           CASE WHEN s.op IS NOT NULL THEN s.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
           CASE WHEN s.op IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
           CASE WHEN s.op IS NOT NULL THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
    FROM customer t FULL OUTER JOIN changes s ON t.c_custkey = s.c_custkey
    WHERE s.op IS NULL OR s.op <> 'D'
    """,
)
def q_tableformat_merge(spark, sf_dir):
    """Transactional MERGE INTO the log-structured table format
    (tableformat.py::merge), oracle-gated: the customer table is committed
    as THREE key-range file groups with min/max stats; a CDC batch
    confined to the first key-range third (updates/deletes on %7, inserts
    above the key space) is merged through the commit log. The merge must
    rewrite EXACTLY ONE of the three groups (stats-pruned copy-on-write —
    asserted in-line), and the oracle recomputes the expected final table
    straight from the fixture with FULL-OUTER MERGE semantics, so the
    gate proves pruning loses no matched row and the commit swaps exactly
    the right data."""
    import shutil
    import tempfile

    from etl_data_processor_spark import tableformat as TF

    c = _cat(spark, sf_dir).customer.select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    m = c.agg(F.max("c_custkey")).collect()[0][0]  # one scalar
    cut = m // 3
    t = tempfile.mkdtemp(prefix="tf_merge_")
    for lo, hi in ((0, cut), (cut, 2 * cut), (2 * cut, m)):
        TF.append(
            c.filter(
                (F.col("c_custkey") > lo) & (F.col("c_custkey") <= hi)
            ),
            t,
            stats_cols=["c_custkey"],
        )
    first = c.filter(F.col("c_custkey") <= cut)
    updates = first.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.concat(F.lit("MRG#"), F.col("c_custkey").cast("string")).alias(
            "c_name"
        ),
        "c_nationkey",
        (F.col("c_acctbal") + F.lit(1000.0)).alias("c_acctbal"),
        F.lit("MRG_UPD").alias("c_mktsegment"),
        F.when(F.col("c_custkey") % 31 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    inserts = first.filter(F.col("c_custkey") % 13 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEWM#"), F.col("c_custkey").cast("string")).alias(
            "c_name"
        ),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("MRG_NEW").alias("c_mktsegment"),
        F.lit("I").alias("op"),
    )
    _, rewritten, total = TF.merge(
        spark, t, updates.unionByName(inserts), key="c_custkey",
        stats_cols=["c_custkey"],
    )
    # the observable pruning contract: one of three groups copy-on-written
    assert (rewritten, total) == (1, 3), (rewritten, total)
    result = (
        TF.read(spark, t)
        .select(
            "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
        )
        # materialize BEFORE deleting the throwaway table dir
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(t, ignore_errors=True)
    return result


# =====================================================================
# Multi-source BFS reachability
# =====================================================================

def _bfs_oracle(hops: int = 3) -> str:
    """Unrolled Bellman-Ford relaxation: d_k(n) = min over (≤k)-edge walks
    from any seed — after k rounds exactly the BFS hop distance capped at
    k. Node-bounded intermediates (MIN per node each level), so the
    oracle stays small even on dense graphs."""
    sql = """
    WITH pairs AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    edges AS (SELECT c*2 AS src, s*2+1 AS dst FROM pairs
              UNION ALL SELECT s*2+1 AS src, c*2 AS dst FROM pairs),
    d0 AS (SELECT DISTINCT c*2 AS node, 0 AS dist FROM pairs WHERE c % 97 = 0)"""
    for k in range(1, hops + 1):
        sql += f""",
    d{k} AS (SELECT node, MIN(dist) AS dist FROM (
               SELECT node, dist FROM d{k - 1}
               UNION ALL
               SELECT e.dst AS node, d.dist + 1 AS dist
               FROM d{k - 1} d JOIN edges e ON e.src = d.node
             ) GROUP BY node)"""
    sql += f"""
    SELECT node, dist FROM d{hops}"""
    return sql


@q("q_graph_bfs", _bfs_oracle())
def q_graph_bfs(spark, sf_dir):
    """B49 ext: multi-source BFS over the symmetrized customer–supplier
    trade graph (ops/graph.py::bfs_hops) — reachability / blast-radius:
    min hop distance (≤3) from the seed customers (custkey%97==0) to
    every reachable node. Frontier-only expansion (each round joins just
    the newly discovered nodes against the src-partitioned cached edge
    list), early-stop on an empty frontier; the oracle unrolls the
    equivalent Bellman-Ford recurrence with node-bounded levels."""
    from etl_data_processor_spark.ops.graph import bfs_hops

    cat = _cat(spark, sf_dir)
    pairs = (
        cat.lineitem.join(
            cat.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    cnode = (F.col("c") * 2).alias("src")
    snode = (F.col("s") * 2 + 1).alias("dst")
    edges = pairs.select(cnode, snode).unionAll(
        pairs.select(
            (F.col("s") * 2 + 1).alias("src"), (F.col("c") * 2).alias("dst")
        )
    )
    seeds = (
        pairs.filter(F.col("c") % 97 == 0)
        .select((F.col("c") * 2).alias("node"))
        .distinct()
    )
    return bfs_hops(edges, seeds, max_hops=3)


# =====================================================================
# Bloom-filter-pruned join
# =====================================================================

@q(
    "q_join_bloom",
    f"""
    SELECT p_partkey, COUNT(*) AS n,
           CAST(SUM({_CENTS_SQL.format(c="l_extendedprice")}) AS BIGINT)
               AS revenue_cents
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#23'
    GROUP BY p_partkey
    """,
)
def q_join_bloom(spark, sf_dir):
    """Bloom-pruned fact-to-dim join (ops/bloom.py): the filtered part
    dim's keys build a PORTABLE bloom filter (distributed bit_or fold,
    driver collects only m/64 words); lineitem is pruned by the k-bit
    membership test INSIDE its scan stage before joining. No false
    negatives ⇒ the result is bit-equal to the plain join the oracle
    runs; the false-positive survivors die in the exact join. At 100 TB
    this is the semi-join reduction that turns a full-fact shuffle into
    a matching-rows shuffle."""
    from etl_data_processor_spark.ops.bloom import bloom_pruned_join

    cat = _cat(spark, sf_dir)
    dim = cat.part.filter(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    joined = bloom_pruned_join(
        cat.lineitem.select("l_partkey", "l_extendedprice"),
        dim,
        fact_key="l_partkey",
        dim_key="p_partkey",
    )
    return joined.groupBy("p_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_cents("l_extendedprice")).alias("revenue_cents"),
    )


# =====================================================================
# Rolling correlation in exact integer moments
# =====================================================================

@q(
    "q_win_rolling_corr",
    f"""
    WITH m AS (
        SELECT l_suppkey, l_orderkey, l_linenumber,
               COUNT(*) OVER w AS n,
               SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
               SUM(x*x) OVER w AS sxx, SUM(y*y) OVER w AS syy,
               SUM(x*y) OVER w AS sxy
        FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
                     CAST(l_quantity AS BIGINT) AS x,
                     {_CENTS_SQL.format(c="l_extendedprice")} AS y
              FROM lineitem)
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT l_suppkey, l_orderkey, l_linenumber,
           {_ROUND6.format(
               x="CAST(n*sxy - sx*sy AS DOUBLE) "
                 "/ SQRT(CAST(n*sxx - sx*sx AS DOUBLE)) "
                 "/ SQRT(CAST(n*syy - sy*sy AS DOUBLE))"
           )} AS corr6
    FROM m
    WHERE n = 7 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
    """,
)
def q_win_rolling_corr(spark, sf_dir):
    """Rolling 7-row Pearson correlation (quantity vs price) per supplier
    — the exact-integer-moment technique (see q_trend_ols) on a SLIDING
    window frame: all five moments accumulate as BIGINTs inside one
    window pass (single shuffle on the partition key), and the only
    floating-point ops are the final casts/sqrt/divides, an identical
    IEEE sequence on both engines (6-decimal stable rounding as
    belt-and-braces). Degenerate frames (zero variance / short head) are
    filtered by exact integer predicates."""
    li = _cat(spark, sf_dir).lineitem.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.col("l_quantity").cast("long").alias("x"),
        _cents("l_extendedprice").alias("y"),
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-6, 0)
    )
    x, y = F.col("x"), F.col("y")
    m = li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(x).over(w).alias("sx"),
        F.sum(y).over(w).alias("sy"),
        F.sum(x * x).over(w).alias("sxx"),
        F.sum(y * y).over(w).alias("syy"),
        F.sum(x * y).over(w).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    corr = (
        (n * sxy - sx * sy).cast("double")
        / F.sqrt(dx.cast("double"))
        / F.sqrt(dy.cast("double"))
    )
    return (
        m.filter((n == 7) & (dx > 0) & (dy > 0))
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            stable_round6(corr).alias("corr6"),
        )
    )


# =====================================================================
# Merge-on-read deletes through the table format
# =====================================================================

@q(
    "q_tableformat_mor",
    f"""
    WITH base AS (
        SELECT o_orderkey, o_orderpriority,
               {_CENTS_SQL.format(c="o_totalprice")} AS cents
        FROM orders WHERE o_orderkey % 3 IN (0, 1)
    ),
    kept AS (SELECT * FROM base WHERE o_orderkey % 5 <> 0),
    reinserted AS (
        SELECT o_orderkey, o_orderpriority,
               {_CENTS_SQL.format(c="o_totalprice")} AS cents
        FROM orders WHERE o_orderkey % 15 = 0
    )
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM (SELECT * FROM kept UNION ALL SELECT * FROM reinserted)
    GROUP BY 1
    """,
)
def q_tableformat_mor(spark, sf_dir):
    """MERGE-ON-READ delete lifecycle (tableformat.py::delete_where),
    oracle-gated: append two order slices (%3==0, %3==1), MOR-delete
    every %5 key (a delete-key file commits — NO data group is rewritten,
    asserted in-line), then re-append the %15 keys (a subset of the
    deleted ones). The sequence rule must bring exactly the re-appended
    rows back while the rest of the deleted keys stay dead; the oracle
    recomputes that final state straight from the fixture. Gate also
    proves the delete applied at read time (not write time): head read
    after compaction-free history."""
    import shutil
    import tempfile

    from etl_data_processor_spark import tableformat as TF

    o = _cat(spark, sf_dir).orders.select(
        "o_orderkey", "o_orderpriority", _cents("o_totalprice").alias("cents")
    )
    t = tempfile.mkdtemp(prefix="tf_mor_")
    TF.append(o.filter(F.col("o_orderkey") % 3 == 0), t)
    TF.append(o.filter(F.col("o_orderkey") % 3 == 1), t)
    data_before = {
        a["group"]
        for a in TF._live_adds(t)
        if a.get("kind", "data") == "data"
    }
    _, n_del = TF.delete_where(
        spark, t, "o_orderkey", F.col("o_orderkey") % 5 == 0
    )
    data_after = {
        a["group"]
        for a in TF._live_adds(t)
        if a.get("kind", "data") == "data"
    }
    # the merge-on-read contract: deletes rewrite NO data group
    assert data_after == data_before and n_del > 0
    TF.append(o.filter(F.col("o_orderkey") % 15 == 0), t)
    result = (
        TF.read(spark, t)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(t, ignore_errors=True)
    return result
