"""Round-4 operator semantics: KMV sketch accuracy, record-linkage recall,
CIDR join exactness vs the naive theta join."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


def test_kmv_estimate_accuracy_on_large_overlap(spark):
    """KMV k=64 intersection estimate within 30% of truth on sets big
    enough (10k / 8k, 6k overlap) that the sketch genuinely estimates
    (both sides > k distinct)."""
    from etl_data_processor_spark.ops.sampling import hash32

    k = 64
    # A = [0, 10000), B = [4000, 12000) -> |A∩B| = 6000
    a = spark.range(0, 10_000).select(F.lit("a").alias("t"), F.col("id"))
    b = spark.range(4_000, 12_000).select(F.lit("b").alias("t"), F.col("id"))
    d = a.unionByName(b).select("t", hash32(F.col("id")).alias("h")).distinct()
    w = Window.partitionBy("t").orderBy("h")
    sk = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    per = {r["t"]: r for r in sk.groupBy("t").agg(F.max("h").alias("kth")).collect()}
    theta = min(per["a"]["kth"], per["b"]["kth"])
    ha = {r["h"] for r in sk.filter("t = 'a'").collect()}
    hb = {r["h"] for r in sk.filter("t = 'b'").collect()}
    common = len({h for h in ha & hb if h < theta})
    est = common * 4294967296.0 / theta
    assert abs(est - 6000) / 6000 < 0.30, est


def test_record_linkage_finds_every_true_pair(spark, sf_dir):
    """Every clean record must link to its own dirty twin (d_id =
    c_custkey + 10^7): the blocking + levenshtein prefilter + JW/balance
    scoring must not lose a single true match (recall = 1.0 by
    construction of the perturbation)."""
    out = QUERIES["q_record_linkage"](spark, sf_dir)
    rows = out.collect()
    got = {(r["c_custkey"], r["d_id"]) for r in rows}
    import duckdb
    n = duckdb.sql(f"SELECT COUNT(*) FROM '{sf_dir}/customer.parquet'").fetchone()[0]
    missing = [
        ck for ck in range(n) if (ck, ck + 10_000_000) not in got
    ]
    assert not missing, f"{len(missing)} true pairs lost, e.g. {missing[:5]}"


def test_record_linkage_repartition_is_width_guarded(spark, sf_dir):
    """VERDICT r4 item 3: the probe-side widening must go through the
    width-guarded `_parallelize` probe, not an unconditional repartition.
    With a narrow (single-small-file) probe the exchange exists — the
    test-scale speedup is retained; when the scan is already estimated
    wide (simulated by shrinking maxPartitionBytes so the width probe
    sees >= defaultParallelism splits) the plan must carry NO
    RoundRobinPartitioning — at 100 TB the corpus never gets a pointless
    full shuffle."""
    import re

    from tests.test_plans import plan_of

    spark.catalog.clearCache()
    narrow_plan = plan_of(QUERIES["q_record_linkage"](spark, sf_dir))
    assert "RoundRobinPartitioning" in narrow_plan

    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "128b")  # sf0.001 customer ~7 KB -> ~54 est. splits
        wide_plan = plan_of(QUERIES["q_record_linkage"](spark, sf_dir))
    finally:
        spark.conf.set(key, old)
    assert "RoundRobinPartitioning" not in wide_plan


def test_cidr_join_equals_naive_theta_join(spark, sf_dir):
    """The /16 grid-cell equi-join + verify must return EXACTLY the naive
    BETWEEN theta-join's matches (grid cover is sound and complete)."""
    from etl_data_processor_spark.registry import cat

    c = cat(spark, sf_dir)
    base = 167772160
    ips = c.events.select(
        "event_id",
        (F.lit(base) + (F.col("event_id") * 2654435761) % 3276800).alias("ip"),
    )
    nk = F.col("n_nationkey").cast("long")
    cidr = c.nation.select(
        "n_name",
        (F.lit(base) + nk * 131072).alias("lo"),
        (
            F.lit(base) + nk * 131072
            + F.when(nk % 3 == 0, 131071).when(nk % 3 == 1, 65535).otherwise(32767)
        ).alias("hi"),
    )
    naive = (
        ips.crossJoin(F.broadcast(cidr))
        .filter(F.col("ip").between(F.col("lo"), F.col("hi")))
        .groupBy("n_name")
        .count()
    )
    got = {
        (r["n_name"], r["n_hits"])
        for r in QUERIES["q_ip_cidr_join"](spark, sf_dir).collect()
    }
    exp = {(r["n_name"], r["count"]) for r in naive.collect()}
    assert got == exp


def test_cached_df_materializes_and_rereads_artifact(spark, tmp_path):
    """materialize=True writes the artifact to parquet ONCE and later
    accesses (even from a cleared in-process memo, i.e. a 'new session')
    read the file back instead of re-running the builder."""
    import os

    from etl_data_processor_spark.ops import dedup as D

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(0, 100).selectExpr("id", "id * 2 AS v")

    key = ("test", "artifact", str(tmp_path))
    df1 = D.cached_df(spark, key, build, materialize=True)
    assert df1.count() == 100 and calls["n"] == 1
    # wipe the in-process memo — simulates a fresh session against the
    # same warehouse; the builder must NOT run again
    D._DF_CACHE.clear()
    df2 = D.cached_df(spark, key, build, materialize=True)
    assert df2.count() == 100 and calls["n"] == 1
    # the artifact is a real parquet dir under the warehouse
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    arts = os.path.join(warehouse, "_artifacts")
    assert os.path.isdir(arts) and any(os.scandir(arts))
    D._DF_CACHE.clear()


def test_phash_finds_planted_image_groups(spark, sf_dir):
    """Every planted near-dup image group (ids sharing doc_id//4) must
    produce at least one within-group pair, and within-group hamming must
    be far below cross-group hamming on average."""
    out = QUERIES["q_image_phash_dedup"](spark, sf_dir).collect()
    within = [r for r in out if r["id_a"] // 4 == r["id_b"] // 4]
    cross = [r for r in out if r["id_a"] // 4 != r["id_b"] // 4]
    groups_hit = {r["id_a"] // 4 for r in within}
    assert len(groups_hit) >= 25, f"only {len(groups_hit)}/30 groups found"
    if within and cross:
        avg_w = sum(r["hamming"] for r in within) / len(within)
        avg_c = sum(r["hamming"] for r in cross) / len(cross)
        assert avg_w < avg_c

def test_ndcg_in_unit_range_and_degrades(spark, sf_dir):
    """nDCG@10 of int4 retrieval: in (0, 1], and strictly below 1 for at
    least one query on this fixture (the metric detects quantization
    loss; int8 was measured lossless here, int4 is not)."""
    rows = QUERIES["q_eval_ndcg"](spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0.0 < r["ndcg4"] <= 1.0
    assert any(r["ndcg4"] < 1.0 for r in rows)


def test_source_signature_invalidates_on_fixture_change(spark, tmp_path):
    """A materialized artifact keyed with source_signature must REBUILD
    when the source file's content changes at the same path (regenerated
    fixture), instead of serving the stale on-disk index."""
    import os
    import time as _time

    from etl_data_processor_spark.ops import dedup as D

    src = tmp_path / "corpus.parquet"
    spark.range(0, 10).write.mode("overwrite").parquet(str(src))
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.read.parquet(str(src))

    k1 = ("t", "sig-art", D.source_signature(str(src)))
    D.cached_df(spark, k1, build, materialize=True).count()
    assert calls["n"] == 1
    # regenerate the fixture at the SAME path with different content
    _time.sleep(0.01)  # ensure mtime moves even on coarse filesystems
    spark.range(0, 25).write.mode("overwrite").parquet(str(src))
    k2 = ("t", "sig-art", D.source_signature(str(src)))
    assert k2 != k1  # the signature moved, so the artifact key moved
    df = D.cached_df(spark, k2, build, materialize=True)
    assert calls["n"] == 2 and df.count() == 25
    D._DF_CACHE.clear()
