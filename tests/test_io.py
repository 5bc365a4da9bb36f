"""Source/sink coverage (B1): CSV + JSON roundtrips, permissive parsing,
and bucketed tables for co-located (shuffle-free) joins."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from etl_data_processor_spark.io import Catalog, read_csv, read_json, write_csv, write_parquet


def test_json_roundtrip(spark, sf_dir, tmp_path):
    docs = Catalog(spark, sf_dir).documents
    path = str(tmp_path / "docs_json")
    docs.write.json(path)
    back = read_json(spark, path, schema=docs.schema)
    assert back.count() == docs.count()
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in docs.select("doc_id").collect()
    }


def test_csv_permissive_malformed_rows(spark, tmp_path):
    """A3/A17 semantics: malformed records are skipped/nulled, never fatal
    (the reference's per-record try/except, main.py:98-103)."""
    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,x\nnot_an_int,y\n3,z\n")
    df = read_csv(
        spark, str(p), schema="a int, b string", mode="PERMISSIVE"
    )
    rows = {(r.a, r.b) for r in df.collect()}
    assert (1, "x") in rows and (3, "z") in rows
    assert (None, "y") in rows  # malformed int -> null, row kept


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both join sides on the key pre-co-locates them: the join
    plans with NO Exchange — at 100 TB this removes the dominant cost of
    repeated fact-fact joins on a stable key."""
    import shutil

    cat = Catalog(spark, sf_dir)
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    cat.orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(
        "b_orders"
    )
    cat.lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(
        "b_lineitem"
    )
    # disable broadcast so the join exercises the bucketed sort-merge path
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).select("l_orderkey", "o_totalprice", "l_quantity")
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        # co-located buckets: a SortMergeJoin with NO shuffle exchange
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_paged_source_partition_planning(spark):
    """A2: the page plan — ceil(total/25) input partitions, parallel fetch."""
    from etl_data_processor_spark.sources.paged import PagedDecisionSource, _PagedReader

    try:
        spark.dataSource.register(PagedDecisionSource)
    except Exception:
        pass
    reader = _PagedReader({"total_rows": "228"})
    assert len(reader.partitions()) == 10  # ceil(228/25)
    df = spark.read.format("paged_decisions").option("total_rows", 228).load()
    assert df.count() == 228
    assert df.rdd.getNumPartitions() == 10
    # A12 downstream: approved-only filter matches the reference's subset
    approved = df.filter(
        F.col("status").isin("Anbefalet", "Delvist anbefalet")
    ).count()
    assert approved == 152  # 228 * 2/3


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-style partitionBy layout + a partition-key filter must prune at
    plan time: the scan's PartitionFilters carries the predicate and only
    the matching directory is read. At 100 TB this is the difference between
    scanning one day and scanning ten years."""
    cat = Catalog(spark, sf_dir)
    out = str(tmp_path / "events_by_type")
    cat.events.write.partitionBy("event_type").parquet(out)

    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    pf = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "event_type" in pf
    # pruned scan reads exactly the one partition's rows
    expected = cat.events.filter(F.col("event_type") == "click").count()
    assert df.count() == expected


def test_partitioned_split_write_layout(spark, sf_dir, tmp_path):
    """train_test_split + partitionBy('split') produces the layout downstream
    training readers partition-prune on (the B41 write path)."""
    import os

    from etl_data_processor_spark.ops.sampling import train_test_split

    cat = Catalog(spark, sf_dir)
    out = str(tmp_path / "docs_split")
    train_test_split(cat.documents, "doc_id", {"train": 0.9, "test": 0.1}).write.partitionBy(
        "split"
    ).parquet(out)
    dirs = {d for d in os.listdir(out) if d.startswith("split=")}
    assert dirs == {"split=train", "split=test"}
    back = spark.read.parquet(out)
    assert back.count() == cat.documents.count()


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    """B1 extension: Spark 4 native XML source/sink roundtrip — schema and
    values survive; the reader infers types back from element text."""
    from etl_data_processor_spark.io import Catalog

    p = str(tmp_path / "events_xml")
    ev = Catalog(spark, sf_dir).events.select(
        "event_id", "event_type", "value"
    ).limit(50)
    ev.write.mode("overwrite").option("rowTag", "event").format("xml").save(p)
    back = (
        spark.read.format("xml")
        .option("rowTag", "event")
        .load(p)
        .select("event_id", "event_type", "value")
    )
    want = {(r.event_id, r.event_type, round(r.value, 6)) for r in ev.collect()}
    got = {(r.event_id, r.event_type, round(r.value, 6)) for r in back.collect()}
    assert got == want


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    # ORC is the second columnar format Spark ships natively; the engine's
    # scan guarantees (schema fidelity, predicate pushdown to the reader)
    # must hold there too.
    orders = Catalog(spark, sf_dir).orders
    p = str(tmp_path / "orders_orc")
    orders.write.orc(p)
    back = spark.read.orc(p)
    assert back.schema == orders.schema
    assert back.count() == orders.count()

    filtered = back.filter(F.col("o_totalprice") > 300000.0).select(
        "o_orderkey", "o_totalprice"
    )
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,300000.0)" in plan
    expected = orders.filter(F.col("o_totalprice") > 300000.0).count()
    assert filtered.count() == expected


def test_write_clustered_tightens_rowgroup_stats(spark, sf_dir, tmp_path):
    """write_clustered: range-partition + in-file sort must produce
    near-disjoint per-file ts ranges (the property parquet min/max skipping
    feeds on), where a hash-repartitioned write leaves every file spanning
    ~the full range (no skipping possible)."""
    import glob

    import pyarrow.parquet as pq

    from etl_data_processor_spark.io import write_clustered

    ev = Catalog(spark, sf_dir).events.select("event_id", "ts", "value")

    clustered = str(tmp_path / "clustered")
    write_clustered(ev, clustered, by=["ts"], n_files=8)
    scattered = str(tmp_path / "scattered")
    ev.repartition(8).write.mode("overwrite").parquet(scattered)

    def file_ranges(d):
        out = []
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            col_idx = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == "ts"
            )
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append((min(mins), max(maxs)))
        return sorted(out)

    def overlap_fraction(ranges):
        # fraction of file pairs whose ts ranges intersect
        hits = total = 0
        for i in range(len(ranges)):
            for j in range(i + 1, len(ranges)):
                total += 1
                if ranges[i][1] >= ranges[j][0] and ranges[j][1] >= ranges[i][0]:
                    hits += 1
        return hits / max(total, 1)

    cl = file_ranges(clustered)
    sc = file_ranges(scattered)
    assert len(cl) >= 4 and len(sc) >= 4
    # clustered: ranges are near-disjoint (boundary touch allowed)
    assert overlap_fraction(cl) <= 0.25
    # hash-scattered: essentially every file spans every other file's range
    assert overlap_fraction(sc) >= 0.9
    # and the data survives the layout change
    assert (
        spark.read.parquet(clustered).count() == ev.count()
    )


def test_ntz_normalization_is_session_tz_independent(spark):
    """ADVICE r1 (medium): normalize_ntz must interpret NTZ wall time as UTC
    under ANY session timezone. The previous to_utc_timestamp(col, 'UTC')
    form shifted NTZ 12:00 to 20:00 UTC under an America/Los_Angeles
    session (the implicit NTZ→LTZ cast applies the session offset first);
    from_utc_timestamp(col, current_timezone()) cancels that shift exactly."""
    from etl_data_processor_spark.io import normalize_ntz

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/Los_Angeles", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = spark.sql(
                "SELECT TIMESTAMP_NTZ '2024-06-01 12:00:00' AS ts"
            )
            out = normalize_ntz(df)
            assert not any(
                t.dataType.typeName().startswith("timestamp_ntz")
                for t in out.schema.fields
            )
            micros = out.select(F.unix_micros("ts").alias("us")).collect()[0].us
            # 2024-06-01T12:00:00Z epoch micros, regardless of session tz
            assert micros == 1717243200000000, (tz, micros)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_write_zordered_gives_both_keys_locality(spark, tmp_path):
    """write_zordered: per-file (x, y) bounding boxes must be small in BOTH
    dimensions, while write_clustered on x alone leaves y unconstrained —
    the reason a two-key scan pattern needs the space-filling curve. The
    assertion compares normalized bounding-box areas: the z-order layout's
    mean area must be a fraction of the x-clustered layout's."""
    import glob

    from pyspark.sql import functions as F

    from etl_data_processor_spark.io import write_clustered, write_zordered

    n = 1 << 14
    side = 1 << 7  # full (x, y) grid [0,128)^2, x and y INDEPENDENT
    df = spark.range(n).select(
        (F.col("id") % side).alias("x"),
        ((F.col("id") / side).cast("long") % side).alias("y"),
    )
    zpath = str(tmp_path / "zord")
    cpath = str(tmp_path / "clust")
    write_zordered(df, zpath, F.col("x"), F.col("y"), n_files=16)
    write_clustered(df, cpath, ["x"], n_files=16)

    def mean_extents(path):
        xs, ys = [], []
        for f in glob.glob(f"{path}/part-*.parquet"):
            r = (
                spark.read.parquet(f)
                .agg(
                    F.min("x"), F.max("x"), F.min("y"), F.max("y"), F.count("*")
                )
                .collect()[0]
            )
            if r[4] == 0:
                continue
            xs.append((r[1] - r[0] + 1) / side)
            ys.append((r[3] - r[2] + 1) / side)
        assert len(xs) >= 8
        return sum(xs) / len(xs), sum(ys) / len(ys)

    zx, zy = mean_extents(zpath)
    cx, cy = mean_extents(cpath)
    # On uniform data the bounding-box AREA is layout-invariant (1/n_files
    # of the grid either way); what the curve buys is bounded extent in
    # BOTH dims. 16 files over a 2-level Morton split -> ~quarter-range
    # boxes; x-clustering leaves y unconstrained, so a y-only predicate
    # can never skip a file there.
    assert zx <= 0.5 and zy <= 0.5, (zx, zy)
    assert cy >= 0.9, cy  # x-clustered: y range is the whole domain
    assert zy < cy / 2, (zy, cy)
    # the data survives the layout change
    assert spark.read.parquet(zpath).count() == n


def test_overwrite_partitions_is_surgical(spark, sf_dir, tmp_path):
    """Dynamic partition overwrite replaces only the partitions present in
    the incoming frame — the idempotent daily-backfill contract; static
    overwrite would truncate every other partition."""
    from pyspark.sql import functions as F

    from etl_data_processor_spark.io import (
        Catalog,
        overwrite_partitions,
        write_parquet,
    )

    ev = Catalog(spark, sf_dir).events.select(
        "event_id", "user_id", F.to_date("ts").alias("day")
    )
    days = [r["day"] for r in ev.select("day").distinct().orderBy("day").limit(3).collect()]
    base = ev.filter(F.col("day").isin(days))
    path = str(tmp_path / "tbl")
    write_parquet(base, path, partition_by=["day"])
    before_other = (
        spark.read.parquet(path).filter(F.col("day") != days[1]).count()
    )

    # backfill day[1] with a reduced set (every other event)
    patch = base.filter(
        (F.col("day") == days[1]) & (F.col("event_id") % 2 == 0)
    )
    n_patch = patch.count()
    overwrite_partitions(patch, path, ["day"])

    got = spark.read.parquet(path)
    assert got.filter(F.col("day") != days[1]).count() == before_other
    assert got.filter(F.col("day") == days[1]).count() == n_patch
    # idempotent: re-running the same backfill changes nothing
    overwrite_partitions(patch, path, ["day"])
    assert spark.read.parquet(path).count() == before_other + n_patch


def test_read_parquet_evolved_merges_schemas(spark, tmp_path):
    """mergeSchema read surfaces late-added columns as nulls on old files
    instead of dropping them."""
    from pyspark.sql import functions as F

    from etl_data_processor_spark.io import read_parquet_evolved

    path = str(tmp_path / "evolving")
    spark.range(5).select(F.col("id"), F.lit("old").alias("tag")).write.parquet(
        f"{path}/part=1"
    )
    spark.range(5, 8).select(
        F.col("id"),
        F.lit("new").alias("tag"),
        F.lit(1.5).alias("score"),
    ).write.parquet(f"{path}/part=2")

    got = read_parquet_evolved(spark, path)
    assert "score" in got.columns
    assert got.count() == 8
    assert got.filter(F.col("score").isNull()).count() == 5


def test_bucketed_join_plans_zero_exchanges(spark, tmp_path):
    """write_bucketed -> join on the bucket key must plan no Exchange on
    either side (co-partitioned reads), and values must equal the plain
    join."""
    import re

    from pyspark.sql import functions as F

    from etl_data_processor_spark.io import read_bucketed, write_bucketed

    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 11).alias("vb")
    )
    write_bucketed(a, "tb_a", "k", n_buckets=8, sort_col="k")
    write_bucketed(b, "tb_b", "k", n_buckets=8, sort_col="k")
    try:
        ba, bb = read_bucketed(spark, "tb_a"), read_bucketed(spark, "tb_b")
        j = ba.join(bb, "k").groupBy().agg(
            F.sum(F.col("va") * F.col("vb")).alias("s")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the join itself consumes the bucket layout: no shuffle below it
        join_part = plan[plan.index("Join"):]
        assert len(re.findall(r"\bExchange\b", join_part)) == 0, join_part
        expected = (
            a.join(b, "k")
            .groupBy()
            .agg(F.sum(F.col("va") * F.col("vb")).alias("s"))
            .collect()[0]["s"]
        )
        assert j.collect()[0]["s"] == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_a")
        spark.sql("DROP TABLE IF EXISTS tb_b")


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC write/read roundtrip; the range predicate must reach the ORC
    scan as a pushed filter (same pushdown story as parquet)."""
    from pyspark.sql import functions as F

    from etl_data_processor_spark.io import read_orc, write_orc

    path = str(tmp_path / "t_orc")
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("g")
    )
    write_orc(df, path)
    back = read_orc(spark, path)
    assert back.count() == 1000
    filtered = back.filter(F.col("id") >= 900)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "GreaterThanOrEqual(id,900)" in pushed, pushed
    assert filtered.count() == 100
    got = sorted(r["id"] for r in filtered.collect())
    assert got == list(range(900, 1000))
