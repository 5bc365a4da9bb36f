"""Sampling/split operator semantics (ops.sampling): determinism,
disjointness, monotonicity, partitioning-invariance — the properties that
make hash sampling the right tool at 100 TB where randomSplit/sample are
partitioning-dependent."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_processor_spark.io import Catalog
from etl_data_processor_spark.ops import sampling as S


def docs(spark, sf_dir):
    return Catalog(spark, sf_dir).documents


def test_sample_deterministic_and_partition_invariant(spark, sf_dir):
    d = docs(spark, sf_dir)
    a = set(
        r[0]
        for r in S.deterministic_sample(d, "doc_id", 0.3).select("doc_id").collect()
    )
    b = set(
        r[0]
        for r in S.deterministic_sample(d.repartition(13), "doc_id", 0.3)
        .select("doc_id")
        .collect()
    )
    assert a == b and len(a) > 0


def test_sample_monotone_in_fraction(spark, sf_dir):
    d = docs(spark, sf_dir)
    small = set(
        r[0]
        for r in S.deterministic_sample(d, "doc_id", 0.1).select("doc_id").collect()
    )
    big = set(
        r[0]
        for r in S.deterministic_sample(d, "doc_id", 0.4).select("doc_id").collect()
    )
    assert small < big  # strictly grows, never swaps rows


def test_sample_fraction_roughly_honored(spark, sf_dir):
    d = docs(spark, sf_dir)
    n = d.count()
    k = S.deterministic_sample(d, "doc_id", 0.25).count()
    assert abs(k / n - 0.25) < 0.1  # binomial tolerance at fixture sizes


def test_split_partitions_every_row_disjointly(spark, sf_dir):
    d = docs(spark, sf_dir)
    out = S.train_test_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = dict(
        out.groupBy("split").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == d.count()  # total preserved, no overlap
    assert counts["train"] > counts.get("val", 0)


def test_split_different_seed_differs(spark, sf_dir):
    d = docs(spark, sf_dir)
    w = {"train": 0.5, "test": 0.5}
    a = {
        r[0]: r[1]
        for r in S.train_test_split(d, "doc_id", w, seed=0)
        .select("doc_id", "split")
        .collect()
    }
    b = {
        r[0]: r[1]
        for r in S.train_test_split(d, "doc_id", w, seed=7)
        .select("doc_id", "split")
        .collect()
    }
    assert a != b


def test_stratified_fractions_per_stratum(spark, sf_dir):
    d = docs(spark, sf_dir)
    out = S.stratified_sample(
        d, "doc_id", "lang", {"en": 0.6}, default_fraction=0.1
    )
    base = dict(d.groupBy("lang").count().rdd.map(lambda r: (r[0], r[1])).collect())
    got = dict(out.groupBy("lang").count().rdd.map(lambda r: (r[0], r[1])).collect())
    assert abs(got.get("en", 0) / base["en"] - 0.6) < 0.15
    for lang, n in base.items():
        if lang != "en" and n >= 30:
            assert got.get(lang, 0) / n < 0.35


def test_hash32_matches_duckdb_fragment(spark):
    """The Spark mixer and the emitted SQL fragment agree value-for-value
    (the exactness contract behind every oracle in queries_corpus)."""
    import duckdb

    keys = list(range(0, 5000, 7))
    sdf = spark.range(0, 5000, 7).select(
        F.col("id"), S.hash32(F.col("id"), seed=3).alias("h")
    )
    spark_vals = {r[0]: r[1] for r in sdf.collect()}
    duck = duckdb.sql(
        f"SELECT k, {S.hash32_sql('k', seed=3)} AS h FROM (SELECT unnest({keys}) AS k)"
    ).fetchall()
    assert {k: h for k, h in duck} == spark_vals


def test_weighted_sample_model_and_monotonicity(spark, sf_dir):
    from etl_data_processor_spark.io import Catalog
    from etl_data_processor_spark.ops.text import quality_score

    d = Catalog(spark, sf_dir).documents
    scored = d.select("doc_id", quality_score(F.col("text")).alias("quality"))
    rows = {r["doc_id"]: r["quality"] for r in scored.collect()}
    hashes = {
        r["doc_id"]: r["h"]
        for r in scored.select(
            "doc_id", S.hash32(F.col("doc_id")).alias("h")
        ).collect()
    }
    # exact model: accept iff hash < floor(weight * 2^32)
    import math

    expected = {
        k for k, w in rows.items()
        if hashes[k] < math.floor(min(max(w, 0.0), 1.0) * (1 << 32))
    }
    got = {
        r["doc_id"]
        for r in S.weighted_sample(scored, "doc_id", F.col("quality")).collect()
    }
    assert got == expected
    assert 0 < len(got) < len(rows)

    # monotone: boosting every weight only adds rows
    boosted = S.weighted_sample(
        scored, "doc_id", F.col("quality") + F.lit(0.2)
    )
    assert got <= {r["doc_id"] for r in boosted.collect()}
