"""Streaming drift monitor (streaming/drift.py): per-micro-batch PSI
against a frozen reference must be BIT-IDENTICAL to the batch PSI
arithmetic over the same rows, and the alert threshold must fire for a
genuinely shifted batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_processor_spark import tableformat as TF
from etl_data_processor_spark.io import Catalog
from etl_data_processor_spark.streaming.drift import (
    drift_monitor_sink,
    frozen_reference_bins,
    psi_of_counts,
    _bin_counts,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_streaming_psi_matches_batch_per_file(spark, sf_dir, tmp_path):
    docs = Catalog(spark, sf_dir).documents
    ref = frozen_reference_bins(docs.filter(F.col("source") == "src0"))
    assert sum(ref.values()) > 0

    # three disjoint files = three micro-batches with different mixes
    src = str(tmp_path / "incoming")
    cuts = [(0, 150), (150, 300), (300, 10_000_000)]
    for lo, hi in cuts:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "psi")
    q = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(drift_monitor_sink(ref, out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(
        (r["n_docs"], r["psi6"]) for r in TF.read(spark, out).collect()
    )
    assert len(got) == 3

    # batch recompute per file slice must agree bit for bit (compare as
    # multisets: two slices can share a row count)
    want = []
    for lo, hi in cuts:
        sl = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        counts = {r["bin"]: r["c"] for r in _bin_counts(sl).collect()}
        want.append((sum(counts.values()), psi_of_counts(counts, ref)))
    assert got == sorted(want)

    # a degenerate batch (every doc in one bin) must alert
    shifted = {0: 1000}
    assert psi_of_counts(shifted, ref) > 0.25


def test_streaming_jsd_matches_batch_per_file(spark, sf_dir, tmp_path):
    """The JSD monitor's per-micro-batch value must equal jsd_of_counts
    (q_js_divergence's exact arithmetic) on that file slice's unigram
    counts, and a disjoint-vocabulary batch must hit the ln 2 bound."""
    import math

    from etl_data_processor_spark.ops.text import tokenize
    from etl_data_processor_spark.streaming.drift import (
        frozen_reference_unigrams,
        jsd_monitor_sink,
        jsd_of_counts,
    )

    docs = Catalog(spark, sf_dir).documents
    ref_docs = docs.filter(F.col("source") == "src0")
    ref = frozen_reference_unigrams(ref_docs)
    ref_counts = {r["token"]: r["rc"] for r in ref.collect()}
    assert sum(ref_counts.values()) > 0

    src = str(tmp_path / "incoming")
    cuts = [(0, 150), (150, 300), (300, 10_000_000)]
    for lo, hi in cuts:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "jsd")
    q = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(jsd_monitor_sink(ref, out))
        .option("checkpointLocation", str(tmp_path / "ckpt_jsd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(
        (r["n_tokens"], r["jsd6"]) for r in TF.read(spark, out).collect()
    )
    assert len(got) == 3

    want = []
    for lo, hi in cuts:
        sl = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        counts = {
            r["token"]: r["c"]
            for r in sl.select(
                F.explode(tokenize(F.col("text"))).alias("token")
            )
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        want.append((sum(counts.values()), jsd_of_counts(counts, ref_counts)))
    assert got == sorted(want)

    # fully disjoint vocabularies sit at the ln 2 bound and must alert
    disjoint = jsd_of_counts({"zzz_only": 10}, ref_counts)
    assert abs(disjoint - math.floor(math.log(2) * 1e6) / 1e6) < 2e-6
    assert disjoint > 0.5


def test_streaming_ks_matches_batch_per_file(spark, sf_dir, tmp_path):
    """The KS monitor's per-micro-batch statistic must equal
    ks_of_counts (q_ks_drift's exact integer ECDF arithmetic) on that
    file slice's value counts, and a shifted batch must set drifted."""
    from etl_data_processor_spark.streaming.drift import (
        frozen_reference_lengths,
        ks_monitor_sink,
        ks_of_counts,
    )

    docs = Catalog(spark, sf_dir).documents
    ref = frozen_reference_lengths(docs.filter(F.col("source") == "src0"))
    assert sum(ref.values()) > 0

    src = str(tmp_path / "incoming_ks")
    cuts = [(0, 150), (150, 300), (300, 10_000_000)]
    for lo, hi in cuts:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "ks")
    q = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(ks_monitor_sink(ref, out))
        .option("checkpointLocation", str(tmp_path / "ckpt_ks"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(
        (r["n_docs"], r["ks6"], r["drifted"])
        for r in TF.read(spark, out).collect()
    )
    assert len(got) == 3

    want = []
    for lo, hi in cuts:
        sl = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        counts = {
            r["v"]: r["c"]
            for r in sl.groupBy(F.col("n_chars").alias("v"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        ks6, drifted = ks_of_counts(counts, ref)
        want.append((sum(counts.values()), ks6, drifted))
    assert got == sorted(want)

    # a batch shifted far outside the reference support must drift
    shifted = {10_000_000: 500}
    ks6, drifted = ks_of_counts(shifted, ref)
    assert ks6 == 1.0 and drifted


def test_streaming_mwu_matches_batch_per_file(spark, sf_dir, tmp_path):
    """The MWU monitor's per-micro-batch statistic must equal
    mwu_of_counts (q_mannwhitney_u's exact integer U + tie-corrected z)
    on that file slice's value counts, and a location-shifted batch
    must set shifted."""
    from etl_data_processor_spark.streaming.drift import (
        frozen_reference_lengths,
        mwu_monitor_sink,
        mwu_of_counts,
    )

    docs = Catalog(spark, sf_dir).documents
    ref = frozen_reference_lengths(docs.filter(F.col("source") == "src0"))
    assert sum(ref.values()) > 0

    src = str(tmp_path / "incoming_mwu")
    cuts = [(0, 150), (150, 300), (300, 10_000_000)]
    for lo, hi in cuts:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "mwu")
    q = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(mwu_monitor_sink(ref, out))
        .option("checkpointLocation", str(tmp_path / "ckpt_mwu"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(
        (r["n_docs"], r["u2"], r["z6"], r["shifted"])
        for r in TF.read(spark, out).collect()
    )
    assert len(got) == 3

    want = []
    for lo, hi in cuts:
        counts = {
            r["v"]: r["c"]
            for r in docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
            .groupBy(F.col("n_chars").alias("v"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        want.append(mwu_of_counts(counts, ref))
    assert got == sorted(want)

    # a batch shifted far above the reference support must flag
    shifted_counts = {10_000_000 + i: 20 for i in range(10)}
    ns, u2, z6, shifted = mwu_of_counts(shifted_counts, ref)
    assert shifted and z6 > 1.96
    # every shifted value exceeds every reference value -> U2 is maximal
    assert u2 == 2 * ns * sum(ref.values())


def test_mwu_of_counts_bit_identical_to_batch_key(spark, sf_dir):
    """Driver arithmetic == the batch key's plan arithmetic: for every
    non-reference source, mwu_of_counts on the per-source value counts
    reproduces q_mannwhitney_u's (ns, u2, z6, shifted) row exactly."""
    import __spark_entry__ as entry_mod
    from etl_data_processor_spark.streaming.drift import (
        frozen_reference_lengths,
        mwu_of_counts,
    )

    docs = Catalog(spark, sf_dir).documents
    ref = frozen_reference_lengths(docs.filter(F.col("source") == "src0"))
    batch = {
        r["source"]: (r["ns"], r["u2"], r["z6"], r["shifted"])
        for r in entry_mod.queries()["q_mannwhitney_u"](
            spark, sf_dir
        ).collect()
    }
    assert batch
    for source, row in batch.items():
        counts = {
            r["v"]: r["c"]
            for r in docs.filter(F.col("source") == source)
            .groupBy(F.col("n_chars").alias("v"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        assert mwu_of_counts(counts, ref) == row, source
