"""Doc-block-sharded inverted index: build, decode, and INCREMENTAL
maintenance (VERDICT r6 item 4 / "What's missing" #2).

The index layout is q_inverted_index's (queries_r6b.py): per (token,
doc-block) a Lucene-shaped posting shard — doc-GAP list (first gap
relative to the block base) plus the aligned term-frequency list. Block
sharding is the load-bearing scale decision (a global per-token posting
list is unbounded at 100 TB — stop words would collect the whole corpus
into one array), and it is ALSO what makes the index incrementally
maintainable: a corpus append touches only the blocks its new doc_ids
fall into, so the nightly rebuild is

    ancestor shards for untouched blocks   (read back, zero recompute)
  + re-derived shards for touched blocks   (decoded ancestor rows for
                                            those blocks + the new docs)

— never a corpus re-scan. The shards are a LOSSLESS encoding (gaps+tfs
reconstruct every (doc_id, tf)), so touched blocks rebuild without
re-reading any old corpus file; appends that only ADD blocks reduce to a
pure union. Wired through ops.dedup.cached_df's ``family``/``delta_merge``
path: same atomic publish, vacuum-sparing ancestor chain, and
params-equality safety as the LSH/PQ/pHash artifacts. Proven
bit-identical to a from-scratch build in tests/test_invindex.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOCK = 128


def _tf_rows(docs: DataFrame, block: int) -> DataFrame:
    """(doc_id, text) -> per-(token, block, doc) term frequencies."""
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy(
            "token",
            (F.col("doc_id") / block).cast("long").alias("block"),
            "doc_id",
        )
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def assemble_postings(tf: DataFrame, block: int = BLOCK) -> DataFrame:
    """(token, block, doc_id, tf) -> gap-encoded shards
    (token, block, df, cf, doc_gaps, tfs)."""
    pl = tf.groupBy("token", "block").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.array_sort(F.collect_list(F.struct("doc_id", "tf"))).alias("pl"),
    )
    ids = F.col("pl").getField("doc_id")
    base = F.col("block") * F.lit(block)
    gaps = F.transform(
        F.sequence(F.lit(1), F.size("pl")),
        lambda i: F.element_at(ids, i)
        - F.when(i == 1, base).otherwise(F.element_at(ids, i - 1)),
    )
    tfs = F.transform(F.col("pl").getField("tf"), lambda t: t.cast("int"))
    return pl.select(
        "token", "block", "df", "cf",
        gaps.alias("doc_gaps"), tfs.alias("tfs"),
    )


def postings(docs: DataFrame, block: int = BLOCK) -> DataFrame:
    """The q_inverted_index derivation from a (doc_id, text) frame. One
    tokenize pass, two hash shuffles ((token, block, doc) tf then
    (token, block) assembly), array work in codegen."""
    return assemble_postings(_tf_rows(docs, block), block)


def decode_postings(shards: DataFrame, block: int = BLOCK) -> DataFrame:
    """Invert :func:`postings` — (token, block, doc_id, tf) rows from the
    gap-encoded shards. doc_id[i] = block*B + sum(gaps[1..i]); the prefix
    sum is an in-codegen fold per entry (shards hold <= B entries, so the
    quadratic-in-B scan is bounded by the block size, never the corpus)."""
    n = F.size("doc_gaps")
    entries = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.struct(
            (
                F.col("block") * F.lit(block)
                + F.aggregate(
                    F.slice("doc_gaps", F.lit(1), i),
                    F.lit(0).cast("long"),
                    lambda a, g: a + g,
                )
            ).alias("doc_id"),
            F.element_at("tfs", i).cast("long").alias("tf"),
        ),
    )
    return shards.select(
        "token", "block", F.explode(entries).alias("e")
    ).select("token", "block", F.col("e.doc_id"), F.col("e.tf"))


def inverted_index_shards(
    spark, docs_path: str, block: int = BLOCK
) -> DataFrame:
    """The PERSISTED, incrementally-maintained index artifact over the
    parquet corpus at ``docs_path``. First build derives the full corpus;
    after an append-only source change, the rebuild reads the ancestor,
    re-derives ONLY the blocks the appended doc_ids touch (decoded
    ancestor rows for those blocks + the new files — the old corpus is
    never re-read), and unions the untouched ancestor shards through.
    Bit-identical to a from-scratch build (tests/test_invindex.py)."""
    from etl_data_processor_spark.ops.dedup import cached_df, source_signature

    sig = source_signature(docs_path)

    def builder():
        return postings(
            spark.read.parquet(docs_path).select("doc_id", "text"), block
        )

    def delta_merge(ancestor: DataFrame, new_files: list) -> DataFrame:
        delta_tf = _tf_rows(
            spark.read.parquet(*new_files).select("doc_id", "text"), block
        )
        touched = delta_tf.select("block").distinct()
        untouched = ancestor.join(F.broadcast(touched), "block", "left_anti")
        old_rows = decode_postings(
            ancestor.join(F.broadcast(touched), "block"), block
        )
        rebuilt = assemble_postings(
            old_rows.unionByName(delta_tf.select("token", "block", "doc_id", "tf")),
            block,
        )
        return untouched.select(
            "token", "block", "df", "cf", "doc_gaps", "tfs"
        ).unionByName(rebuilt)

    return cached_df(
        spark,
        ("invindex", docs_path, block, sig),
        builder,
        materialize=True,
        sources=(docs_path,),
        family=f"{docs_path}:invindex",
        delta_merge=delta_merge,
    )
