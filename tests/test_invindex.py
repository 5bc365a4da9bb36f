"""Incremental inverted-index shards (ops.invindex; VERDICT r6 item 4).

Contract, same bar as the r5/r6 PQ/pHash proofs: append-only corpus
growth rebuilds the index via the delta path — ONLY the doc blocks the
appended doc_ids touch are re-derived (from DECODED ancestor shards plus
the new files; the old corpus is never re-scanned) — and the result is
bit-identical to a from-scratch build over the full corpus.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time


from etl_data_processor_spark.ops import dedup as D
from etl_data_processor_spark.ops import invindex as IX

BLOCK = 8  # small block so one append both touches an old block and adds one


def _docs(spark, lo, hi):
    """Deterministic little corpus: repeated words so tf > 1 occurs."""
    return spark.range(lo, hi).selectExpr(
        "id AS doc_id",
        "concat('w', CAST(pmod(id, 5) AS STRING), ' ', "
        "'w', CAST(pmod(id, 3) AS STRING), ' ', "
        "'w', CAST(pmod(id, 5) AS STRING), ' common') AS text",
    )


def _appendable(spark, tmp_path, name):
    corpus = tmp_path / name

    def add(df, fname):
        stage = str(tmp_path / f"stage-{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        os.makedirs(corpus, exist_ok=True)
        shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], str(corpus / fname))

    return str(corpus), add


def _rows(df):
    return sorted(
        (r["token"], r["block"], r["df"], r["cf"],
         tuple(r["doc_gaps"]), tuple(r["tfs"]))
        for r in df.collect()
    )


def test_decode_inverts_postings(spark):
    docs = _docs(spark, 0, 30)
    tf_direct = sorted(
        map(tuple, IX._tf_rows(docs, BLOCK).collect())
    )
    tf_decoded = sorted(
        map(tuple, IX.decode_postings(IX.postings(docs, BLOCK), BLOCK).collect())
    )
    assert tf_decoded == tf_direct and len(tf_direct) > 0


def test_delta_merge_math_rebuilds_only_touched_blocks(spark):
    """The rebuild identity the delta path relies on: untouched ancestor
    shards pass through; touched blocks re-assemble from decoded ancestor
    rows + new-doc tf rows; the union equals from-scratch postings."""
    old = _docs(spark, 0, 12)   # blocks 0 (full) and 1 (docs 8..11)
    new = _docs(spark, 12, 20)  # touches block 1 (12..15), adds block 2
    anc = IX.postings(old, BLOCK)
    touched = IX._tf_rows(new, BLOCK).select("block").distinct()
    untouched = anc.join(touched, "block", "left_anti")
    assert sorted(r["block"] for r in touched.distinct().collect()) == [1, 2]
    assert set(r["block"] for r in untouched.select("block").distinct().collect()) == {0}
    rebuilt = IX.assemble_postings(
        IX.decode_postings(anc.join(touched, "block"), BLOCK).unionByName(
            IX._tf_rows(new, BLOCK).select("token", "block", "doc_id", "tf")
        ),
        BLOCK,
    )
    merged = untouched.select(
        "token", "block", "df", "cf", "doc_gaps", "tfs"
    ).unionByName(rebuilt)
    assert _rows(merged) == _rows(IX.postings(_docs(spark, 0, 20), BLOCK))


def test_incremental_index_shards_append_only(spark, tmp_path):
    """End-to-end through cached_df's family/delta_merge path: the second
    build publishes an INCREMENTAL artifact (manifest records its
    ancestor — the discriminator that the full builder did NOT run) and
    is bit-identical to a from-scratch build of the grown corpus."""
    import hashlib

    corpus, add = _appendable(spark, tmp_path, "docs.parquet")

    def slug_for():
        sig = D.source_signature(corpus)
        key = ("invindex", corpus, BLOCK, sig)
        return hashlib.md5(
            repr((D._ARTIFACT_VERSION, *key)).encode()
        ).hexdigest()[:16]

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    adir = os.path.join(warehouse, "_artifacts")
    slugs = []
    try:
        add(_docs(spark, 0, 12), "f1.parquet")
        slugs.append(slug_for())
        first = IX.inverted_index_shards(spark, corpus, BLOCK)
        assert first.count() > 0

        time.sleep(0.01)
        add(_docs(spark, 12, 20), "f2.parquet")
        slugs.append(slug_for())
        assert slugs[0] != slugs[1]
        D._DF_CACHE.clear()
        inc = IX.inverted_index_shards(spark, corpus, BLOCK)

        meta = json.load(open(os.path.join(adir, slugs[1], "_KEY.json")))
        assert meta.get("incremental_from") == slugs[0]  # delta path ran

        scratch = IX.postings(
            spark.read.parquet(corpus).select("doc_id", "text"), BLOCK
        )
        assert _rows(inc) == _rows(scratch)
        # every doc made it: decode covers the full corpus
        n = IX.decode_postings(inc, BLOCK).select("doc_id").distinct().count()
        assert n == 20
    finally:
        spark.catalog.clearCache()
        D._DF_CACHE.clear()
        for s in slugs:
            shutil.rmtree(os.path.join(adir, s), ignore_errors=True)
