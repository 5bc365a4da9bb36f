"""Semantic tests for the corpus-prep operators (PII scrub, chunking,
sequence packing) — properties the oracle differential can't state:
reassembly, idempotence, and bin-budget invariants."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_data_processor_spark.io import Catalog
from etl_data_processor_spark.ops import text as T


def test_chunk_reassembly_roundtrip(spark):
    """Dropping each chunk's trailing overlap (keep the first `stride`
    chars) and concatenating in chunk_id order must reconstruct the
    original text exactly — for empty, sub-window, boundary, and long
    inputs."""
    cases = ["", "x", "a" * 399, "b" * 400, "c" * 500, "d" * 501,
             "e" * 900, "f" * 1300, "".join(chr(97 + i % 26) for i in range(2777))]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id int, text string"
    )
    chunks = T.chunk_documents(df, window=500, stride=400).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(cases):
        rows = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        # chunk ids are dense from 0
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        rebuilt = "".join(r["chunk"][:400] for r in rows[:-1]) + rows[-1]["chunk"]
        assert rebuilt == t, f"case {i} len {len(t)}"
        # every chunk except the last is a full window when text is long
        for r in rows[:-1]:
            assert len(r["chunk"]) == 500


def test_chunk_overlap_consistency(spark, sf_dir):
    """Adjacent chunks agree on their 100-char overlap (window 500,
    stride 400) for real fixture documents."""
    d = Catalog(spark, sf_dir).documents.limit(50).select("doc_id", "text")
    rows = T.chunk_documents(d).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    checked = 0
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["chunk_id"])
        for a, b in zip(rows, rows[1:]):
            if len(a["chunk"]) == 500:
                assert a["chunk"][400:] == b["chunk"][: len(a["chunk"][400:])]
                checked += 1
    assert checked > 0, "fixture must contain multi-chunk docs"


def test_scrub_pii_idempotent_and_complete(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b-c_d%x@sub.example.co.uk now"),
            (2, "call +1 415 555 0100 or +45 12 34 56 78"),
            (3, "host 192.168.0.1 and 10.255.3.77 up"),
            (4, "mixed u@e.io +33 1 23 45 67 89 8.8.8.8"),
            (5, "clean text, no pii at all 123 456"),
        ],
        "id int, t string",
    )
    once = T.scrub_pii(F.col("t")).alias("s1")
    out = df.select(
        "id", once, T.scrub_pii(T.scrub_pii(F.col("t"))).alias("s2")
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["s1"] == "mail <EMAIL> now"
    assert by_id[2]["s1"] == "call <PHONE> or <PHONE>"
    assert by_id[3]["s1"] == "host <IP> and <IP> up"
    assert by_id[4]["s1"] == "mixed <EMAIL> <PHONE> <IP>"
    assert by_id[5]["s1"] == "clean text, no pii at all 123 456"
    for r in out:  # idempotence: scrubbing scrubbed text changes nothing
        assert r["s1"] == r["s2"]


def test_pack_sequences_bin_invariants(spark, sf_dir):
    """Bins are dense per source, every bin but the last stops within one
    document of the 2048 budget, and token totals are conserved."""
    q = __import__("__spark_entry__").queries()
    rows = q["q_pack_sequences"](spark, sf_dir).collect()
    d = Catalog(spark, sf_dir).documents
    total = d.select(
        F.sum(T.token_count(F.col("text")).cast("long")).alias("s")
    ).collect()[0]["s"]
    assert sum(r["sum_tok"] for r in rows) == total
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, bins in by_src.items():
        bins.sort(key=lambda r: r["seq"])
        assert bins[0]["seq"] == 0
        seqs = [r["seq"] for r in bins]
        assert seqs == list(range(len(seqs))), f"{src} bins not dense"


# ---- property-based (hypothesis): batched — one Spark job per example set

from hypothesis import given, settings, strategies as st  # noqa: E402

_ASCII = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=1500,
)


@settings(max_examples=15, deadline=None)
@given(st.lists(_ASCII, min_size=1, max_size=30))
@pytest.mark.slow
def test_chunk_roundtrip_random_texts(spark, texts):
    """Chunk reassembly (drop overlap, concat) reconstructs ANY text —
    random lengths 0..1500 across the window/stride boundaries."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    rows = T.chunk_documents(df, window=500, stride=400).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        rebuilt = "".join(c["chunk"][:400] for c in chunks[:-1]) + chunks[-1]["chunk"]
        assert rebuilt == t, (len(t), [len(c["chunk"]) for c in chunks])


@settings(max_examples=15, deadline=None)
@given(st.lists(_ASCII, min_size=1, max_size=30))
@pytest.mark.slow
def test_scrub_pii_idempotent_random_texts(spark, texts):
    """scrub(scrub(x)) == scrub(x) for arbitrary text — the placeholders
    must never re-trigger any pattern."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, t string"
    )
    rows = df.select(
        "i",
        T.scrub_pii(F.col("t")).alias("s1"),
        T.scrub_pii(T.scrub_pii(F.col("t"))).alias("s2"),
    ).collect()
    for r in rows:
        assert r["s1"] == r["s2"]
