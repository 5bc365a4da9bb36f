"""Round-6 batch-3 tests (B66 #2): n-gram benchmark contamination,
exact two-sample KS drift, RAG context assembly.

Same strategy as test_r6_ops' batch-2 block: hand-checked semantics on
constructed corpora, a random differential against an independent
pure-Python reference where the statistic warrants it, and the
scale-critical plan pins. Fixture-level value proof is the DuckDB oracle
differential in the sweep (sf0.01 + sf0.1, run this round).
"""

from __future__ import annotations

import pytest

import math
import os
import random

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


def _mini_docs(spark, tmp_path, rows):
    """Write a documents-shaped parquet fixture into a tmp sf_dir."""
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"]).withColumn(
        "n_chars", F.length("text")
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


# --- n-gram contamination ---------------------------------------------------


@pytest.mark.slow
def test_contamination_hand_checked(spark, tmp_path):
    """Constructed corpus with known trigram overlap: a doc sharing 1 of
    its 2 distinct trigrams with the benchmark scores 0.5 (contaminated
    at tau=0.2), a disjoint doc scores 0, and repeated trigrams inside a
    doc count ONCE (distinct-gram accounting, the GPT-3 recipe)."""
    rows = [
        (0, "src0", "a b c d"),          # benchmark: {a b c, b c d}
        (10, "web", "a b c x"),           # {a b c, b c x} -> 1/2
        (11, "web", "p q r s t"),         # 3 grams, 0 hits
        (12, "web", "b c d b c d"),        # 3 distinct grams, 1 hit -> 1/3
        (13, "web", "z z z z z"),          # 'z z z' x3 -> 1 distinct, 0 hits
    ]
    sf = _mini_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hits"], r["overlap6"], r["contaminated"])
        for r in QUERIES["q_contamination_ngrams"](spark, sf).collect()
    }
    assert got == {
        10: (2, 1, 0.5, 1),
        11: (3, 0, 0.0, 0),
        12: (3, 1, 0.333333, 1),
        13: (1, 0, 0.0, 0),
    }


@pytest.mark.slow
def test_contamination_random_differential(spark, tmp_path):
    """Random tiny-alphabet corpus vs an independent pure-Python overlap
    count — heavy gram collisions across the benchmark boundary."""
    rng = random.Random(77)
    words = ["a", "b", "c"]
    rows = []
    for i in range(40):
        src = "src0" if i < 8 else f"s{i % 3}"
        text = " ".join(rng.choice(words) for _ in range(rng.randint(3, 12)))
        rows.append((i, src, text))
    sf = _mini_docs(spark, tmp_path, rows)

    def grams(text):
        w = [t for t in text.split(" ") if t]
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    bench = set()
    for i, src, text in rows:
        if src == "src0":
            bench |= grams(text)
    expect = {}
    for i, src, text in rows:
        if src == "src0":
            continue
        g = grams(text)
        hits = len(g & bench)
        frac = hits / len(g)
        expect[i] = (
            len(g),
            hits,
            math.floor(frac * 1e6 + 0.5) / 1e6,
            1 if frac > 0.2 else 0,
        )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hits"], r["overlap6"], r["contaminated"])
        for r in QUERIES["q_contamination_ngrams"](spark, sf).collect()
    }
    assert got == expect


# --- exact two-sample KS drift ----------------------------------------------


def _py_ks(ref_lengths, src_lengths):
    """Independent exact KS: max ECDF gap over the union of values."""
    n, m = len(src_lengths), len(ref_lengths)
    pts = sorted(set(ref_lengths) | set(src_lengths))
    best = 0
    for v in pts:
        fs = sum(1 for x in src_lengths if x <= v)
        fr = sum(1 for x in ref_lengths if x <= v)
        best = max(best, abs(fs * m - fr * n))
    ks = best / (n * m)
    crit = 1.358 * math.sqrt((n + m) / (n * m))
    return math.floor(ks * 1e6 + 0.5) / 1e6, 1 if ks > crit else 0


@pytest.mark.slow
def test_ks_drift_hand_checked(spark, tmp_path):
    """A source with the identical length multiset scores exactly 0 (not
    drifted); a fully separated one scores exactly 1 (drifted: the
    critical value at n=m=4 is 1.358*sqrt(1/2) < 1)."""
    rows = []
    i = 0
    for src in ("src0", "same"):
        for ln in (1, 2, 3, 4):
            rows.append((i, src, "x" * ln))
            i += 1
    for ln in (10, 11, 12, 13):
        rows.append((i, "far", "x" * ln))
        i += 1
    sf = _mini_docs(spark, tmp_path, rows)
    got = {
        r["source"]: (r["n"], r["ks6"], r["drifted"])
        for r in QUERIES["q_ks_drift"](spark, sf).collect()
    }
    assert got == {"same": (4, 0.0, 0), "far": (4, 1.0, 1)}


@pytest.mark.slow
def test_ks_drift_random_differential(spark, tmp_path):
    """Random integer lengths with heavy ties vs the pure-Python exact
    KS — the cross-multiplied integer form must agree to the bit."""
    rng = random.Random(4242)
    rows = []
    i = 0
    lengths = {}
    for src in ("src0", "s1", "s2", "s3"):
        ls = [rng.randint(1, 15) for _ in range(rng.randint(5, 40))]
        lengths[src] = ls
        for ln in ls:
            rows.append((i, src, "x" * ln))
            i += 1
    sf = _mini_docs(spark, tmp_path, rows)
    got = {
        r["source"]: (r["ks6"], r["drifted"])
        for r in QUERIES["q_ks_drift"](spark, sf).collect()
    }
    expect = {
        src: _py_ks(lengths["src0"], ls)
        for src, ls in lengths.items()
        if src != "src0"
    }
    assert got == expect


# --- RAG context assembly ----------------------------------------------------


def test_rag_context_consistency(spark, sf_dir):
    """The packed context recomputes exactly from q_hybrid_rrf's top-3
    docs: chunks enumerate in (fused_rank, chunk_id) order, n_tokens is
    the word-count chunking of each doc, cum_tokens is the running sum,
    and packing stops exactly at the 96-token budget."""
    from etl_data_processor_spark.queries_r6b import (
        _RAG_BUDGET,
        _RAG_CHUNK_W,
        _RAG_TOP_DOCS,
        q_hybrid_rrf,
    )

    fused = [
        (r["query_id"], r["fused_rank"], r["doc_id"])
        for r in q_hybrid_rrf(spark, sf_dir).collect()
        if r["fused_rank"] <= _RAG_TOP_DOCS
    ]
    words = {
        r["doc_id"]: len([t for t in r["text"].split(" ") if t])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    expect = []
    for qid in sorted({q for q, _, _ in fused}):
        docs = sorted((fr, d) for q, fr, d in fused if q == qid)
        cum, seq = 0, 0
        for fr, d in docs:
            nw = words[d]
            n_chunks = (nw + _RAG_CHUNK_W - 1) // _RAG_CHUNK_W
            for c in range(n_chunks):
                nt = min(_RAG_CHUNK_W, nw - c * _RAG_CHUNK_W)
                cum += nt
                seq += 1
                if cum <= _RAG_BUDGET:
                    expect.append((qid, seq, d, c, nt, cum))
    got = sorted(
        (
            r["query_id"], r["seq"], r["doc_id"], r["chunk_id"],
            r["n_tokens"], r["cum_tokens"],
        )
        for r in QUERIES["q_rag_context"](spark, sf_dir).collect()
    )
    assert got == sorted(expect)
    assert len(got) > 0


# --- plan pins ----------------------------------------------------------------


def test_round6_batch3_plan_pins(spark, sf_dir):
    """Scale pins. q_contamination_ngrams: the benchmark gram set joins
    BROADCAST into the corpus gram stream (two pushed-filter corpus
    scans — bench subset and corpus complement — no cartesian, no
    Python, no window over corpus rows). q_ks_drift: the corpus
    collapses into ONE cached value-count table — every printed FileScan
    is that cache's reprint. q_rag_context: everything stays JVM-side
    and cartesian-free; the only windows partition by query_id."""
    spark.catalog.clearCache()
    plan = (
        QUERIES["q_contamination_ngrams"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 2, plan[:2000]
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "Window" not in plan

    spark.catalog.clearCache()
    plan = (
        QUERIES["q_ks_drift"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "InMemoryTableScan" in plan
    assert plan.count("Scan parquet") == plan.count("InMemoryTableScan"), (
        plan[:2000]
    )
    assert "EvalPython" not in plan

    spark.catalog.clearCache()
    plan = (
        QUERIES["q_rag_context"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    for line in plan.splitlines():  # every window keys on query_id
        if line.lstrip().startswith(("Window", "+- Window", ":- Window")):
            assert "query_id" in line, line
