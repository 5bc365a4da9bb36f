"""Round-6 tests: the BPE tokenizer loop (train + encode).

Differential strategy (same as the round-5 text ops): the Spark
implementations are compared against independent pure-Python references on
a RANDOM corpus over a tiny alphabet (forcing heavy pair collisions,
repeated-letter runs, and multi-level merge chains), not just the fixture.
The encoder reference is the CANONICAL min-rank-iterate BPE algorithm,
while ops.text.bpe_encode_words applies one full fold pass per rank — a
green differential is an empirical proof of the equivalence argument in
its docstring. The trained-merge literal shipped in queries_r6 is pinned
to ops.text.train_bpe_merges' output on the fixture corpus.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from etl_data_processor_spark.ops import text as T


# --- pure-Python references ------------------------------------------------


def _apply_all(syms, a, b):
    out = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _naive_train(corpus_words, n_merges):
    """Corpus-level greedy BPE training (Sennrich et al. 2016): count
    adjacent pairs over every word OCCURRENCE, merge the argmax (count
    desc, pair asc), repeat."""
    seqs = [list(w) for w in corpus_words]
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for s in seqs:
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += 1
        if not pc:
            break
        (a, b), _ = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        seqs = [_apply_all(s, a, b) for s in seqs]
    return merges


def _canonical_encode(word, ranks):
    """Canonical BPE encoding: repeatedly find the LOWEST-RANK pair
    present and merge its LEFTMOST occurrence, until no trained pair
    remains — the min-rank-iterate form (also the DuckDB oracle's)."""
    syms = list(word)
    while True:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            return syms
        i = best[1]
        syms[i : i + 2] = [syms[i] + syms[i + 1]]


def _random_corpus(seed, n_docs=60, words_per_doc=8, alphabet="abcd"):
    rng = random.Random(seed)
    docs = []
    for d in range(n_docs):
        words = []
        for _ in range(words_per_doc):
            ln = rng.randint(1, 8)
            # repeated-letter runs are likely on a 4-char alphabet — the
            # overlap-handling edge case ('aaaa' under merge (a,a))
            words.append("".join(rng.choice(alphabet) for _ in range(ln)))
        docs.append((d, " ".join(words)))
    return docs


# --- differentials ---------------------------------------------------------


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_train_bpe_merges_matches_naive_reference(spark, seed):
    docs = _random_corpus(seed)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = T.train_bpe_merges(df, n_merges=12)
    want = _naive_train(
        [w for _, text in docs for w in text.split()], 12
    )
    assert got == [tuple(m) for m in want]


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_bpe_encode_words_matches_canonical_reference(spark, seed):
    """The rank-order full-pass fold == canonical min-rank-iterate BPE,
    word for word, on corpora designed to hit overlap runs and
    multi-level merge chains."""
    docs = _random_corpus(seed)
    corpus_words = [w for _, text in docs for w in text.split()]
    merges = _naive_train(corpus_words, 12)
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    vocab = df.select(
        F.explode(T.tokenize(F.col("text"))).alias("word")
    ).distinct()
    got = {
        r["word"]: list(r["tokens"])
        for r in T.bpe_encode_words(vocab, merges).collect()
    }
    assert set(got) == set(corpus_words)
    for w in set(corpus_words):
        assert got[w] == _canonical_encode(w, ranks), w
    # round-trip: tokens always reassemble the word
    for w, toks in got.items():
        assert "".join(toks) == w


def test_overlap_run_merges_leftmost_first(spark):
    """'aaaa' under merge (a,a): leftmost-first non-overlapping gives
    [aa, aa]; 'aaa' gives [aa, a] — the classic BPE overlap rule."""
    df = spark.createDataFrame(
        [("aaaa",), ("aaa",), ("a",), ("baab",)], ["word"]
    )
    got = {
        r["word"]: list(r["tokens"])
        for r in T.bpe_encode_words(df, [("a", "a")]).collect()
    }
    assert got == {
        "aaaa": ["aa", "aa"],
        "aaa": ["aa", "a"],
        "a": ["a"],
        "baab": ["b", "aa", "b"],
    }


def test_shipped_merge_list_is_trained_on_fixture(spark):
    """The literal BPE_MERGES in queries_r6 must BE train_bpe_merges'
    output on the fixture corpus it documents (sf0.01) — the shipped
    tokenizer artifact stays reproducible from the data."""
    from etl_data_processor_spark.queries_r6 import BPE_MERGES

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert T.train_bpe_merges(docs, n_merges=16) == BPE_MERGES


def test_bpe_encode_plan_is_vocab_sized_no_python(spark, sf_dir):
    """Plan pins for q_bpe_encode: the corpus is scanned once into a
    partial+final word-frequency aggregate, every merge fold stays
    JVM-side (no Python/Arrow eval node, no UDF), and there is exactly
    one exchange (the vocab agg) before the final order-by."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["q_bpe_encode"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
    # exchanges: one hash (vocab agg) + one range (deterministic ORDER BY)
    import re

    kinds = re.findall(r"Exchange (\w+)", plan)
    assert sum(1 for k in kinds if k == "hashpartitioning") == 1, kinds
