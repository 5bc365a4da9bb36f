"""Round-6 batch-4 tests (B67): curriculum interleave, DSIR selection,
CCNet perplexity buckets, GD-trained linear probe.

Hand-checked semantics on constructed corpora + random differentials
against independent pure-Python references + scale plan pins; fixture
value proof is the DuckDB oracle differential (green at sf0.01 + sf0.1
this round, incl. the bit-exact unrolled-GD parity).
"""

from __future__ import annotations

import pytest

import math
import os
import random
import re
from collections import Counter

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


def _mini_docs(spark, tmp_path, rows):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"]).withColumn(
        "n_chars", F.length("text")
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


# --- curriculum interleave ---------------------------------------------------


def test_curriculum_hand_checked(spark, tmp_path):
    """Two sources, known chars-per-token: within-source ranks go
    easy->hard with doc_id tiebreak; src_pos follows source name order."""
    rows = [
        (0, "a", "aa bb"),        # 5 chars / 2 tok -> 2.5
        (1, "a", "aaaa"),         # 4 / 1 -> 4.0
        (2, "a", "a b"),          # 3 / 2 -> 1.5
        (3, "b", "cc"),           # 2 / 1 -> 2.0
        (4, "b", "c"),            # 1 / 1 -> 1.0
    ]
    sf = _mini_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["source"], r["batch_idx"], r["src_pos"], r["diff_q"])
        for r in QUERIES["q_curriculum_interleave"](spark, sf).collect()
    }
    assert got == {
        2: ("a", 1, 1, 1500000),
        0: ("a", 2, 1, 2500000),
        1: ("a", 3, 1, 4000000),
        4: ("b", 1, 2, 1000000),
        3: ("b", 2, 2, 2000000),
    }


# --- DSIR selection ----------------------------------------------------------


def _poly31(s):
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % 4294967296
    return h


@pytest.mark.slow
def test_dsir_random_differential(spark, tmp_path):
    """Random tiny-vocab corpus vs a pure-Python DSIR: identical hashed
    buckets, smoothed distributions, quantized per-token log ratios,
    integer doc sums, and top-k ranking with doc_id tiebreak."""
    from etl_data_processor_spark.queries_r6c import (
        _DSIR_BUCKETS,
        _DSIR_REF,
        _DSIR_TOP_K,
    )

    rng = random.Random(99)
    words = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(60):
        src = _DSIR_REF if i < 12 else f"s{i % 4}"
        text = " ".join(rng.choice(words) for _ in range(rng.randint(1, 25)))
        rows.append((i, src, text))
    sf = _mini_docs(spark, tmp_path, rows)

    bucket = {w: _poly31(w) % _DSIR_BUCKETS for w in words}
    tgt, raw = Counter(), Counter()
    for i, src, text in rows:
        for t in text.split():
            (tgt if src == _DSIR_REF else raw)[bucket[t]] += 1
    nt, nr = sum(tgt.values()), sum(raw.values())
    lrq = {
        b: math.floor(
            math.log(
                ((tgt.get(b, 0) + 1.0) / (nt + float(_DSIR_BUCKETS)))
                / ((raw.get(b, 0) + 1.0) / (nr + float(_DSIR_BUCKETS)))
            )
            * 1e12
            + 0.5
        )
        for b in range(_DSIR_BUCKETS)
    }
    docs = []
    for i, src, text in rows:
        if src == _DSIR_REF:
            continue
        toks = text.split()
        lw = sum(lrq[bucket[t]] for t in toks)
        docs.append((i, src, len(toks), lw))
    docs.sort(key=lambda d: (-d[3], d[0]))
    expect = {
        d[0]: (d[1], d[2], math.floor(d[3] / 1e6 + 0.5) / 1e6, k + 1)
        for k, d in enumerate(docs[:_DSIR_TOP_K])
    }
    got = {
        r["doc_id"]: (r["source"], r["n_tokens"], r["lw6"], r["sel_rank"])
        for r in QUERIES["q_dsir_select"](spark, sf).collect()
    }
    assert got == expect


# --- CCNet perplexity buckets --------------------------------------------------


@pytest.mark.slow
def test_ccnet_ppl_hand_checked(spark, tmp_path):
    """Reference 'a b a b': V=2, bigrams {a b: 2, b a: 1}; a doc made of
    in-LM bigrams scores lower NLL than an all-OOV doc, and the bucket
    boundaries split head < tail."""
    rows = [
        (0, "src0", "a b a b"),
        (1, "s1", "a b a b a b"),   # all bigrams seen
        (2, "s1", "z q z q"),        # all OOV (1/(0+2) each)
        (3, "s1", "b a z"),          # mixed (seen "b a" + OOV "a z")
    ]
    sf = _mini_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll6"], r["bucket"])
        for r in QUERIES["q_ccnet_perplexity"](spark, sf).collect()
    }
    # ref LM: c12{a b:2, b a:1}, c1{a:2, b:1}, V=2. Per-bigram NLLs:
    # 'a b' -> -ln((2+1)/(2+2)); 'b a' -> -ln((1+1)/(1+2));
    # OOV 'z q'/'q z' (head unseen) -> -ln(1/(0+2)); 'b z' -> -ln(1/(1+2))
    def q12(x):
        return math.floor(-math.log(x) * 1e12 + 0.5)

    d1 = (q12(3 / 4) * 3 + q12(2 / 3) * 2) // 5
    d2 = (q12(1 / 2) * 3) // 3
    d3 = (q12(2 / 3) + q12(1 / 4)) // 2
    exp_nll = {
        1: math.floor(d1 / 1e6 + 0.5) / 1e6,
        2: math.floor(d2 / 1e6 + 0.5) / 1e6,
        3: math.floor(d3 / 1e6 + 0.5) / 1e6,
    }
    assert {k: v[1] for k, v in got.items()} == exp_nll
    assert got[1][0] == 5 and got[2][0] == 3 and got[3][0] == 2
    # ranking: seen-bigram doc is head, the OOV-heavy docs sit above it
    assert d1 < d2 < d3
    assert (got[1][2], got[2][2], got[3][2]) == ("head", "middle", "tail")


# --- GD-trained probe -----------------------------------------------------------


def test_gd_probe_matches_pure_python(spark, sf_dir):
    """The 3-step trajectory recomputes exactly in pure Python from the
    raw parquet (same features, same 1e-9 quantized gradient sums, same
    update arithmetic) — proving the Spark aggregate IS full-batch GD."""
    from etl_data_processor_spark.queries_r6c import _GD_LR, _GD_REF

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "n_chars", "text")
        .collect()
    )
    feats = []
    for r in docs:
        w = [t for t in r["text"].split() if t]
        if not w:
            continue
        feats.append(
            (
                r["n_chars"] / 500.0,
                len(w) / 100.0,
                len(set(w)) / len(w),
                1.0 if r["source"] == _GD_REF else 0.0,
            )
        )
    n = len(feats)
    ws = [0.0, 0.0, 0.0, 0.0]
    expect = []
    for step in (1, 2, 3):
        g = [0, 0, 0, 0]
        mse_q = 0
        for x1, x2, x3, y in feats:
            r_ = (ws[0] + ws[1] * x1 + ws[2] * x2 + ws[3] * x3) - y
            for j, xj in enumerate((1.0, x1, x2, x3)):
                t = r_ if j == 0 else xj * r_
                g[j] += math.floor(t * 1e9 + 0.5)
            mse_q += math.floor(r_ * r_ * 1e9 + 0.5)
        ws = [ws[j] - _GD_LR * ((g[j] / 1e9) / n) for j in range(4)]
        expect.append(
            (
                step,
                *(math.floor(wj * 1e6 + 0.5) / 1e6 for wj in ws),
                math.floor(mse_q / 1000.0 / n + 0.5) / 1e6,
            )
        )
    got = sorted(
        (r["step"], r["w0_6"], r["w1_6"], r["w2_6"], r["w3_6"], r["mse6"])
        for r in QUERIES["q_quality_probe_gd"](spark, sf_dir).collect()
    )
    assert got == expect
    # training actually reduces MSE step over step
    assert got[2][5] < got[0][5]


# --- plan pins -------------------------------------------------------------------


def test_round6_batch4_plan_pins(spark, sf_dir):
    """Scale pins. q_curriculum_interleave: the only corpus window
    partitions by source. q_dsir_select / q_ccnet_perplexity: model
    tables broadcast (BroadcastHashJoin), no cartesian, no Python.
    All four: no Python boundary."""
    for key in (
        "q_curriculum_interleave",
        "q_dsir_select",
        "q_ccnet_perplexity",
    ):
        spark.catalog.clearCache()
        plan = (
            QUERIES[key](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan, key
        assert "CartesianProduct" not in plan, key
        if key != "q_curriculum_interleave":
            assert "BroadcastHashJoin" in plan, key
    # curriculum (reworked r8 per VERDICT r7 item 1): the corpus rank
    # runs through chunked_rank, so the only corpus-sized window
    # partitions by (source, __chunk) — never by source alone; the
    # source-only window is the bounded chunk-offsets frame and the
    # unpartitioned one is srcdim's distinct-sources mini-table
    plan = (
        QUERIES["q_curriculum_interleave"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    wlines = [
        ln for ln in plan.splitlines()
        if "Window [" in ln and "windowspecdefinition" in ln
    ]
    # within-chunk rank + chunk-offsets cumulation + srcdim mini-rank
    assert len(wlines) == 3, wlines
    assert any("__chunk" in ln for ln in wlines), wlines
    # and no window PARTITIONS by source alone over the corpus: every
    # source-partitioned spec is either (source, __chunk) or the
    # chunk-offsets frame ordered by __chunk (srcdim's mini-rank merely
    # ORDERS by source — "source ASC" — and is exempt)
    for ln in wlines:
        m = re.search(r"windowspecdefinition\(source#\d+,", ln)
        if m:
            assert "__chunk" in ln, ln
