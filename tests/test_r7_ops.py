"""Round-7 tests: PassJoin segment blocking (ops.text.passjoin_*).

Losslessness is the contract: the segment equi-join must find EVERY pair
within lev <= k. The registry key q_fuzzy_passjoin differential-proves it
against the naive all-pairs DuckDB oracle on the part fixture; here a
randomized adversarial corpus (short strings, empty strings, injected
near-pairs) is proven against a pure-Python Levenshtein.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_data_processor_spark.ops import text as T


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _pool(seed: int) -> list[str]:
    rng = random.Random(seed)
    alpha = "abcde"
    pool = set()
    while len(pool) < 150:
        pool.add("".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))))
    for s in list(pool)[:25]:  # inject near-pairs aggressively
        t = list(s)
        if t:
            t[rng.randrange(len(t))] = rng.choice(alpha)
        pool.add("".join(t))
        pool.add(s + rng.choice(alpha))
        if len(s) > 1:
            pool.add(s[1:])
    return sorted(pool)


@pytest.mark.parametrize("seed", [11, 42])
@pytest.mark.parametrize("k", [1, 2])
def test_passjoin_pairs_lossless_vs_naive(spark, seed, k):
    pool = _pool(seed)
    want = sorted(
        (x, y, _lev(x, y))
        for i, x in enumerate(pool)
        for y in pool[i + 1:]
        if _lev(x, y) <= k
    )
    df = spark.createDataFrame([(s,) for s in pool], ["k"])
    got = sorted(
        (r["key_a"], r["key_b"], r["dist"])
        for r in T.fuzzy_key_pairs_passjoin(df, "k", k).collect()
    )
    assert got == want


def test_passjoin_agrees_with_symdelete(spark):
    pool = _pool(7)
    df = spark.createDataFrame([(s,) for s in pool], ["k"])
    pj = sorted(map(tuple, T.fuzzy_key_pairs_passjoin(df, "k", 2).collect()))
    sd = sorted(map(tuple, T.fuzzy_key_pairs_symdelete(df, "k", 2).collect()))
    assert pj == sd


def test_passjoin_probe_volume_bounded(spark):
    """The probe explode is <= (2k+1)^2 * (k+1) keys per string (clipping
    and dedup only shrink it) — the volume claim the docstring makes."""
    df = spark.createDataFrame(
        [("abcdefghijklmnopqr",), ("x" * 40,), ("",)], ["s"]
    )
    k = 2
    sizes = df.select(
        F.size(T.passjoin_probe_keys("s", k)).alias("n")
    ).collect()
    bound = (2 * k + 1) ** 2 * (k + 1)
    assert all(r["n"] <= bound for r in sizes)
    # ... and the index side is exactly k+1 keys
    idx = df.select(F.size(T.passjoin_index_keys("s", k)).alias("n")).collect()
    assert all(r["n"] == k + 1 for r in idx)


# --- round-7 batch #2: diversity / A-Res / BLEU / span corruption / VAD ------


def test_span_corruption_round_trips(spark, sf_dir):
    """Splicing each target span back over its sentinel in the inputs
    string must reconstruct the original tokenized text exactly — the
    defining property of the T5 objective."""
    import re as _re

    import __spark_entry__ as entry_mod

    from etl_data_processor_spark.io import Catalog

    out = {
        r["doc_id"]: r
        for r in entry_mod.queries()["q_span_corruption"](spark, sf_dir).collect()
    }
    orig = {
        r["doc_id"]: " ".join(r["text"].split())
        for r in Catalog(spark, sf_dir).documents.collect()
    }
    assert set(out) == {d for d, t in orig.items() if t}
    for d, r in out.items():
        spans = {}
        toks = _re.findall(r"<extra_id_(\d+)>|(\S+)", r["targets"])
        cur = None
        for sid, tok in toks:
            if sid != "":
                cur = int(sid)
                spans[cur] = []
            else:
                spans[cur].append(tok)
        rebuilt = []
        for sid, tok in _re.findall(r"<extra_id_(\d+)>|(\S+)", r["inputs"]):
            if sid != "":
                rebuilt.extend(spans[int(sid)])
            else:
                rebuilt.append(tok)
        assert " ".join(rebuilt) == orig[d], d
        assert r["n_masked"] == sum(len(v) for v in spans.values())
        assert r["n_spans"] == len(spans)


def test_bleu_eval_matches_pure_python(spark, sf_dir):
    """Full independent recompute: clipped modified n-gram precisions,
    add-one smoothing for n>=2, brevity penalty — pure Python over the
    collected fixture vs the distributed result."""
    import math
    from collections import Counter

    import __spark_entry__ as entry_mod

    from etl_data_processor_spark.io import Catalog

    docs = {
        r["doc_id"]: (r["source"], r["text"].split())
        for r in Catalog(spark, sf_dir).documents.collect()
    }

    def grams(w, n):
        return Counter(
            " ".join(w[i:i + n]) for i in range(len(w) - n + 1)
        )

    agg = {}
    for d, (src, w) in docs.items():
        if src == "src0":
            continue
        rid = d - d % 20
        if rid not in docs or docs[rid][0] != "src0":
            continue
        rw = docs[rid][1]
        a = agg.setdefault(src, {"m": [0] * 5, "t": [0] * 5, "c": 0, "r": 0, "n": 0})
        a["n"] += 1
        a["c"] += len(w)
        a["r"] += len(rw)
        for n in range(1, 5):
            cg, rg = grams(w, n), grams(rw, n)
            a["m"][n] += sum(min(c, rg.get(g, 0)) for g, c in cg.items())
            a["t"][n] += sum(cg.values())
    want = {}
    for src, a in agg.items():
        if a["m"][1] == 0:
            bleu = 0.0
        else:
            bp = 1.0 if a["c"] >= a["r"] else math.exp(1.0 - a["r"] / a["c"])
            ls = math.log(a["m"][1] / a["t"][1]) + sum(
                math.log((a["m"][n] + 1.0) / (a["t"][n] + 1.0)) for n in (2, 3, 4)
            )
            bleu = bp * math.exp(ls / 4.0)
        want[src] = (
            a["n"], a["c"], a["r"], *a["m"][1:], *a["t"][1:],
            math.floor(bleu * 1e6 + 0.5) / 1e6,
        )
    got = {
        r["source"]: (
            r["n_docs"], r["c_len"], r["r_len"],
            r["m1"], r["m2"], r["m3"], r["m4"],
            r["t1"], r["t2"], r["t3"], r["t4"], r["bleu6"],
        )
        for r in entry_mod.queries()["q_bleu_eval"](spark, sf_dir).collect()
    }
    assert got == want and len(got) >= 10


def test_vad_segments_match_closed_form(spark, sf_dir):
    """Python recompute of the gated waveform's voiced islands for every
    track; also pins that the fixture actually exercises multi-segment
    tracks (the gate pattern yields ~5 segments per 16-frame track)."""
    import __spark_entry__ as entry_mod

    got = {}
    for r in entry_mod.queries()["q_audio_vad_segments"](spark, sf_dir).collect():
        got[(r["doc_id"], r["seg_idx"])] = (
            r["start_frame"], r["end_frame"], r["n_frames"], r["energy"]
        )
    want = {}
    n_multi = 0
    for d in range(100):
        frames = []
        for f in range(16):
            s = 0
            for n in range(f * 64, (f + 1) * 64):
                w = (((d * 7 + n * 13) % 200) - 100) * (
                    0 if (n // 64 + d) % 3 == 0 else 1
                )
                s += w * w
            frames.append(s)
        seg = -1
        prev = False
        segs = {}
        for f, s in enumerate(frames):
            v = s > 0
            if v and not prev:
                seg += 1
                segs[seg] = [f, f, 0, 0]
            if v:
                segs[seg][1] = f
                segs[seg][2] += 1
                segs[seg][3] += s
            prev = v
        if len(segs) > 1:
            n_multi += 1
        for k, v in segs.items():
            want[(d, k)] = tuple(v)
    assert got == want
    assert n_multi == 100  # every track splits into multiple segments


def test_ares_sample_properties(spark, sf_dir):
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["q_sample_ares"](spark, sf_dir).collect()
    assert len(rows) == 50
    assert len({r["doc_id"] for r in rows}) == 50
    by_rank = sorted(rows, key=lambda r: r["rank"])
    keys = [r["score6"] for r in by_rank]
    assert all(keys[i] >= keys[i + 1] - 1e-9 for i in range(len(keys) - 1))
    assert all(r["score6"] <= 0.0 for r in rows)  # ln(u)/w is never positive


# --- round-7 batch #3: eval/diagnostic keys ----------------------------------


def test_langid_f1_consistent_with_confusion(spark, sf_dir):
    """tp/fp/fn per class must recompute exactly from the confusion
    matrix; macro-F1 in [0, 1]."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    cm = [(r["lang"], r["guess"], r["n"])
          for r in qs["q_langid_confusion"](spark, sf_dir).collect()]
    f1 = {r["lang"]: r for r in qs["q_langid_f1"](spark, sf_dir).collect()}
    classes = {t for t, _, _ in cm}
    assert set(f1) == classes
    for c in classes:
        tp = sum(n for t, g, n in cm if t == c and g == c)
        fp = sum(n for t, g, n in cm if t != c and g == c)
        fn = sum(n for t, g, n in cm if t == c and g != c)
        assert (f1[c]["tp"], f1[c]["fp"], f1[c]["fn"]) == (tp, fp, fn), c
        assert 0.0 <= f1[c]["f16"] <= 1.0
    macro = sum(r["f16"] for r in f1.values()) / len(f1)
    assert 0.0 <= macro <= 1.0


def test_zipf_slope_negative_and_head_sized(spark, sf_dir):
    import __spark_entry__ as entry_mod

    (row,) = entry_mod.queries()["q_zipf_fit"](spark, sf_dir).collect()
    assert 2 <= row["n"] <= 100  # min(vocab, head budget); fixture vocab is 31
    assert row["slope6"] < 0  # frequency decays with rank, always


def test_kappa_internal_consistency(spark, sf_dir):
    import math

    import __spark_entry__ as entry_mod

    (r,) = entry_mod.queries()["q_gate_agreement_kappa"](spark, sf_dir).collect()
    n = r["n11"] + r["n10"] + r["n01"] + r["n00"]
    assert n == r["n"] and n > 0
    po = (r["n11"] + r["n00"]) / n
    pe = (
        (r["n11"] + r["n10"]) * (r["n11"] + r["n01"])
        + (r["n01"] + r["n00"]) * (r["n10"] + r["n00"])
    ) / (n * n)
    assert abs(r["po6"] - math.floor(po * 1e6 + 0.5) / 1e6) < 1e-9
    assert abs(r["pe6"] - math.floor(pe * 1e6 + 0.5) / 1e6) < 1e-9
    assert -1.0 <= r["kappa6"] <= 1.0


def test_blocking_audit_catches_gold_and_counts_consistent(spark, sf_dir):
    """The simhash blocker must RECALL the (tiny) exact-Jaccard gold on
    the fixture (recall 1.0 where gold exists), and tp+fn per source must
    equal that source's gold-pair count from q_dedup_ngram."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    audit = {r["source"]: r for r in qs["q_dedup_blocking_audit"](spark, sf_dir).collect()}
    gold = {}
    for r in qs["q_dedup_ngram"](spark, sf_dir).collect():
        gold[r["source"]] = gold.get(r["source"], 0) + 1
    for src, n in gold.items():
        assert audit[src]["tp"] + audit[src]["fn"] == n, src
    assert all(r["tp"] >= 0 and r["fp"] >= 0 and r["fn"] >= 0 for r in audit.values())


def test_rouge_bounds_and_bleu_consistency(spark, sf_dir):
    """ROUGE-n in [0,1]; its clipped-match numerators relate to BLEU's:
    both clip per (pair, gram), so sum-of-min is the SAME quantity — only
    the denominator side differs (candidate totals vs reference totals).
    Verify m1/m2 equal BLEU's m1/m2 per source."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    rouge = {r["source"]: r for r in qs["q_rouge_n"](spark, sf_dir).collect()}
    bleu = {r["source"]: r for r in qs["q_bleu_eval"](spark, sf_dir).collect()}
    assert set(rouge) == set(bleu)
    for s in rouge:
        assert rouge[s]["m1"] == bleu[s]["m1"], s
        assert rouge[s]["m2"] == bleu[s]["m2"], s
        assert 0.0 <= rouge[s]["rouge1_6"] <= 1.0
        assert 0.0 <= rouge[s]["rouge2_6"] <= 1.0


def test_jsd_bounds(spark, sf_dir):
    """JSD is within [0, ln 2] and zero only for an identical
    distribution (no source IS the global mixture, so strictly > 0)."""
    import math

    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["q_js_divergence"](spark, sf_dir).collect()
    assert len(rows) >= 10
    for r in rows:
        assert 0.0 < r["jsd6"] <= math.log(2) + 1e-9, r


def test_l_diversity_consistent_with_k_anonymity(spark, sf_dir):
    """Every l-diversity class size n must equal the sum of the
    k-anonymity class sizes sharing its (nation, band) prefix, and
    l <= number of distinct segments in that prefix."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    ka = {}
    for r in qs["q_k_anonymity"](spark, sf_dir).collect():
        key = (r["c_nationkey"], r["bal_band"])
        ka.setdefault(key, []).append(r)
    for r in qs["q_l_diversity"](spark, sf_dir).collect():
        key = (r["c_nationkey"], r["bal_band"])
        assert r["n"] == sum(x["n"] for x in ka[key]), key
        assert r["l"] == len(ka[key]), key
        assert r["violates_l3"] == (r["l"] < 3)


def test_orc_roundtrip_plan_pushdown(spark, sf_dir):
    """The ORC scan must push both filters and prune to the 3 used
    columns — the same guarantees the parquet scans are pinned to."""
    import io as _io
    from contextlib import redirect_stdout

    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["q_scan_orc"](spark, sf_dir)
    buf = _io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1].split("\n")[0]
    assert "lang" in pushed and "n_chars" in pushed
    schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "doc_id" not in schema  # unused column pruned from the read


def test_blocking_tradeoff_monotone_and_matches_audit(spark, sf_dir):
    """Thresholds are cumulative: tp and fp are non-decreasing in h,
    recall non-decreasing; the h=3 point must equal
    q_dedup_blocking_audit's totals (same relations)."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    curve = sorted(
        (r["h"], r["tp"], r["fp"], r["fn"], r["recall6"])
        for r in qs["q_blocking_tradeoff"](spark, sf_dir).collect()
    )
    assert [h for h, *_ in curve] == [0, 1, 2, 3]
    for (h1, tp1, fp1, _, r1), (h2, tp2, fp2, _, r2) in zip(curve, curve[1:]):
        assert tp2 >= tp1 and fp2 >= fp1 and r2 >= r1
    audit = qs["q_dedup_blocking_audit"](spark, sf_dir).collect()
    tot_tp = sum(r["tp"] for r in audit)
    tot_fp = sum(r["fp"] for r in audit)
    tot_fn = sum(r["fn"] for r in audit)
    h3 = curve[-1]
    assert (h3[1], h3[2], h3[3]) == (tot_tp, tot_fp, tot_fn)
