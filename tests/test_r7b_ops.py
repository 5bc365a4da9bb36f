"""Round-7 batch-2 tests: the tuned 64-bit portable SimHash blocker.

The contract under test is the TUNING CLAIM itself: at the identical
gold relation and identical hamming threshold, widening the signature
from 32 to 64 bits must not lose a single gold pair (recall parity) and
must strictly shrink the false-positive set (the precision lift the
audit pair documents). Plus a structural pin: the 64-bit signature's lo
half IS the 32-bit signature (same base-31 char fold over the same
tokens), so the two keys can never drift apart silently.
"""

from __future__ import annotations


def _queries():
    import __spark_entry__ as entry_mod

    return entry_mod.queries()


def test_sig64_lo_half_equals_sig32(spark, sf_dir):
    """q_simhash64_portable.sig_lo must be bit-identical to
    q_simhash_portable.sig for every document — the lo half is the same
    base-31 fold over the same token array, so any tokenizer or vote
    drift between the two keys shows up here first."""
    qs = _queries()
    s32 = {
        r["doc_id"]: r["sig"]
        for r in qs["q_simhash_portable"](spark, sf_dir).collect()
    }
    s64 = qs["q_simhash64_portable"](spark, sf_dir).collect()
    assert len(s64) == len(s32) > 0
    for r in s64:
        assert r["sig_lo"] == s32[r["doc_id"]], r["doc_id"]
        assert 0 <= r["sig_hi"] < (1 << 32)


def test_audit64_recall_parity_and_precision_lift(spark, sf_dir):
    """Same gold, equal relative radius (h <= 6 on 64 bits vs h <= 3 on
    32): the tuned blocker must catch every gold pair the 32-bit blocker
    catches (no recall regression from widening — the h=3 recall trap is
    what the scaled threshold exists to avoid) while producing strictly
    fewer false positives (the measured ~1.6x variance-reduction lift)."""
    qs = _queries()
    a32 = qs["q_dedup_blocking_audit"](spark, sf_dir).collect()
    a64 = qs["q_dedup_blocking_audit64"](spark, sf_dir).collect()
    t32 = {
        k: sum(r[k] for r in a32) for k in ("tp", "fp", "fn")
    }
    t64 = {
        k: sum(r[k] for r in a64) for k in ("tp", "fp", "fn")
    }
    # identical gold relation on both sides
    assert t64["tp"] + t64["fn"] == t32["tp"] + t32["fn"]
    # no recall regression from widening, and a real precision lift
    assert t64["fn"] <= t32["fn"]
    assert t64["fp"] < t32["fp"]


def test_rouge_l_matches_cell_dp_replay(spark, sf_dir):
    """The bit-parallel Allison-Dix fold must equal the classic O(m*n)
    cell DP: replay every candidate/reference pair in pure Python
    (quadratic LCS over the same truncated windows) and compare the
    per-source integer sums and all three rounded metrics."""
    import math

    import pyarrow.parquet as pq

    qs = _queries()
    rows = {r["source"]: r for r in qs["q_rouge_l"](spark, sf_dir).collect()}

    docs = {
        r["doc_id"]: (
            r["source"],
            [w for w in r["text"].strip().split(" ") if w],
        )
        for r in pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    }

    def lcs(a, b):
        prev = [0] * (len(b) + 1)
        for x in a:
            cur = [0]
            for j, y in enumerate(b, 1):
                cur.append(max(prev[j], cur[-1], prev[j - 1] + (x == y)))
            prev = cur
        return prev[-1]

    exp = {}
    for cid, (source, w) in docs.items():
        if source == "src0":
            continue
        rid = cid - (cid % 20)
        if rid not in docs or docs[rid][0] != "src0":
            continue
        cw, rw = w[:512], docs[rid][1][:62]
        e = exp.setdefault(source, [0, 0, 0])
        e[0] += lcs(cw, rw)
        e[1] += len(rw)
        e[2] += len(cw)

    assert set(rows) == set(exp)
    for source, (l, t, c) in exp.items():
        r = rows[source]
        assert (r["lcs_sum"], r["ref_tokens"], r["cand_tokens"]) == (l, t, c)
        for col, val in (
            ("rougeL_r6", l / t),
            ("rougeL_p6", l / c),
            ("rougeL_f6", 2.0 * l / (t + c)),
        ):
            assert r[col] == math.floor(val * 1e6 + 0.5) / 1e6, (source, col)


def test_chrf_matches_python_replay(spark, sf_dir):
    """chrF replayed in pure Python: char n-gram clipped matches per
    (pair, order), micro-summed per source, means over orders, beta=2
    combination — every column must match."""
    import math
    from collections import Counter

    import pyarrow.parquet as pq

    qs = _queries()
    rows = {r["source"]: r for r in qs["q_chrf_eval"](spark, sf_dir).collect()}

    docs = {
        r["doc_id"]: (r["source"], "".join(r["text"].strip().split()))
        for r in pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    }

    def grams(s, n):
        return Counter(s[i : i + n] for i in range(len(s) - n + 1))

    agg = {}
    for cid, (source, cs) in docs.items():
        if source == "src0":
            continue
        rid = cid - (cid % 20)
        if rid not in docs or docs[rid][0] != "src0":
            continue
        rs = docs[rid][1]
        a = agg.setdefault(source, {n: [0, 0, 0] for n in range(1, 5)})
        for n in range(1, 5):
            cg, rg = grams(cs, n), grams(rs, n)
            a[n][0] += sum(min(c, cg.get(g, 0)) for g, c in rg.items())
            a[n][1] += sum(cg.values())
            a[n][2] += sum(rg.values())

    assert set(rows) == set(agg)
    for source, byn in agg.items():
        r = rows[source]
        m = sum(v[0] for v in byn.values())
        tc = sum(v[1] for v in byn.values())
        tr = sum(v[2] for v in byn.values())
        assert (r["matches"], r["cand_grams"], r["ref_grams"]) == (m, tc, tr)
        p = sum(v[0] / v[1] for v in byn.values()) / 4
        rec = sum(v[0] / v[2] for v in byn.values()) / 4
        f = 0.0 if 4 * p + rec == 0 else 5 * p * rec / (4 * p + rec)
        for col, val in (("chrp6", p), ("chrr6", rec), ("chrf6", f)):
            assert r[col] == math.floor(val * 1e6 + 0.5) / 1e6, (source, col)


def test_t_closeness_python_replay_and_trio_consistency(spark, sf_dir):
    """t-closeness replayed in pure Python (exact integer TVD), plus the
    trio consistency: classes line up with q_k_anonymity's (nation,
    band) rollup and t is always within [0, 1]."""
    import math
    from collections import Counter

    import pyarrow.parquet as pq

    qs = _queries()
    got = {
        (r["c_nationkey"], r["bal_band"]): r
        for r in qs["q_t_closeness"](spark, sf_dir).collect()
    }

    cust = pq.read_table(f"{sf_dir}/customer.parquet").to_pylist()
    glob = Counter()
    cls = {}
    for r in cust:
        key = (r["c_nationkey"], math.floor(r["c_acctbal"] / 1000.0))
        glob[r["c_mktsegment"]] += 1
        cls.setdefault(key, Counter())[r["c_mktsegment"]] += 1
    big_n = sum(glob.values())

    assert set(got) == set(cls)
    for key, cnt in cls.items():
        n = sum(cnt.values())
        num = sum(abs(cnt.get(s, 0) * big_n - g * n) for s, g in glob.items())
        t = math.floor(num / (2.0 * n * big_n) * 1e6 + 0.5) / 1e6
        r = got[key]
        assert r["n"] == n and r["t6"] == t and r["violates_t02"] == (t > 0.2)
        assert 0.0 <= r["t6"] <= 1.0

    ka = {
        (r["c_nationkey"], r["bal_band"]): 0
        for r in qs["q_k_anonymity"](spark, sf_dir).collect()
    }
    for r in qs["q_k_anonymity"](spark, sf_dir).collect():
        ka[(r["c_nationkey"], r["bal_band"])] += r["n"]
    assert {k: v["n"] for k, v in got.items()} == ka


def test_heaps_fit_python_replay(spark, sf_dir):
    """Heaps fit replayed in pure Python: same bucket arithmetic, same
    cumulative checkpoints, same quantized OLS — every column."""
    import math
    from collections import defaultdict

    import pyarrow.parquet as pq

    qs = _queries()
    got = {r["source"]: r for r in qs["q_heaps_fit"](spark, sf_dir).collect()}

    rows = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    per_src = defaultdict(list)
    for r in rows:
        per_src[r["source"]].append(
            (r["doc_id"], [w for w in r["text"].strip().split(" ") if w])
        )

    for source, docs in per_src.items():
        ids = [i for i, _ in docs]
        mn, mx = min(ids), max(ids)
        toks_per = defaultdict(int)
        first_b = {}
        for i, ws in docs:
            b = (i - mn) * 32 // (mx - mn + 1)
            toks_per[b] += len(ws)
            for w in ws:
                if w not in first_b or b < first_b[w]:
                    first_b[w] = b
        types_per = defaultdict(int)
        for b in first_b.values():
            types_per[b] += 1
        n = v = 0
        pts = []
        for b in sorted(toks_per):
            n += toks_per[b]
            v += types_per.get(b, 0)
            pts.append(
                (
                    math.floor(math.log(n) * 1e9 + 0.5),
                    math.floor(math.log(v) * 1e9 + 0.5),
                )
            )
        k = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
        logk = (sy - slope * sx) / k / 1e9
        r = got[source]
        assert r["n_points"] == k
        assert r["n_tokens"] == sum(toks_per.values())
        assert r["n_types"] == len(first_b)
        assert r["beta6"] == math.floor(slope * 1e6 + 0.5) / 1e6
        assert r["logk6"] == math.floor(logk * 1e6 + 0.5) / 1e6


def test_label_propagation_python_replay_and_cc_containment(spark, sf_dir):
    """LPA replayed in pure Python (3 synchronized rounds, ties to the
    smallest label) from the same pair relation; plus the structural
    invariant: a label never crosses a connected component, so every
    LPA community's members sit inside one CC component."""
    from collections import Counter, defaultdict

    qs = _queries()
    got = sorted(
        (r["community"], r["n_members"])
        for r in qs["q_label_propagation"](spark, sf_dir).collect()
    )

    pairs = [
        (r["key_a"], r["key_b"])
        for r in qs["q_fuzzy_match"](spark, sf_dir).collect()
        if r["dist"] <= 2
    ]
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    labels = {n: n for n in adj}
    for _ in range(3):
        nxt = {}
        for n in adj:
            cnt = Counter(labels[u] for u in adj[n])
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            nxt[n] = best
        labels = nxt
    want = sorted(Counter(labels.values()).items())
    assert got == want

    # CC containment: union-find over the same edges
    parent = {n: n for n in adj}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comm_comp = defaultdict(set)
    for n, lbl in labels.items():
        comm_comp[lbl].add(find(n))
    for lbl, comps in comm_comp.items():
        assert len(comps) == 1, (lbl, comps)
