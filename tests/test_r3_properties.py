"""Hypothesis property tests for round-3 operators (pure driver-side —
no Spark session needed): DOM round-trip, MMR greedy vs brute force,
HDR bucket invariants, bloom no-false-negatives, hash32 parity."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# DOM builder round-trip
# ---------------------------------------------------------------------------

_TAGS = ["div", "p", "span", "article", "b"]


@st.composite
def dom_tree(draw, depth=0):
    """(html, expected_text) for a random small element tree."""
    if depth >= 3 or draw(st.booleans()):
        text = draw(
            st.text(
                alphabet="abcxyz 0123456789", min_size=0, max_size=12
            )
        )
        return text, text
    tag = draw(st.sampled_from(_TAGS))
    n = draw(st.integers(min_value=0, max_value=3))
    parts = [draw(dom_tree(depth + 1)) for _ in range(n)]
    html = f"<{tag}>" + "".join(h for h, _ in parts) + f"</{tag}>"
    return html, "".join(t for _, t in parts)


@settings(max_examples=200, deadline=None)
@given(dom_tree())
def test_dom_get_text_roundtrip(tree):
    """parse_html(render(tree)).get_text() reproduces the concatenated
    text content for arbitrary nesting — the invariant every extraction
    rule sits on."""
    from etl_data_processor_spark.ops.html import parse_html

    html, want = tree
    assert parse_html(html).get_text() == want


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(_TAGS), min_size=0, max_size=6))
def test_dom_nesting_parents(tags):
    """Nested single-child chains preserve parent links and tag order."""
    from etl_data_processor_spark.ops.html import parse_html

    html = "".join(f"<{t}>" for t in tags) + "x" + "".join(
        f"</{t}>" for t in reversed(tags)
    )
    root = parse_html(html)
    node, seen = root, []
    while node.children:
        child = node.children[0]
        if isinstance(child, str):
            assert child == "x"
            break
        assert child.parent is node
        seen.append(child.tag)
        node = child
    assert seen == tags


# ---------------------------------------------------------------------------
# MMR greedy vs brute force
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.floats(0, 1, width=32)),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    st.data(),
)
def test_mmr_greedy_matches_bruteforce(shortlist, data):
    """mmr_greedy equals an independent step-by-step brute-force greedy
    (same tie rules) on random pools."""
    from etl_data_processor_spark.ops.similarity import mmr_greedy

    shortlist = sorted(shortlist, key=lambda t: (-t[1], t[0]))
    ids = [i for i, _ in shortlist]
    sim = {
        (a, b): data.draw(
            st.floats(0, 1, width=32), label=f"sim{a},{b}"
        )
        for a in ids
        for b in ids
        if a != b
    }
    k = min(3, len(ids))
    got = mmr_greedy(shortlist, sim, k=k)

    rel = dict(shortlist)
    chosen: list[int] = []
    want = []
    for step in range(1, k + 1):
        best = None
        for vid in ids:
            if vid in chosen:
                continue
            sc = (
                0.7 * rel[vid] - 0.3 * max(sim[(s, vid)] for s in chosen)
                if chosen
                else rel[vid]
            )
            if best is None or sc > best[1] or (sc == best[1] and vid < best[0]):
                best = (vid, sc)
        want.append((step, best[0], math.floor(best[1] * 1e6 + 0.5) / 1e6))
        chosen.append(best[0])
    assert got == want


# ---------------------------------------------------------------------------
# HDR bucket invariants
# ---------------------------------------------------------------------------


def _hdr_bucket(c: int) -> int:
    e = c.bit_length() - 1
    base = 1 << e
    return e * 16 + ((c - base) * 16) // base


def _hdr_lower(bucket: int) -> int:
    base = 1 << (bucket // 16)
    return base + ((bucket % 16) * base) // 16


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=1 << 40))
def test_hdr_bucket_bounds_value(c):
    """lower(bucket(c)) <= c always, bucketing is monotone, and for
    c >= 16 the NEXT bucket's lower bound exceeds c (the one-sub-bucket
    error guarantee; below 16 integer sub-buckets of [2^e, 2^(e+1))
    collapse and the bound is the octave itself)."""
    b = _hdr_bucket(c)
    assert _hdr_lower(b) <= c
    assert _hdr_bucket(c + 1) >= b
    if c >= 16:
        assert _hdr_lower(b + 1) > c


# ---------------------------------------------------------------------------
# Bloom admission + driver-side hash parity
# ---------------------------------------------------------------------------


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(0, 1 << 40), min_size=1, max_size=64, unique=True),
    st.integers(0, 1 << 40),
)
def test_bloom_no_false_negatives_driver_side(keys, probe):
    """Driver-side bloom build (same arithmetic as the distributed one)
    never rejects an inserted key."""
    from etl_data_processor_spark.tableformat import _bloom_admits, _hash32_py

    m, k = 1 << 13, 5
    words = [0] * (m // 64)
    for key in keys:
        h1, h2 = _hash32_py(key, 0), _hash32_py(key, 1)
        for i in range(k):
            pos = (h1 + i * h2) % m
            words[pos // 64] |= 1 << (pos % 64)
    bloom = {"m": m, "k": k, "words": words}
    for key in keys:
        assert _bloom_admits(bloom, key)
    # absent probes may false-positive, but admission is deterministic
    assert _bloom_admits(bloom, probe) == _bloom_admits(bloom, probe)


@settings(max_examples=200, deadline=None)
@given(st.integers(0, (1 << 62)), st.integers(0, 3))
def test_hash32_py_matches_column_arithmetic(x, seed):
    """The driver-side hash replica gives values in [0, 2^32) and agrees
    with an independent reimplementation of the documented mixer."""
    from etl_data_processor_spark.ops.sampling import _A1, _A2
    from etl_data_processor_spark.tableformat import _hash32_py

    m32 = 1 << 32
    h = (x + seed * 0x9E3779B9) % m32
    h = (h * _A1) % m32
    h ^= h >> 16
    h = (h * _A2) % m32
    h ^= h >> 13
    assert _hash32_py(x, seed) == h < m32
