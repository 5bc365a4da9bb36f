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
