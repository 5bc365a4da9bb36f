"""Registry-wide plan audit: UNPARTITIONED WindowExec whitelist.

`Window.partitionBy().orderBy(...)` (or an unpartitioned aggregate
window) plans as Exchange SinglePartition + a one-task pass over the
whole frame — the scale-killer class VERDICT r6 flagged three times.
Per-key plan pins (test_plans.py) catch regressions on the keys they
name; THIS test sweeps every registered query's physical plan and pins
the COMPLETE set of unpartitioned windows to a justified whitelist, so
a new corpus-frame window cannot land silently anywhere in the
registry.

The audit found (and this round fixed, via the ops/prefix chunked
forms) four keys whose unpartitioned window ranked a DATA-SIZED frame:
q_eval_auc (scored corpus), q_golden_record (distinct part names),
q_null_ordering (all customers), q_quantile_normalize (both ranks).
Every remaining entry below is a BOUNDED frame: chunk-offset tables
(ops/prefix internals, <= num_chunks+1 rows), value-distribution
tables, constant-size report heads.

Parsing: in `explain("simple")` a window spec lists bare partition
columns first; a spec whose first argument is the frame itself or an
ordered column (ASC/DESC) has no partition columns.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

# key -> (expected count, justification: what the bounded frame is)
WHITELIST = {
    "q_abc_classification": (2, "chunk-offset + total frames (ops/prefix, <= 33 rows)"),
    "q_benford": (1, "9-row first-digit table"),
    "q_curriculum_interleave": (1, "|sources| frame (source ordinal)"),
    "q_eval_auc": (1, "chunked_rank offset frame (<= 11 rows at 10 score-decile chunks)"),
    "q_golden_record": (4, "chunked_rank offsets/total + pair-graph CC frames (pair-bounded)"),
    "q_null_ordering": (1, "chunked_rank offset frame (<= 27 first-char chunks)"),
    "q_quantile_normalize": (1, "chunked_rank offset frame (<= 33 equi-depth chunks)"),
    "q_rfm_segments": (6, "3 metrics x chunked_rank offsets/total frames"),
    "q_sketch_quantile_hdr": (1, "HDR bucket table (value-range-bounded, few hundred rows)"),
    "q_skyline": (1, "phase-2 survivor set (O(salts x skyline))"),
    "q_survival_km": (2, "per-event-time tally frame (delay-bounded)"),
    "q_text_vocab": (1, "top-50 vocabulary head"),
}


def _top_level_first_arg(s: str) -> str:
    depth = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                return s[:i]
            depth -= 1
        elif ch == "," and depth == 0:
            return s[:i]
    return s


def _unpartitioned_windows(df) -> int:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("simple")
    hits = 0
    for line in buf.getvalue().splitlines():
        if "Window" not in line:
            continue
        for mo in re.finditer(r"windowspecdefinition\(", line):
            first = _top_level_first_arg(line[mo.end():]).strip()
            if (
                first.startswith("specifiedwindowframe")
                or " ASC" in first
                or " DESC" in first
            ):
                hits += 1
    return hits


def test_registry_unpartitioned_window_whitelist(spark, sf_dir):
    """Every registered query's physical plan: the exact set (and count)
    of unpartitioned windows must equal the justified whitelist."""
    import __spark_entry__ as entry_mod

    found = {}
    for name, fn in sorted(entry_mod.queries().items()):
        n = _unpartitioned_windows(fn(spark, sf_dir))
        if n:
            found[name] = n

    expected = {k: n for k, (n, _why) in WHITELIST.items()}
    new_offenders = {k: v for k, v in found.items() if k not in expected}
    assert not new_offenders, (
        "unpartitioned window over a frame not yet reviewed — if the "
        f"frame is bounded, whitelist it WITH a justification: {new_offenders}"
    )
    assert found == expected, {
        "missing_or_count_drift": {
            k: (found.get(k), expected.get(k))
            for k in set(found) | set(expected)
            if found.get(k) != expected.get(k)
        }
    }
