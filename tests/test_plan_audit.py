"""Registry-wide plan audit: single-task window whitelists.

Two window classes single-task data-sized frames and are therefore the
recurring scale-killer this audit hunts (VERDICT r6 x3, VERDICT r7
items 1-2):

1. UNPARTITIONED windows — `Window.partitionBy().orderBy(...)` plans as
   Exchange SinglePartition + one task over the whole frame.
2. LOW-NDV-PARTITIONED windows — `PARTITION BY source` (20 values) over
   a corpus-sized frame is the same class per partition: each source's
   whole slice sorts through ONE task, and the task count CANNOT grow
   with the data.

Per-key plan pins (test_plans.py) catch regressions on the keys they
name; THIS test sweeps every registered query's physical plan once and
pins the COMPLETE set of both window classes to justified whitelists,
so a new corpus-frame window cannot land silently anywhere in the
registry.

History: the unpartitioned audit found and fixed four data-sized
offenders in r7 (q_eval_auc, q_golden_record, q_null_ordering,
q_quantile_normalize); the low-NDV audit found seven more in r8, all
rewritten onto the ops/prefix chunked forms (q_pack_sequences,
q_curriculum_interleave, q_peak_concurrency, q_twap, q_bollinger,
q_pareto_share via chunked_cumsum/chunked_rank/bounded_window_frame;
q_minmax_scale via aggregate+broadcast; q_win_rank/q_win_dist via
chunked_ranks). Every remaining whitelist entry is a BOUNDED frame:
chunk-offset tables (ops/prefix internals, <= num_chunks+1 rows per
series), value-distribution tables, per-day/week aggregates,
constant-size report heads — or a rank-filter window whose
WindowGroupLimit partial pushdown bounds the rows per group per map
task BEFORE the shuffle (verified in-plan, not taken on trust).

Parsing: in `explain("simple")` a window spec lists bare partition
columns first; a spec whose first argument is the frame itself or an
ordered column (ASC/DESC) has no partition columns.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

# key -> (expected count, justification: what the bounded frame is)
UNPARTITIONED_WHITELIST = {
    "q_abc_classification": (2, "chunk-offset + total frames (ops/prefix, <= 33 rows)"),
    "q_benford": (1, "9-row first-digit table"),
    "q_curriculum_interleave": (1, "|sources| frame (source ordinal)"),
    "q_eval_auc": (1, "chunked_rank offset frame (<= 11 rows at 10 score-decile chunks)"),
    "q_golden_record": (4, "chunked_rank offsets/total + pair-graph CC frames (pair-bounded)"),
    "q_mannwhitney_u": (1, "reference ECDF over the distinct-length value table"),
    "q_null_ordering": (1, "chunked_rank offset frame (<= 27 first-char chunks)"),
    "q_quantile_normalize": (1, "chunked_rank offset frame (<= 33 equi-depth chunks)"),
    "q_rfm_segments": (6, "3 metrics x chunked_rank offsets/total frames"),
    "q_sketch_quantile_hdr": (1, "HDR bucket table (value-range-bounded, few hundred rows)"),
    "q_skyline": (1, "phase-2 survivor set (O(salts x skyline))"),
    "q_survival_km": (2, "per-event-time tally frame (delay-bounded)"),
    "q_text_vocab": (1, "top-50 vocabulary head"),
}

# Partition-column names that are LOW-CARDINALITY on the fixture tables
# (and at any scale: enum-like dimensions, not keys). A window
# partitioned ONLY by these cannot scale its task count with the data.
# The base-table members are NDV-verified against the fixtures by
# test_low_ndv_catalog_is_honest below; the rest are registered query
# aliases of those columns (segment = c_mktsegment etc.).
LOW_NDV_COLS = {
    # base columns (NDV checked against sf0.001)
    "source": ("documents", "source"),
    "lang": ("documents", "lang"),
    "event_type": ("events", "event_type"),
    "c_mktsegment": ("customer", "c_mktsegment"),
    "l_returnflag": ("lineitem", "l_returnflag"),
    "l_linestatus": ("lineitem", "l_linestatus"),
    "o_orderstatus": ("orders", "o_orderstatus"),
    "o_orderpriority": ("orders", "o_orderpriority"),
    "p_brand": ("part", "p_brand"),
    "n_name": ("nation", "n_name"),
    "r_name": ("region", "r_name"),
    # query-level aliases of the above
    "segment": None,
    "mktsegment": None,
    "nation": None,
    "region": None,
    "returnflag": None,
    "linestatus": None,
    "shipmode": None,
    "orderstatus": None,
    "orderpriority": None,
}

# key -> (expected count, needs_wgl, justification)
# needs_wgl: the window is bounded BECAUSE a rank<=k filter plans as
# partial WindowGroupLimit below the exchange — asserted in-plan.
LOW_NDV_WHITELIST = {
    "q_bollinger": (1, False, "chunked_rank offsets frame (<= 33 chunks/type)"),
    "q_curriculum_interleave": (1, False, "chunked_rank offsets frame (<= 33 chunks/source)"),
    "q_dedup": (1, True, "keep-first rank filter: WGL forwards <= 1 row/group/map task"),
    "q_entropy": (1, False, "(source, lang) count table"),
    "q_gini": (1, False, "chunked_rank offsets frame (<= 33 chunks/segment)"),
    "q_group_sample_topk": (1, True, "rank<=2 filter: WGL bounds rows/group/map task"),
    "q_heaps_fit": (2, False, "<= 32-row-per-source checkpoint frame"),
    "q_ks_drift": (2, False, "per-source ECDF over the distinct-length value grid"),
    "q_length_filter_adaptive": (2, False, "(source, n_chars) value-count table"),
    "q_markov_transitions": (1, False, "|types|^2 transition table"),
    "q_pack_sequences": (2, False, "chunked_cumsum offsets frame (<= 33 chunks/source)"),
    "q_pareto_share": (2, False, "chunked_rank offsets + totals frames"),
    "q_peak_concurrency": (2, False, "chunked_cumsum offsets frame (<= 33 chunks/type)"),
    "q_period_over_period": (1, False, "per-(priority, week) aggregate"),
    "q_ratio_to_report": (1, False, "(status, priority) aggregate"),
    "q_sample_ares_grouped": (1, True, "k=5 reservoir/source: WGL bounds rows/group/map task"),
    "q_sketch_theta_kmv": (4, True, "k=64 sketch rows/type; rn<=k filter plans WGL (x4: cached branch reuse)"),
    "q_source_centroid_outliers": (1, True, "top-3 outliers/source: WGL-bounded"),
    "q_topk_per_group": (1, True, "top-3/priority: WGL partial+final"),
    "q_ts_autocorr": (1, False, "per-(type, day) aggregate"),
    "q_ts_cusum": (5, False, "per-(type, day) aggregate windows"),
    "q_ts_decompose": (2, False, "per-(type, day) aggregate rolling"),
    "q_twap": (1, False, "chunked_rank offsets frame (<= 33 chunks/type)"),
    "q_weighted_median": (2, False, "per-group distinct-price value table"),
    "q_win_dist": (2, False, "chunked_ranks offsets + totals frames"),
    "q_win_rank": (2, False, "chunked_ranks offsets (+gct) frame"),
}


def _top_level_args(s: str) -> list[str]:
    args, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            if depth == 0:
                args.append("".join(cur))
                return args
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            args.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    args.append("".join(cur))
    return args


def _window_specs(plan: str):
    """Yield the partition-column name tuple of every windowspecdefinition
    in the plan (empty tuple = unpartitioned)."""
    for line in plan.splitlines():
        if "Window" not in line:
            continue
        for mo in re.finditer(r"windowspecdefinition\(", line):
            parts = []
            for a in _top_level_args(line[mo.end():]):
                a = a.strip()
                if (
                    a.startswith("specifiedwindowframe")
                    or " ASC" in a
                    or " DESC" in a
                ):
                    break
                parts.append(re.sub(r"#\d+L?$", "", a))
            yield tuple(parts)


# The registry_plans fixture alone takes ~50 s (it analyzes every
# registered query): builder tier only (VERDICT r10 item 6).
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def registry_plans(spark, sf_dir):
    """One simple-mode plan string per registered query — shared by both
    audits so the registry is planned exactly once per test session.
    Plans are built from a COLD cache state (earlier test files leave
    .cache() marks whose CacheManager substitution collapses cached
    subtrees and shifts window counts — the audit pins the cold,
    fresh-session plan shape)."""
    import __spark_entry__ as entry_mod
    from etl_data_processor_spark.ops import dedup as D

    spark.catalog.clearCache()
    D._DF_CACHE.clear()
    plans = {}
    for name, fn in sorted(entry_mod.queries().items()):
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn(spark, sf_dir).explain("simple")
        plans[name] = buf.getvalue()
    return plans


def test_registry_unpartitioned_window_whitelist(registry_plans):
    """Every registered query's physical plan: the exact set (and count)
    of unpartitioned windows must equal the justified whitelist."""
    found = {}
    for name, plan in registry_plans.items():
        n = sum(1 for p in _window_specs(plan) if not p)
        if n:
            found[name] = n

    expected = {k: n for k, (n, _why) in UNPARTITIONED_WHITELIST.items()}
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


def test_registry_low_ndv_window_whitelist(registry_plans):
    """Every window whose partition columns are ALL low-cardinality
    dimension columns must be on the justified whitelist (VERDICT r7
    item 2 — the PARTITION BY source single-task class), and entries
    justified by WindowGroupLimit must actually plan one."""
    found = {}
    for name, plan in registry_plans.items():
        n = sum(
            1
            for p in _window_specs(plan)
            if p and all(c.lower() in LOW_NDV_COLS for c in p)
        )
        if n:
            found[name] = n

    expected = {k: n for k, (n, _wgl, _why) in LOW_NDV_WHITELIST.items()}
    new_offenders = {k: v for k, v in found.items() if k not in expected}
    assert not new_offenders, (
        "window partitioned ONLY by low-NDV dimension columns — a fixed "
        "task count per partition value that cannot grow with the data. "
        "Route data-sized frames through ops/prefix (chunked_cumsum / "
        "chunked_rank(s) / bounded_window_frame); whitelist bounded "
        f"frames WITH a justification: {new_offenders}"
    )
    assert found == expected, {
        "missing_or_count_drift": {
            k: (found.get(k), expected.get(k))
            for k in set(found) | set(expected)
            if found.get(k) != expected.get(k)
        }
    }
    for key, (_n, needs_wgl, _why) in LOW_NDV_WHITELIST.items():
        if needs_wgl:
            assert "WindowGroupLimit" in registry_plans[key], (
                f"{key}: whitelisted as WindowGroupLimit-bounded but the "
                "plan no longer contains one"
            )


def test_low_ndv_catalog_is_honest(spark, sf_dir):
    """The base-table members of LOW_NDV_COLS really are low-cardinality
    on the fixtures (NDV <= 64) — so the audit's column list can't rot
    into flagging genuinely high-cardinality partitions."""
    from etl_data_processor_spark.io import Catalog

    cat = Catalog(spark, sf_dir)
    for col, src in LOW_NDV_COLS.items():
        if src is None:
            continue
        table, c = src
        ndv = getattr(cat, table).select(c).distinct().count()
        assert ndv <= 64, (col, ndv)
