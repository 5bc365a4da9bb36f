#!/usr/bin/env python
"""Three-point scaling trend for the PAIR-GENERATING family (VERDICT r8
item 5): two scale points (sf0.1 -> sf1) cannot distinguish linear from
quadratic-with-small-constant, so the 5 heaviest pair keys get a third
point at sf3 (30x sf0.1; scripts/make_sf1.py --replicas 30 --tables
documents,customer) and a per-step power-law exponent

    alpha_step = log(cpu_hi / cpu_lo) / log(scale_hi / scale_lo)

on executor CPU (the drift-immune basis). A linear key holds alpha ~ 1
on BOTH steps; a quadratic one drifts toward 2 as the fixed per-session
CPU stops mattering. Keys whose OUTPUT relation itself grows
super-linearly (record linkage: the true lev<=2 pair set is ~quadratic
in replicas because replica customers share names) also record the
result row count, so cpu-per-output-row can be trended — the r8
adjudication discipline, now with three points.

Writes SCALE_TREND.json. Usage: python scripts/scale_trend.py [keys...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from etl_data_processor_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402
from bench import StageMetrics  # noqa: E402

sys.path.insert(0, os.path.join(REPO, "scripts"))
from scale_stress import measure  # noqa: E402

KEYS = [
    "q_record_linkage",
    "q_dedup_blocking_audit64",
    "q_dedup_clusters",
    "q_selection_pipeline",
    "q_linkage_fs_em",
]

SF_DIRS = [
    ("0.1", "/root/testdata/sf0.1", 1.0),
    ("1", os.path.join(REPO, "testdata_sf1"), 10.0),
    ("3", os.path.join(REPO, "testdata_sf3"), 30.0),
]
FIXED_CPU_S = 5.0  # same per-session allowance as scale_stress


def main() -> None:
    keys = sys.argv[1:] or KEYS
    queries = entry_mod.queries()
    spark = get_spark("scale_trend", extra_conf={"spark.ui.enabled": "true"})
    metrics = StageMetrics(spark)

    out: dict = {"scales": [s for s, _, _ in SF_DIRS], "results": {}}
    prior = os.path.join(REPO, "SCALE_TREND.json")
    if os.path.exists(prior):
        try:
            with open(prior) as f:
                prev = json.load(f)
            out["results"] = prev.get("results", {})
            # carry the human-written blocks through a re-measure (r11:
            # the first rewrite silently dropped the adjudications)
            for k in ("adjudications", "note"):
                if k in prev:
                    out[k] = prev[k]
        except (OSError, ValueError):
            pass

    for name in keys:
        fn = queries[name]
        row: dict = {}
        failed = False
        for sf, sf_dir, _mult in SF_DIRS:
            try:
                r = measure(spark, fn, sf_dir, metrics)
                r["out_rows"] = fn(spark, sf_dir).count()
            except Exception as e:  # record the scale failure, keep going
                row[sf] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
                print(f"{name} sf{sf}: FAILED {type(e).__name__}", flush=True)
                failed = True
                break
            row[sf] = r
            print(
                f"{name} sf{sf}: wall={r['wall_s']}s cpu={r['cpu_s']}s "
                f"shuffle={r['shuffle_read_mb']}MB spill={r['spill_mb']}MB "
                f"maxtask={r['max_stage_task_s']}s rows={r['out_rows']}",
                flush=True,
            )
        steps = {}
        for (lo, _, ml), (hi, _, mh) in zip(SF_DIRS, SF_DIRS[1:]):
            if failed and (lo not in row or hi not in row
                           or "error" in row.get(lo, {})
                           or "error" in row.get(hi, {})):
                continue
            c_lo = max(row[lo]["cpu_s"], 0.05)
            c_hi = row[hi]["cpu_s"]
            steps[f"{lo}->{hi}"] = {
                "cpu_ratio": round(c_hi / c_lo, 2),
                "alpha": round(math.log(c_hi / c_lo) / math.log(mh / ml), 2),
                "out_ratio": round(
                    row[hi]["out_rows"] / max(row[lo]["out_rows"], 1), 2
                ),
                "cpu_per_outrow_ratio": round(
                    (c_hi / max(row[hi]["out_rows"], 1))
                    / (c_lo / max(row[lo]["out_rows"], 1)),
                    3,
                ),
            }
        row["steps"] = steps
        out["results"][name] = row
        print(f"  -> {json.dumps(steps)}", flush=True)
        # persist after EVERY key: a later key's failure must not lose
        # the completed measurements (learned the hard way: the first
        # run's OOM discarded 25 minutes of curves)
        with open(prior, "w") as f:
            json.dump(out, f, indent=1)
    print("wrote SCALE_TREND.json", flush=True)


if __name__ == "__main__":
    main()
