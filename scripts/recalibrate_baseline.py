#!/usr/bin/env python
"""Multi-session re-calibration of BENCH_baseline.json work rows
(VERDICT r6 next-round item 7).

Same-plan executor CPU on this VM is bimodal across sessions (up to 2.2x
with byte-identical shuffle — the r6 calibration), so the baseline stores
the CPU ENVELOPE: the max over independent calibration sessions. The 24
round-6-era rows were seeded from a single run; this script re-measures a
key list in N fresh subprocess sessions (fresh JVM each — the
co-scheduling mode is sticky within a session, so in-session reps cannot
sample it) and rewrites each row's cpu_s as

    max(existing seed, run_1..run_N)        for unchanged-plan keys
    max(run_1..run_N)                       for --fresh keys (plan changed
                                            this round; the old row
                                            measured a different plan)

Shuffle/input/spill bytes are plan properties (byte-identical across
same-code runs) and are refreshed from the latest session. Wall rows are
refreshed for --fresh keys only (best across sessions).

Usage:
  python scripts/recalibrate_baseline.py [--sessions 3]
      [--fresh k1,k2] key1 key2 ...
  python scripts/recalibrate_baseline.py --one k1 k2 ...   (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = os.path.join(REPO, "BENCH_baseline.json")


def _measure(keys: list[str]) -> dict:
    from bench import StageMetrics, measure_query, work_row, SF_DIR
    from etl_data_processor_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("recalibrate", extra_conf={"spark.ui.enabled": "true"})
    queries = entry_mod.queries()
    queries["q_scan"](spark, SF_DIR).collect()  # warm JVM + metadata
    metrics = StageMetrics(spark)
    metrics.snapshot()
    out = {}
    for name in keys:
        reps, w, n_rows = measure_query(spark, queries[name], SF_DIR, metrics)
        out[name] = {
            "wall": reps[0],
            "work": work_row(w) if w else None,
            "rows": n_rows,
        }
    return out


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--one":
        print("ONE_RESULT " + json.dumps(_measure(args[1:])))
        return

    sessions = 3
    fresh: set[str] = set()
    if "--sessions" in args:
        i = args.index("--sessions")
        sessions = int(args[i + 1])
        del args[i : i + 2]
    if "--fresh" in args:
        i = args.index("--fresh")
        fresh = set(args[i + 1].split(","))
        del args[i : i + 2]
    keys = args
    if not keys:
        sys.exit("no keys given")

    runs: list[dict] = []
    for s in range(sessions):
        print(f"calibration session {s + 1}/{sessions} ...", flush=True)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", *keys],
                cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, timeout=1800,
            )
        except subprocess.TimeoutExpired:
            print("  session timed out; skipping")
            continue
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith("ONE_RESULT "):
                runs.append(json.loads(line[len("ONE_RESULT "):]))
                break
        else:
            print("  session produced no result; tail:")
            print("\n".join(proc.stdout.splitlines()[-5:]))
    if not runs:
        sys.exit("no successful calibration sessions")

    with open(BASE) as f:
        base = json.load(f)
    bw, bq = base["work"], base["queries"]
    for name in keys:
        rows = [r[name] for r in runs if r.get(name, {}).get("work")]
        if not rows:
            continue
        cpus = [r["work"]["cpu_s"] for r in rows]
        new = dict(rows[-1]["work"])  # bytes: plan properties, latest run
        walls = [r["wall"] for r in rows]
        if name in fresh or name not in bw:
            new["cpu_s"] = round(max(cpus), 3)
            bq[name] = round(max(walls), 3)
        else:
            new["cpu_s"] = round(max([bw[name].get("cpu_s", 0.0), *cpus]), 3)
            # wall rows are ENVELOPES too (r8, VERDICT r7 item 6): the
            # bench gate fires when a run's BEST-of-reps exceeds 1.2x the
            # baseline row, and same-plan wall is bimodal across sessions
            # on this VM — seeding walls from one (fast) session made the
            # secondary list flag ~25 keys every slow-mode round. The
            # envelope = max over calibration sessions of each session's
            # best-of-reps: quiet in both modes, still fires on a real
            # regression (which moves every session's best).
            bq[name] = round(max([bq.get(name, 0.0), *walls]), 3)
            for k in ("shuffle_read_mb", "shuffle_write_mb", "input_mb"):
                new[k] = max(bw[name].get(k, 0.0), new[k])
        bw[name] = new
        # output-row count: the normalizer for bench.OUTPUT_BOUND keys'
        # envelopes (identical across sessions — it is a plan property)
        n_rows = rows[-1].get("rows")
        if n_rows is not None:
            base.setdefault("rows", {})[name] = n_rows
        print(f"{name}: cpu envelope {new['cpu_s']} (runs: "
              f"{[round(c, 2) for c in cpus]})")
    base["value"] = round(sum(bq.values()), 3)
    with open(BASE, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
    print(f"rewrote {BASE} ({len(keys)} keys, {len(runs)} sessions)")


if __name__ == "__main__":
    main()
