#!/usr/bin/env python
"""Render SCALE_STRESS.json as the SCALE.md markdown table.

Usage: python scripts/stress_table.py   # prints the table to stdout

Keeps the doc derivable from the artifact instead of hand-maintained:
rows sorted by cpu ratio descending, verdict column from the recorded
super-linear flag (rule documented in scripts/scale_stress.py).
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    with open(os.path.join(ROOT, "SCALE_STRESS.json")) as f:
        data = json.load(f)
    results = data["results"]
    rows = []
    for key, r in results.items():
        a, b = r["0.1"], r["1"]
        rows.append(
            (
                r["cpu_ratio"],
                key,
                a["cpu_s"],
                b["cpu_s"],
                a["wall_s"],
                b["wall_s"],
                a["shuffle_write_mb"],
                b["shuffle_write_mb"],
                b["max_stage_task_s"],
                "SUPER-LINEAR" if r.get("super_linear") else "linear",
            )
        )
    rows.sort(key=lambda t: -t[0])
    print(
        "| key | cpu sf0.1 (s) | cpu sf1 (s) | cpu ratio (10x data) | "
        "wall sf0.1 | wall sf1 | shuffle sf0.1 (MB) | shuffle sf1 (MB) | "
        "max task sf1 (s) | verdict |"
    )
    print("|---|---|---|---|---|---|---|---|---|---|")
    for ratio, key, c0, c1, w0, w1, s0, s1, mt, verdict in rows:
        print(
            f"| {key} | {c0:.1f} | {c1:.1f} | {ratio:.2f}x | {w0:.2f} | "
            f"{w1:.2f} | {s0:.2f} | {s1:.2f} | {mt:.2f} | {verdict} |"
        )


if __name__ == "__main__":
    main()
