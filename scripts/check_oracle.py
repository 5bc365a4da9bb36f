#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01 (or $SPARK_GRAFT_SF_DIR), then compares row count, sorted column
names, and exact cell values (order-insensitive). Stricter than any sane
hash: if this passes, a value-hash comparison passes too.

Usage: python scripts/check_oracle.py [--sf 0.1] [query_name ...]

``--sf X`` switches both engines to /root/testdata/sfX — the scale-drift
sweep (VERDICT r2 item 7): a query can be green at sf0.01 and wrong at
sf0.1 through spills, AQE re-plans, or decimal overflow, so the heaviest
oracles get re-checked at the bench scale each round.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_data_processor_spark.io import TABLES  # noqa: E402
from etl_data_processor_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Per-key DuckDB time budget (VERDICT r4 item 10). The costliest honest
# oracles today are the CC-closure rewrites (~30s at sf0.1); anything past
# 60s signals a super-linear form sneaking back in. Env-overridable for
# ad-hoc runs on slower machines.
ORACLE_BUDGET_S = float(os.environ.get("SPARK_GRAFT_ORACLE_BUDGET_S", "60"))


def canon_type_duck(t) -> str:
    """Canonicalize a DuckDB logical type to Spark simpleString vocabulary."""
    s = str(t).lower()
    if s.endswith("[]"):
        return f"array<{canon_type_duck(s[:-2])}>"
    s = s.replace("varchar", "string").replace("blob", "binary")
    if s.startswith("timestamp"):
        return "timestamp"
    if s == "real":
        return "float"
    if s == "integer":
        return "int"
    return s


def canon_type_spark(dt) -> str:
    s = dt.simpleString()
    if s.startswith("timestamp"):
        return "timestamp"
    return s


def check_types(sdf, rel) -> list[str]:
    """Compare Spark schema to DuckDB result types by column name.

    A typed (Arrow-serialized) value hash distinguishes int64 from int128
    (HUGEINT), float from double, date from timestamp, and decimal scales —
    numerically-equal results still mismatch. This assertion makes that
    class of drift impossible to reintroduce silently (VERDICT r1 item 1/2).
    """
    duck = {c: canon_type_duck(t) for c, t in zip(rel.columns, rel.types)}
    drift = []
    for f in sdf.schema.fields:
        if f.name in duck and canon_type_spark(f.dataType) != duck[f.name]:
            drift.append(
                f"{f.name}: spark={canon_type_spark(f.dataType)} "
                f"duckdb={duck[f.name]}"
            )
    return drift


def canon_cell(v):
    """Canonicalize a cell for engine-independent comparison."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon_cell(r[i]) for i in idx) for r in rows)


def main(only: list[str]) -> int:
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        pat = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(pat):  # Spark-written table = directory of parts
            pat = f"{pat}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = only or sorted(queries)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        t_oracle = time.time()
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            type_drift = check_types(sdf, rel)
            drows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        oracle_secs = time.time() - t_oracle
        # Oracle-cost budget (VERDICT r4 item 10): the differential gate
        # must itself stay sub-quadratic — a future oracle that silently
        # reintroduces an all-pairs form shows up as a budget breach, not
        # as an ever-slower sweep everyone stops running.
        if oracle_secs > ORACLE_BUDGET_S:
            failures.append(name)
            print(
                f"FAIL {name}: oracle over budget "
                f"({oracle_secs:.1f}s > {ORACLE_BUDGET_S:.0f}s) — rewrite "
                "the DuckDB form (prefix-filter / bounded-closure)"
            )
            continue
        status = []
        if len(srows) != len(drows):
            status.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            status.append(f"schema spark={sorted(scols)} duckdb={sorted(dcols)}")
        if type_drift:
            status.append(f"type drift: {'; '.join(type_drift)}")
        if not status:
            s, d = canon_rows(scols, srows), canon_rows(dcols, drows)
            if s != d:
                diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
                status.append(f"values differ; first diffs: {diffs}")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(
                f"ok   {name}: {len(srows)} rows match "
                f"({time.time()-t0:.1f}s, oracle {oracle_secs:.1f}s)"
            )

    print(f"\n{len(names) - len(failures)}/{len(names)} queries match")
    if failures:
        print("failing:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    if "--sf" in args:
        i = args.index("--sf")
        SF_DIR = f"/root/testdata/sf{args[i + 1]}"
        del args[i : i + 2]
    sys.exit(main(args))
