#!/usr/bin/env python
"""Synthesize an sf1 fixture (10x sf0.1) for scale-stress runs (VERDICT r4
item 2): replicate every sf0.1 table 10x with RE-KEYED ids so foreign keys
stay intact within each replica and key cardinalities grow 10x.

Design choices that keep the workload's asymptotics honest (the point is a
scaling CURVE, so the data's own structure must scale linearly):

- region/nation are fixed dimensions (as in TPC-H) — copied once.
- every synthetic key gets ``key + r * (max_key + 1)`` per replica r, so
  replicas are disjoint and joins never cross replicas.
- events.user_id is offset too: user cardinality grows 10x with the same
  per-user event density (sessionize/funnel stay linear).
- documents.text gets EVERY WORD suffixed with the replica digit: replicas
  share zero shingles, so the near-dup pair/cluster structure replicates
  exactly 10x. A plain text copy would make every doc a 10-way exact twin
  and inflate LSH pair counts ~100x — a superlinearity of the DATA, which
  would corrupt the plan-scaling measurement. n_chars is recomputed.
- embeddings get one coordinate nudged by a replica-specific epsilon so
  replicas are not exact ties in top-k ordering.

Writes to testdata_sf1/ at the repo root (git-ignored). Deterministic —
pure column arithmetic on the deterministic sf0.1 input, no RNG.

Usage: python scripts/make_sf1.py [--replicas 10] [--out testdata_sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_data_processor_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"

# table -> {column: offset_base_table_key} ; offset unit = max(key)+1 of the
# NAMED key column in the SOURCE table, so every replica is key-disjoint.
KEYED = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
COPY_ONCE = ["region", "nation"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "testdata_sf1",
        ),
    )
    ap.add_argument("--src", default=SRC)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset (default: all); COPY_ONCE tables "
        "are included only when explicitly named",
    )
    args = ap.parse_args()
    subset = set(args.tables.split(",")) if args.tables else None

    spark = get_spark("make_sf1")
    os.makedirs(args.out, exist_ok=True)

    # key-space units (max+1 per named key), one tiny agg per base table
    units: dict[tuple[str, str], int] = {}
    for tbl, cols in KEYED.items():
        if subset is not None and tbl not in subset:
            continue
        for col, base in cols.items():
            if base not in units:
                bt, bc = base
                df = spark.read.parquet(f"{args.src}/{bt}.parquet")
                units[base] = int(df.agg(F.max(bc)).collect()[0][0]) + 1

    for tbl in COPY_ONCE:
        if subset is not None and tbl not in subset:
            continue
        df = spark.read.parquet(f"{args.src}/{tbl}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(f"{args.out}/{tbl}.parquet")
        print(f"{tbl}: copied once ({df.count()} rows)")

    for tbl, keycols in KEYED.items():
        if subset is not None and tbl not in subset:
            continue
        df = spark.read.parquet(f"{args.src}/{tbl}.parquet")
        parts = []
        for r in range(args.replicas):
            rep = df
            for col, base in keycols.items():
                rep = rep.withColumn(col, F.col(col) + F.lit(r * units[base]))
            if tbl == "documents":
                suffixed = F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(w, F.lit(str(r))),
                    ),
                    " ",
                )
                rep = rep.withColumn("text", suffixed).withColumn(
                    "n_chars", F.length("text").cast("long")
                )
            if tbl == "embeddings":
                eps = 1e-4 * (r + 1)
                rep = rep.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda v, i: F.when(i == 0, v + F.lit(eps)).otherwise(v).cast(
                            "float"
                        ),
                    ),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # a handful of files per table: wide enough to split, small enough
        # to keep the fixture tidy (maxPartitionBytes re-splits on read)
        out.repartition(8).write.mode("overwrite").parquet(
            f"{args.out}/{tbl}.parquet"
        )
        print(f"{tbl}: x{args.replicas} -> {out.count()} rows")

    print(f"sf1 fixture written to {args.out}")


if __name__ == "__main__":
    main()
