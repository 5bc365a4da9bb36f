#!/usr/bin/env python
"""Measured probe: table-format OPTIMIZE ZORDER + bloom point lookups at
sf0.1 (run: python scripts/zorder_probe.py [sf_dir]).

Builds a 16-append orders-derived table whose (x, y) ranges fully overlap
per group (range stats useless), then measures:
  1. groups opened for half-range predicates on x and on y BEFORE vs
     AFTER `compact(zorder_by=("x","y"), target_files=8)`;
  2. bloom point-lookup pruning on interleaved keys vs stats-only;
  3. bytes written by the z-order rewrite (the one-off cost the pruning
     pays back every read).
Results land in stdout; SCALE.md cites the shape.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_data_processor_spark import tableformat as TF  # noqa: E402
from etl_data_processor_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def total_bytes(table_dir: str) -> int:
    total = 0
    for root, _, files in os.walk(os.path.join(table_dir, "data")):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> None:
    spark = get_spark("zorder-probe")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_orderkey") % 512).alias("x"),
        ((F.col("o_orderkey") * 37) % 512).alias("y"),
    )
    t = tempfile.mkdtemp(prefix="zorder_probe_")
    try:
        n = orders.count()
        for s in range(16):  # every append spans the full x/y range
            TF.append(
                orders.filter(F.col("id") % 16 == s),
                t,
                stats_cols=["x", "y"],
                bloom_cols=["id"],
            )
        ox0, tot0 = TF.pruned_group_count(t, "x", 384, 511)
        oy0, _ = TF.pruned_group_count(t, "y", 384, 511)
        pt0 = [TF.point_group_count(t, "id", k)[0] for k in (7, 1001, 4242)]
        bytes_before = total_bytes(t)

        t0 = time.time()
        TF.compact(spark, t, target_files=8, zorder_by=("x", "y"))
        dt = time.time() - t0
        rewrite_bytes = total_bytes(t) - bytes_before

        ox1, tot1 = TF.pruned_group_count(t, "x", 384, 511)
        oy1, _ = TF.pruned_group_count(t, "y", 384, 511)
        got = TF.read_pruned(spark, t, "x", 384, 511).count()
        want = orders.filter((F.col("x") >= 384) & (F.col("x") <= 511)).count()
        assert got == want, (got, want)

        print(f"rows={n} groups_before={tot0} groups_after={tot1}")
        print(f"x-range scan: opened {ox0}/{tot0} before -> {ox1}/{tot1} after")
        print(f"y-range scan: opened {oy0}/{tot0} before -> {oy1}/{tot1} after")
        print(f"bloom point lookups (stats cannot skip): opened {pt0} of {tot0}")
        print(f"zorder rewrite: {rewrite_bytes / 1e6:.2f} MB in {dt:.1f}s")
        print(f"row-correctness: pruned read == filter ({got} rows)")
    finally:
        shutil.rmtree(t, ignore_errors=True)


if __name__ == "__main__":
    main()
