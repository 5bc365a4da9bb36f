#!/usr/bin/env python
"""Measured table-format MERGE write-amplification evidence for SCALE.md.

Builds a key-range-grouped table from sf0.1 orders (16 groups with
min/max stats), then applies the SAME small change batch (updates
confined to one key-range 1/16th) three ways:

  overwrite — read + apply_changes + full overwrite (rewrites the table)
  merge     — tableformat.merge: stats-pruned copy-on-write (rewrites
              only the overlapping group)
  mor       — delete_where + append of new images (merge-on-read:
              rewrites NOTHING, commits a key file + a new group)

Reports wall time and BYTES WRITTEN per strategy (the write
amplification that dominates at 100 TB), plus equality of the final
row counts. Run ad hoc: python scripts/merge_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_data_processor_spark import tableformat as TF  # noqa: E402
from etl_data_processor_spark.io import Catalog  # noqa: E402
from etl_data_processor_spark.ops.cdc import apply_changes  # noqa: E402
from etl_data_processor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_GROUPS = 16


def dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
    )


def build(spark, o, m):
    t = tempfile.mkdtemp(prefix="merge_probe_")
    step = m // N_GROUPS + 1
    for lo in range(0, m + 1, step):
        TF.append(
            o.filter(
                (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < lo + step)
            ),
            t,
            stats_cols=["o_orderkey"],
        )
    return t, dir_bytes(t)


def changes_for(o, m):
    step = m // N_GROUPS + 1
    return o.filter(
        (F.col("o_orderkey") < step) & (F.col("o_orderkey") % 7 == 0)
    ).select(
        "o_orderkey",
        *[F.col(c) for c in o.columns if c != "o_orderkey"],
        F.lit("U").alias("op"),
    ).withColumn("o_totalprice", F.col("o_totalprice") + 1.0)


def main() -> None:
    spark = get_spark("merge-probe")
    o = Catalog(spark, SF_DIR).orders
    m = o.agg(F.max("o_orderkey")).collect()[0][0]
    out = {"metric": "merge_write_amplification_probe", "sf_dir": SF_DIR}

    # overwrite strategy
    t, base_bytes = build(spark, o, m)
    ch = changes_for(o, m)
    t0 = time.time()
    TF.overwrite(apply_changes(TF.read(spark, t), ch, key="o_orderkey"), t)
    out["overwrite_sec"] = round(time.time() - t0, 3)
    out["overwrite_bytes_written"] = dir_bytes(t) - base_bytes
    n_over = TF.read(spark, t).count()
    shutil.rmtree(t, ignore_errors=True)

    # pruned merge strategy
    t, base_bytes = build(spark, o, m)
    t0 = time.time()
    _, rewritten, total = TF.merge(
        spark, t, ch, key="o_orderkey", stats_cols=["o_orderkey"]
    )
    out["merge_sec"] = round(time.time() - t0, 3)
    out["merge_bytes_written"] = dir_bytes(t) - base_bytes
    out["merge_groups_rewritten"] = f"{rewritten}/{total}"
    n_merge = TF.read(spark, t).count()
    shutil.rmtree(t, ignore_errors=True)

    # merge-on-read strategy (delete old images, append new ones)
    t, base_bytes = build(spark, o, m)
    keys = [r["o_orderkey"] for r in ch.select("o_orderkey").collect()]
    t0 = time.time()
    TF.delete_where(
        spark, t, "o_orderkey", F.col("o_orderkey").isin(keys)
    )
    TF.append(ch.drop("op"), t, stats_cols=["o_orderkey"])
    out["mor_sec"] = round(time.time() - t0, 3)
    out["mor_bytes_written"] = dir_bytes(t) - base_bytes
    n_mor = TF.read(spark, t).count()
    shutil.rmtree(t, ignore_errors=True)

    out["rows_equal"] = n_over == n_merge == n_mor
    print(json.dumps(out))


if __name__ == "__main__":
    main()
