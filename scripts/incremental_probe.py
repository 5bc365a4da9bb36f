#!/usr/bin/env python
"""Measure the incremental artifact-maintenance win (round 5): build the
LSH shingle artifact over a directory corpus, append ~5% new files, and
compare the append-only rebuild (ancestor UNION delta — cached_df's
family/delta_builder path) against a from-scratch re-derivation of the
grown corpus.

The corpus is the sf0.1 documents table replicated into N parquet files
in a scratch directory (the multi-file layout a real corpus has; the
fixtures are single files, which the incremental path correctly declines).
Prints one JSON line; SCALE.md cites the numbers.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_data_processor_spark.ops import dedup as D  # noqa: E402
from etl_data_processor_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1/documents.parquet"
REPLICATE = 16  # base corpus = 16x sf0.1 documents (~96k docs)


def derive(spark, df):
    return D.with_shingles(
        D._parallelize(df.select("doc_id", "source", "text"))
    ).select("doc_id", "source", "shingles")


def main() -> None:
    spark = get_spark("incremental_probe")
    scratch = "/tmp/inc_probe_corpus"
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    base = spark.read.parquet(SRC)
    n_base = base.count()

    stage = "/tmp/inc_probe_stage"
    for r in range(REPLICATE):
        rep = base.withColumn(
            "doc_id", F.col("doc_id") + F.lit(r * n_base)
        ).withColumn(
            "text",
            F.concat(F.col("text"), F.lit(f" replica{r}")),
        )
        rep.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        shutil.copy(part, os.path.join(scratch, f"base-{r}.parquet"))

    calls = {"full": 0, "delta": 0}
    fam = f"inc-probe:{scratch}"

    def full():
        calls["full"] += 1
        return derive(spark, spark.read.parquet(scratch))

    def delta(files):
        calls["delta"] += 1
        return derive(spark, spark.read.parquet(*files))

    def build():
        sig = D.source_signature(scratch)
        return D.cached_df(
            spark,
            ("probe", fam, sig),
            full,
            materialize=True,
            sources=(scratch,),
            family=fam,
            delta_builder=delta,
        )

    t0 = time.time()
    n0 = build().count()
    t_initial = time.time() - t0

    # append ~5%: one more file holding a 20% slice of the base table
    slice_df = base.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(REPLICATE * n_base)
    )
    slice_df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(f"{stage}/part-*.parquet")[0]
    shutil.copy(part, os.path.join(scratch, "delta-0.parquet"))

    D._DF_CACHE.clear()
    t0 = time.time()
    n1 = build().count()
    t_incremental = time.time() - t0
    assert calls["delta"] == 1 and calls["full"] == 1, calls

    # from-scratch comparison on the SAME grown corpus (fresh slug)
    t0 = time.time()
    full_df = derive(spark, spark.read.parquet(scratch))
    full_df.write.mode("overwrite").parquet("/tmp/inc_probe_full_out")
    t_scratch = time.time() - t0
    n_full = spark.read.parquet("/tmp/inc_probe_full_out").count()
    assert n1 == n_full, (n1, n_full)

    print(
        json.dumps(
            {
                "docs_base": n0,
                "docs_after_append": n1,
                "initial_build_s": round(t_initial, 2),
                "incremental_rebuild_s": round(t_incremental, 2),
                "from_scratch_rebuild_s": round(t_scratch, 2),
                "speedup": round(t_scratch / max(t_incremental, 1e-9), 1),
            }
        )
    )
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.rmtree("/tmp/inc_probe_full_out", ignore_errors=True)


if __name__ == "__main__":
    main()
