#!/usr/bin/env python
"""Measured parquet-codec evidence for SCALE.md.

Writes the sf0.1 lineitem table under snappy / zstd / gzip / uncompressed
and records file size, write time, and full-scan read time per codec. At
100 TB the codec choice is a first-order storage-and-IO decision: zstd
typically buys ~25-40% size over snappy for a small CPU premium, which on
object storage is read-throughput, not just cost.

Run ad hoc: python scripts/compression_probe.py
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

from etl_data_processor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CODECS = ["snappy", "zstd", "gzip", "uncompressed"]


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    spark = get_spark("compression-probe")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li = li.repartition(8).cache()
    n = li.count()  # materialize once so write timing excludes the scan

    out = {"rows": n, "sf_dir": SF_DIR, "codecs": {}}
    base = tempfile.mkdtemp(prefix="codec_probe_")
    try:
        for codec in CODECS:
            path = os.path.join(base, codec)
            t0 = time.time()
            li.write.option("compression", codec).parquet(path)
            t_write = round(time.time() - t0, 3)
            size = dir_bytes(path)
            # full-scan read: aggregate one column so the read dominates
            t0 = time.time()
            spark.read.parquet(path).agg(
                F.sum("l_quantity")
            ).collect()
            t_read = round(time.time() - t0, 3)
            out["codecs"][codec] = {
                "bytes": size,
                "write_sec": t_write,
                "scan_sec": t_read,
            }
        snappy = out["codecs"]["snappy"]["bytes"]
        for codec, d in out["codecs"].items():
            d["size_vs_snappy"] = round(d["bytes"] / snappy, 3)
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
