#!/usr/bin/env python
"""Measured bloom-pruned-join evidence for SCALE.md.

Times a selective dim ⋈ inflated fact aggregate two ways at sf0.1:

  plain — the fact streams into the join in full; every row crosses the
          join operator (broadcast dim, so no fact shuffle here — the
          local analog of shuffle volume is rows ENTERING the join)
  bloom — the fact is prefiltered by the portable bloom filter at the
          scan; only potentially-matching rows (+ false positives)
          reach the join

To make the effect visible on local[32] (where a broadcast join is
already cheap), the fact is inflated 20x and the join is forced to
SortMergeJoin via hints — the cluster shape where pre-exchange row
reduction is the whole game. Prints one JSON line with wall times and
the row counts entering the join. Run ad hoc:
python scripts/bloom_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_data_processor_spark.io import Catalog  # noqa: E402
from etl_data_processor_spark.ops.bloom import (  # noqa: E402
    build_bloom,
    might_contain_batch,
)
from etl_data_processor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
INFLATE = int(os.environ.get("SPARK_GRAFT_PROBE_INFLATE", "20"))


def main() -> None:
    spark = get_spark("bloom-probe")
    cat = Catalog(spark, SF_DIR)
    fact = (
        cat.lineitem.select("l_partkey", "l_extendedprice")
        .crossJoin(spark.range(INFLATE).withColumnRenamed("id", "rep"))
        .drop("rep")
    )
    dim = cat.part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")

    def agg(f):
        return (
            f.hint("merge")
            .join(dim.hint("merge"), f["l_partkey"] == dim["p_partkey"])
            .agg(F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice"))
        )

    def timed(df):
        df.collect()  # warm codegen
        t0 = time.time()
        rows = df.collect()
        return round(time.time() - t0, 3), rows[0]["n"]

    fact = fact.cache()
    total = fact.count()  # materialize once; both strategies read cache
    t_plain, n = timed(agg(fact))

    # Bloom strategy timed END-TO-END — INCLUDING the filter build
    # (distributed bit_or fold + m/64-word collect). Membership runs on
    # the Arrow-batched numpy path (the default): the expression form
    # drops out of codegen at >=2 probes and evaluates interpreted
    # (measured 35 s for this same probe — see might_contain_batch).
    def bloom_run():
        words = build_bloom(dim, "p_partkey")
        pruned = fact.filter(
            might_contain_batch(words, 1 << 16)(F.col("l_partkey"))
        )
        return pruned, agg(pruned).collect()

    bloom_run()  # warm (codegen compile, not counted)
    t0 = time.time()
    pruned, rows = bloom_run()
    t_bloom = round(time.time() - t0, 3)
    n2 = rows[0]["n"]
    assert n == n2, (n, n2)  # no false negatives: identical result

    survivors = pruned.count()
    print(
        json.dumps(
            {
                "metric": "bloom_pruned_join_probe",
                "plain_sec": t_plain,
                "bloom_sec": t_bloom,
                "fact_rows": total,
                "rows_entering_join_after_bloom": survivors,
                "reduction": round(1 - survivors / total, 4),
                "result_rows_equal": True,
                "sf_dir": SF_DIR,
                "inflate": INFLATE,
            }
        )
    )


if __name__ == "__main__":
    main()
