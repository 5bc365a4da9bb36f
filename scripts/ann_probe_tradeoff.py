#!/usr/bin/env python
"""ANN probe-count calibration (VERDICT r9 item 4): recall@10 of the
SERVED vector legs vs n_probe, at sf0.001 and sf0.01 — the
q_blocking_tradeoff discipline applied to IVF, replacing the bare
`_ANN_PROBE = 10` constant's justification with a measured table.

For each n_probe in {1, 2, 4, 8, 10, 16} and each fixture scale,
measures recall@10 against the exact brute-force top-10
(cosine_topk_exact) for both serving paths:

- ivf_flat : queries_r9._ivf_topk_served (IVF-Flat assignment artifact)
- ivfpq    : queries_r10._ivfpq_topk_served (PQ code artifact + ADC
             shortlist + exact re-rank, rerank=50)

Emits a markdown table (paste into SCALE.md) plus one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from etl_data_processor_spark.session import get_spark  # noqa: E402

PROBES = [1, 2, 4, 8, 10, 16]
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
K = 10


def pairs(df):
    return {(r["query_id"], r["vec_id"]) for r in df.collect()}


def main() -> None:
    import etl_data_processor_spark.queries_r9 as r9
    from etl_data_processor_spark.ops.similarity import cosine_topk_exact
    from etl_data_processor_spark.queries_r10 import _ivfpq_topk_served

    spark = get_spark("ann-probe-tradeoff")
    out: dict[str, dict[str, dict[int, float]]] = {}
    for sf_dir in SFS:
        sf = os.path.basename(sf_dir)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id").isin([0, 1, 2]))
        qrows = queries.select("vec_id", "embedding").collect()
        exact = pairs(
            cosine_topk_exact(emb, queries, k=K).select(
                "query_id", "vec_id"
            )
        )
        out[sf] = {"ivf_flat": {}, "ivfpq": {}}
        for np_ in PROBES:
            old = r9._ANN_PROBE
            r9._ANN_PROBE = np_
            try:
                flat = pairs(r9._ivf_topk_served(spark, sf_dir, qrows, K))
            finally:
                r9._ANN_PROBE = old
            out[sf]["ivf_flat"][np_] = round(
                len(flat & exact) / len(exact), 3
            )
            pq = pairs(
                _ivfpq_topk_served(spark, sf_dir, qrows, K, n_probe=np_)
            )
            out[sf]["ivfpq"][np_] = round(len(pq & exact) / len(exact), 3)
            print(f"{sf} n_probe={np_}: ivf_flat "
                  f"{out[sf]['ivf_flat'][np_]}, ivfpq "
                  f"{out[sf]['ivfpq'][np_]}", flush=True)

    print("\n| n_probe | " + " | ".join(
        f"{os.path.basename(s)} flat | {os.path.basename(s)} ivfpq"
        for s in SFS) + " |")
    print("|---" * (1 + 2 * len(SFS)) + "|")
    for np_ in PROBES:
        cells = []
        for s in SFS:
            sf = os.path.basename(s)
            cells.append(f"{out[sf]['ivf_flat'][np_]:.3f}")
            cells.append(f"{out[sf]['ivfpq'][np_]:.3f}")
        print(f"| {np_} | " + " | ".join(cells) + " |")
    print("\nRESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
