"""Round-10 queries: the PQ-served ANN story (VERDICT r9 item 1).

q_hybrid_ann_served (r9) completed the serving plan shape — both hybrid
legs from persisted artifacts — but its vector leg reads the IVF-FLAT
assignment table, which stores the float vectors inside the inverted
lists: at 100 TB that artifact is corpus-sized, the one remaining
corpus-shaped object in the serving story. This module serves the
vector leg from the PERSISTED PQ CODE index instead (~m_sub bytes per
vector, 16x smaller than the floats): probed-list IN-filter on the code
artifact, broadcast-ADC shortlist, then an EXACT re-rank that reads
only the shortlist's float vectors back by id pushdown — the
FAISS-style IVFPQ serving loop (Jégou et al., TPAMI 2011) expressed as
three pushdown-friendly Spark scans.

Reference parity note: the reference engine (main.py) has no vector
search; this family extends the engine for training-data pipelines
(mandate: similarity search at 100 TB). Keys here are rows-only
(approximate by design); their recall is pinned vs exact twins in
tests/test_r10_ops.py, and the probe/rerank constants carry a measured
tradeoff table (SCALE.md round-10) instead of bare numbers.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_data_processor_spark.io import read_parquet_memo
from etl_data_processor_spark.ops import similarity as SIM
from etl_data_processor_spark.registry import cat as _cat, q

# Probe depth for the PQ-served vector leg: same depth as the IVF-Flat
# leg (_ANN_PROBE, queries_r9) — the coarse quantizer is the SAME
# model, so the two served hybrids stay probe-comparable. CALIBRATED
# (SCALE.md "Round-10", scripts/ann_probe_tradeoff.py): the PQ leg's
# recall plateaus from n_probe=8-10 (0.833/0.9 at sf0.001/sf0.01) —
# past the knee the ceiling is the ADC shortlist's depth, not the
# probe count (deeper probing only adds ADC-favoured impostors to a
# fixed-depth shortlist; the sf0.01 0.967->0.900 dip in the table).
_ANNPQ_PROBE = 10
# ADC shortlist depth for the exact re-rank: q_cosine_ivfpq's 50 — the
# recall knob for this path (see the calibration adjudication); the
# exact scorer touches queries x 50 float rows, never the corpus.
_ANNPQ_RERANK = 50


def _ivfpq_shortlist_df(spark, sf_dir, qrows,
                        n_probe=_ANNPQ_PROBE, rerank=_ANNPQ_RERANK):
    """The ADC shortlist stage of the PQ-served vector leg, as a lazy
    DataFrame (query_id, vec_id): probed-list-pruned scan of the
    persisted CODE artifact + broadcast-ADC scoring + per-query
    window top-rerank. Split out so the plan-pin test can ``explain``
    this stage — at query time it is executed eagerly (collected) by
    :func:`_ivfpq_topk_served`, so the probed In(__list) scan never
    appears in the FINAL plan. Probe selection runs driver-side on the
    n_lists×dim centroid matrix with the same int64 quantization as
    the distributed argmax, mapping matrix row -> centroid id through
    the sorted cid list. Also returns the query-vector rows for the
    re-rank stage."""
    import numpy as np

    from etl_data_processor_spark.ops.dedup import artifact_location
    from etl_data_processor_spark.queries_ext3 import ivfpq_index_artifact

    cents, books, _index, key = ivfpq_index_artifact(spark, sf_dir)
    cents_sorted = sorted(cents)
    C = SIM._quantized_centroid_matrix(cents_sorted)
    cids = [int(cid) for cid, _ in cents_sorted]
    m_sub, k_codes, d_sub = len(books), len(books[0]), len(books[0][0])
    B = np.array(books, dtype=np.float64)

    probes, tables, qvec_rows = [], [], []
    for r in qrows:
        qv = np.asarray(list(r["embedding"]), dtype=np.float64)
        qq = np.floor(qv * SIM._Q + 0.5).astype(np.int64)
        dots = C @ qq
        order = sorted(range(len(dots)), key=lambda c: (-dots[c], c))
        for row_idx in order[:n_probe]:
            probes.append((int(r["vec_id"]), cids[row_idx]))
        # asymmetric-distance table: the query's dot against every
        # codebook centroid (m_sub × k_codes floats — model-sized)
        flat = []
        for s in range(m_sub):
            qs = qv[s * d_sub:(s + 1) * d_sub]
            flat.extend(float(x) for x in (B[s] @ qs))
        tables.append((int(r["vec_id"]), flat))
        qvec_rows.append(
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        )

    probed_lists = sorted({c for _, c in probes})
    idx = read_parquet_memo(spark, artifact_location(spark, key)).filter(
        F.col("__list").isin(probed_lists)
    )
    probe_df = F.broadcast(
        spark.createDataFrame(probes, "query_id long, __list long")
    )
    tdf = F.broadcast(
        spark.createDataFrame(tables, "query_id long, __tbl array<double>")
    )
    score = F.expr(
        f"aggregate(sequence(0, {m_sub - 1}), 0D, (acc, i) -> "
        f"acc + element_at(__tbl, CAST(i * {k_codes} + "
        f"element_at(codes, i + 1) + 1 AS INT)))"
    )
    scored = (
        idx.join(probe_df, "__list")
        .join(tdf, "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", score.alias("__s"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__s"), F.asc("vec_id"))
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= rerank)
        .select("query_id", "vec_id")
    )
    return shortlist, qvec_rows


def _ivfpq_topk_served(spark, sf_dir, qrows, k,
                       n_probe=_ANNPQ_PROBE, rerank=_ANNPQ_RERANK):
    """IVF×PQ top-k with every corpus-sized input read from persisted
    artifacts — the PQ upgrade of queries_r9._ivf_topk_served:

    - centroids + codebooks from the on-disk model store (no k-means or
      Lloyd pass in a cold session — pinned in tests);
    - the (vec_id, codes, __list) CODE index from the cached_df
      artifact, scanned with the probed-list IN-filter PUSHED into the
      parquet scan (the scan reads ~n_probe/n_lists of 16-byte rows);
    - ADC scoring via the broadcast per-query dot-table, pure-JVM fold
      (no floats decoded in the probed scan);
    - the shortlist (<= queries × rerank ids — the fetch list a serving
      frontend holds) re-ranks EXACTLY against float vectors read back
      by id PUSHDOWN: the only embeddings.parquet touch is an
      In(vec_id, shortlist) scan, never a corpus scan.

    ``qrows`` is the collected query rows (vec_id, embedding)."""
    shortlist_df, qvec_rows = _ivfpq_shortlist_df(
        spark, sf_dir, qrows, n_probe=n_probe, rerank=rerank
    )
    shortlist_rows = shortlist_df.collect()
    # exact re-rank: fetch ONLY the shortlist vectors by id pushdown —
    # the embeddings scan carries In(vec_id, [<= queries*rerank ids])
    sl_ids = sorted({int(r["vec_id"]) for r in shortlist_rows})
    pairs = [(int(r["query_id"]), int(r["vec_id"])) for r in shortlist_rows]
    emb_short = (
        read_parquet_memo(spark, f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id").isin(sl_ids))
        .select("vec_id", "embedding")
    )
    pairs_df = F.broadcast(
        spark.createDataFrame(pairs, "query_id long, vec_id long")
    )
    qvecs = F.broadcast(
        spark.createDataFrame(qvec_rows, "query_id long, __qvec array<float>")
    )
    exact = (
        pairs_df.join(emb_short, "vec_id")
        .join(qvecs, "query_id")
        .withColumn("__c", SIM.dec_cosine(F.col("embedding"), F.col("__qvec")))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("__c"), F.asc("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank")
    )


@q("q_hybrid_annpq_served")  # rows-only: the IVF×PQ vector leg is approximate
def q_hybrid_annpq_served(spark, sf_dir):
    """Hybrid retrieval (BM25 + IVF×PQ cosine, RRF-fused) with both legs
    served from persisted artifacts AND no corpus-sized artifact in the
    read set (VERDICT r9 item 1). vs q_hybrid_ann_served (IVF-Flat):
    the vector leg's big scan reads the 16-byte-code index — 16× smaller
    than the float lists — and the float vectors are touched only for
    the <= queries×rerank shortlist, by id pushdown. Query-time reads
    (all plan-pinned in tests/test_r10_ops.py): posting shards + doclen
    sidecar (token IN-filter pushed), PQ code artifact (probed-list
    IN-filter pushed), shortlist vectors (id IN-filter pushed), query
    docs/vectors (id IN-filter pushed). Fusion, depths and tie rules
    are q_hybrid_rrf_served's verbatim; fused recall >= 0.8 vs that
    exact twin is pinned in pytest."""
    from etl_data_processor_spark.ops.invindex import (
        bm25_batch_scores_from_index,
    )
    from etl_data_processor_spark.ops.text import tokenize
    from etl_data_processor_spark.queries_r6b import (
        _FUSED_K,
        _LEG_K,
        _RRF_K,
        _RRF_QUERIES,
    )

    d = _cat(spark, sf_dir).documents
    emb = _cat(spark, sf_dir).embeddings
    qids = list(_RRF_QUERIES)

    # query-side reads: ONLY the query docs/vectors (id IN-filter pushes)
    qdoc_rows = (
        d.filter(F.col("doc_id").isin(qids))
        .select("doc_id", tokenize(F.col("text")).alias("toks"))
        .collect()
    )
    query_terms = {r["doc_id"]: list(set(r["toks"])) for r in qdoc_rows}
    qvec_rows = emb.filter(F.col("vec_id").isin(qids)).select(
        "vec_id", "embedding"
    ).collect()

    lex_scored = bm25_batch_scores_from_index(
        spark, f"{sf_dir}/documents.parquet", query_terms
    )
    wl = Window.partitionBy("query_id").orderBy(F.desc("sq"), F.asc("doc_id"))
    lex = (
        lex_scored.withColumn("lex_rank", F.row_number().over(wl))
        .filter(F.col("lex_rank") <= _LEG_K)
        .select("query_id", "doc_id", "lex_rank")
    )

    vec = _ivfpq_topk_served(spark, sf_dir, qvec_rows, _LEG_K).select(
        "query_id", F.col("vec_id").alias("doc_id"),
        F.col("rank").alias("vec_rank"),
    )

    fused = lex.join(vec, ["query_id", "doc_id"], "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("vec_rank")), F.lit(0.0)
    )
    fused = fused.withColumn("rrf", rrf).withColumn(
        "rrf_q", F.floor(F.col("rrf") * F.lit(1e12) + F.lit(0.5)).cast("long")
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_q"), F.asc("doc_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf))
        .filter(F.col("fused_rank") <= _FUSED_K)
        .select(
            "query_id", "doc_id",
            SIM.stable_round6(F.col("rrf")).alias("rrf6"),
            "fused_rank", "lex_rank", "vec_rank",
        )
    )
