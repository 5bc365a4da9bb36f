"""Round-8 batch: INDEX-SERVED retrieval (VERDICT r7 item 3).

The r6 retrieval keys (q_bm25 / q_hybrid_rrf / q_prf_expand) are honest
scorers but re-derive term frequencies from the corpus on every run;
the persisted, incrementally-maintained posting-shard artifact existed
(ops/invindex.py) with nothing registered that SERVES from it. "At
100 TB an index you rebuild per query isn't an index." This batch
registers the serving path: score from the shard artifact + the
(doc_id, dl) sidecar, query-term filter pushed into the artifact scan,
corpus text never read at query time. The corpus-scan scorer q_bm25
stays registered as the differential twin; both share the same DuckDB
oracle because the scoring arithmetic is bit-identical.

House rules: deterministic, DuckDB-oracled on the same parquet, exact
integers until one final libm pair, constant-size reports.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_processor_spark import queries_ext3 as _ext3  # noqa: F401
from etl_data_processor_spark.registry import ORACLE, q

# _ext3 import guarantees q_bm25's oracle is registered before this
# module aliases it, whatever order a consumer imports query modules.

# Same query-term set as q_bm25 — shared oracle requires shared inputs.
_BM25_TERMS = ("spark", "hash", "window")


def _bm25_served_oracle() -> str:
    """q_bm25's oracle verbatim: the index-served scorer must produce
    EXACTLY the corpus-scan scorer's rows (that equality is the whole
    correctness claim of a lossless index)."""
    return ORACLE["q_bm25"]


@q("q_bm25_served", _bm25_served_oracle())
def q_bm25_served(spark, sf_dir):
    """BM25 top-20 SERVED from the persisted inverted-index shards +
    doc-length sidecar (ops/invindex.py:bm25_from_index). Query-time
    plan: a parquet scan of the shard artifact with the token IN-filter
    PUSHED (only the 3 query terms' postings are read), gap-decode of
    those postings in codegen, a broadcast of the term df table and the
    two corpus scalars, one per-doc integer sum, TakeOrdered top-20.
    documents.parquet is NOT scanned (plan-pinned in
    tests/test_invindex.py); the artifacts are built once per corpus
    version and maintained incrementally on append (delta-merge
    bit-identity pinned in the same file). Scoring arithmetic is
    q_bm25's to the bit, so this key shares q_bm25's oracle — the
    driver independently proves served == scanned every round."""
    from etl_data_processor_spark.ops.invindex import bm25_from_index

    return bm25_from_index(
        spark, f"{sf_dir}/documents.parquet", _BM25_TERMS
    )


def _phrase_served_oracle() -> str:
    """q_phrase_search's oracle verbatim — served == scanned is the
    lossless-positional-index claim."""
    from etl_data_processor_spark import queries_r3 as _r3  # noqa: F401

    return ORACLE["q_phrase_search"]


@q("q_phrase_search_served", _phrase_served_oracle())
def q_phrase_search_served(spark, sf_dir):
    """Exact phrase search ("value table") SERVED from the persisted
    POSITIONAL index artifact (ops/invindex.py:phrase_search_from_index)
    — q_bm25_served's sibling for the positional-retrieval primitive.
    Query-time plan: a raw parquet scan of the positional shards with
    the two phrase terms' IN-filter pushed, gap-decode + position
    explode of just those postings, a per-term (doc, pos - i) equi-join
    for adjacency, one per-doc count. documents.parquet is never
    scanned at query time; the artifact maintains incrementally on
    append (the inverted_index_shards contract, pinned in
    tests/test_invindex.py). Shares q_phrase_search's oracle — the
    driver proves served == scanned every round."""
    from etl_data_processor_spark.ops.invindex import phrase_search_from_index

    return phrase_search_from_index(
        spark, f"{sf_dir}/documents.parquet", ("value", "table")
    )
