"""etl_data_processor_spark — a PySpark-native ETL/analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference ETL pipeline (Mitkobochev/etl-data-processor,
surveyed in SURVEY.md), generalized into a tested operator library:

- ``session``     — SparkSession factory tuned for scale (AQE, Arrow, broadcast).
- ``io``          — batch sources/sinks (parquet/csv/json) + table catalog.
- ``ops.scalar``  — pure Column-expression functions (classify, dates, regex,
                    string/math/null handling) mirroring reference semantics.
- ``ops.relational`` — joins, aggregates, windows, set ops, sort/top-k, dedup.
- ``ops.arrays``  — array/map/JSON functions and vector math.
- ``ops.text``    — text analysis: tokenization, language-ID, quality, fingerprints.
- ``ops.dedup``   — exact + MinHash-LSH + SimHash + n-gram-Jaccard near-dup.
- ``ops.similarity`` — embedding cosine top-k (exact + LSH-bucketed scale path).
- ``ops.enrich``  — chunked, rate-limited, error-isolated batch enrichment
                    (distinct → mapInPandas → left-join-back) with pluggable client.
- ``ops.asof``    — as-of / range joins.
- ``ops.multimodal`` — binary-blob column plumbing (decode stubbed).
- ``streaming``   — Structured Streaming windows/watermark/session/dedup.
- ``pipelines.medicines`` — the reference's end-to-end pipeline semantics on a
                    synthetic fixture (golden test).

Everything is public-Spark-surface only: DataFrame/SQL + Catalyst; no custom
optimizer rules, no RDDs in hot paths, no collect() inside operators.
"""

__version__ = "0.1.0"

from etl_data_processor_spark.session import get_spark  # noqa: F401
from etl_data_processor_spark.io import Catalog  # noqa: F401
