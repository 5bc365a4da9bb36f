"""Multimodal column plumbing (north star B33).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The Spark-side machinery is real and tested — schema, Arrow-batched
``mapInPandas`` feature extraction, partition-friendly shapes — while the
actual media decode is stubbed (codec libraries are not in this container):

- ``decode_image`` raises NotImplementedError by design; swap in a real
  decoder (PIL/ffmpeg) in production.
- ``fake_feature_extractor`` is the deterministic stand-in used by tests
  and oracles: features computed from the raw bytes only.

At 100 TB the rules encoded here: blobs travel as parquet binary (never
strings), metadata lives in a sibling struct so pruning works (a query that
reads only metadata must not fetch blobs — parquet column pruning gives
this for free), and per-batch Python cost is amortized via Arrow batch
size, not per-row UDF calls.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def to_blob(text: Column) -> Column:
    """Encode a string column as a binary blob (UTF-8) — the test stand-in
    for real media bytes."""
    return F.encode(text, "UTF-8")


def blob_metadata(blob: Column, media_type: str = "text/plain") -> Column:
    """Typed metadata struct computed JVM-side: size + media type + stable
    content id. Queries touching only this struct never decode the blob."""
    return F.struct(
        F.octet_length(blob).cast("long").alias("n_bytes"),
        F.lit(media_type).alias("media_type"),
        F.xxhash64(blob).alias("content_id"),
    )


def decode_image(blob_bytes: bytes) -> object:
    """Real decoder goes here (PIL.Image.open / soundfile / ffmpeg).
    Deliberately stubbed: the container ships no codec libraries."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this "
        "environment; use fake_feature_extractor for the tested path"
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("last_byte", LongType()),
        StructField("head_hex", StringType()),
    ]
)


def fake_feature_extractor(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Deterministic byte-level 'feature extraction' over Arrow batches —
    the real UDF signature/batching/partitioning with a fake body.
    Production swaps the per-batch body for decode + model inference; the
    Spark plumbing (mapInPandas over binary, struct-typed output, batch
    amortization) is exactly what ships."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": blobs.map(len).astype("int64"),
                    "first_byte": blobs.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int64"),
                    "last_byte": blobs.map(
                        lambda b: b[-1] if len(b) else -1
                    ).astype("int64"),
                    "head_hex": blobs.map(lambda b: bytes(b[:4]).hex()),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(extract, FEATURE_SCHEMA)
