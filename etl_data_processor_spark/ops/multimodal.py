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


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("resized_blob", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Image resize plumbing: binary in -> binary out through Arrow batches.

    The Spark-side contract is production-shaped: one ``mapInPandas`` pass,
    blobs never leave binary form, output size is width*height bytes per
    row, and per-batch Python cost amortizes over the Arrow batch. The
    "resize" body is the deterministic stand-in (stride-sample the byte
    stream to exactly width*height bytes, zero-padded) — production swaps
    in a real decoder + PIL/opencv resize per `decode_image`'s note without
    touching the Spark plumbing."""
    n_out = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for b in pdf[blob_col]:
                b = bytes(b)
                if len(b) >= n_out:
                    stride = len(b) // n_out
                    sampled = b[:: stride][:n_out]
                else:
                    sampled = b
                outs.append(sampled + b"\x00" * (n_out - len(sampled)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "resized_blob": outs,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(resize, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_blob", BinaryType()),
        StructField("n_frames_total", LongType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_k: int = 2,
    frame_size: int = 16,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Video frame-sampling plumbing: one input row fans out to one row per
    sampled frame — the shape a real decoder produces (ffmpeg keyframe
    extraction), with the decode stubbed as fixed-size byte chunking.

    The scale-relevant properties are real: ``mapInPandas`` may yield MORE
    rows than it consumes (fan-out inside the Arrow iterator, no explode of
    a driver-built array), frames stay binary end-to-end, and the sampling
    stride bounds output volume to |video| / (every_k * frame_size) rows.
    At 100 TB the downstream repartition decision belongs to the caller:
    frames inherit the video's partition, which is right for per-video
    models and wrong for global shuffles."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs, totals = [], [], [], []
            for doc_id, b in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(b)
                n_frames = max((len(b) + frame_size - 1) // frame_size, 0)
                for i in range(0, n_frames, every_k):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    blobs.append(b[i * frame_size : (i + 1) * frame_size])
                    totals.append(n_frames)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_blob": blobs,
                    "n_frames_total": pd.Series(totals, dtype="int64"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(frames, FRAME_SCHEMA)
