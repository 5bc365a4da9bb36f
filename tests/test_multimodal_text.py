"""Tests for multimodal blob plumbing and text-analysis operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_processor_spark.ops import multimodal as MM
from etl_data_processor_spark.ops import text as T


def test_blob_roundtrip_and_metadata(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "")], ["doc_id", "text"])
    out = df.select(
        "doc_id",
        MM.to_blob(F.col("text")).alias("blob"),
        MM.blob_metadata(MM.to_blob(F.col("text"))).alias("meta"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert bytes(by_id[1].blob) == b"hello"
    assert by_id[1].meta.n_bytes == 5
    assert by_id[1].meta.media_type == "text/plain"
    assert by_id[2].meta.n_bytes == 0


def test_fake_feature_extractor(spark):
    df = spark.createDataFrame([(1, "abcd xyz"), (2, "")], ["doc_id", "text"])
    blobs = df.select("doc_id", MM.to_blob(F.col("text")).alias("blob"))
    feats = {r.doc_id: r for r in MM.fake_feature_extractor(blobs).collect()}
    assert feats[1].n_bytes == 8
    assert feats[1].first_byte == ord("a")
    assert feats[1].last_byte == ord("z")
    assert feats[1].head_hex == b"abcd".hex()
    assert feats[2].n_bytes == 0
    assert feats[2].first_byte == -1


def test_decode_image_is_documented_stub():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG")


def test_language_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is warm"),
            (2, "el perro y el gato en la casa con los ninos"),
            (3, "zzz qqq www"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.lang for r in df.select(
        "doc_id", T.language_id(F.col("text")).alias("lang")
    ).collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] is None


def test_fingerprint_stable_under_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other")], ["doc_id", "text"]
    )
    fps = {r.doc_id: r.fp for r in df.select(
        "doc_id", T.fingerprint(F.col("text")).alias("fp")
    ).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_quality_score_ordering(spark):
    df = spark.createDataFrame(
        [
            (1, "a good long document " * 20),
            (2, "x"),
            (3, "!!! ??? ;;; ,,, ..."),
        ],
        ["doc_id", "text"],
    )
    q = {r.doc_id: r.q for r in df.select(
        "doc_id", T.quality_score(F.col("text")).alias("q")
    ).collect()}
    assert q[1] > q[2]
    assert q[3] == 0.0
