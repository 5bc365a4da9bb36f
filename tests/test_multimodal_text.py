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


def test_resize_images_plumbing(spark):
    df = spark.createDataFrame(
        [(1, "x" * 100), (2, "ab"), (3, "")], ["doc_id", "text"]
    )
    blobs = df.select("doc_id", MM.to_blob(F.col("text")).alias("blob"))
    out = {r.doc_id: r for r in MM.resize_images(blobs, 4, 3).collect()}
    # every output is exactly width*height bytes, regardless of input size
    assert all(len(bytes(r.resized_blob)) == 12 for r in out.values())
    assert out[1].width == 4 and out[1].height == 3
    assert bytes(out[1].resized_blob) == b"x" * 12          # stride-sampled
    assert bytes(out[2].resized_blob) == b"ab" + b"\x00" * 10  # zero-padded
    assert bytes(out[3].resized_blob) == b"\x00" * 12


def test_sample_frames_fan_out(spark):
    # 100 bytes -> 7 frames of 16 (last one short); every 2nd -> idx 0,2,4,6
    df = spark.createDataFrame([(1, "v" * 100), (2, "")], ["doc_id", "text"])
    blobs = df.select("doc_id", MM.to_blob(F.col("text")).alias("blob"))
    rows = MM.sample_frames(blobs, every_k=2, frame_size=16).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted(r.frame_idx for r in by_doc[1]) == [0, 2, 4, 6]
    assert all(r.n_frames_total == 7 for r in by_doc[1])
    full = [r for r in by_doc[1] if r.frame_idx < 6]
    assert all(len(bytes(r.frame_blob)) == 16 for r in full)
    last = [r for r in by_doc[1] if r.frame_idx == 6][0]
    assert len(bytes(last.frame_blob)) == 100 - 6 * 16
    assert 2 not in by_doc  # empty video yields no frames


def test_metadata_only_query_prunes_blob_column(spark, sf_dir, tmp_path):
    """The 100 TB rule the module docstring promises: a query touching only
    the metadata struct must not read blob bytes from parquet."""
    import io as _io
    from contextlib import redirect_stdout

    p = str(tmp_path / "blobs.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    docs.select(
        "doc_id",
        MM.to_blob(F.col("text")).alias("blob"),
        MM.blob_metadata(MM.to_blob(F.col("text"))).alias("meta"),
    ).write.mode("overwrite").parquet(p)
    q = spark.read.parquet(p).select("doc_id", "meta.n_bytes")
    buf = _io.StringIO()
    with redirect_stdout(buf):
        q.explain("formatted")
    read_schema = buf.getvalue().split("ReadSchema:")[1].split("\n")[0]
    assert "blob" not in read_schema
    assert q.count() == 50


def test_fuzzy_key_pairs_band_is_lossless(spark, sf_dir):
    # brute-force model over the distinct key set
    from etl_data_processor_spark.io import Catalog
    from etl_data_processor_spark.ops.text import fuzzy_key_pairs

    part = Catalog(spark, sf_dir).part
    keys = sorted({r["p_name"] for r in part.select("p_name").distinct().collect()})

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    expected = {
        (a, b, lev(a, b))
        for i, a in enumerate(keys)
        for b in keys[i + 1 :]
        if lev(a, b) <= 2
    }
    got = {
        (r["key_a"], r["key_b"], r["dist"])
        for r in fuzzy_key_pairs(part, "p_name", max_dist=2).collect()
    }
    assert got == expected
    assert len(got) == len({(a, b) for a, b, _ in got}), "pair emitted twice"


def test_repetition_stats_handcrafted(spark):
    from etl_data_processor_spark.ops.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a a a a"),      # 4 tokens, 1 distinct; "a a" bigram 3/3
            (2, "a b c"),        # all distinct; each bigram once -> 1/2
            (3, "solo"),         # single token: no bigram, share 0
            (4, "x y x y x"),    # "x y" twice of 4 bigrams -> 0.5
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["n_tokens"] == 4
    assert rows[1]["distinct_ratio"] == 0.25
    assert rows[1]["top_bigram_share"] == 1.0
    assert rows[2]["distinct_ratio"] == 1.0
    assert rows[2]["top_bigram_share"] == 0.5
    assert rows[3]["top_bigram_share"] == 0.0
    assert rows[4]["top_bigram_share"] == 0.5
