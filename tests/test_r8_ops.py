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
