"""Unit tests for reference-semantics scalar ops (SURVEY.md §2 Part A),
including the Java-regex lookbehind precedence that can't go through the
RE2-based DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_processor_spark.ops import scalar as S


def test_decision_classify_lookbehind_precedence(spark):
    """A5 (main.py:121-131): 'Ikke anbefalet' must NOT classify as 'Anbefalet'
    even when the plain pattern is evaluated (negative lookbehind)."""
    df = spark.createDataFrame(
        [
            ("Anbefalet af rådet",),
            ("Ikke anbefalet",),
            ("Delvist anbefalet",),
            ("ikke  anbefalet (extra space)",),
            ("no match here",),
        ],
        ["text"],
    )
    out = df.select(
        S.classify_first_match(F.col("text"), S.DECISION_PATTERNS).alias("status")
    ).collect()
    assert [r.status for r in out] == [
        "Anbefalet",
        "Ikke anbefalet",
        "Delvist anbefalet",
        "Ikke anbefalet",
        None,
    ]


def test_conditional_concat(spark):
    """A4 (main.py:114-118)."""
    df = spark.createDataFrame([("/rel",), ("https://abs/x",)], ["u"])
    out = df.select(S.conditional_concat(F.col("u"), "https://b").alias("url")).collect()
    assert [r.url for r in out] == ["https://b/rel", "https://abs/x"]


def test_split_first_separator(spark):
    """A7 (main.py:147-156): first of ' - ', ' – ', ' — '; no-sep -> tail NULL."""
    df = spark.createDataFrame(
        [("Drug - Indication",), ("Drug – Indi - cation",), ("NoSeparator",)], ["h"]
    )
    head, tail = S.split_first_separator(F.col("h"))
    out = df.select(head.alias("head"), tail.alias("tail")).collect()
    assert (out[0].head, out[0].tail) == ("Drug", "Indication")
    assert (out[1].head, out[1].tail) == ("Drug", "Indi - cation")
    assert (out[2].head, out[2].tail) == ("NoSeparator", None)


def test_normalize_danish_date(spark):
    """A9 (main.py:217-232): Danish month map + zero-padded day."""
    df = spark.createDataFrame(
        [
            ("Godkendt den 5. marts 1997",),
            ("Godkendt den 28 oktober 2023",),
            ("Godkendt den 5. notamonth 1997",),
            ("irrelevant",),
        ],
        ["t"],
    )
    out = df.select(S.normalize_danish_date(F.col("t")).alias("d")).collect()
    assert [r.d for r in out] == ["1997-03-05", "2023-10-28", None, None]


def test_fallback_date(spark):
    """A10 (main.py:246-256): d.m.yyyy first, then yyyy.m.d."""
    df = spark.createDataFrame(
        [("seen 5.3.1997 ok",), ("on 1997-03-05",), ("nothing",)], ["t"]
    )
    out = df.select(S.fallback_date(F.col("t")).alias("d")).collect()
    assert [r.d for r in out] == ["5.3.1997", "1997-03-05", None]


def test_extract_atc_code(spark):
    """A11 (main.py:234-244)."""
    df = spark.createDataFrame(
        [("code A10BX77 here",), ("lower a10bx77 no",), ("none",)], ["t"]
    )
    out = df.select(S.extract_atc_code(F.col("t")).alias("c")).collect()
    assert [r.c for r in out] == ["A10BX77", None, None]


def test_ceil_div(spark):
    """A2 (main.py:63-83)."""
    df = spark.createDataFrame([(0,), (1,), (25,), (26,), (228,)], ["n"])
    out = df.select(S.ceil_div(F.col("n"), 25).alias("p")).collect()
    assert [r.p for r in out] == [0, 1, 1, 2, 10]


def test_coalesce_chain_empty_is_missing(spark):
    """A8: '' counts as missing (reference treats '' and None alike)."""
    df = spark.createDataFrame([("", "b"), (None, "c"), ("a", "x")], ["p", "s"])
    out = df.select(S.coalesce_chain(F.col("p"), F.col("s")).alias("r")).collect()
    assert [r.r for r in out] == ["b", "c", "a"]
