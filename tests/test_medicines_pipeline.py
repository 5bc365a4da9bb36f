"""Golden end-to-end test: the reference pipeline semantics (SURVEY.md §5.2)
on the synthetic medicines fixture, checked against a committed golden CSV.
"""

from __future__ import annotations

import csv
import os

from etl_data_processor_spark.pipelines.medicines import (
    OUTPUT_COLUMNS,
    run_pipeline,
    synthetic_cards,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "medicines_output.csv")


def _result_rows(spark):
    out = run_pipeline(synthetic_cards(spark, 40))
    assert out.columns == OUTPUT_COLUMNS
    rows = [
        tuple("" if v is None else str(v) for v in r)
        for r in out.collect()
    ]
    return sorted(rows)


def test_pipeline_matches_golden(spark):
    got = _result_rows(spark)
    with open(GOLDEN, newline="", encoding="utf-8") as f:
        reader = csv.reader(f)
        header = next(reader)
        want = sorted(tuple(r) for r in reader)
    assert header == OUTPUT_COLUMNS
    assert got == want


def test_pipeline_semantics(spark):
    """Branch checks independent of the golden file."""
    out = run_pipeline(synthetic_cards(spark, 40)).collect()
    # 40 cards: i%4==3 unmatched (dropped), i%4==1 'Ikke anbefalet' (filtered)
    # -> only i%4 in {0, 2} survive = 20 rows
    assert len(out) == 20
    by_ai = {r["Active Ingredient"]: r for r in out}
    # enrichment stub: first token uppercased; heading 'Drug0 - ...' -> DRUG0
    assert "DRUG0" in by_ai
    r0 = by_ai["DRUG0"]
    # i=0: danish date 'Godkendt den 1. januar 2020' -> 2020-01-01
    assert r0["Decision Date"] == "2020-01-01"
    assert r0["Indication"] == "Behandling af tilstand 0"
    # i=0: i%5==0 -> no ATC token in detail text
    assert r0["ATC Code"] is None
    # i=2 ('Delvist anbefalet', sep ' — '): present with fallback-free fields
    assert "DRUG2" in by_ai
    # i=34: i%4==2 keeps it, i%3==1 -> fallback date d.m.yyyy form kept raw
    # (the reference's weak date typing, main.py:246-256)
    r34 = by_ai.get("DRUG34")
    assert r34 is not None and r34["Decision Date"] == "7.11.2024"


def test_csv_sink_roundtrip(spark, tmp_path):
    """A17: CSV sink writes header + all rows; read-back matches."""
    from etl_data_processor_spark.io import read_csv, write_csv

    out = run_pipeline(synthetic_cards(spark, 40))
    path = str(tmp_path / "medicines_csv")
    write_csv(out, path)
    back = read_csv(spark, path)
    assert sorted(back.columns) == sorted(OUTPUT_COLUMNS)
    assert back.count() == out.count()
