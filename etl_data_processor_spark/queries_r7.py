"""Round-7 extension batch: low-volume fuzzy-candidate generation
(PassJoin segment blocking) — the round's linkage-family rework.

House rules as ever: deterministic, DuckDB-oracled on the same parquet,
and shaped for 100 TB — candidate generation is an equi-join on a
derived key, verification is one codegen levenshtein per candidate, and
no Python touches the hot path.
"""

from __future__ import annotations

from etl_data_processor_spark.ops import text as T
from etl_data_processor_spark.registry import cat as _cat
from etl_data_processor_spark.registry import q

# =====================================================================
# Fuzzy key matching, PassJoin scale path (B50 ext; VERDICT r6 item 2)
# =====================================================================


@q(
    "q_fuzzy_passjoin",
    """
    WITH k AS (SELECT DISTINCT p_name AS key FROM part)
    SELECT a.key AS key_a, b.key AS key_b,
           CAST(levenshtein(a.key, b.key) AS INTEGER) AS dist
    FROM k a JOIN k b ON a.key < b.key
    WHERE levenshtein(a.key, b.key) <= 2
    """,
)
def q_fuzzy_passjoin(spark, sf_dir):
    """q_fuzzy_match's exact output through PASSJOIN segment blocking
    (Li, Deng & Feng 2011, public; ops.text.fuzzy_key_pairs_passjoin):
    each key indexes its 3 even segments and probes with the
    position-windowed substrings of partner-length segments — 3 index +
    <= ~75 probe keys per key instead of the ~170 deletion variants PER
    SIDE of q_fuzzy_symdelete, i.e. ~4x less candidate-join exchange
    volume with the identical lossless guarantee (pigeonhole: <= 2 edits
    leave one of 3 segments untouched, and it occurs in the partner
    shifted by <= 2). The oracle is the same NAIVE all-pairs SQL, so a
    green differential PROVES the blocking lossless on a real text
    column. Honest tradeoff, measured (NOTES_r7): explode volume is ~4x
    lower but candidate PRECISION depends on segment entropy — short
    segments among the linkage fixture's sequential-ID names were 14x
    less selective than full-length deletion variants (18.0M vs ~1.25M
    candidates at sf0.1, forward or reversed), so the linkage family
    keeps symdelete and this key registers PassJoin as the alternative
    for HIGH-entropy key domains where the exchange volume, not the
    verify, dominates. All three blocking strategies stay registered:
    length band (cheapest per key at small scale), symmetric delete
    (precision-robust), PassJoin (lowest explode volume)."""
    return T.fuzzy_key_pairs_passjoin(
        _cat(spark, sf_dir).part, "p_name", max_dist=2
    )
