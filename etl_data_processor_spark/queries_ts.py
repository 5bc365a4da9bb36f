"""Time-series and corpus-statistics queries: forward-fill, gap-fill /
resampling, exact percentiles, TF-IDF. All shapes a telemetry or corpus
pipeline runs daily; all expressed as window/sequence/join primitives that
scale (no driver-side loops, no UDFs).

No reference counterpart (absent from main.py:1-422); extended surface in
the spirit of SURVEY.md §2 Part B.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_data_processor_spark.registry import q, cat as _cat
from etl_data_processor_spark.ops.exact import dsum, sql_dsum
from etl_data_processor_spark.ops.similarity import stable_round6

_SQL_ROUND6 = "CAST(FLOOR(({x}) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0"


@q(
    "q_ts_fill",
    """
    SELECT event_id, user_id,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
          FROM events)
    """,
)
def q_ts_fill(spark, sf_dir):
    """Forward-fill (last-observation-carried-forward) per user: sensor
    readings during 'error' events are nulled, then filled from the most
    recent good value. One window over (user, time) — a single hash
    partition on user_id at any scale; tie-broken by event_id so the result
    is deterministic under re-partitioning. (ts is the sort key but not an
    output column: the fixture stores TIMESTAMP(NANOS), which the two
    engines surface at different precisions.)"""
    ev = _cat(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(
            F.when(F.col("event_type") != "error", F.col("value")), ignorenulls=True
        )
        .over(w)
        .alias("filled"),
    )


@q(
    "q_ts_gapfill",
    f"""
    WITH bounds AS (
        SELECT (FLOOR(epoch(MIN(ts)) / 900) * 900)::BIGINT AS lo,
               (FLOOR(epoch(MAX(ts)) / 900) * 900)::BIGINT AS hi
        FROM events
    ),
    buckets AS (SELECT unnest(range(lo, hi + 900, 900)) AS bucket_epoch FROM bounds),
    dims AS (SELECT DISTINCT event_type FROM events),
    agg AS (
        SELECT (FLOOR(epoch(ts) / 900) * 900)::BIGINT AS bucket_epoch,
               event_type, COUNT(*) AS n, {sql_dsum('value')} AS total
        FROM events GROUP BY 1, 2
    )
    SELECT b.bucket_epoch, d.event_type,
           COALESCE(a.n, 0) AS n, COALESCE(a.total, 0.0) AS total
    FROM buckets b CROSS JOIN dims d
    LEFT JOIN agg a ON a.bucket_epoch = b.bucket_epoch AND a.event_type = d.event_type
    """,
)
def q_ts_gapfill(spark, sf_dir):
    """Resample to a dense 15-minute grid per event type: aggregate into
    epoch-aligned buckets, generate the full bucket × type grid with
    ``sequence``+``explode`` (no driver loop — the grid is itself a
    DataFrame), left-join and zero-fill gaps. At 100 TB the grid side is
    tiny (time-range/900 × |types|) and broadcasts; the only big shuffle is
    the bucket aggregation."""
    ev = _cat(spark, sf_dir).events
    bucket = (F.floor(F.unix_timestamp("ts") / 900) * 900).cast("long")
    agg = ev.groupBy(
        bucket.alias("bucket_epoch"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total"))
    bounds = ev.agg(
        F.min(bucket).alias("lo"), F.max(bucket).alias("hi")
    )
    buckets = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(900))).alias("bucket_epoch")
    )
    dims = ev.select("event_type").distinct()
    grid = buckets.crossJoin(dims)
    return grid.join(agg, ["bucket_epoch", "event_type"], "left").select(
        "bucket_epoch",
        "event_type",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.col("total"), F.lit(0.0)).alias("total"),
    )


@q(
    "q_percentile_exact",
    f"""
    SELECT event_type,
           {_SQL_ROUND6.format(x="quantile_cont(value, 0.25)")} AS p25,
           {_SQL_ROUND6.format(x="quantile_cont(value, 0.5)")} AS p50,
           {_SQL_ROUND6.format(x="quantile_cont(value, 0.75)")} AS p75
    FROM events GROUP BY event_type
    """,
)
def q_percentile_exact(spark, sf_dir):
    """Exact (interpolated) quartiles per group — B13's exact counterpart.
    Both engines interpolate lower+(upper-lower)*frac over the sorted
    values; stable 6-decimal rounding absorbs any final-ulp difference.
    Exact percentile is a full sort per group — at 100 TB prefer
    percentile_approx (q_agg_approx) unless exactness is contractual."""
    ev = _cat(spark, sf_dir).events
    return ev.groupBy("event_type").agg(
        stable_round6(F.percentile("value", F.lit(0.25))).alias("p25"),
        stable_round6(F.percentile("value", F.lit(0.5))).alias("p50"),
        stable_round6(F.percentile("value", F.lit(0.75))).alias("p75"),
    )


@q(
    "q_text_tfidf",
    f"""
    WITH tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        ) GROUP BY doc_id, token
    ),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, token, tf,
           {_SQL_ROUND6.format(x="tf * ln(n_docs / df)")} AS tfidf
    FROM tf JOIN df USING (token) CROSS JOIN n
    WHERE doc_id < 50
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tf * ln(n_docs / df) DESC, token ASC
    ) <= 5
    """,
)
def q_text_tfidf(spark, sf_dir):
    """TF-IDF top-5 terms per document (docs < 50 to bound output):
    term-frequency agg ⋈ document-frequency agg (broadcast — vocabulary ≪
    corpus) ⋈ corpus size, ranked per doc. ln() is evaluated on identical
    exact integer ratios on both engines; stable rounding absorbs libm ulps.
    At 100 TB: two hash aggregations + one broadcast join — the classic
    scalable TF-IDF plan (df table is vocabulary-sized)."""
    d = _cat(spark, sf_dir).documents
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    tfidf_expr = F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(tfidf_expr), F.asc("token")
    )
    return (
        tf.filter(F.col("doc_id") < 50)
        .join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 5)
        .select("doc_id", "token", "tf", stable_round6(tfidf_expr).alias("tfidf"))
    )


@q(
    "q_text_vocab",
    f"""
    WITH tf AS (
        SELECT token, COUNT(*) AS tf FROM (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ) GROUP BY token
    ),
    tot AS (SELECT SUM(tf) AS total FROM tf)
    SELECT token, tf,
           {_SQL_ROUND6.format(x="SUM(tf) OVER (ORDER BY tf DESC, token ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / total")} AS cum_share
    FROM tf CROSS JOIN tot
    ORDER BY tf DESC, token ASC LIMIT 50
    """,
)
def q_text_vocab(spark, sf_dir):
    """Vocabulary coverage: top-50 terms with cumulative corpus share — the
    'how big a vocab covers X% of tokens' question every tokenizer design
    asks. Integer counts + one stable-rounded division, so exact across
    engines. Plan: one explode+agg shuffle, a single-partition window over
    only the head of the vocabulary (the ORDER BY ... LIMIT keeps the
    global sort a TakeOrdered at scale)."""
    from pyspark.sql import Window

    d = _cat(spark, sf_dir).documents
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tot = tf.agg(F.sum("tf").alias("total"))
    w = Window.orderBy(F.desc("tf"), F.asc("token")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        tf.crossJoin(F.broadcast(tot))
        .withColumn("cum", F.sum("tf").over(w))
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(50)
        .select(
            "token",
            "tf",
            stable_round6(F.col("cum") / F.col("total")).alias("cum_share"),
        )
    )


@q(
    "q_text_bigrams",
    """
    SELECT bigram, COUNT(*) AS n FROM (
        SELECT unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bigram
        FROM (SELECT string_split(text, ' ') AS w FROM documents)
    ) GROUP BY bigram
    QUALIFY ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, bigram ASC) <= 20
    """,
)
def q_text_bigrams(spark, sf_dir):
    """Top-20 bigram counts (n-gram language-model statistics): adjacent
    token pairs built with slice+zip_with (pure array expressions, no
    Python), then the usual explode → agg → TakeOrdered plan."""
    d = _cat(spark, sf_dir).documents
    words = F.split("text", " ")
    n = F.size(words)
    bigrams = F.zip_with(
        F.slice(words, 1, n - 1),
        F.slice(words, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@q(
    "q_text_repetition",
    f"""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    scal AS (
        SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct
        FROM base
    ),
    bc AS (
        SELECT doc_id, bigram, COUNT(*) AS c FROM (
            SELECT doc_id,
                   unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bigram
            FROM base
        ) GROUP BY doc_id, bigram
    ),
    top AS (SELECT doc_id, MAX(c) AS top_cnt FROM bc GROUP BY doc_id)
    SELECT s.doc_id, CAST(s.n_tokens AS INTEGER) AS n_tokens,
           {_SQL_ROUND6.format(x="s.n_distinct / s.n_tokens")} AS distinct_ratio,
           CASE WHEN s.n_tokens > 1
                THEN {_SQL_ROUND6.format(x="COALESCE(t.top_cnt, 0) / (s.n_tokens - 1)")}
                ELSE 0.0 END AS top_bigram_share
    FROM scal s LEFT JOIN top t ON s.doc_id = t.doc_id
    """,
)
def q_text_repetition(spark, sf_dir):
    """Per-document repetition signals (Gopher-style corpus filters):
    distinct-token ratio and the most-frequent-bigram share. See
    ops/text.py::repetition_stats for the two-exchange plan story; the
    signal complements q_text_quality (surface ratios) by catching
    boilerplate and looping generations that look clean char-wise."""
    from etl_data_processor_spark.ops.text import repetition_stats

    return repetition_stats(_cat(spark, sf_dir).documents)


@q(
    "q_ts_rollup_cascade",
    f"""
    SELECT (FLOOR(epoch(ts) / 86400) * 86400)::BIGINT AS day_epoch,
           event_type, COUNT(*) AS n, {sql_dsum('value')} AS total
    FROM events GROUP BY 1, 2
    """,
)
def q_ts_rollup_cascade(spark, sf_dir):
    """Cascading time-series rollup (the hypertable/materialized-rollup
    pattern): minute buckets from raw events, hour buckets from the MINUTE
    rollup, day buckets from the HOUR rollup — each level re-aggregates the
    previous one, never the raw data. At 100 TB only the minute aggregation
    is a fact-scale shuffle; every later exchange is rollup-sized (time-
    range/60 x |types| rows), which is why warehouses materialize the finest
    level once and serve all coarser granularities from it.

    Exactness is the point of the oracle here: the SQL aggregates DIRECTLY
    from raw events, so the hash-match proves sums-of-sums lose nothing —
    counts are integers and the value sums stay DECIMAL through every level
    (ops.exact), rounded once at the end. floor(floor(e/60)/60) ==
    floor(e/3600) for non-negative epochs, so the cascaded bucket keys are
    identical to direct bucketing."""
    ev = _cat(spark, sf_dir).events
    from etl_data_processor_spark.ops.exact import dec

    minute = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 60).alias("m"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum(dec("value")).alias("s"))
    hour = minute.groupBy(
        F.floor(F.col("m") / 60).alias("h"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    day = hour.groupBy(
        F.floor(F.col("h") / 24).alias("d"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    return day.select(
        (F.col("d") * 86400).cast("long").alias("day_epoch"),
        "event_type",
        "n",
        F.round(F.col("s"), 4).cast("double").alias("total"),
    )
