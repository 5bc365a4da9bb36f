"""Round-4 extension batch (B61): URL parsing, IP/CIDR containment join,
nearest-direction as-of join, probabilistic record linkage, bucketed
co-located join, and DP-style noisy counts.

Each query follows the house rules: deterministic (no RNG, no wall clock),
oracle-checked against DuckDB on the same parquet, and shaped for 100 TB —
candidate generation is always an equi-join on a derived bucket/block key,
never an unbounded theta join; synthetic columns (URLs, IPs, dirty names)
derive from table columns with integer arithmetic so both engines compute
bit-identical inputs.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_data_processor_spark.registry import q, cat as _cat
from etl_data_processor_spark.ops import sampling as S
from etl_data_processor_spark.ops.dedup import _parallelize


def _parquet_rows(path: str) -> int:
    """Row count of the parquet file/dataset at ``path`` from the file
    FOOTERS (pyarrow, driver-side, no Spark job, no data read) — the
    size probe q_record_linkage sizes its verify buckets from.
    Compressed bytes are a bad proxy here: zero-padded sequential names
    compress ~100x, so a byte-based bucket count under-parallelizes
    exactly the data shape that blows up the verify stage."""
    import os

    import pyarrow.parquet as pq

    if os.path.isfile(path):
        return pq.read_metadata(path).num_rows
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, f)).num_rows
    return total


# =====================================================================
# URL parsing / web-log analytics
# =====================================================================

# Both engines BUILD the same URL string from events columns, then PARSE it
# back with their own machinery (Spark parse_url vs DuckDB regexps) — the
# parsing is what's under test; the construction just gives the corpus URLs
# without needing a URL column in the fixture.
_URL_SQL = (
    "'https://www.site' || (user_id % 20) || "
    "CASE (user_id % 3) WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk' ELSE '.org' END || "
    "'/cat/' || event_type || '/item' || (event_id % 50) || "
    "'?uid=' || user_id || '&ref=r' || (event_id % 7)"
)


@q(
    "q_url_parse",
    f"""
    WITH u AS (SELECT event_id, user_id, {_URL_SQL} AS url FROM events),
    p AS (
        SELECT user_id,
               regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
               regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
               regexp_extract(url, 'uid=([^&]*)', 1) AS uid_param
        FROM u
    ),
    d AS (
        SELECT user_id, host, path, uid_param,
               CASE WHEN host LIKE '%.co.uk'
                    THEN regexp_extract(host, '([^.]+\\.co\\.uk)$', 1)
                    ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1)
               END AS domain,
               len(string_split(path, '/')) - 1 AS path_depth
        FROM p
    )
    SELECT domain,
           COUNT(*) AS n,
           COUNT(DISTINCT host) AS n_hosts,
           COUNT(DISTINCT uid_param) AS n_uids,
           CAST(MAX(path_depth) AS BIGINT) AS max_depth
    FROM d GROUP BY domain
    """,
)
def q_url_parse(spark, sf_dir):
    """URL parsing + per-registrable-domain rollup — the web-log / crawl
    analytics primitive (host, path, query-param extraction, public-suffix
    domain). Spark side uses the built-in ``parse_url`` (JVM expression,
    codegen — the hot path stays off Python); the registrable-domain rule
    is a 2-label heuristic with a .co.uk-style 3-label exception. Scale:
    pure narrow column expressions into one hash aggregate — no shuffle
    except the final groupBy."""
    ev = _cat(spark, sf_dir).events
    url = F.concat(
        F.lit("https://www.site"), (F.col("user_id") % 20).cast("string"),
        F.when(F.col("user_id") % 3 == 0, ".com")
        .when(F.col("user_id") % 3 == 1, ".co.uk")
        .otherwise(".org"),
        F.lit("/cat/"), F.col("event_type"),
        F.lit("/item"), (F.col("event_id") % 50).cast("string"),
        F.lit("?uid="), F.col("user_id").cast("string"),
        F.lit("&ref=r"), (F.col("event_id") % 7).cast("string"),
    )
    u = ev.select("user_id", url.alias("url"))
    parsed = u.select(
        "user_id",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("uid")).alias("uid_param"),
    )
    domain = F.when(
        F.col("host").endswith(".co.uk"),
        F.regexp_extract(F.col("host"), r"([^.]+\.co\.uk)$", 1),
    ).otherwise(F.regexp_extract(F.col("host"), r"([^.]+\.[^.]+)$", 1))
    d = parsed.select(
        "user_id", "host", "uid_param",
        domain.alias("domain"),
        (F.size(F.split(F.col("path"), "/")) - 1).cast("long").alias("path_depth"),
    )
    return d.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("host").alias("n_hosts"),
        F.countDistinct("uid_param").alias("n_uids"),
        F.max("path_depth").alias("max_depth"),
    )


# =====================================================================
# IP-in-CIDR containment join
# =====================================================================

# Synthetic plumbing: every event gets an IPv4 in 10.0.0.0/8 via integer
# arithmetic on event_id; every nation owns a CIDR block of varying prefix
# length (/15, /16 or /17) inside a disjoint /15-aligned lane.
_IP_BASE = 167772160  # 10.0.0.0
_IP_SQL = f"({_IP_BASE} + (event_id * 2654435761) % 3276800)"
_CIDR_SQL = f"""
    SELECT n_nationkey, n_name,
           {_IP_BASE} + n_nationkey * 131072 AS lo,
           {_IP_BASE} + n_nationkey * 131072
             + CASE (n_nationkey % 3) WHEN 0 THEN 131071
                                      WHEN 1 THEN 65535
                                      ELSE 32767 END AS hi
    FROM nation
"""


@q(
    "q_ip_cidr_join",
    f"""
    WITH ips AS (SELECT event_id, user_id, {_IP_SQL} AS ip FROM events),
    cidr AS ({_CIDR_SQL})
    SELECT c.n_name, COUNT(*) AS n_hits,
           COUNT(DISTINCT i.user_id) AS n_users,
           CAST(MIN(i.ip) AS BIGINT) AS min_ip, CAST(MAX(i.ip) AS BIGINT) AS max_ip
    FROM ips i JOIN cidr c ON i.ip BETWEEN c.lo AND c.hi
    GROUP BY c.n_name
    """,
)
def q_ip_cidr_join(spark, sf_dir):
    """IP-in-CIDR containment join — the geo/threat-feed enrichment
    primitive. The naive form is a theta join (ip BETWEEN lo AND hi —
    quadratic candidate space); the scale shape here expands each CIDR
    into the /16 grid cells it covers (a /15 explodes to 2 cells, a /16
    or /17 to 1 — bounded fan-out, like the spatial grid join) and joins
    on the CELL KEY: one equi-shuffle on ip>>16, BETWEEN only verifies
    within-cell candidates. A broadcast of the tiny dim would also work at
    this cardinality, but the grid join is the shape that survives a
    100M-row routing table."""
    c = _cat(spark, sf_dir)
    ips = c.events.select(
        "event_id", "user_id",
        (F.lit(_IP_BASE) + (F.col("event_id") * 2654435761) % 3276800).alias("ip"),
    )
    nk = F.col("n_nationkey").cast("long")
    cidr = c.nation.select(
        "n_name",
        (F.lit(_IP_BASE) + nk * 131072).alias("lo"),
        (
            F.lit(_IP_BASE) + nk * 131072
            + F.when(nk % 3 == 0, 131071).when(nk % 3 == 1, 65535).otherwise(32767)
        ).alias("hi"),
    )
    # /16-grid cover cells per CIDR: explode sequence(lo>>16, hi>>16)
    cells = cidr.select(
        "n_name", "lo", "hi",
        F.explode(
            F.sequence(
                F.shiftrightunsigned(F.col("lo"), 16),
                F.shiftrightunsigned(F.col("hi"), 16),
            )
        ).alias("cell"),
    )
    joined = ips.withColumn(
        "cell", F.shiftrightunsigned(F.col("ip"), 16)
    ).join(cells, "cell").filter(
        F.col("ip").between(F.col("lo"), F.col("hi"))
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ip").alias("min_ip"),
        F.max("ip").alias("max_ip"),
    )


# =====================================================================
# Nearest-direction as-of join
# =====================================================================


@q(
    "q_join_asof_nearest",
    """
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    cand AS (
        SELECT p.event_id,
               (SELECT b.ts FROM events b
                WHERE b.user_id = p.user_id AND b.event_type = 'click' AND b.ts <= p.ts
                ORDER BY b.ts DESC, b.event_id DESC LIMIT 1) AS b_ts,
               (SELECT b.value FROM events b
                WHERE b.user_id = p.user_id AND b.event_type = 'click' AND b.ts <= p.ts
                ORDER BY b.ts DESC, b.event_id DESC LIMIT 1) AS b_val,
               (SELECT b.ts FROM events b
                WHERE b.user_id = p.user_id AND b.event_type = 'click' AND b.ts >= p.ts
                ORDER BY b.ts ASC, b.event_id ASC LIMIT 1) AS f_ts,
               (SELECT b.value FROM events b
                WHERE b.user_id = p.user_id AND b.event_type = 'click' AND b.ts >= p.ts
                ORDER BY b.ts ASC, b.event_id ASC LIMIT 1) AS f_val,
               p.ts
        FROM p
    )
    SELECT event_id,
           CASE WHEN b_ts IS NOT NULL
                     AND (f_ts IS NULL OR (ts - b_ts) <= (f_ts - ts))
                THEN b_val ELSE f_val END AS value_near
    FROM cand
    """,
)
def q_join_asof_nearest(spark, sf_dir):
    """Nearest-direction as-of join (pandas merge_asof direction='nearest'):
    each purchase gets the click closest in time in EITHER direction, ties
    resolving backward. ONE shuffle: both directional candidates come from
    the same union + sort (two window frames over one exchange) — see
    ops/asof.py::asof_join_nearest."""
    from etl_data_processor_spark.ops.asof import asof_join_nearest

    ev = _cat(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join_nearest(
        purchases, clicks, key="user_id", ts="ts", value_cols=["value"],
        tiebreak="event_id",
    )
    return joined.select("event_id", F.col("value_near"))


# =====================================================================
# Probabilistic record linkage (Fellegi-Sunter-style)
# =====================================================================

# The dirty replica: custkey shifted by 10^7, the last digit of the name
# rotated by +5 (one-character typo), acctbal rounded to 1 decimal — a
# deterministic stand-in for an independently-keyed second source.


@q(
    "q_record_linkage",
    """
    WITH dirty AS (
        SELECT c_custkey + 10000000 AS d_id,
               substr(c_name, 1, len(c_name) - 1)
                 || CAST((CAST(substr(c_name, len(c_name), 1) AS INTEGER) + 5) % 10
                         AS VARCHAR) AS d_name,
               ROUND(c_acctbal, 1) AS d_bal,
               c_nationkey AS d_nationkey, c_mktsegment AS d_seg
        FROM customer
    ),
    scored AS (
        SELECT a.c_custkey, d.d_id,
               FLOOR(jaro_winkler_similarity(a.c_name, d.d_name) * 1000000.0 + 0.5)
                 / 1000000.0 AS jw6,
               CASE WHEN abs(a.c_acctbal - d.d_bal) <= 0.051 THEN 1 ELSE 0 END AS bal_ok
        FROM customer a
        JOIN dirty d ON a.c_nationkey = d.d_nationkey AND a.c_mktsegment = d.d_seg
                    AND levenshtein(a.c_name, d.d_name) <= 2
    )
    SELECT c_custkey, d_id,
           CAST(4 * CAST(jw6 >= 0.95 AS INTEGER) + 2 * bal_ok AS BIGINT) AS score
    FROM scored
    WHERE 4 * CAST(jw6 >= 0.95 AS INTEGER) + 2 * bal_ok >= 5
    """,
)
def q_record_linkage(spark, sf_dir):
    """Probabilistic record linkage (Fellegi-Sunter shape): match a clean
    customer table against an independently-keyed dirty replica (one-digit
    name typo, rounded balance) WITHOUT using the join key. Blocking =
    symmetric-delete variant equi-join (ops.text.deletion_neighborhood, a
    lossless candidate filter for lev <= 2) intersected with the
    (nationkey, mktsegment) attributes — candidates per record are
    bounded by spelling-neighbor density, NOT block population, so the
    candidate space is linear in N (the r4 in-block form measured 94.8x
    CPU at 10x data; this form re-measured linear — SCALE_STRESS.json;
    the PassJoin alternative measured 14x worse candidate precision on
    this fixture and was rejected — see the inline note).
    Field agreements (Jaro-Winkler ≥ 0.95 on names, |Δbal| ≤ 0.051)
    combine into an integer evidence score; score ≥ 5 needs BOTH
    agreements — one-digit neighbors pass the name test but fail the
    balance test. The JW scorer is the q_fuzzy_jw Arrow-batched pandas
    UDF, oracled against DuckDB's native C++
    jaro_winkler_similarity."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from etl_data_processor_spark.queries_ext2 import _jaro_winkler

    def _jw6(a, b):
        return pd.Series(
            [
                math.floor(_jaro_winkler(x, y) * 1000000.0 + 0.5) / 1000000.0
                for x, y in zip(a, b)
            ]
        )

    _jw6.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    # asNondeterministic (r11, guide §4.4): the score filter below
    # references the jw6 column, and Catalyst's filter pushdown
    # duplicated the UDF — the committed r10 plan carries TWO
    # ArrowEvalPython nodes for one call (every surviving pair paid the
    # Jaro-Winkler twice). The function is pure; the marker only stops
    # the optimizer from re-evaluating it below the pushed filter.
    jw6 = pandas_udf(_jw6, "double").asNondeterministic()

    # widen the scan BEFORE deriving either side, so both explodes run at
    # cluster parallelism (width-guarded: no-op when the scan is wide)
    cust = _parallelize(_cat(spark, sf_dir).customer)
    last = F.substring(F.col("c_name"), -1, 1).cast("int")
    dirty = cust.select(
        (F.col("c_custkey") + 10000000).alias("d_id"),
        F.concat(
            F.expr("substr(c_name, 1, length(c_name) - 1)"),
            ((last + 5) % 10).cast("string"),
        ).alias("d_name"),
        F.round(F.col("c_acctbal"), 1).alias("d_bal"),
        F.col("c_nationkey").alias("d_nationkey"),
        F.col("c_mktsegment").alias("d_seg"),
    )
    # Candidate generation is a SYMMETRIC-DELETE (SymSpell) equi-join,
    # not an in-block comparison: each side explodes to its <=2-deletion
    # variants (ops.text.deletion_neighborhood — a lossless filter for
    # lev <= 2), and candidates are pairs sharing a variant AND the
    # blocking attributes. The r4 form evaluated levenshtein on every
    # in-block pair (Sigma|block|^2 with only 125 fixed blocks), which the
    # r5 scale-stress measured QUADRATIC: 94.8x CPU at 10x data, one
    # 27.6 s task (SCALE_STRESS.json). The variant equi-join's candidate
    # count per row is bounded by how many rows share a near-identical
    # spelling — independent of N — so the whole query is one linear
    # explode + one hash shuffle at any scale. VERDICT r6 item 2's
    # lower-volume PassJoin alternative (q_fuzzy_passjoin) was measured
    # HERE and rejected: 6-char segments are weakly selective among
    # sequential-ID names (18.0M candidates vs symdelete's ~1.25M at
    # sf0.1, forward OR reversed — NOTES_r7), so the cheaper explode
    # loses 14x on candidate precision; full-length deletion variants
    # keep the distinguishing digits. levenshtein then runs
    # per-candidate (cheap codegen, textbook multi-stage linkage:
    # block → cheap filter → expensive Arrow-batched score), and the
    # pair-dedup shuffle sees only verified near-pairs. The probe side
    # spreads to full parallelism FIRST, but only when it is actually
    # narrow (the width-guarded _parallelize probe): a test-scale
    # single-file scan would otherwise explode + score on one core,
    # while at 100 TB the scan is already wide and the exchange would be
    # a pointless full shuffle.
    from etl_data_processor_spark.ops.text import symdelete_hash_arrays

    # r11: the variant hashes come from the vectorized Arrow pass
    # (see symdelete_hash_arrays — the interpreted-HOF expression form
    # was the dominant stage CPU of this key) and explode in JVM
    # codegen; the exploded frames carry only (key, block cols,
    # variant hash): the names stay out of the candidate exchanges and
    # rejoin after the pair dedup.
    cand_a = cust.select(
        "c_custkey", "c_nationkey", "c_mktsegment",
        F.explode(symdelete_hash_arrays("c_name")).alias("__v"),
    )
    cand_b = dirty.select(
        "d_id", "d_nationkey", "d_seg",
        F.explode(symdelete_hash_arrays("d_name")).alias("__vb"),
    )
    # SHUFFLE_HASH hint is load-bearing: Catalyst sizes the exploded side
    # from the pre-Generate scan estimate (~the customer file), so it
    # plans a broadcast build of what is really a ~70x-exploded frame —
    # measured at sf1 as a 3.3 GiB broadcast spilling to disk and 458
    # CPU-seconds. The variant key is high-cardinality and skew-free, so
    # a shuffled hash join is the right physical shape at every scale.
    # The lev verify sits IN the join condition and the output projects
    # ONLY the key pair: a true near-pair matches on every shared variant
    # (~100x multiplicity), so the pair-dedup shuffle must carry 16-byte
    # rows, not attribute-wide ones; attributes rejoin after the dedup
    # over the (tiny) verified pair set.
    #
    # EXPLICIT fine co-partitioning on the equi keys (VERDICT r7 item
    # 4): the verify stage's memory pressure is the JOIN OUTPUT (the
    # ~100x variant multiplicity feeding the partial pair-dedup hash
    # map), which AQE cannot see — it sizes partitions from the ~20 MB
    # shuffle INPUT and left this stage at base parallelism, measured at
    # sf1 as a 3.0 GB spill and a 37.5 s max task. The bucket count
    # scales with the SOURCE ROWS (footer metadata, one bucket per ~512
    # customer rows ~= 50k verify pair-slots at the ~100x multiplicity,
    # floored at spark.sql.shuffle.partitions, capped at 64x so a giant
    # corpus tops out at a sane multiple of the cluster's own shuffle
    # sizing): per-bucket verify+dedup state is proportional to rows, so
    # a row-proportional bucket count keeps it flat at any scale, while
    # small fixtures keep base parallelism instead of paying 8x task
    # constants (measured: a flat 8x tripled sf0.1 CPU). An explicit
    # numPartitions repartition is exempt from AQE coalescing, and the
    # SHJ reuses the partitioning — one exchange per side as before,
    # finer buckets. Re-measured at sf1: 3.0 GB spill -> 0, max task
    # 37.5 s -> ~6 s, CPU ratio 22x -> ~8x at 10x rows.
    nshuf = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    nbkt = max(
        nshuf,
        min(64 * nshuf, _parquet_rows(f"{sf_dir}/customer.parquet") // 512),
    )
    cand_a = cand_a.repartition(
        nbkt, "__v", "c_nationkey", "c_mktsegment"
    )
    cand_b = cand_b.repartition(nbkt, "__vb", "d_nationkey", "d_seg")
    # r11 (VERDICT r10 item 3): the levenshtein verify MOVES BELOW the
    # pair dedup — in the r4-r10 shape it sat in the join condition and
    # ran once per variant-multiplicity candidate row (~100x per true
    # pair); now the bare 16-byte pair dedups first and the verify runs
    # once per DISTINCT pair, on the attr-rejoined frame, with the
    # THRESHOLD levenshtein (banded DP + early-out; -1 when > 2). The
    # 2 < lev <= 4 false candidates the join-side filter used to drop
    # now flow through the dedup as extra skinny rows — measured far
    # cheaper than re-running the full-matrix DP per candidate row.
    pairs = (
        cand_a.join(
            cand_b.hint("shuffle_hash"),
            (F.col("__v") == F.col("__vb"))
            & (F.col("c_nationkey") == F.col("d_nationkey"))
            & (F.col("c_mktsegment") == F.col("d_seg")),
        )
        .select("c_custkey", "d_id")
        .dropDuplicates(["c_custkey", "d_id"])
    )
    blocked = (
        pairs.join(
            cust.select("c_custkey", "c_name", "c_acctbal"), "c_custkey"
        )
        .join(dirty.select("d_id", "d_name", "d_bal"), "d_id")
        .filter(F.levenshtein(F.col("c_name"), F.col("d_name"), 2) >= 0)
    )
    scored = blocked.select(
        "c_custkey", "d_id",
        jw6(F.col("c_name"), F.col("d_name")).alias("jw6"),
        F.when(
            F.abs(F.col("c_acctbal") - F.col("d_bal")) <= 0.051, 1
        ).otherwise(0).alias("bal_ok"),
    )
    score = (
        F.lit(4) * (F.col("jw6") >= 0.95).cast("int") + F.lit(2) * F.col("bal_ok")
    ).cast("long")
    return scored.select("c_custkey", "d_id", score.alias("score")).filter(
        F.col("score") >= 5
    )


# =====================================================================
# Bucketed (pre-shuffled) co-located join
# =====================================================================


@q(
    "q_join_bucketed",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_bucketed(spark, sf_dir):
    """Shuffle-free co-located join via BUCKETED tables — the 100 TB answer
    to repeated fact⋈fact joins on the same key: both sides are written
    bucketed by the join key (8 buckets, hash-partitioned at WRITE time),
    so the sort-merge join reads bucket i ⋈ bucket i with NO Exchange on
    either side (plan-pinned in tests/test_plans.py). At cluster scale the
    bucket count matches the standing parallelism and every subsequent
    join/aggregate on the key is exchange-free. The DDL/table writes live
    in the explicit setup hook io.ensure_bucketed_join_tables (idempotent
    per sf_dir) — this body only reads. Results are the plain join
    aggregate, oracled; prices aggregate as exact integer cents."""
    from etl_data_processor_spark.io import ensure_bucketed_join_tables

    orders_tbl, customer_tbl = ensure_bucketed_join_tables(spark, sf_dir)
    o = spark.table(orders_tbl)
    cu = spark.table(customer_tbl)
    # disable broadcast for THIS join so the bucket-aligned SMJ is what
    # runs (a broadcast would also avoid the shuffle, but only because the
    # dim is test-small; the bucketed plan is the one that scales)
    joined = o.hint("merge").join(
        cu, o["o_custkey"] == cu["c_custkey"]
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
        ).alias("total_cents"),
    )


# =====================================================================
# Perceptual-hash image dedup (aHash + banded hamming)
# =====================================================================


@q(
    "q_image_phash_dedup",
    """
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 120),
    px AS (
        SELECT doc_id, CAST(t.i AS BIGINT) AS i,
               ((doc_id // 4 + 11) * (CAST(t.i AS BIGINT) + 7)
                + CASE WHEN CAST(t.i AS BIGINT) % 50 = doc_id % 4
                       THEN 60 ELSE 0 END) % 256 AS v
        FROM ids, UNNEST(range(0, 1024)) AS t(i)
    ),
    tot AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS s FROM px GROUP BY 1),
    blk AS (
        SELECT doc_id, ((i // 32) // 4) * 8 + (i % 32) // 4 AS b,
               CAST(SUM(v) AS BIGINT) AS bs
        FROM px GROUP BY 1, 2
    ),
    sig AS (
        SELECT blk.doc_id,
               CAST(SUM(CASE WHEN bs * 64 > s THEN
                   CASE WHEN b = 63 THEN -9223372036854775807 - 1
                        ELSE (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) END
                   ELSE 0 END) AS BIGINT) AS sig
        FROM blk JOIN tot ON blk.doc_id = tot.doc_id
        GROUP BY 1
    ),
    bands AS (
        SELECT doc_id, CAST(u.k AS INTEGER) AS k,
               (sig >> CAST(16 * u.k AS INTEGER)) & 65535 AS bv
        FROM sig, UNNEST(range(0, 4)) AS u(k)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.k = b.k AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(sa.sig, sb.sig)) AS INTEGER) AS hamming
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.id_a
    JOIN sig sb ON sb.doc_id = c.id_b
    WHERE bit_count(xor(sa.sig, sb.sig)) <= 10
    """,
)
def q_image_phash_dedup(spark, sf_dir):
    """IMAGE near-duplicate detection via perceptual hashing — the
    multimodal counterpart of SimHash text dedup: synthesize grayscale
    frames with planted near-dup groups (binary columns, real
    np.frombuffer decode), compute a 64-bit average-hash signature per
    frame (8×8 mean-pooled blocks vs global mean, exact integer
    cross-multiplied comparisons), block candidates by 16-bit signature
    bands (4 bands — only same-band-value pairs ever join), and verify
    exact hamming ≤ 10 via bit_count(xor). At 100 TB: signatures are one
    Arrow-batched decode pass (narrow), the band self-join is the only
    shuffle, and the signature table persists exactly like the MinHash
    band-bucket index. The closed-form pixels let DuckDB recompute the
    entire decode→pool→sign→band→verify chain bit-for-bit."""
    from etl_data_processor_spark.ops.multimodal import (
        ahash64,
        gray_synthesize_groups,
    )

    docs = _cat(spark, sf_dir).documents.filter(F.col("doc_id") < 120)
    sigs = ahash64(gray_synthesize_groups(docs))
    sigs = sigs.cache()  # consumed by both band sides + the verify joins
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        F.shiftright(F.col("sig"), 16 * k)
                        .bitwiseAND(F.lit(65535))
                        .alias("bv"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("kb"),
    ).select("doc_id", F.col("kb.k").alias("k"), F.col("kb.bv").alias("bv"))
    a = bands.select(F.col("doc_id").alias("id_a"), "k", "bv")
    b = bands.select(F.col("doc_id").alias("id_b"), "k", "bv")
    cand = (
        a.join(b, ["k", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= 10)
        .select("id_a", "id_b", "hamming")
    )


# =====================================================================
# KMV theta sketch — set-INTERSECTION estimation
# =====================================================================

_KMV_K = 64


@q(
    "q_sketch_theta_kmv",
    f"""
    WITH d AS (
        SELECT DISTINCT event_type, {S.hash32_sql('user_id')} AS h FROM events
    ),
    sk AS (
        SELECT event_type, h FROM d
        QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) <= {_KMV_K}
    ),
    per AS (
        SELECT event_type, MAX(h) AS kth, COUNT(*) AS m FROM sk
        GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               LEAST(CASE WHEN pa.m < {_KMV_K} THEN 4294967296 ELSE pa.kth END,
                     CASE WHEN pb.m < {_KMV_K} THEN 4294967296 ELSE pb.kth END)
                 AS theta,
               a.h
        FROM sk a
        JOIN sk b ON a.h = b.h AND a.event_type < b.event_type
        JOIN per pa ON pa.event_type = a.event_type
        JOIN per pb ON pb.event_type = b.event_type
    )
    SELECT type_a, type_b,
           CAST(FLOOR(COUNT(CASE WHEN h < theta THEN 1 END)
                      * 4294967296.0 / ANY_VALUE(theta) + 0.5) AS BIGINT)
             AS est_common
    FROM pairs GROUP BY type_a, type_b
    """,
)
def q_sketch_theta_kmv(spark, sf_dir):
    """KMV (k-minimum-values / theta) sketch SET-INTERSECTION estimate —
    the sketch family HLL cannot provide: per event_type keep the k=64
    smallest distinct portable-hash(user_id) values; for each type pair,
    common sketch hashes below θ = min(kth_a, kth_b) scale by 2³²/θ to
    estimate |users_a ∩ users_b| (Beyer et al., SIGMOD'07). Deterministic
    hash → both engines hold bit-identical sketches, so even the
    'randomized' estimator is exact-value oracled. Types with < k distinct
    users degrade to the EXACT set (θ = 2³²) — estimates become exact,
    the standard small-set behavior. Scale: the only full-data work is
    the distinct (type, h) pass; sketches are k-row bounded state per
    group (at 100 TB swap the window top-k for a partial-merge typed
    aggregator — the math is what's under test). Accuracy vs exact
    intersection pinned in pytest."""
    from pyspark.sql import Window
    from etl_data_processor_spark.ops.sampling import hash32

    ev = _cat(spark, sf_dir).events
    d = ev.select(
        "event_type", hash32(F.col("user_id")).alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    sk = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .select("event_type", "h")
    )
    sk = sk.cache()  # consumed by both pair sides and the per-type stats
    per = sk.groupBy("event_type").agg(
        F.max("h").alias("kth"), F.count(F.lit(1)).alias("m")
    )
    theta_of = lambda m, kth: F.when(m < _KMV_K, F.lit(4294967296)).otherwise(kth)
    a = sk.select(F.col("event_type").alias("type_a"), "h")
    b = sk.select(F.col("event_type").alias("type_b"), F.col("h").alias("hb"))
    pa = per.select(
        F.col("event_type").alias("type_a"),
        theta_of(F.col("m"), F.col("kth")).alias("theta_a"),
    )
    pb = per.select(
        F.col("event_type").alias("type_b"),
        theta_of(F.col("m"), F.col("kth")).alias("theta_b"),
    )
    pairs = (
        a.join(b, (F.col("h") == F.col("hb")) & (F.col("type_a") < F.col("type_b")))
        .join(F.broadcast(pa), "type_a")
        .join(F.broadcast(pb), "type_b")
        .withColumn("theta", F.least(F.col("theta_a"), F.col("theta_b")))
    )
    return pairs.groupBy("type_a", "type_b").agg(
        F.floor(
            F.count(F.when(F.col("h") < F.col("theta"), 1))
            * F.lit(4294967296.0) / F.first("theta") + F.lit(0.5)
        ).cast("long").alias("est_common")
    )


# =====================================================================
# Retrieval-quality eval: nDCG of int8-quantized retrieval
# =====================================================================

_QVEC8 = (
    "list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) / mx * 7.0"
    " + 0.5) AS BIGINT))"
)
_QVEC7 = (
    "list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)*10000000.0"
    "+0.5) AS BIGINT))"
)


@q(
    "q_eval_ndcg",
    f"""
    WITH m AS (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE)))) AS mx
        FROM embeddings
    ),
    q8 AS (
        SELECT vec_id,
               CAST(FLOOR(mx * 1000000.0 + 0.5) AS BIGINT) AS s6,
               {_QVEC8} AS c8,
               {_QVEC7} AS ce
        FROM m WHERE mx > 0
    ),
    qa AS (SELECT vec_id AS query_id, c8, ce FROM q8 WHERE vec_id IN (0, 1, 2)),
    scored AS (
        SELECT qa.query_id, db.vec_id,
               CAST(SUM(db.c8[i] * qa.c8[i]) AS BIGINT) * ANY_VALUE(db.s6)
                 AS iscore,
               CAST(FLOOR((CAST(SUM(db.ce[i] * qa.ce[i]) AS DOUBLE)
                    / (SQRT(CAST(SUM(db.ce[i] * db.ce[i]) AS DOUBLE))
                       * SQRT(CAST(SUM(qa.ce[i] * qa.ce[i]) AS DOUBLE))))
                    * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS cos6
        FROM q8 db, qa, range(1, 65) t(i)
        WHERE db.vec_id <> qa.query_id
        GROUP BY qa.query_id, db.vec_id
    ),
    ranked AS (
        SELECT query_id, vec_id, cos6,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY iscore DESC, vec_id) AS pos_r,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos6 DESC, vec_id) AS pos_i
        FROM scored
    ),
    agg AS (
        SELECT query_id,
               SUM(CASE WHEN pos_r <= 10
                        THEN GREATEST(cos6, 0.0) / log2(pos_r + 1)
                        ELSE 0 END) AS dcg,
               SUM(CASE WHEN pos_i <= 10
                        THEN GREATEST(cos6, 0.0) / log2(pos_i + 1)
                        ELSE 0 END) AS idcg
        FROM ranked GROUP BY query_id
    )
    SELECT query_id,
           CAST(FLOOR(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0 END
                      * 10000.0 + 0.5) AS DOUBLE) / 10000.0 AS ndcg4
    FROM agg
    """,
)
def q_eval_ndcg(spark, sf_dir):
    """Retrieval-quality evaluation: nDCG@10 of int4-QUANTIZED retrieval
    against full-precision exact-cosine ground truth — the measurement
    that decides whether 16×-cheaper quantized embeddings are good enough
    to ship at 100 TB. Retrieval ranks by integer code-dot × doc scale
    (query scale is rank-invariant per query; all-integer, so the ranking
    is bit-deterministic), gains are the exact fixed-point cosines, and
    both the retrieved and ideal DCG come from ONE scored frame with two
    window ranks. Everything is closed-form arithmetic, so the entire
    eval — quantize, retrieve, rank, nDCG — is value-checked cross-engine
    (rounded to 4dp; the only floats are 10-term gain/log2 sums where
    1-ulp libm noise is 1e-15)."""
    from etl_data_processor_spark.ops.similarity import dec_cosine

    from pyspark.sql import Window

    e = _cat(spark, sf_dir).embeddings
    xd = lambda x: x.cast("double")  # noqa: E731
    m = e.select(
        "vec_id",
        "embedding",
        F.array_max(F.transform("embedding", lambda x: F.abs(xd(x)))).alias("mx"),
    ).filter(F.col("mx") > 0)
    q8 = m.select(
        "vec_id",
        "embedding",
        F.floor(F.col("mx") * 1000000.0 + F.lit(0.5)).cast("long").alias("s6"),
        F.transform(
            "embedding",
            lambda x: F.floor(xd(x) / F.col("mx") * 7.0 + F.lit(0.5)).cast("long"),
        ).alias("c8"),
    )
    qa = q8.filter(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qemb"),
        F.col("c8").alias("qc8"),
    )
    cand = q8.crossJoin(F.broadcast(qa)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    iscore = (
        F.aggregate(
            F.zip_with(F.col("c8"), F.col("qc8"), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        * F.col("s6")
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        iscore.alias("iscore"),
        dec_cosine(F.col("embedding"), F.col("qemb")).alias("cos6"),
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("iscore"), F.asc("vec_id"))
    wi = Window.partitionBy("query_id").orderBy(F.desc("cos6"), F.asc("vec_id"))
    ranked = scored.select(
        "query_id", "cos6",
        F.row_number().over(wr).alias("pos_r"),
        F.row_number().over(wi).alias("pos_i"),
    )
    gain = F.greatest(F.col("cos6"), F.lit(0.0))
    agg = ranked.groupBy("query_id").agg(
        F.sum(
            F.when(F.col("pos_r") <= 10, gain / F.log2(F.col("pos_r") + 1)).otherwise(0.0)
        ).alias("dcg"),
        F.sum(
            F.when(F.col("pos_i") <= 10, gain / F.log2(F.col("pos_i") + 1)).otherwise(0.0)
        ).alias("idcg"),
    )
    ndcg = F.when(
        F.col("idcg") > 0, F.col("dcg") / F.col("idcg")
    ).otherwise(F.lit(0.0))
    return agg.select(
        "query_id",
        (F.floor(ndcg * 10000.0 + F.lit(0.5)) / F.lit(10000.0)).alias("ndcg4"),
    )


# =====================================================================
# DP-style noisy counts
# =====================================================================


@q(
    "q_dp_noise_counts",
    f"""
    WITH g AS (
        SELECT event_type, COUNT(*) AS n,
               ascii(substr(event_type, 1, 1)) * 100 + len(event_type) AS gk
        FROM events GROUP BY event_type
    ),
    u AS (
        SELECT event_type, n,
               GREATEST(({S.hash32_sql('gk')}) / 4294967296.0 - 0.5,
                        -0.49999999) AS uu
        FROM g
    )
    SELECT event_type, n,
           CAST(n + CAST(FLOOR(
               -10.0 * sign(uu) * ln(1.0 - 2.0 * abs(uu)) + 0.5
           ) AS BIGINT) AS BIGINT) AS noisy_n
    FROM u
    """,
)
def q_dp_noise_counts(spark, sf_dir):
    """Differential-privacy-style noisy counts: per-group count + Laplace
    noise (scale b=10) drawn by INVERSE CDF from a deterministic
    hash-uniform — the portable-hash sampling trick (ops/sampling.py)
    applied to noise generation, so both engines derive the bit-identical
    draw and the gate can value-check a 'randomized' mechanism. Production
    DP swaps the hash-uniform for a calibrated RNG and adds budget
    accounting; the Spark shape (one hash aggregate, noise as a scalar
    column expression on the GROUP row, never per-input-row) is unchanged
    at 100 TB. Noise rounds to integer counts (geometric-mechanism
    style)."""
    from etl_data_processor_spark.ops.sampling import hash32

    ev = _cat(spark, sf_dir).events
    g = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    gk = (
        F.ascii(F.substring(F.col("event_type"), 1, 1)) * 100
        + F.length(F.col("event_type"))
    ).cast("long")
    u = g.select(
        "event_type", "n",
        F.greatest(
            hash32(gk) / F.lit(4294967296.0) - F.lit(0.5),
            F.lit(-0.49999999),  # hash==0 would put ln at exactly 0
        ).alias("uu"),
    )
    noise = F.floor(
        F.lit(-10.0) * F.signum(F.col("uu"))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(F.col("uu")))
        + F.lit(0.5)
    ).cast("long")
    return u.select(
        "event_type", "n", (F.col("n") + noise).alias("noisy_n")
    )
