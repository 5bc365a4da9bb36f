"""Round-5 extension batch (B62): scale-path fuzzy matching, SemDeDup-style
semantic dedup, and token-budget corpus mixing.

House rules as ever: deterministic (no RNG / wall clock), DuckDB-oracled on
the same parquet, and shaped for 100 TB — candidate generation is an
equi-join on a derived key, sampling decisions depend only on the row, and
every Python boundary is avoided (all three queries are pure Column
expressions + joins).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_processor_spark.ops import sampling as SMP
from etl_data_processor_spark.ops import similarity as SIM
from etl_data_processor_spark.ops import text as T
from etl_data_processor_spark.registry import cat as _cat
from etl_data_processor_spark.registry import q

# =====================================================================
# Fuzzy key matching, symmetric-delete scale path (B50 ext)
# =====================================================================


@q(
    "q_fuzzy_symdelete",
    """
    WITH k AS (SELECT DISTINCT p_name AS key FROM part)
    SELECT a.key AS key_a, b.key AS key_b,
           CAST(levenshtein(a.key, b.key) AS INTEGER) AS dist
    FROM k a JOIN k b ON a.key < b.key
    WHERE levenshtein(a.key, b.key) <= 2
    """,
)
def q_fuzzy_symdelete(spark, sf_dir):
    """q_fuzzy_match's exact output through the SYMMETRIC-DELETE blocking
    (ops.text.fuzzy_key_pairs_symdelete) instead of the length band: the
    oracle is the same NAIVE all-pairs SQL, so a green differential
    PROVES the deletion-variant equi-join lossless for lev <= 2 on a
    real text column — the same primitive that took q_record_linkage
    from 94.8x to 13.1x CPU at 10x data (SCALE_STRESS.json). Both
    blocking strategies stay registered: the band is cheaper per key at
    small scale, the variant join is the one whose candidate count
    survives 100 TB."""
    return T.fuzzy_key_pairs_symdelete(
        _cat(spark, sf_dir).part, "p_name", max_dist=2
    )


# =====================================================================
# SemDeDup-style semantic dedup (B22/B32 ext)
# =====================================================================

# Deterministic coarse clusterer both engines can compute: the bucket key
# is the string of sign bits of the first b embedding coordinates (a
# random-hyperplane LSH with the canonical axes as planes), where b GROWS
# WITH THE CORPUS — b = max(6, bitlength(ceil(n/32) - 1)), i.e. ~n/32
# buckets — so expected bucket population stays ~constant at every scale
# (SemDeDup's own k ~ n/target prescription; a FIXED b measured 108.6x
# CPU at 10x data because Sigma|bucket|^2 grows quadratically when the
# bucket count can't follow the corpus). The bit-length is computed via
# binary-string length (Spark conv / DuckDB bin) — pure integer
# arithmetic, no float log2 whose boundary could disagree between
# engines. NOTE the slice/index semantics are per-engine: DuckDB lists
# are 1-based (`e[1:b]`), Spark's `arr[i]` is 0-BASED but `slice(e,1,b)`
# is 1-based.

_BITS_DUCK = "GREATEST(6, LENGTH(bin((SELECT (COUNT(*) + 31) // 32 - 1 FROM embeddings))))"
_BUCKET_DUCK = (
    "array_to_string(list_transform(embedding[1:__b], "
    "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')"
)
_BUCKET_SPARK = (
    "array_join(transform(slice(embedding, 1, __b), "
    "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')"
)
_BITS_SPARK = (
    "greatest(6, length(conv(CAST((__n + 31) DIV 32 - 1 AS STRING), 10, 2)))"
)


@q(
    "q_dedup_semantic",
    f"""
    WITH g AS (SELECT {_BITS_DUCK} AS __b),
    cv AS (
        SELECT vec_id,
               {_BUCKET_DUCK} AS bucket,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE)*10000000.0+0.5) AS BIGINT)) AS ce
        FROM embeddings, g
    ),
    pivots AS (
        SELECT vec_id, bucket, ce
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn
              FROM cv)
        WHERE rn <= 64
    ),
    pair_drops AS (
        SELECT DISTINCT b.vec_id
        FROM pivots a JOIN cv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id, range(1, 65) t(i)
        GROUP BY a.vec_id, b.vec_id
        HAVING CAST(FLOOR((CAST(SUM(a.ce[i] * b.ce[i]) AS DOUBLE)
                    / (SQRT(CAST(SUM(a.ce[i] * a.ce[i]) AS DOUBLE))
                       * SQRT(CAST(SUM(b.ce[i] * b.ce[i]) AS DOUBLE))))
                    * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 >= 0.5
    )
    SELECT c.vec_id, c.bucket
    FROM cv c ANTI JOIN pair_drops d ON c.vec_id = d.vec_id
    ORDER BY c.vec_id
    """,
)
def q_dedup_semantic(spark, sf_dir):
    """SemDeDup-shape semantic dedup (Abbas et al. 2023, public): cluster
    the embedding space coarsely, screen every member against its
    cluster's 64 lowest-id PIVOTS, and drop any vector with a pivot
    neighbor at cosine >= 0.5 — returns the KEPT corpus. The registered
    clusterer is a deterministic sign-bucket LSH whose BIT COUNT grows
    with the corpus (~n/32 buckets: constant expected population at any
    scale — SemDeDup's k ~ n/target regime; a FIXED bit count measured
    108.6x CPU at 10x data), and the DuckDB oracle replicates the whole
    chain bit-for-bit (incl. the adaptive bit count and the ROW_NUMBER
    pivot rule); production swaps in trained k-means centroids
    (ops.similarity.train_ivf_centroids + ivf_assign_argmax, exercised
    by q_cosine_ivf and tests) — same plan, and with clusters sized
    <= 64 the pivot rule IS exact all-pairs SemDeDup. The pivot bound
    is load-bearing at scale: sign/LSH buckets on clustered data track
    the semantic clusters themselves (the r5 scale-stress measured the
    all-pairs form at 108.6x CPU for 10x data with one 18 s task —
    SCALE_STRESS.json), so the prune budget, not the bucketing, is what
    makes the operator linear. One window + one equi-join, codegen
    decimal-exact cosine, no Python boundary."""
    emb = _cat(spark, sf_dir).embeddings
    n = emb.agg(F.count("*").alias("__n"))
    cv = (
        emb.crossJoin(F.broadcast(n))
        .withColumn("__b", F.expr(_BITS_SPARK))
        .select("vec_id", F.expr(_BUCKET_SPARK).alias("bucket"), "embedding")
    )
    return SIM.semantic_dedup_kept(cv, tau=0.5).orderBy("vec_id")


# =====================================================================
# Token-budget corpus mixing (north star: data mixing)
# =====================================================================

_MIX_SEED = 7
_M32 = 1 << 32


@q(
    "q_corpus_mix",
    f"""
    WITH toks AS (
        SELECT doc_id, source,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               x -> x <> '')) AS n_toks,
               1 + (CAST(regexp_extract(source, '(\\d+)$', 1) AS BIGINT) % 3) AS w
        FROM documents
    ),
    totals AS (
        SELECT source, ANY_VALUE(w) AS w, SUM(n_toks) AS src_toks, COUNT(*) AS src_docs
        FROM toks GROUP BY source
    ),
    grand AS (
        SELECT CAST(FLOOR(0.6 * SUM(src_toks)) AS BIGINT) AS budget,
               SUM(w) AS w_total
        FROM totals
    ),
    rated AS (
        SELECT t.source, t.w, t.src_toks,
               LEAST(1.0, (g.budget * t.w) / (g.w_total * t.src_toks)) AS rate
        FROM totals t, grand g
    ),
    kept AS (
        SELECT k.doc_id, k.source, k.n_toks
        FROM toks k JOIN rated r ON k.source = r.source
        WHERE {SMP.hash32_sql('k.doc_id', seed=_MIX_SEED)}
              < CAST(FLOOR(r.rate * {_M32}) AS BIGINT)
    )
    SELECT r.source, r.w AS weight,
           CAST(FLOOR(r.rate * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS rate6,
           CAST(COALESCE(COUNT(k.doc_id), 0) AS BIGINT) AS kept_docs,
           CAST(COALESCE(SUM(k.n_toks), 0) AS BIGINT) AS kept_tokens
    FROM rated r LEFT JOIN kept k ON r.source = k.source
    GROUP BY r.source, r.w, r.rate
    ORDER BY r.source
    """,
)
def q_corpus_mix(spark, sf_dir):
    """Domain mixing to a token budget (the curriculum/mixture step every
    LLM corpus pipeline runs): integer domain weights -> per-source
    sampling rate min(1, budget*w_s / (W*T_s)) -> DETERMINISTIC hash
    sample (ops.sampling.hash32: the decision depends only on doc_id, so
    the mix is reproducible across engines, re-runs and partitionings,
    and growing the budget only ever adds documents). Returns the mix
    manifest per source: weight, rate, kept docs/tokens. 100 TB shape:
    token totals are ONE small aggregate (or free from table-format
    column stats), rates broadcast back, and the sample itself is a
    shuffle-free scan-stage filter — the corpus is never exchanged."""
    d = _cat(spark, sf_dir).documents
    toks = d.select(
        "doc_id",
        "source",
        T.token_count(F.col("text")).cast("long").alias("n_toks"),
        (
            1
            + F.regexp_extract("source", r"(\d+)$", 1).cast("long") % 3
        ).alias("w"),
    )
    totals = toks.groupBy("source").agg(
        F.first("w").alias("w"),
        F.sum("n_toks").alias("src_toks"),
        F.count("*").alias("src_docs"),
    )
    grand = totals.agg(
        F.floor(0.6 * F.sum("src_toks")).cast("long").alias("budget"),
        F.sum("w").alias("w_total"),
    )
    rated = totals.crossJoin(F.broadcast(grand)).select(
        "source",
        "w",
        "src_toks",
        F.least(
            F.lit(1.0),
            (F.col("budget") * F.col("w"))
            / (F.col("w_total") * F.col("src_toks")),
        ).alias("rate"),
    )
    kept = toks.join(F.broadcast(rated.select("source", "rate")), "source").filter(
        SMP.hash32(F.col("doc_id"), seed=_MIX_SEED)
        < F.floor(F.col("rate") * _M32).cast("long")
    )
    agg = kept.groupBy("source").agg(
        F.count("*").alias("kept_docs"), F.sum("n_toks").alias("kept_tokens")
    )
    return (
        rated.join(agg, "source", "left")
        .select(
            "source",
            F.col("w").alias("weight"),
            (F.floor(F.col("rate") * 1000000.0 + 0.5) / 1000000.0).alias(
                "rate6"
            ),
            F.coalesce(F.col("kept_docs"), F.lit(0)).cast("long").alias(
                "kept_docs"
            ),
            F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("long").alias(
                "kept_tokens"
            ),
        )
        .orderBy("source")
    )


# =====================================================================
# B63: corpus-level segment dedup + deterministic shard placement
# =====================================================================


@q(
    "q_dedup_lines",
    """
    WITH ws AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
        FROM documents
    ),
    tot AS (
        SELECT doc_id, CAST(ceil(len(w) / 3.0) AS BIGINT) AS n_chunks
        FROM ws WHERE len(w) > 0
    ),
    chunks AS (
        SELECT doc_id, u.pos AS pos, u.chunk AS chunk FROM (
            SELECT doc_id,
                   UNNEST([{'pos': i,
                            'chunk': array_to_string(w[i*3+1 : i*3+3], ' ')}
                           for i in range(0, CAST(ceil(len(w)/3.0) AS BIGINT))]) AS u
            FROM ws WHERE len(w) > 0)
    ),
    dups AS (
        SELECT chunk FROM chunks
        GROUP BY chunk HAVING COUNT(DISTINCT doc_id) >= 3
    ),
    kept AS (
        SELECT c.doc_id, c.pos, c.chunk
        FROM chunks c ANTI JOIN dups d ON c.chunk = d.chunk
    ),
    ragg AS (
        SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS clean_text,
               COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id, COALESCE(r.clean_text, '') AS clean_text, t.n_chunks,
           CAST(t.n_chunks - COALESCE(r.n_kept, 0) AS BIGINT) AS n_dropped
    FROM tot t LEFT JOIN ragg r ON t.doc_id = r.doc_id
    ORDER BY t.doc_id
    """,
)
def q_dedup_lines(spark, sf_dir):
    """Sub-document (segment-level) corpus dedup — CCNet's line dedup /
    Gopher's boilerplate removal, the step public pipelines run BEFORE
    document MinHash so shared headers/navigation don't inflate Jaccard
    between unrelated pages. Segments = fixed 3-word chunks (the fixture
    text is single-line, so 'line' granularity is a fixed word window);
    any segment occurring in >= 3 distinct documents is dropped
    everywhere it occurs, and each document's survivors are reassembled
    in order (fully-boilerplate docs survive with clean_text = '').
    See ops.text.dedup_segments for the three-narrow-shuffle plan story.
    """
    return T.dedup_segments(
        _cat(spark, sf_dir).documents, width=3, min_docs=3
    ).orderBy("doc_id")


_SHARDS = 16
_SHARD_SEED = 11
_ORDER_SEED = 23


@q(
    "q_shard_manifest",
    f"""
    WITH t AS (
        SELECT doc_id, n_chars,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               x -> x <> '')) AS n_toks,
               ({SMP.hash32_sql('doc_id', seed=_SHARD_SEED)}) % {_SHARDS} AS shard,
               {SMP.hash32_sql('doc_id', seed=_ORDER_SEED)} AS order_key
        FROM documents
    ),
    m1 AS (
        SELECT shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars,
               MIN(order_key) AS min_ok,
               CAST(SUM(order_key) % {1 << 32} AS BIGINT) AS id_checksum
        FROM t GROUP BY shard
    ),
    firsts AS (
        SELECT t.shard, MIN(t.doc_id) AS first_doc
        FROM t JOIN m1 ON t.shard = m1.shard AND t.order_key = m1.min_ok
        GROUP BY t.shard
    )
    SELECT m1.shard, m1.n_docs, m1.n_tokens, m1.n_chars,
           f.first_doc, m1.id_checksum
    FROM m1 JOIN firsts f ON m1.shard = f.shard
    ORDER BY m1.shard
    """,
)
def q_shard_manifest(spark, sf_dir):
    """Deterministic training-shard placement + per-shard manifest: every
    document gets a shard (portable hash32 of doc_id mod 16) and an
    in-shard order key (independent seed), giving the 'global
    deterministic shuffle' a training run needs — well-mixed, engine- and
    partitioning-independent, exactly reproducible for resume. The
    manifest is what the writer would publish next to the shards: docs /
    tokens / bytes per shard, the first document in shard order (min
    order_key, doc_id tiebreak via a min+join two-step — NO per-shard
    window, which at 100 TB would funnel each shard through one reducer),
    and an order-independent membership checksum (sum of order keys mod
    2^32; at >2^31 rows per shard widen the sum to DECIMAL first — the
    q_corr_exact pattern). Write path: repartition(n_shards, shard) +
    sortWithinPartitions(order_key) — one exchange, no global sort.
    See ops.sampling.shard_assignment.
    """
    d = _cat(spark, sf_dir).documents
    t = SMP.shard_assignment(
        d.select(
            "doc_id",
            "n_chars",
            T.token_count(F.col("text")).cast("long").alias("n_toks"),
        ),
        "doc_id",
        _SHARDS,
        shard_seed=_SHARD_SEED,
        order_seed=_ORDER_SEED,
    )
    m1 = t.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.min("order_key").alias("min_ok"),
        F.pmod(F.sum("order_key"), F.lit(1 << 32)).alias("id_checksum"),
    )
    firsts = (
        t.join(
            F.broadcast(m1.select("shard", "min_ok")),
            ["shard"],
        )
        .filter(F.col("order_key") == F.col("min_ok"))
        .groupBy("shard")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    return (
        m1.join(firsts, "shard")
        .select(
            "shard", "n_docs", "n_tokens", "n_chars", "first_doc",
            "id_checksum",
        )
        .orderBy("shard")
    )


# =====================================================================
# B64: BPE tokenizer-training core + intra-doc repetition removal
# =====================================================================


@q(
    "q_bpe_pair_counts",
    """
    WITH words AS (
        SELECT UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS word
        FROM documents
    ),
    wf AS (SELECT word, COUNT(*) AS freq FROM words GROUP BY word),
    pairs AS (
        SELECT freq, u.p AS pair FROM (
            SELECT freq,
                   UNNEST([{'p': word[i:i+1]} for i in range(1, len(word))]) AS u
            FROM wf WHERE len(word) >= 2)
    )
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT 20
    """,
)
def q_bpe_pair_counts(spark, sf_dir):
    """BPE tokenizer-training statistic (Sennrich et al. 2016): weighted
    adjacent character-pair counts whose argmax is the next merge — the
    distributed step of training a tokenizer on the corpus. The corpus
    is scanned ONCE (word-frequency hash agg, map-side partials); pair
    enumeration then runs on the vocabulary table with freq as weight,
    so merge iterations never re-touch the corpus. Deterministic top-20
    (cnt desc, pair asc). See ops.text.bpe_pair_counts."""
    return T.bpe_pair_counts(_cat(spark, sf_dir).documents, top_n=20)


@q(
    "q_text_dedup_consecutive",
    """
    WITH toks AS (
        SELECT doc_id, u.pos AS pos, u.word AS word FROM (
            SELECT doc_id,
                   UNNEST([{'pos': i, 'word': w[i]}
                           for i in range(1, len(w) + 1)]) AS u
            FROM (SELECT doc_id,
                         regexp_split_to_array(trim(text), '\\s+') AS w
                  FROM documents)
            WHERE len(w) > 0)
    ),
    kept AS (
        SELECT doc_id, pos, word FROM (
            SELECT doc_id, pos, word,
                   LAG(word) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM toks)
        WHERE prev IS NULL OR word <> prev
    ),
    ragg AS (
        SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS clean_text,
               COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_words FROM toks GROUP BY doc_id)
    SELECT t.doc_id, r.clean_text, t.n_words,
           CAST(t.n_words - r.n_kept AS BIGINT) AS n_removed
    FROM tot t JOIN ragg r ON t.doc_id = r.doc_id
    ORDER BY t.doc_id
    """,
)
def q_text_dedup_consecutive(spark, sf_dir):
    """Gopher-style intra-document repetition removal: collapse runs of
    consecutively-repeated words and reassemble ("the the the" -> "the")
    — the scrubber counterpart of q_text_repetition's filter stats, for
    OCR/ASR stutter and crawler glitches. Only window is PARTITION BY
    doc_id (frame bounded by the doc's own length — data-parallel at any
    scale). See ops.text.dedup_consecutive_words."""
    return T.dedup_consecutive_words(
        _cat(spark, sf_dir).documents
    ).orderBy("doc_id")
