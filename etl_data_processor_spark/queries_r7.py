"""Round-7 extension batch: PassJoin fuzzy-candidate generation,
corpus diversity (distinct-n), weighted reservoir sampling (A-Res),
corpus BLEU eval, T5 span corruption, and PCM VAD segmentation.

House rules as ever: deterministic (hash-derived randomness, no RNG),
DuckDB-oracled on the same parquet, exact integers until one final
libm pair, and shaped for 100 TB — candidate generation is an equi-join
on a derived key, rankings are TakeOrderedAndProject (ranked_topk), the
only windows are per-doc/per-track bounded frames, and the sole Python
stage is the Arrow-batched binary PCM decode.
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


# =====================================================================
# Corpus diversity: distinct-n ratios (B31 ext — Li et al. 2016's
# distinct-1/2/3, the generation-diversity diagnostic)
# =====================================================================

from pyspark.sql import functions as F  # noqa: E402

from etl_data_processor_spark.ops import similarity as SIM  # noqa: E402
from etl_data_processor_spark.ops.sampling import hash32_sql  # noqa: E402
from etl_data_processor_spark.ops.text import _one_to, tokenize  # noqa: E402

_SQL_TOKENS = "list_filter(string_split(trim(text), ' '), t -> t <> '')"
_SQL_ROUND6 = "CAST(FLOOR(({x}) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0"

_DNG_ORACLE = f"""
WITH tok AS (SELECT source, {_SQL_TOKENS} AS w FROM documents),
g AS (
    SELECT source, nn.n AS n, array_to_string(w[i:i + nn.n - 1], ' ') AS g
    FROM tok, range(1, 4) nn(n), range(1, 4097) t(i)
    WHERE i + nn.n - 1 <= len(w)
)
SELECT source, CAST(n AS INT) AS n,
       CAST(COUNT(*) AS BIGINT) AS total_n,
       CAST(COUNT(DISTINCT g) AS BIGINT) AS distinct_n,
       {_SQL_ROUND6.format(x="CAST(COUNT(DISTINCT g) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)")} AS ratio6
FROM g GROUP BY source, n
"""


@q("q_distinct_ngrams", _DNG_ORACLE)
def q_distinct_ngrams(spark, sf_dir):
    """B31 ext: distinct-n diversity ratios (Li et al. 2016, public) —
    per source and n in 1..3, the fraction of n-gram OCCURRENCES that are
    distinct. Low distinct-2/3 flags templated or mode-collapsed text;
    corpus teams read this next to q_text_quality's surface ratios and
    q_ngram_novelty's cross-source overlap. Plan: ONE corpus explode
    emits (n, gram) structs for all three n (no per-n corpus pass), then
    a single hash aggregate per (source, n) with a distinct count —
    vocabulary-sized state, corpus-linear work, the identical plan at
    100 TB."""
    d = _cat(spark, sf_dir).documents
    w = tokenize(F.col("text"))
    grams = F.flatten(
        F.transform(
            F.array(F.lit(1), F.lit(2), F.lit(3)),
            lambda n: F.transform(
                _one_to(F.size(w) - n + F.lit(1)),
                lambda i: F.struct(
                    n.alias("n"), F.array_join(F.slice(w, i, n), " ").alias("g")
                ),
            ),
        )
    )
    e = d.select("source", F.explode(grams).alias("p")).select(
        "source", F.col("p.n").alias("n"), F.col("p.g").alias("g")
    )
    ratio = F.count_distinct(F.col("g")).cast("double") / F.count(
        F.lit(1)
    ).cast("double")
    return e.groupBy("source", "n").agg(
        F.count(F.lit(1)).alias("total_n"),
        F.count_distinct(F.col("g")).alias("distinct_n"),
        SIM.stable_round6(ratio).alias("ratio6"),
    )


# =====================================================================
# Weighted reservoir sampling, A-Res keys (B41 ext — Efraimidis &
# Spirakis 2006: top-k by u^(1/w), the without-replacement counterpart
# of q_sample_weighted's Bernoulli keep)
# =====================================================================

_ARES_K = 50

_ARES_H = hash32_sql("doc_id")

_ARES_ORACLE = f"""
WITH s AS (
    SELECT doc_id, source, n_chars,
           LN((CAST(({{h}}) AS DOUBLE) + 1.0) / 4294967296.0)
             / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS sc
    FROM documents
)
SELECT doc_id, source, n_chars,
       {_SQL_ROUND6.format(x="sc")} AS score6,
       CAST(ROW_NUMBER() OVER (
           ORDER BY CAST(FLOOR(sc * 1000000000000.0 + 0.5) AS BIGINT) DESC,
                    doc_id ASC
       ) AS INTEGER) AS rank
FROM s
QUALIFY rank <= {_ARES_K}
"""


@q("q_sample_ares", _ARES_ORACLE.format(h=_ARES_H))
def q_sample_ares(spark, sf_dir):
    """B41 ext: weighted reservoir sample WITHOUT replacement (A-Res,
    Efraimidis & Spirakis 2006, public): each row keys as u^(1/w) with
    u = (hash32(doc_id)+1)/2^32 and w = n_chars (the quality/length
    weight), and the k largest keys ARE a weighted random sample without
    replacement. Deterministic (hash-derived u, no RNG), partitioning-
    independent, engine-reproducible; ranking uses the 1e-12-quantized
    log-key ln(u)/w (monotone in u^(1/w)) with doc_id tiebreaks. Plan:
    shuffle-free scan projection + TakeOrderedAndProject with rank
    recovered on the <=k rows (ops.relational.ranked_topk — never a
    single-partition window). The 100 TB sample-k-docs-by-quality step in
    one pass."""
    from etl_data_processor_spark.ops.relational import ranked_topk
    from etl_data_processor_spark.ops.sampling import M32, hash32

    d = _cat(spark, sf_dir).documents
    u = (hash32(F.col("doc_id")).cast("double") + F.lit(1.0)) / F.lit(
        float(M32)
    )
    sc = F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    scored = d.select(
        "doc_id", "source", "n_chars",
        SIM.stable_round6(sc).alias("score6"),
        F.floor(sc * F.lit(1e12) + F.lit(0.5)).cast("long").alias("sc_q"),
    )
    return ranked_topk(
        scored, [("sc_q", "desc"), ("doc_id", "asc")], _ARES_K,
        rank_col="rank",
    ).drop("sc_q")


# =====================================================================
# Corpus BLEU eval (B-eval ext — Papineni et al. 2002, with Chen &
# Cherry 2014 add-one smoothing for n >= 2): score every non-reference
# source against its row-leader src0 document
# =====================================================================

_BLEU_N = 4
_BLEU_SRCS = 20  # fixture layout: source = src{doc_id % 20}

_BLEU_GRAMS_SQL = """
    SELECT {id} AS pid, nn.n AS n,
           array_to_string(w[i:i + nn.n - 1], ' ') AS g,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM {src}, range(1, 5) nn(n), range(1, 4097) t(i)
    WHERE i + nn.n - 1 <= len(w)
    GROUP BY pid, n, g
"""

_BLEU_ORACLE = f"""
WITH cand AS (
    SELECT doc_id AS cid, source,
           doc_id - (doc_id % {_BLEU_SRCS}) AS rid,
           {_SQL_TOKENS} AS w
    FROM documents WHERE source <> 'src0'
),
ref AS (
    SELECT doc_id AS rid, {_SQL_TOKENS} AS w
    FROM documents WHERE source = 'src0'
),
pairs AS (SELECT c.cid, c.source, c.rid FROM cand c JOIN ref r USING (rid)),
cg AS ({_BLEU_GRAMS_SQL.format(id="cid", src="cand")}),
rg AS ({_BLEU_GRAMS_SQL.format(id="rid", src="ref")}),
clip AS (
    SELECT p.source, cg.n,
           CAST(SUM(LEAST(cg.c, COALESCE(rg.c, 0))) AS BIGINT) AS m,
           CAST(SUM(cg.c) AS BIGINT) AS t
    FROM pairs p
    JOIN cg ON cg.pid = p.cid
    LEFT JOIN rg ON rg.pid = p.rid AND rg.n = cg.n AND rg.g = cg.g
    GROUP BY p.source, cg.n
),
wide AS (
    SELECT source,
           MAX(CASE WHEN n = 1 THEN m END) AS m1,
           MAX(CASE WHEN n = 2 THEN m END) AS m2,
           MAX(CASE WHEN n = 3 THEN m END) AS m3,
           MAX(CASE WHEN n = 4 THEN m END) AS m4,
           MAX(CASE WHEN n = 1 THEN t END) AS t1,
           MAX(CASE WHEN n = 2 THEN t END) AS t2,
           MAX(CASE WHEN n = 3 THEN t END) AS t3,
           MAX(CASE WHEN n = 4 THEN t END) AS t4
    FROM clip GROUP BY source
),
lens AS (
    SELECT p.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(c.w)) AS BIGINT) AS c_len,
           CAST(SUM(len(r.w)) AS BIGINT) AS r_len
    FROM pairs p JOIN cand c ON c.cid = p.cid JOIN ref r ON r.rid = p.rid
    GROUP BY p.source
),
scored AS (
    SELECT l.source, l.n_docs, l.c_len, l.r_len,
           w.m1, w.m2, w.m3, w.m4, w.t1, w.t2, w.t3, w.t4,
           CASE WHEN w.m1 = 0 THEN 0.0 ELSE
             (CASE WHEN l.c_len >= l.r_len THEN 1.0
                   ELSE EXP(1.0 - CAST(l.r_len AS DOUBLE)
                                  / CAST(l.c_len AS DOUBLE)) END)
             * EXP((LN(CAST(w.m1 AS DOUBLE) / CAST(w.t1 AS DOUBLE))
                  + LN((CAST(w.m2 AS DOUBLE) + 1.0) / (CAST(w.t2 AS DOUBLE) + 1.0))
                  + LN((CAST(w.m3 AS DOUBLE) + 1.0) / (CAST(w.t3 AS DOUBLE) + 1.0))
                  + LN((CAST(w.m4 AS DOUBLE) + 1.0) / (CAST(w.t4 AS DOUBLE) + 1.0))
               ) / 4.0)
           END AS bleu
    FROM lens l JOIN wide w USING (source)
)
SELECT source, n_docs, c_len, r_len, m1, m2, m3, m4, t1, t2, t3, t4,
       {_SQL_ROUND6.format(x="bleu")} AS bleu6
FROM scored
"""


@q("q_bleu_eval", _BLEU_ORACLE)
def q_bleu_eval(spark, sf_dir):
    """Eval ext: corpus-level BLEU-4 (Papineni et al. 2002, public) of
    every non-reference source against its row-leader src0 document
    (fixture layout: doc_id % 20 indexes the source, so doc d's reference
    is doc d - d%20) — the eval-harness metric next to q_eval_ndcg/
    q_eval_winrate_wilson: n-gram precisions are CLIPPED per pair
    (min(cand count, ref count) per distinct gram), summed corpus-level
    per source, smoothed add-one for n>=2 (Chen & Cherry 2014 method —
    short references leave p4 zero otherwise), with the brevity penalty
    from total candidate/reference lengths. Determinism: matches/totals
    are exact integers; the only doubles are the final LN/EXP pair on
    identical operands (engine-identical libm — the repo's standing
    precedent). Plan: one gram explode per side into (pair, n, gram)
    counts, one hash join on the gram key, two source-sized aggregates —
    corpus-linear, model-free, no window, no Python."""
    d = _cat(spark, sf_dir).documents
    w = tokenize(F.col("text"))
    grams = F.flatten(
        F.transform(
            F.array(*[F.lit(i) for i in range(1, _BLEU_N + 1)]),
            lambda n: F.transform(
                _one_to(F.size("__w") - n + F.lit(1)),
                lambda i: F.struct(
                    n.alias("n"),
                    F.array_join(F.slice("__w", i, n), " ").alias("g"),
                ),
            ),
        )
    )
    cand = d.filter(F.col("source") != "src0").select(
        F.col("doc_id").alias("cid"),
        "source",
        (F.col("doc_id") - F.pmod(F.col("doc_id"), F.lit(_BLEU_SRCS))).alias("rid"),
        w.alias("__w"),
    )
    ref = d.filter(F.col("source") == "src0").select(
        F.col("doc_id").alias("rid"), w.alias("__w")
    )
    pairs = cand.select("cid", "source", "rid").join(
        ref.select("rid"), "rid"
    )

    def gram_counts(side, idc):
        return (
            side.select(F.col(idc).alias("pid"), F.explode(grams).alias("p"))
            .groupBy("pid", F.col("p.n").alias("n"), F.col("p.g").alias("g"))
            .agg(F.count(F.lit(1)).alias("c"))
        )

    cg = gram_counts(cand, "cid")
    rg = gram_counts(ref, "rid").select(
        F.col("pid").alias("rpid"), F.col("n").alias("rn"),
        F.col("g").alias("rg"), F.col("c").alias("cr"),
    )
    clip = (
        pairs.join(cg, pairs["cid"] == cg["pid"])
        .join(
            rg,
            (F.col("rid") == F.col("rpid"))
            & (F.col("n") == F.col("rn"))
            & (F.col("g") == F.col("rg")),
            "left",
        )
        .groupBy("source", "n")
        .agg(
            F.sum(F.least(F.col("c"), F.coalesce(F.col("cr"), F.lit(0)))).alias("m"),
            F.sum("c").alias("t"),
        )
    )
    wide = clip.groupBy("source").agg(
        *[
            F.max(F.when(F.col("n") == i, F.col(col))).alias(f"{col}{i}")
            for i in range(1, _BLEU_N + 1)
            for col in ("m", "t")
        ]
    )
    lens = (
        pairs.join(cand.select("cid", F.size("__w").alias("cl")), "cid")
        .join(ref.select("rid", F.size("__w").alias("rl")), "rid")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("cl").alias("c_len"),
            F.sum("rl").alias("r_len"),
        )
    )
    dd = lambda c: c.cast("double")  # noqa: E731
    bp = F.when(F.col("c_len") >= F.col("r_len"), F.lit(1.0)).otherwise(
        F.exp(F.lit(1.0) - dd(F.col("r_len")) / dd(F.col("c_len")))
    )
    logsum = F.log(dd(F.col("m1")) / dd(F.col("t1")))
    for i in range(2, _BLEU_N + 1):
        logsum = logsum + F.log(
            (dd(F.col(f"m{i}")) + F.lit(1.0)) / (dd(F.col(f"t{i}")) + F.lit(1.0))
        )
    bleu = F.when(F.col("m1") == 0, F.lit(0.0)).otherwise(
        bp * F.exp(logsum / F.lit(float(_BLEU_N)))
    )
    return lens.join(wide, "source").select(
        "source", "n_docs", "c_len", "r_len",
        "m1", "m2", "m3", "m4", "t1", "t2", "t3", "t4",
        SIM.stable_round6(bleu).alias("bleu6"),
    )


# =====================================================================
# T5-style span corruption (B31/B64 ext — Raffel et al. 2020's
# pretraining objective: hash-seeded token masking, contiguous masked
# runs become sentinel spans, emitting the (inputs, targets) pair)
# =====================================================================

_SPAN_SALT = 100003  # position-mixing salt for the mask hash
_SPAN_MOD = 5        # mask rate 1/5

_SPAN_H = hash32_sql(f"doc_id * {_SPAN_SALT} + pos")

_SPAN_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, CAST(t.i AS INTEGER) AS pos, w[i] AS token
    FROM (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
         range(1, 4097) t(i)
    WHERE i <= len(w)
),
m AS (
    SELECT doc_id, pos, token,
           (({_SPAN_H}) % {_SPAN_MOD} = 0) AS masked
    FROM tok
),
s AS (
    SELECT *,
           masked AND NOT COALESCE(
               LAG(masked) OVER (PARTITION BY doc_id ORDER BY pos), FALSE
           ) AS span_start
    FROM m
),
z AS (
    SELECT *,
           SUM(CASE WHEN span_start THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS span_id
    FROM s
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) FILTER (WHERE masked) AS BIGINT) AS n_masked,
       CAST(COUNT(*) FILTER (WHERE span_start) AS BIGINT) AS n_spans,
       COALESCE(string_agg(
           CASE WHEN NOT masked THEN token
                WHEN span_start THEN '<extra_id_' || span_id || '>'
           END, ' ' ORDER BY pos), '') AS inputs,
       COALESCE(string_agg(
           CASE WHEN masked AND span_start
                    THEN '<extra_id_' || span_id || '> ' || token
                WHEN masked THEN token
           END, ' ' ORDER BY pos), '') AS targets
FROM z GROUP BY doc_id
"""


@q("q_span_corruption", _SPAN_ORACLE)
def q_span_corruption(spark, sf_dir):
    """B31/B64 ext: T5 span corruption (Raffel et al. 2020, public) — the
    pretraining-objective transform a training-data pipeline runs LAST:
    each token masks iff hash32(doc_id*salt + pos) % 5 == 0 (deterministic
    hash-seeded noise, no RNG — the portable-mixer discipline), contiguous
    masked runs collapse into '<extra_id_k>' sentinels in the INPUTS
    string, and the TARGETS string carries each sentinel followed by the
    masked-out tokens. Output per doc: token/mask/span counts + both
    strings, byte-identical across engines. Plan: one tokenize explode,
    per-doc windows (partitioned by doc_id — bounded frames at any
    scale), pieces re-assembled with the sort-collect_list idiom; no
    Python, no global window. At 100 TB this runs as the final map-shape
    pass before shard write."""
    from etl_data_processor_spark.ops.sampling import hash32
    from pyspark.sql import Window

    d = _cat(spark, sf_dir).documents
    tok = d.select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")
    masked = (
        F.pmod(
            hash32(F.col("doc_id") * _SPAN_SALT + F.col("pos")),
            F.lit(_SPAN_MOD),
        )
        == 0
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    m = tok.withColumn("masked", masked)
    s = m.withColumn(
        "span_start",
        F.col("masked") & ~F.coalesce(F.lag("masked").over(win), F.lit(False)),
    )
    z = s.withColumn(
        "span_id",
        F.sum(F.col("span_start").cast("long")).over(
            win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )
    sentinel = F.concat(
        F.lit("<extra_id_"), F.col("span_id").cast("string"), F.lit(">")
    )
    in_piece = F.when(~F.col("masked"), F.col("token")).when(
        F.col("span_start"), sentinel
    )
    tg_piece = F.when(
        F.col("masked") & F.col("span_start"),
        F.concat(sentinel, F.lit(" "), F.col("token")),
    ).when(F.col("masked"), F.col("token"))

    def joined(piece):
        return F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            piece.isNotNull(),
                            F.struct(F.col("pos").alias("pos"), piece.alias("pc")),
                        )
                    )
                ),
                lambda st: st.getField("pc"),
            ),
            " ",
        )

    return z.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("masked").cast("long")).alias("n_masked"),
        F.sum(F.col("span_start").cast("long")).alias("n_spans"),
        joined(in_piece).alias("inputs"),
        joined(tg_piece).alias("targets"),
    )


# =====================================================================
# VAD-style energy segmentation over binary PCM (B33 ext — the
# speech-data-curation step: split each track into voiced segments)
# =====================================================================

_VAD_DOCS = 100
_VAD_BLOCK = 64

_VAD_ORACLE = f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < {_VAD_DOCS}),
samples AS (
    SELECT doc_id, CAST(t.i AS BIGINT) AS n,
           (((doc_id * 7 + CAST(t.i AS BIGINT) * 13) % 200) - 100)
             * CASE WHEN ((CAST(t.i AS BIGINT) // {_VAD_BLOCK} + doc_id) % 3 = 0)
                    THEN 0 ELSE 1 END AS w
    FROM ids, UNNEST(range(0, 1024)) AS t(i)
),
fr AS (
    SELECT doc_id, CAST(n // {_VAD_BLOCK} AS INT) AS frame_idx,
           CAST(SUM(w * w) AS BIGINT) AS sumsq
    FROM samples GROUP BY doc_id, frame_idx
),
v AS (
    SELECT *, sumsq > 0 AS voiced,
           (sumsq > 0) AND NOT COALESCE(
               LAG(sumsq > 0) OVER (PARTITION BY doc_id ORDER BY frame_idx),
               FALSE
           ) AS new_seg
    FROM fr
),
z AS (
    SELECT *, SUM(CASE WHEN new_seg THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY frame_idx) - 1 AS seg
    FROM v
)
SELECT doc_id, CAST(seg AS INTEGER) AS seg_idx,
       CAST(MIN(frame_idx) AS INTEGER) AS start_frame,
       CAST(MAX(frame_idx) AS INTEGER) AS end_frame,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(sumsq) AS BIGINT) AS energy
FROM z WHERE voiced GROUP BY doc_id, seg
"""


@q("q_audio_vad_segments", _VAD_ORACLE)
def q_audio_vad_segments(spark, sf_dir):
    """B33 ext: voice-activity-style segmentation over REAL binary PCM —
    the speech-curation step between ingest and transcription: an
    envelope-gated waveform (ops.multimodal.pcm_synthesize_gated — every
    third 64-sample block silent, per-track phase) is packed into a
    genuine binary column, DECODED back frame by frame in the
    Arrow-batched mapInPandas stage (ops.multimodal.pcm_frame_features,
    the q_audio_pcm_features plumbing), and frames with nonzero energy
    group into maximal voiced runs (gaps-and-islands per track). Output:
    per (track, segment) the frame range, length and total energy. The
    oracle recomputes everything from the closed-form waveform, so the
    binary round-trip + segmentation is value-checked end to end. Plan:
    one decode pass, one per-track window (bounded frames), one hash
    aggregate; at 100 TB tracks partition freely (no cross-track
    state)."""
    from pyspark.sql import Window

    from etl_data_processor_spark.ops.multimodal import (
        pcm_frame_features,
        pcm_synthesize_gated,
    )

    docs = _cat(spark, sf_dir).documents.filter(F.col("doc_id") < _VAD_DOCS)
    blobs = pcm_synthesize_gated(docs, n_samples=1024, block=_VAD_BLOCK)
    fr = pcm_frame_features(blobs, frame=_VAD_BLOCK).select(
        "doc_id", "frame_idx", "sumsq"
    )
    win = Window.partitionBy("doc_id").orderBy("frame_idx")
    voiced = F.col("sumsq") > 0
    v = fr.withColumn("voiced", voiced).withColumn(
        "new_seg",
        voiced & ~F.coalesce(F.lag(voiced).over(win), F.lit(False)),
    )
    z = v.withColumn(
        "seg",
        F.sum(F.col("new_seg").cast("long")).over(
            win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )
    return (
        z.filter("voiced")
        .groupBy("doc_id", F.col("seg").cast("int").alias("seg_idx"))
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("sumsq").alias("energy"),
        )
    )
