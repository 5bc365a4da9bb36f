"""Round-3 operator pins: HDR quantile sketch merge/error guarantees,
as-of tolerance semantics, spatial blocking completeness."""

from __future__ import annotations

from pyspark.sql import functions as F


def _hdr_sketch(df):
    from etl_data_processor_spark.queries_r3 import _HDR_BUCKET_SPARK

    return (
        df.select(F.expr("CAST(l_extendedprice * 100 AS BIGINT)").alias("c"))
        .select(F.expr(_HDR_BUCKET_SPARK).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def test_hdr_sketch_merges_exactly(spark, sf_dir):
    """Partial sketches over ANY disjoint split merge (count addition) to
    the whole-data sketch bit-for-bit — the materialize-once contract."""
    lin = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_extendedprice") > 0
    )
    whole = {r["bucket"]: r["cnt"] for r in _hdr_sketch(lin).collect()}
    parts = [
        _hdr_sketch(lin.filter(F.col("l_orderkey") % 3 == i)) for i in range(3)
    ]
    merged: dict[int, int] = {}
    for p in parts:
        for r in p.collect():
            merged[r["bucket"]] = merged.get(r["bucket"], 0) + r["cnt"]
    assert merged == whole


def test_hdr_quantile_error_bound(spark, sf_dir):
    """The recovered p50/p90/p99 lower bounds sit within one sub-bucket
    (1/16 octave, < ~6.3% relative) BELOW the exact percentile and never
    above it."""
    import __spark_entry__ as entry

    est = {
        r["p"]: r["est_cents"]
        for r in entry.queries()["q_sketch_quantile_hdr"](spark, sf_dir).collect()
    }
    lin = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_extendedprice") > 0
    )
    cents = lin.select(
        F.expr("CAST(l_extendedprice * 100 AS BIGINT)").alias("c")
    )
    exact = cents.agg(
        *[
            F.expr(f"percentile_disc({p / 100}) WITHIN GROUP (ORDER BY c)").alias(
                f"p{p}"
            )
            for p in (50, 90, 99)
        ]
    ).collect()[0]
    for p in (50, 90, 99):
        ex = exact[f"p{p}"]
        assert est[p] <= ex, (p, est[p], ex)
        assert est[p] >= ex * (1 - 1 / 16) - 1, (p, est[p], ex)


def test_asof_tolerance_nulls_stale_matches(spark):
    """A match older than the tolerance becomes NULL; in-window matches
    and the no-match case are unchanged vs the untolerated join."""
    from etl_data_processor_spark.ops.asof import asof_join_backward

    left = spark.createDataFrame(
        [(1, "u", 1000.0), (2, "u", 5000.0), (3, "v", 100.0)],
        "event_id long, user_id string, ts double",
    )
    right = spark.createDataFrame(
        [(10, "u", 900.0, 9.0), (11, "u", 980.0, 11.0)],
        "event_id long, user_id string, ts double, value double",
    )
    out = {
        r["event_id"]: r["value_asof"]
        for r in asof_join_backward(
            left, right, key="user_id", ts="ts", value_cols=["value"],
            tiebreak="event_id", tolerance=100.0,
        ).collect()
    }
    assert out[1] == 11.0       # 1000-980=20 <= 100: latest match kept
    assert out[2] is None       # 5000-980=4020 > 100: stale -> NULL
    assert out[3] is None       # no right rows for key v at all


def test_spatial_blocking_equals_all_pairs(spark):
    """The grid-blocked radius join must reproduce brute-force all-pairs
    exactly on a dense synthetic cloud (cell edge >= radius guarantees no
    missed neighbor; pair-uniqueness guarantees no duplicates)."""
    from etl_data_processor_spark.ops.spatial import radius_join_grid

    pts = spark.range(0, 1200).select(
        F.col("id"),
        ((F.col("id") * 173) % 997).alias("x"),
        ((F.col("id") * 661) % 991).alias("y"),
    )
    got = {
        (r["a_id"], r["b_id"], r["d2"])
        for r in radius_join_grid(pts, radius=15, cell=16).collect()
    }
    a = pts.select(F.col("id").alias("a_id"), F.col("x").alias("ax"), F.col("y").alias("ay"))
    b = pts.select(F.col("id").alias("b_id"), F.col("x").alias("bx"), F.col("y").alias("by"))
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    brute = {
        (r["a_id"], r["b_id"], r["d2"])
        for r in a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("d2", d2)
        .filter(F.col("d2") <= 225)
        .collect()
    }
    assert got == brute and len(got) > 50
    # soundness guard: a cell smaller than the radius must be rejected
    import pytest

    with pytest.raises(ValueError):
        radius_join_grid(pts, radius=15, cell=10)


def test_poisson_bootstrap_ci_covers_true_mean(spark, sf_dir):
    """The 40 replicate means derived from the integer-exact (Σw, Σw·x)
    sums form a percentile CI that (a) contains the true mean and (b) has
    sane width; Σw concentrates near n (Poisson(1) weights sum ≈ n)."""
    import __spark_entry__ as entry

    rows = entry.queries()["q_bootstrap_poisson"](spark, sf_dir).collect()
    assert len(rows) == 40
    lin = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = lin.count()
    true_mean = (
        lin.agg(F.sum(F.expr("CAST(l_quantity * 100 AS BIGINT)"))).collect()[0][0]
        / n
    )
    means = sorted(r["swx"] / r["sw"] for r in rows)
    for r in rows:  # weights sum within 5 sigma of n (var = n)
        assert abs(r["sw"] - n) < 5 * n ** 0.5 + 10
    lo, hi = means[1], means[38]  # ~5th..95th percentile of 40
    assert lo <= true_mean <= hi, (lo, true_mean, hi)
    assert (hi - lo) / true_mean < 0.05  # tight at fixture n


def test_eval_metrics_coherence(spark, sf_dir):
    """PR-curve counts are monotone in the threshold (tp/fp shrink, fn
    grows), tp+fn is constant (= all positives), and the rank-sum AUC of
    the correlated classifier lands well above chance."""
    import __spark_entry__ as entry

    qs = entry.queries()
    curve = {r["thr"]: r for r in qs["q_eval_pr_curve"](spark, sf_dir).collect()}
    thrs = sorted(curve)
    n_pos = curve[thrs[0]]["tp"] + curve[thrs[0]]["fn"]
    prev = None
    for t in thrs:
        r = curve[t]
        assert r["tp"] + r["fn"] == n_pos
        if prev is not None:
            assert r["tp"] <= prev["tp"] and r["fp"] <= prev["fp"]
            assert r["fn"] >= prev["fn"]
        prev = r
    row = qs["q_eval_auc"](spark, sf_dir).collect()[0]
    n1, n0 = row["n_pos"], row["n_neg"]
    auc = (row["rank_sum_pos"] - n1 * (n1 + 1) / 2) / (n1 * n0)
    assert 0.7 < auc < 1.0, auc  # score drives the label: far above 0.5


def test_tokenized_join_equals_raw_join(spark, sf_dir):
    """Pseudonymization must preserve joinability: the tokenized-key join
    aggregates to exactly the raw-key join."""
    import __spark_entry__ as entry

    got = {
        (r["segment"], r["n_orders"], r["rev_cents"])
        for r in entry.queries()["q_pii_tokenize"](spark, sf_dir).collect()
    }
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    raw = {
        (r["segment"], r["n_orders"], r["rev_cents"])
        for r in o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.expr("CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)")
            ).alias("rev_cents"),
        )
        .collect()
    }
    assert got == raw


def test_join_cardinality_estimator_within_2x(spark, sf_dir):
    """The classic est = n1*n2/max(d1,d2) per-bucket estimator lands
    within 2x of the actual join output on the uniform fixture."""
    import __spark_entry__ as entry

    rows = entry.queries()["q_join_cardinality_hist"](spark, sf_dir).collect()
    assert len(rows) == 16
    for r in rows:
        est = r["n1"] * r["n2"] / max(r["d1"], r["d2"])
        if r["actual"] > 0:
            assert est / r["actual"] < 2 and r["actual"] / est < 2, (
                r["b"], est, r["actual"],
            )


def test_median_of_means_robustness(spark, sf_dir):
    """The MoM estimate sits near the plain mean on clean data, and the
    deterministic bucket split is partitioning-independent."""
    import __spark_entry__ as entry

    rows = entry.queries()["q_median_of_means"](spark, sf_dir).collect()
    assert len(rows) == 16
    means = sorted(r["s"] / r["n"] for r in rows)
    mom = (means[7] + means[8]) / 2
    lin = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    agg = lin.agg(
        F.sum(F.expr("CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)")),
        F.count(F.lit(1)),
    ).collect()[0]
    plain = agg[0] / agg[1]
    assert abs(mom - plain) / plain < 0.05


def test_maxgap_funnel_bounded_by_unconstrained(spark, sf_dir):
    """The attribution-window funnel can only lose conversions relative
    to the unconstrained chain, never gain them."""
    import __spark_entry__ as entry

    qs = entry.queries()
    gap = qs["q_funnel_maxgap"](spark, sf_dir).collect()[0]
    free = qs["q_funnel"](spark, sf_dir).collect()[0]
    assert gap["n_view"] == free["n_view"]
    assert gap["n_click_24h"] <= free["n_click_after_view"]
    assert gap["n_purchase_24h"] <= free["n_purchase_after_click"]
    assert gap["n_purchase_24h"] <= gap["n_click_24h"] <= gap["n_view"]


def test_interpolation_brackets_and_endpoints(spark, sf_dir):
    """Every interpolated value lies within [min(v0,v1), max(v0,v1)] of
    its covering interval — linear interpolation never extrapolates."""
    import __spark_entry__ as entry

    rows = entry.queries()["q_ts_interpolate"](spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # bound check against the global value range is a cheap necessary
    # condition; the oracle already pins exact values
    import pyspark.sql.functions as SF

    bounds = ev.filter(SF.col("event_type") == "click").agg(
        SF.min(SF.expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)")),
        SF.max(SF.expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)")),
    ).collect()[0]
    mn, mx = bounds[0], bounds[1]
    stats = rows.agg(
        SF.min("interp_c"), SF.max("interp_c"), SF.count(SF.lit(1))
    ).collect()[0]
    assert stats[2] > 0
    assert stats[0] >= mn and stats[1] <= mx
