"""Round-10 pins (ADVICE r9 fixes).

- cached_model revalidates the persisted model against the CURRENT
  source signature on every disk load: a fixture regenerated in place
  (same path, same params -> same slug) retrains instead of serving
  stale centroids forever, and the slug is reused, not leaked.
- mwu_of_counts survives degenerate inputs (all observations in one
  tie group / empty side) with the batch twin's NULL-on-div-by-zero
  semantics instead of raising out of the foreachBatch sink.
- vacuum_models with neither spark nor warehouse raises a clear
  ValueError instead of AttributeError.
"""

from __future__ import annotations

import io
import os
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from etl_data_processor_spark.ops import similarity as SIM
from etl_data_processor_spark.streaming.drift import mwu_of_counts


def _pairs(df):
    return {(r["query_id"], r["doc_id"]) for r in df.collect()}


def _plan_of(spark, df) -> str:
    spark.catalog.clearCache()
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# --- PQ-served hybrid (VERDICT r9 item 1) ----------------------------


def test_hybrid_annpq_served_recall_vs_exact_twin(spark, sf_dir):
    """Fused top-10 recall >= 0.8 against q_hybrid_rrf_served (the
    exact-vector-leg twin) — the rows-only gate every ANN key carries.
    Measured: 0.97 at sf0.001, 1.0 at sf0.01."""
    served = _pairs(
        entry_mod.queries()["q_hybrid_annpq_served"](spark, sf_dir)
    )
    exact = _pairs(entry_mod.queries()["q_hybrid_rrf_served"](spark, sf_dir))
    assert len(exact) > 0
    recall = len(served & exact) / len(exact)
    assert recall >= 0.8, recall


def test_hybrid_annpq_served_final_plan_readset(spark, sf_dir):
    """The FINAL registered plan's read set: posting shards + doclen
    sidecar (artifacts), the shortlist's float vectors by id PUSHDOWN
    (In(vec_id) on embeddings.parquet — never a full corpus scan), and
    zero documents.parquet scans."""
    df = entry_mod.queries()["q_hybrid_annpq_served"](spark, sf_dir)
    plan = _plan_of(spark, df)
    scans = [ln for ln in plan.splitlines()
             if "Scan parquet" in ln or "Location" in ln]
    assert not any("documents.parquet" in ln for ln in scans), scans
    assert any("_artifacts" in ln for ln in scans), scans
    assert "In(token" in plan, "token IN-filter must push into shard scan"
    # the ONLY embeddings touch is the shortlist fetch, id-pushed
    assert "In(vec_id" in plan, (
        "shortlist id IN-filter must push into the embeddings scan"
    )


def test_hybrid_annpq_shortlist_plan_prunes_code_artifact(spark, sf_dir):
    """The ADC shortlist stage (executed eagerly at query time) scans
    the persisted CODE artifact with the probed-list IN-filter PUSHED
    into the parquet scan, and touches neither embeddings.parquet nor
    documents.parquet — the corpus-sized float lists are OUT of the
    vector leg's big scan (the r9 IVF-Flat residue, closed)."""
    from etl_data_processor_spark.queries_r10 import _ivfpq_shortlist_df

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrows = emb.filter(F.col("vec_id").isin([0, 1, 2])).select(
        "vec_id", "embedding"
    ).collect()
    shortlist, _qv = _ivfpq_shortlist_df(spark, sf_dir, qrows)
    plan = _plan_of(spark, shortlist)
    scans = [ln for ln in plan.splitlines()
             if "Scan parquet" in ln or "Location" in ln]
    assert not any("embeddings.parquet" in ln for ln in scans), scans
    assert not any("documents.parquet" in ln for ln in scans), scans
    assert any("_artifacts" in ln for ln in scans), scans
    assert "In(__list" in plan, (
        "probed-list IN-filter must push into the code-artifact scan"
    )


def test_ivfpq_serving_cold_session_runs_no_training(spark, sf_dir):
    """Restart scenario for the PQ serving path: with both artifacts on
    disk, a cold session (cleared model memo + DataFrame memo + session
    cache) builds the shortlist plan without re-running k-means OR the
    PQ Lloyd pass — centroids and codebooks come from warehouse/_models,
    the code table from warehouse/_artifacts."""
    from etl_data_processor_spark.ops import dedup as D
    from etl_data_processor_spark.queries_ext3 import ivfpq_index_artifact
    from etl_data_processor_spark.queries_r10 import _ivfpq_shortlist_df

    ivfpq_index_artifact(spark, sf_dir)  # train at most once
    for mkey in (("ivfpq-cents", sf_dir, 16), ("pq", sf_dir, 16, 16)):
        assert os.path.exists(SIM.model_location(spark, mkey))
        SIM._MODEL_CACHE.pop(mkey, None)
    D._DF_CACHE.clear()
    spark.catalog.clearCache()

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrows = emb.filter(F.col("vec_id").isin([0, 1, 2])).select(
        "vec_id", "embedding"
    ).collect()
    import etl_data_processor_spark.ops.similarity as sim_mod

    real_kmeans = sim_mod.train_ivf_centroids
    real_pq = sim_mod.train_pq_codebooks
    sim_mod.train_ivf_centroids = _boom
    sim_mod.train_pq_codebooks = _boom
    try:
        shortlist, _qv = _ivfpq_shortlist_df(spark, sf_dir, qrows)
        assert shortlist.limit(1).count() == 1
    finally:
        sim_mod.train_ivf_centroids = real_kmeans
        sim_mod.train_pq_codebooks = real_pq


def _boom(*a, **k):
    raise AssertionError("model training ran in a cold serving session")


def test_cached_model_retrains_on_source_regeneration(spark, tmp_path):
    """In-place fixture regeneration (content changes, path does not)
    must invalidate the persisted model: the manifest's recorded source
    signature no longer matches, so a cold load retrains and atomically
    overwrites the SAME slug (no unreachable-slug leak)."""
    src = tmp_path / "corpus.bin"
    src.write_bytes(b"v1" * 100)
    key = ("r10-test-model", str(tmp_path))
    calls = []

    def trainer():
        calls.append(1)
        return [(0, [float(len(calls)), 2.5])]

    first = SIM.cached_model(
        key, trainer, spark=spark, sources=(str(src),)
    )
    path = SIM.model_location(spark, key)
    try:
        assert calls == [1]
        # cold load, source untouched: served from disk, no retrain
        SIM._MODEL_CACHE.pop(key, None)
        assert SIM.cached_model(
            key, trainer, spark=spark, sources=(str(src),)
        ) == first
        assert calls == [1]
        # regenerate the fixture IN PLACE (different size -> different
        # signature even if mtime granularity collapses)
        src.write_bytes(b"v2" * 101)
        SIM._MODEL_CACHE.pop(key, None)
        second = SIM.cached_model(
            key, trainer, spark=spark, sources=(str(src),)
        )
        assert calls == [1, 1], "regenerated source must retrain"
        assert second == [(0, [2.0, 2.5])]
        # the slug was REUSED (overwritten), not leaked
        assert os.path.exists(path)
        # and the refreshed manifest now validates: next cold load hits
        SIM._MODEL_CACHE.pop(key, None)
        assert SIM.cached_model(
            key, trainer, spark=spark, sources=(str(src),)
        ) == second
        assert calls == [1, 1]
    finally:
        SIM._MODEL_CACHE.pop(key, None)
        for p in (path, f"{path}.key.json"):
            if os.path.exists(p):
                os.unlink(p)


def test_cached_model_missing_manifest_is_stale(spark, tmp_path):
    """A model file with sources but NO manifest cannot prove it was
    trained on the current fixture -> treated as stale (retrains)."""
    src = tmp_path / "corpus.bin"
    src.write_bytes(b"x" * 10)
    key = ("r10-test-nomanifest", str(tmp_path))
    calls = []

    def trainer():
        calls.append(1)
        return [1, 2, 3]

    SIM.cached_model(key, trainer, spark=spark, sources=(str(src),))
    path = SIM.model_location(spark, key)
    try:
        os.unlink(f"{path}.key.json")
        SIM._MODEL_CACHE.pop(key, None)
        SIM.cached_model(key, trainer, spark=spark, sources=(str(src),))
        assert calls == [1, 1]
    finally:
        SIM._MODEL_CACHE.pop(key, None)
        for p in (path, f"{path}.key.json"):
            if os.path.exists(p):
                os.unlink(p)


def test_mwu_degenerate_counts_do_not_raise():
    """All observations in one tie group -> tie-corrected variance is 0;
    the batch SQL twin's non-ANSI division yields NULL there, so the
    driver twin returns (ns, u2, None, False) instead of raising
    ZeroDivisionError out of the streaming sink."""
    ns, u2, z6, shifted = mwu_of_counts({5: 3}, {5: 7})
    assert (ns, z6, shifted) == (3, None, False)
    assert u2 == 3 * (2 * 0 + 7)  # all ties: U*2 = cs*cr
    # empty reference: nvar = ns*0*... = 0
    ns2, _u22, z62, sh2 = mwu_of_counts({1: 4, 2: 1}, {})
    assert (ns2, z62, sh2) == (5, None, False)
    # sanity: the non-degenerate path still yields a finite z
    _, _, z6_ok, _ = mwu_of_counts({1: 5, 2: 5}, {3: 5, 4: 5})
    assert z6_ok is not None


def test_vacuum_models_requires_spark_or_warehouse():
    with pytest.raises(ValueError, match="warehouse"):
        SIM.vacuum_models()
