"""Round-9 pins: the served ANN story (VERDICT r8 items 1-2).

- q_hybrid_ann_served: fused recall >= 0.8 vs the exact twin and a
  fresh-plan pin proving zero corpus scans at query time (both legs
  read persisted artifacts only).
- cached_model's disk layer: a cold process (simulated by clearing the
  in-memory memo) loads trained model state from warehouse/_models
  without invoking the trainer, and the loaded object is equal — so
  model_fingerprint, which keys the derived index artifacts, is stable
  across sessions and the artifacts are NOT invalidated by a restart.
"""

from __future__ import annotations

import io
import os
from contextlib import redirect_stdout

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from etl_data_processor_spark.ops import similarity as SIM


def _pairs(df):
    return {(r["query_id"], r["doc_id"]) for r in df.collect()}


def test_hybrid_ann_served_recall_vs_exact_twin(spark, sf_dir):
    """Fused top-10 recall >= 0.8 against q_hybrid_rrf_served (the
    exact-vector-leg twin) — the rows-only gate every ANN key carries."""
    served = _pairs(entry_mod.queries()["q_hybrid_ann_served"](spark, sf_dir))
    exact = _pairs(entry_mod.queries()["q_hybrid_rrf_served"](spark, sf_dir))
    assert len(exact) > 0
    recall = len(served & exact) / len(exact)
    assert recall >= 0.8, recall


def test_hybrid_ann_served_plan_never_scans_corpus(spark, sf_dir):
    """VERDICT r8 item 1's 'done' bar: the fresh-session physical plan
    reads ONLY artifact parquet (posting shards, doclen sidecar,
    IVF-Flat assignment) — zero documents.parquet and zero
    embeddings.parquet scans at query time; the probed-list and token
    IN-filters push into the artifact scans."""
    served = entry_mod.queries()["q_hybrid_ann_served"](spark, sf_dir)
    spark.catalog.clearCache()
    buf = io.StringIO()
    with redirect_stdout(buf):
        served.explain("formatted")
    plan = buf.getvalue()
    scans = [ln for ln in plan.splitlines()
             if "Scan parquet" in ln or "Location" in ln]
    assert not any("documents.parquet" in ln for ln in scans), scans
    assert not any("embeddings.parquet" in ln for ln in scans), scans
    assert any("_artifacts" in ln for ln in scans), scans
    assert "In(token" in plan, "token IN-filter must push into the shard scan"
    assert "In(__list" in plan, (
        "probed-list IN-filter must push into the IVF index scan"
    )


def test_cached_model_cold_load_skips_training(spark, sf_dir, tmp_path):
    """A cold process (cleared memo) serves the model from the on-disk
    store without invoking the trainer, and the loaded state is equal
    to the trained state (so model_fingerprint-keyed artifacts stay
    valid across restarts)."""
    key = ("r9-test-model", str(tmp_path))
    calls = []

    def trainer():
        calls.append(1)
        return [(0, [1.0, 2.5, -0.125]), (1, [0.3333333333333333, 7.0, 0.1])]

    first = SIM.cached_model(key, trainer, spark=spark)
    assert calls == [1]
    path = SIM.model_location(spark, key)
    assert os.path.exists(path)
    try:
        # simulate process death: the memo is gone, the file is not
        SIM._MODEL_CACHE.pop(key, None)
        second = SIM.cached_model(key, trainer, spark=spark)
        assert calls == [1], "cold load must not retrain"
        assert second == first
        assert SIM.model_fingerprint(second) == SIM.model_fingerprint(first)
    finally:
        SIM._MODEL_CACHE.pop(key, None)
        if os.path.exists(path):
            os.unlink(path)


def test_ivf_serving_cold_session_runs_no_kmeans(spark, sf_dir):
    """The production restart scenario end-to-end: after the index
    exists, a cold session (cleared model memo + DataFrame memo +
    session cache) builds q_cosine_ivf's plan without re-running the
    k-means corpus pass — the centroids come from warehouse/_models,
    the assignment table from warehouse/_artifacts."""
    from etl_data_processor_spark.ops import dedup as D
    from etl_data_processor_spark.queries_north import ivf_index_artifact

    # ensure both artifacts exist (trains at most once)
    ivf_index_artifact(spark, sf_dir)
    model_key = ("ivf", sf_dir, 16, 2, 0.5)
    assert os.path.exists(SIM.model_location(spark, model_key))

    SIM._MODEL_CACHE.pop(model_key, None)
    D._DF_CACHE.clear()
    spark.catalog.clearCache()

    # a k-means pass would run corpus jobs through train_ivf_centroids;
    # prove it is never entered by poisoning it for this cold rebuild
    import etl_data_processor_spark.ops.similarity as sim_mod

    real = sim_mod.train_ivf_centroids
    sim_mod.train_ivf_centroids = _boom
    try:
        cents, assigned, _key = ivf_index_artifact(spark, sf_dir)
    finally:
        sim_mod.train_ivf_centroids = real
    assert len(cents) == 16
    assert assigned.limit(1).count() == 1


def _boom(*a, **k):
    raise AssertionError("k-means ran in a cold serving session")


def test_prf_expand_served_plan_scans_artifacts_only(spark, sf_dir):
    """VERDICT r8 item 6's 'done' bar: q_prf_expand's registered plan
    (the round-2 scorer — rounds 0/1 resolve to driver-held term sets)
    scans ONLY the shard + sidecar artifacts with the expanded term
    IN-filter pushed; documents.parquet never appears."""
    df = entry_mod.queries()["q_prf_expand"](spark, sf_dir)
    spark.catalog.clearCache()
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    scans = [ln for ln in plan.splitlines()
             if "Scan parquet" in ln or "Location" in ln]
    assert not any("documents.parquet" in ln for ln in scans), scans
    assert any("_artifacts" in ln for ln in scans), scans
    assert "In(token" in plan, (
        "round-2 term IN-filter must push into the shard scan"
    )


def test_hybrid_ann_served_schema_and_rows(spark, sf_dir):
    df = entry_mod.queries()["q_hybrid_ann_served"](spark, sf_dir)
    assert [f.name for f in df.schema.fields] == [
        "query_id", "doc_id", "rrf6", "fused_rank", "lex_rank", "vec_rank",
    ]
    rows = df.collect()
    assert len(rows) == 30  # 3 queries x fused top-10
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["fused_rank"])
    for qid, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, 11)), (qid, ranks)


def test_eval_mrr_shape_and_bounds(spark, sf_dir):
    rows = entry_mod.queries()["q_eval_mrr"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 3
    for r in rows:
        assert r["n_rel"] >= 1
        assert r["first_rank"] >= 0
        assert 0.0 <= r["rr6"] <= 1.0
        if r["first_rank"] == 1:
            assert r["rr6"] == 1.0


def test_vacuum_models_lifecycle(spark, tmp_path):
    """GC for the model store: crashed tmps and models whose recorded
    fixture dir is gone are reclaimed past the age window; live models
    (key paths exist or are relative) and young files are spared."""
    import json
    import time

    wh = str(tmp_path / "wh")
    mdir = os.path.join(wh, "_models")
    os.makedirs(mdir)
    old = time.time() - 3600

    def put(name, body, manifest_key=None, age=True):
        p = os.path.join(mdir, name)
        with open(p, "w", encoding="utf-8") as f:
            f.write(body)
        if manifest_key is not None:
            with open(f"{p}.key.json", "w", encoding="utf-8") as f:
                json.dump({"key": repr(manifest_key)}, f)
            if age:
                os.utime(f"{p}.key.json", (old, old))
        if age:
            os.utime(p, (old, old))

    live_dir = str(tmp_path / "fixture")
    os.makedirs(live_dir)
    put("live", "[(0, [1.0])]", manifest_key=("ivf", live_dir, 16))
    put("stale", "[(0, [1.0])]",
        manifest_key=("ivf", str(tmp_path / "gone_dir"), 16))
    put("relpath", "[(0, [1.0])]", manifest_key=("pq", "testdata_rel", 8))
    put("legacy", "[(0, [1.0])]")                      # no manifest, old
    put(".model-tmp-123", "partial")                   # crashed writer
    put("young", "[(0, [1.0])]",
        manifest_key=("ivf", str(tmp_path / "also_gone"), 4), age=False)

    dropped = set(SIM.vacuum_models(warehouse=wh, min_age_seconds=600))
    assert dropped == {
        "stale", "stale.key.json", "legacy", ".model-tmp-123",
    }, dropped
    left = set(os.listdir(mdir))
    assert "live" in left and "relpath" in left and "young" in left

    # dry_run lists without deleting
    put("stale2", "x", manifest_key=("m", str(tmp_path / "gone2"), 1))
    listed = SIM.vacuum_models(warehouse=wh, min_age_seconds=600,
                               dry_run=True)
    assert "stale2" in listed
    assert os.path.exists(os.path.join(mdir, "stale2"))


def test_cached_model_writes_manifest(spark, tmp_path):
    key = ("r9-manifest-model", str(tmp_path))
    try:
        SIM.cached_model(key, lambda: [(0, [1.5])], spark=spark)
        path = SIM.model_location(spark, key)
        import json

        with open(f"{path}.key.json", encoding="utf-8") as f:
            assert json.load(f)["key"] == repr(key)
    finally:
        SIM._MODEL_CACHE.pop(key, None)
        for suf in ("", ".key.json"):
            p = SIM.model_location(spark, key) + suf
            if os.path.exists(p):
                os.unlink(p)


def test_registry_rejects_duplicate_names():
    from etl_data_processor_spark.registry import QUERIES, q

    name = next(iter(QUERIES))
    import pytest

    with pytest.raises(ValueError, match="duplicate query registration"):
        q(name)(lambda spark, sf_dir: None)
