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

import os

import pytest

from etl_data_processor_spark.ops import similarity as SIM
from etl_data_processor_spark.streaming.drift import mwu_of_counts


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
