"""LLM-client adapter for batch_enrich (VERDICT r2 item 4): JSON-reply
parsing with fence stripping, per-chunk isolation producing A15 miss-rows,
rate-limit retry, and the env-flag-gated factory — driven by fault-injecting
fake backends (no SDK, no network)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from etl_data_processor_spark.ops.enrich import (
    RateLimitError,
    TokenBucket,
    batch_enrich,
    deterministic_stub_client,
    llm_json_client,
    resolve_enrich_client,
)

FIELDS = ["active_ingredient", "trade_name"]
SCHEMA = StructType(
    [StructField("raw", StringType())]
    + [StructField(f, StringType()) for f in FIELDS]
)


def _chunk_of(prompt: str) -> list[str]:
    return json.loads(prompt[prompt.index("Input List:") + len("Input List:"):])


def _good_reply(texts, fence=True):
    reply = {t: {"active_ingredient": t.upper(), "trade_name": t[:2]} for t in texts}
    body = json.dumps(reply)
    return f"```json\n{body}\n```" if fence else body


def test_happy_path_strips_fences_and_parses():
    client = llm_json_client(lambda p: _good_reply(_chunk_of(p)), FIELDS)
    out = client(["abc", "def"])
    assert out == {
        "abc": {"active_ingredient": "ABC", "trade_name": "ab"},
        "def": {"active_ingredient": "DEF", "trade_name": "de"},
    }


def test_reply_hygiene_missing_extra_nondict():
    """Missed keys are absent (-> A15 miss-rows downstream); hallucinated
    keys and non-dict values are discarded; unknown fields dropped."""

    def generate(prompt):
        texts = _chunk_of(prompt)
        reply = {
            texts[0]: {"active_ingredient": "X", "bogus_field": "y"},
            "never-asked": {"active_ingredient": "H"},
            texts[1]: "not-a-dict",
        }
        return json.dumps(reply)

    client = llm_json_client(generate, FIELDS)
    out = client(["a", "b", "c"])
    assert out == {"a": {"active_ingredient": "X"}}


def test_malformed_json_raises_for_chunk_isolation():
    client = llm_json_client(lambda p: "Sure! Here are the results: a=1", FIELDS)
    with pytest.raises(ValueError):
        client(["a"])
    # a JSON list (not object) is also a contract violation
    client = llm_json_client(lambda p: "[1, 2]", FIELDS)
    with pytest.raises(ValueError):
        client(["a"])


def test_rate_limit_retries_then_succeeds():
    calls = {"n": 0}

    def flaky(prompt):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RateLimitError("429 slow down")
        return _good_reply(_chunk_of(prompt))

    client = llm_json_client(flaky, FIELDS, max_retries=3)
    assert client(["x"])["x"]["active_ingredient"] == "X"
    assert calls["n"] == 3


def test_rate_limit_exhaustion_propagates():
    def always_429(prompt):
        exc = RuntimeError("too many requests")
        exc.status_code = 429  # duck-typed SDK error
        raise exc

    client = llm_json_client(always_429, FIELDS, max_retries=1)
    with pytest.raises(RuntimeError):
        client(["x"])


def test_non_rate_limit_error_does_not_retry():
    calls = {"n": 0}

    def broken(prompt):
        calls["n"] += 1
        raise RuntimeError("model exploded")

    client = llm_json_client(broken, FIELDS, max_retries=5)
    with pytest.raises(RuntimeError):
        client(["x"])
    assert calls["n"] == 1


def test_token_bucket_paces_calls():
    stamps = []
    import time

    bucket = TokenBucket(rate=50.0, burst=1)
    client = llm_json_client(
        lambda p: (stamps.append(time.monotonic()), _good_reply(_chunk_of(p)))[1],
        FIELDS,
        bucket=bucket,
    )
    client(["a"])
    client(["b"])
    client(["c"])
    assert stamps[2] - stamps[0] >= 1.5 / 50.0  # ~rate-limited spacing


def test_batch_enrich_with_faulty_adapter_yields_miss_rows(spark):
    """End-to-end through batch_enrich: chunk 'bad' returns malformed JSON
    -> whole-chunk fallback; a missed key in a good chunk -> miss-row; both
    get the A15 defaults (raw text, '') while good rows enrich."""

    def generate(prompt):
        # self-contained (no test-module globals): this closure is pickled
        # to executors, where the tests package is not importable
        import json as _json

        texts = _json.loads(prompt[prompt.index("Input List:") + len("Input List:"):])
        if "bad" in texts:
            return "I'm sorry, I can't produce JSON today"
        reply = {
            t: {"active_ingredient": t.upper(), "trade_name": t[:2]}
            for t in texts
            if t != "missed"
        }
        return "```json\n" + _json.dumps(reply) + "\n```"

    df = spark.createDataFrame([("good",), ("bad",), ("missed",)], "raw string")
    out = batch_enrich(
        df,
        key_col="raw",
        result_schema=SCHEMA,
        client_factory=lambda: llm_json_client(generate, FIELDS),
        chunk_size=1,  # one chunk per key -> failures isolate per key
        defaults={
            "active_ingredient": F.col("raw"),
            "trade_name": F.lit(""),
        },
    )
    rows = {r["raw"]: r for r in out.collect()}
    assert rows["good"]["active_ingredient"] == "GOOD"
    assert rows["bad"]["active_ingredient"] == "bad"  # chunk-failure default
    assert rows["missed"]["active_ingredient"] == "missed"  # miss-row default
    assert rows["missed"]["trade_name"] == ""


def test_env_flag_resolves_real_adapter(spark, monkeypatch):
    """Unset -> deterministic stub; set to module:callable -> the adapter
    wraps that backend (constructed per partition, on the executor)."""
    factory = resolve_enrich_client(FIELDS)
    assert factory() is deterministic_stub_client

    monkeypatch.setenv("ETL_LLM_GENERATE", "tests.fake_llm:generate")
    factory = resolve_enrich_client(FIELDS)
    out = factory()(["Drug7 tablet"])
    assert out["Drug7 tablet"] == {
        "active_ingredient": "DRUG7",
        "trade_name": "tablet",
    }
