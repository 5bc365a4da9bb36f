"""Chunked batch-enrichment operator (north star B34).

Generalizes the reference's core pipeline insight — A13+A14+A15 fused
(main.py:262-305): dedupe the inputs of an expensive per-value function,
call it in bounded chunks with per-chunk error isolation and rate limiting,
then left-join results back with deterministic miss fallbacks
(main.py:297-300: miss → (raw_text, '')).

Spark-first shape:
- ``distinct()`` before the expensive stage — the reference's manual rewrite
  (main.py:264, 272-273, 285) that Catalyst won't do across a Python UDF.
- ``mapInPandas`` for the expensive stage: Arrow delivers batches, the
  client is constructed once per partition (the reference's session reuse,
  main.py:26), chunking bounds each external call, failures degrade to
  deterministic fallback rows instead of failing the job (main.py:213-214).
- Left join back on the key; at 100 TB the distinct side is far smaller
  than the fact side, so the join is usually broadcast-able.

The client is pluggable: production would wrap an LLM/HTTP service;
``deterministic_stub_client`` keeps tests and oracles exact.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

EnrichClient = Callable[[list[str]], dict[str, dict[str, str]]]


def deterministic_stub_client(texts: list[str]) -> dict[str, dict[str, str]]:
    """Pure, deterministic stand-in for the reference's LLM extractor
    (main.py:178-215): active ingredient = first token uppercased, trade
    name = second token, '' when absent."""
    out = {}
    for t in texts:
        toks = t.split()
        out[t] = {
            "active_ingredient": toks[0].upper() if toks else "",
            "trade_name": toks[1] if len(toks) > 1 else "",
        }
    return out


def batch_enrich(
    df: DataFrame,
    key_col: str,
    result_schema: StructType,
    client_factory: Callable[[], EnrichClient] = lambda: deterministic_stub_client,
    chunk_size: int = 200,
    rate_limit_s: float = 0.0,
    defaults: dict[str, Column] | None = None,
    broadcast_results: bool = True,
) -> DataFrame:
    """Enrich ``df`` by ``key_col`` through an expensive batched function.

    ``result_schema`` must contain ``key_col`` plus the enrichment columns.
    Fallback rows (chunk failure / client miss) carry NULLs, which the final
    join fills from ``defaults`` (coalesce), mirroring main.py:297-303.
    """
    field_names = [f.name for f in result_schema.fields if f.name != key_col]

    def enrich_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()  # one client per partition (conn reuse)
        for pdf in batches:
            keys = pdf[key_col].tolist()
            rows: list[dict] = []
            for i in range(0, len(keys), chunk_size):
                chunk = keys[i : i + chunk_size]
                if rate_limit_s:
                    time.sleep(rate_limit_s)  # token-bucket stand-in (A19)
                try:
                    result = client(chunk)
                except Exception:
                    # per-chunk isolation (main.py:213-214): failed chunk
                    # degrades to deterministic fallback rows, job continues
                    result = {}
                for key in chunk:
                    hit = result.get(key, {})
                    rows.append(
                        {key_col: key, **{f: hit.get(f) for f in field_names}}
                    )
            yield pd.DataFrame(rows, columns=[key_col] + field_names)

    distinct_keys = df.select(key_col).distinct()
    enriched = distinct_keys.mapInPandas(enrich_partition, result_schema)

    # Broadcast fits the reference's regime (hundreds of distinct keys).
    # For huge key spaces pass broadcast_results=False: the join becomes a
    # shuffle join on the key both sides already hash on.
    right = F.broadcast(enriched) if broadcast_results else enriched
    out = df.join(right, key_col, "left")
    for col_name, fallback in (defaults or {}).items():
        out = out.withColumn(col_name, F.coalesce(F.col(col_name), fallback))
    return out


class TokenBucket:
    """Per-partition rate limiter (A19, main.py:212/278/351 generalized):
    allows ``rate`` calls/sec with bursts up to ``burst``. Monotonic-clock
    based; one instance per partition inside mapInPandas (executor-local —
    cluster-wide limits need rate*executors sized accordingly)."""

    def __init__(self, rate: float, burst: int = 1):
        self.rate = float(rate)
        self.capacity = float(burst)
        self.tokens = float(burst)
        self.last = time.monotonic()

    def acquire(self) -> None:
        while True:
            now = time.monotonic()
            self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return
            time.sleep((1.0 - self.tokens) / self.rate)
