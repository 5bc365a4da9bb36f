"""Paginated-API source (reference A1/A2) as a Spark 4 Python Data Source.

The reference fetches a paged HTTP listing: page 1 → parse total count →
ceil-div by page size → loop pages (main.py:44-83, 333-351). The Spark-native
shape is a DataSource whose ``partitions()`` IS the page plan — one partition
per page, fetched in parallel by executors, with per-record parse-failure
skipping (A3, main.py:98-103).

Network is deliberately pluggable: ``PagedDecisionSource`` ships with a
deterministic synthetic "site" (no sockets in tests); a real deployment
replaces ``_fetch_page`` with an HTTP GET + session reuse + token-bucket
rate limiting per partition (A19) — the planning/parallelism machinery is
identical.

Usage:
    spark.dataSource.register(PagedDecisionSource)
    df = spark.read.format("paged_decisions").option("total_rows", 228).load()
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

PAGE_SIZE = 25  # the reference site's page size (main.py:70)

SCHEMA_DDL = (
    "page int, row_in_page int, url string, status string, raw_drug_text string"
)

_STATUSES = ["Anbefalet", "Ikke anbefalet", "Delvist anbefalet"]


def _synthetic_record(i: int) -> tuple:
    """Deterministic stand-in for one parsed decision card."""
    page = i // PAGE_SIZE + 1
    return (
        page,
        i % PAGE_SIZE,
        f"/anbefalinger/decision-{i}",
        _STATUSES[i % 3],
        f"Drug{i} tablet",
    )


class _PagePartition(InputPartition):
    def __init__(self, page: int, total_rows: int):
        self.page = page
        self.total_rows = total_rows


class _PagedReader(DataSourceReader):
    def __init__(self, options):
        self.total_rows = int(options.get("total_rows", 228))

    def partitions(self):
        # A2 (main.py:63-83): page count = ceil(total / PAGE_SIZE); each page
        # becomes an input partition -> executors fetch pages concurrently
        # (the reference loops them serially with sleeps).
        n_pages = max(1, -(-self.total_rows // PAGE_SIZE))
        return [_PagePartition(p, self.total_rows) for p in range(1, n_pages + 1)]

    def read(self, partition: _PagePartition):
        # A1/A3: fetch one page, yield parsed records, skip malformed ones.
        start = (partition.page - 1) * PAGE_SIZE
        end = min(start + PAGE_SIZE, partition.total_rows)
        for i in range(start, end):
            try:
                yield _synthetic_record(i)
            except Exception:
                continue  # per-record skip (main.py:98-103)


class _PagedStreamReader(SimpleDataSourceStreamReader):
    """Streaming shape of the same source (Spark 4 streaming Python Data
    Source): the offset is the next unread page, each micro-batch fetches up
    to ``pages_per_batch`` new pages, and ``readBetweenOffsets`` replays a
    committed range deterministically for failure recovery — which is what
    makes the source exactly-once-capable end to end (pair with an
    idempotent sink, streaming/windows.py::idempotent_parquet_sink).

    This is the incremental version of the reference's polling loop
    (main.py:333-351): instead of a batch job re-fetching all pages, a
    continuous query picks up new pages as the listing grows."""

    def __init__(self, options):
        self.total_rows = int(options.get("total_rows", 228))
        self.pages_per_batch = int(options.get("pages_per_batch", 2))
        self.n_pages = max(1, -(-self.total_rows // PAGE_SIZE))

    def initialOffset(self) -> dict:
        return {"next_page": 1}

    def _page_rows(self, page: int):
        start, end = (page - 1) * PAGE_SIZE, min(page * PAGE_SIZE, self.total_rows)
        for i in range(start, end):
            try:
                yield _synthetic_record(i)
            except Exception:
                continue  # per-record skip (main.py:98-103)

    def read(self, start: dict):
        first = start["next_page"]
        if first > self.n_pages:
            return iter([]), start
        last = min(first + self.pages_per_batch - 1, self.n_pages)
        rows = [r for p in range(first, last + 1) for r in self._page_rows(p)]
        return iter(rows), {"next_page": last + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [
                r
                for p in range(start["next_page"], end["next_page"])
                for r in self._page_rows(p)
            ]
        )


class PagedDecisionSource(DataSource):
    @classmethod
    def name(cls):
        return "paged_decisions"

    def schema(self):
        return SCHEMA_DDL

    def reader(self, schema: StructType):
        return _PagedReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return _PagedStreamReader(self.options)
