"""Paginated-API source (reference A1/A2) as a Spark 4 Python Data Source.

The reference fetches a paged HTTP listing: page 1 → parse total count →
ceil-div by page size → loop pages (main.py:44-83, 333-351). The Spark-native
shape is a DataSource whose ``partitions()`` IS the page plan — one partition
per page, fetched in parallel by executors, with per-record parse-failure
skipping (A3, main.py:98-103).

Network is pluggable behind one ``session.get(url, params) -> Response``
seam with three implementations:

- synthetic (default): deterministic records, no parsing, no sockets;
- ``responses_json`` option: :class:`RecordedSession` replays a canned
  page -> (status, html) map through the REAL parse/plan/error machinery;
- ``live_http=1`` option: :class:`HttpSession`, a urllib-based client with
  connection/session reuse, a User-Agent header, requests-style
  ``raise_for_status`` semantics and per-partition token-bucket pacing
  (A19, main.py:44-61) — one session per input partition, constructed on
  the executor (never pickled).

Usage:
    spark.dataSource.register(PagedDecisionSource)
    df = spark.read.format("paged_decisions").option("total_rows", 228).load()
    # live:
    df = (spark.read.format("paged_decisions")
          .option("live_http", "1").option("endpoint", "https://site/api")
          .option("rate_limit_rps", "1").load())
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

PAGE_SIZE = 25  # the reference site's page size (main.py:70)

# The reference's listing-request defaults (main.py:45-55); a recorded
# session asserts they arrive on every fetch.
DEFAULT_PARAMS = {
    "order": "updated desc",
    "currentpageid": "1095",
    "database": "1095",
    "secondary": "1096",
    "category": "",
    "archived": "0",
}


class HTTPError(Exception):
    """requests.HTTPError stand-in raised by Response.raise_for_status."""

    def __init__(self, status_code: int, url: str):
        super().__init__(f"HTTP {status_code} for {url}")
        self.status_code = status_code


class Response:
    """Minimal requests.Response shape: status_code, text,
    raise_for_status (main.py:59-61, 136-138)."""

    def __init__(self, status_code: int, text: str, url: str = ""):
        self.status_code = status_code
        self.text = text
        self.url = url

    def raise_for_status(self) -> None:
        if self.status_code >= 400:
            raise HTTPError(self.status_code, self.url)


class RecordedSession:
    """Session-reuse seam fed by a canned page->response map — the
    recorded-response HTTP client (no sockets). One instance per partition
    mirrors the reference's single requests.Session (main.py:22-25);
    ``calls`` records (url, params) so tests can assert session reuse and
    the default query params."""

    def __init__(self, responses: dict[int, tuple[int, str]]):
        self.responses = responses
        self.calls: list[tuple[str, dict]] = []

    def get(self, url: str, params: dict | None = None) -> Response:
        params = dict(params or {})
        self.calls.append((url, params))
        page = int(params.get("page", 1))
        status, text = self.responses.get(page, (404, ""))
        return Response(status, text, f"{url}?page={page}")


class HttpSession:
    """Live HTTP client on stdlib urllib behind the same ``.get()`` seam as
    :class:`RecordedSession` (VERDICT r3 item 3) — the reference's single
    ``requests.Session`` (main.py:22-25) re-expressed without third-party
    deps: one shared opener reused across every GET, a User-Agent header,
    requests semantics (4xx/5xx return a Response; ``raise_for_status``
    raises), and an optional :class:`~..ops.enrich.TokenBucket` so a
    partition never exceeds ``rate`` requests/sec (A19 — the reference
    sleeps between pages, main.py:351).

    Construct one per input partition ON the executor: cluster-wide request
    rate is then ``rate × concurrent partitions`` — size ``rate`` (or cap
    partitions) for the target site accordingly."""

    def __init__(
        self,
        rate: float | None = None,
        user_agent: str = "etl-data-processor-spark/0.1",
        timeout: float = 30.0,
    ):
        import urllib.request

        self._opener = urllib.request.build_opener()
        self.user_agent = user_agent
        self.timeout = timeout
        if rate:
            from etl_data_processor_spark.ops.enrich import TokenBucket

            self._bucket = TokenBucket(rate=rate, burst=1)
        else:
            self._bucket = None
        # Observability without unbounded executor memory (ADVICE r4): a
        # long-lived partition fetching many pages must not accrete one
        # tuple per GET forever — keep a total counter plus a short
        # ring-buffer tail for debugging.
        import collections

        self.n_calls: int = 0
        self.calls: collections.deque = collections.deque(maxlen=16)

    def get(self, url: str, params: dict | None = None) -> Response:
        import urllib.error
        import urllib.request
        from urllib.parse import urlencode

        params = dict(params or {})
        self.n_calls += 1
        self.calls.append((url, params))
        full = url + ("?" + urlencode(params) if params else "")
        if self._bucket is not None:
            self._bucket.acquire()
        req = urllib.request.Request(
            full, headers={"User-Agent": self.user_agent}
        )
        try:
            with self._opener.open(req, timeout=self.timeout) as r:
                body = r.read().decode("utf-8", "replace")
                return Response(r.status, body, full)
        except urllib.error.HTTPError as e:
            # requests parity: an HTTP status error is a normal Response;
            # only raise_for_status turns it into an exception.
            body = e.read().decode("utf-8", "replace") if e.fp else ""
            return Response(e.code, body, full)


def fetch_details_live(
    df,
    base_url: str,
    url_col: str = "url",
    rate: float | None = None,
    timeout: float = 30.0,
):
    """Per-row detail-page fetch over live HTTP (the reference fetches each
    card's own page before detail extraction, main.py:266-270): widen
    ``df`` with an ``html`` column by GETting ``urljoin(base_url, url)``
    for every row. One :class:`HttpSession` per PARTITION (the reference's
    single requests.Session, main.py:22-25) so connections, the UA header
    and the optional token bucket are reused across the partition's rows —
    at cluster scale the aggregate request rate is rate x partitions, the
    same contract as the paged source. A failed page yields html=NULL and
    the row survives (downstream extract_details already NULL-fills — the
    reference appends the un-enriched decision, main.py:283-285).
    Compose with :func:`ops.html.extract_details` for the
    fetch -> parse -> enrich -> CSV path over real sockets."""
    import pandas as pd
    from urllib.parse import urljoin

    from pyspark.sql.types import StringType, StructField, StructType

    keep_fields = list(df.schema.fields)
    schema = StructType(keep_fields + [StructField("html", StringType())])

    def gen(batches):
        session = HttpSession(rate=rate, timeout=timeout)
        for pdf in batches:
            html: list = []
            for u in pdf[url_col]:
                try:
                    resp = session.get(urljoin(base_url, u))
                    resp.raise_for_status()
                    html.append(resp.text)
                except Exception:
                    html.append(None)  # per-record skip tier
            out = pdf.copy()
            out["html"] = pd.array(html, dtype=object)
            yield out

    return df.mapInPandas(gen, schema)


def _live_conf(options) -> dict | None:
    """Live-HTTP mode config from source options; None unless opted in via
    ``live_http=1`` (mirrors resolve_enrich_client's env/flag gating —
    recorded and synthetic modes stay the default, keeping tests and
    oracles socket-free)."""
    if str(options.get("live_http", "")).lower() not in ("1", "true", "yes"):
        return None
    rate = float(options.get("rate_limit_rps", "1") or 0)
    return {
        "endpoint": options.get("endpoint", "https://example.test/api"),
        "rate": rate if rate > 0 else None,
        "timeout": float(options.get("http_timeout_s", "30")),
    }


def _live_session(conf: dict) -> HttpSession:
    return HttpSession(rate=conf["rate"], timeout=conf["timeout"])


def fetch_page_html(session, page: int, endpoint: str = "https://example.test/api") -> str:
    """One listing-page fetch (main.py:44-61): default params + page
    number, session reuse, raise_for_status on HTTP failure. The error is
    page-fatal (the task retries/fails) — per-RECORD skip happens during
    card parsing, matching the reference's two error tiers."""
    params = dict(DEFAULT_PARAMS, page=str(page))
    resp = session.get(endpoint, params=params)
    resp.raise_for_status()
    return resp.text


def _records_from_html(page: int, html: str):
    """Parse one fetched listing page into records via the DOM card
    extractor (ops/html.py): 3-tier fallback + per-card skip
    (main.py:85-133). Emits the source schema rows; card order within the
    page is the DOM order."""
    from etl_data_processor_spark.ops.html import card_fields, find_cards, parse_html

    row = 0
    for card in find_cards(parse_html(html)):
        try:
            fields = card_fields(card)
        except Exception:
            continue  # per-record skip (main.py:98-103)
        if fields is None:
            continue
        yield (page, row, fields["url"], fields["status"], fields["card_text"].strip())
        row += 1

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


def _parse_responses(options) -> dict[int, tuple[int, str]] | None:
    """The ``responses_json`` option is the recorded-response site: a JSON
    map page -> [status_code, html]. Options are strings, so the map rides
    into every (pickled) reader; absent -> synthetic mode."""
    raw = options.get("responses_json")
    if not raw:
        return None
    return {int(k): (int(v[0]), v[1]) for k, v in json.loads(raw).items()}


class _PagedReader(DataSourceReader):
    def __init__(self, options):
        self.total_rows = int(options.get("total_rows", 228))
        self.responses = _parse_responses(options)
        self.live = _live_conf(options)

    def _session(self):
        """Fresh session for one fetch context (planning, or one partition)."""
        if self.live is not None:
            return _live_session(self.live)
        return RecordedSession(self.responses)

    def _endpoint(self) -> str:
        return self.live["endpoint"] if self.live else "https://example.test/api"

    def _plan_pages(self) -> int:
        if self.responses is None and self.live is None:
            return max(1, -(-self.total_rows // PAGE_SIZE))
        # Recorded/live-HTTP modes plan exactly like the reference
        # (main.py:63-83, 337-339): fetch page 1, parse 'af N resultater' /
        # pagination links -> page count. A failing page 1 fails planning
        # (raise_for_status).
        from etl_data_processor_spark.ops.html import total_pages

        html = fetch_page_html(self._session(), 1, self._endpoint())
        return total_pages(html, PAGE_SIZE)

    def partitions(self):
        # A2: page count = ceil(total / PAGE_SIZE); each page becomes an
        # input partition -> executors fetch pages concurrently (the
        # reference loops them serially with sleeps).
        return [
            _PagePartition(p, self.total_rows)
            for p in range(1, self._plan_pages() + 1)
        ]

    def read(self, partition: _PagePartition):
        # A1/A3: fetch one page, yield parsed records, skip malformed ones.
        if self.responses is not None or self.live is not None:
            # One session per partition (the reference reuses one session
            # for its whole serial loop, main.py:22-25); an HTTP error is
            # task-fatal via raise_for_status -> Spark retries the task.
            session = self._session()
            yield from _records_from_html(
                partition.page,
                fetch_page_html(session, partition.page, self._endpoint()),
            )
            return
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
        self.responses = _parse_responses(options)
        self.live = _live_conf(options)
        if self.responses is None and self.live is None:
            self.n_pages = max(1, -(-self.total_rows // PAGE_SIZE))
        else:
            from etl_data_processor_spark.ops.html import total_pages

            self.n_pages = total_pages(
                fetch_page_html(self._session(), 1, self._endpoint()),
                PAGE_SIZE,
            )

    def _session(self):
        if self.live is not None:
            return _live_session(self.live)
        return RecordedSession(self.responses)

    def _endpoint(self) -> str:
        return self.live["endpoint"] if self.live else "https://example.test/api"

    def initialOffset(self) -> dict:
        return {"next_page": 1}

    def _page_rows(self, page: int):
        if self.responses is not None or self.live is not None:
            # HTTP failure raises -> the micro-batch fails and is retried
            # against the SAME offset range (exactly-once with an
            # idempotent sink); per-CARD failures are skipped inside
            # _records_from_html.
            session = self._session()
            yield from _records_from_html(
                page, fetch_page_html(session, page, self._endpoint())
            )
            return
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
