"""Recorded-response HTTP path for the paged source (VERDICT r2 item 3):
raise_for_status -> task-fatal page errors, per-card skip, A2 planning from
the fetched first page, session/param parity, and streaming offset replay —
all against a canned page->response map, no sockets."""

from __future__ import annotations

import json

import pytest

from etl_data_processor_spark.sources.paged import (
    DEFAULT_PARAMS,
    HTTPError,
    RecordedSession,
    _PagedReader,
    _PagedStreamReader,
    fetch_page_html,
)

STATUSES = ["Anbefalet", "Ikke anbefalet", "Delvist anbefalet"]


def _site(n_results=60, bad_page=None, linkless_card_page=None, pagination_fallback=False):
    """Canned listing site: n_results cards across ceil(n/25) pages; page 1
    announces the total ('af N resultater') unless pagination_fallback, in
    which case planning must use the pagination max-page link instead."""
    pages = {}
    n_pages = -(-n_results // 25)
    for p in range(1, n_pages + 1):
        lo, hi = (p - 1) * 25, min(p * 25, n_results)
        cards = [
            f'<div class="card"><a href="/anbefalinger-og-vejledninger/d-{i}">Se</a>'
            f"<p>{STATUSES[i % 3]} sag {i}</p></div>"
            for i in range(lo, hi)
        ]
        if p == linkless_card_page:
            cards.insert(0, '<div class="card"><p>Anbefalet men uden link</p></div>')
        header = (
            f"<p>Viser {lo + 1} til {hi} af {n_results} resultater</p>"
            if p == 1 and not pagination_fallback
            else ""
        )
        if p == 1 and pagination_fallback:
            header = (
                '<div class="pagination">'
                + "".join(f'<a href="?page={k}">{k}</a>' for k in range(1, n_pages + 1))
                + "</div>"
            )
        pages[p] = [200, f"<html><body>{header}\n" + "\n".join(cards) + "</body></html>"]
    if bad_page:
        pages[bad_page] = [500, "internal error"]
    return pages


def _opts(site, **kw):
    return {"responses_json": json.dumps(site), **{k: str(v) for k, v in kw.items()}}


def test_recorded_batch_read_via_spark(spark):
    """End-to-end: register the source, read the recorded site, get every
    card as a row with DOM-extracted fields; the linkless card is dropped
    per-record while the rest of its page survives."""
    from etl_data_processor_spark.sources.paged import PagedDecisionSource

    spark.dataSource.register(PagedDecisionSource)
    site = _site(n_results=60, linkless_card_page=2)
    df = (
        spark.read.format("paged_decisions")
        .option("responses_json", json.dumps(site))
        .load()
    )
    rows = df.collect()
    assert len(rows) == 60  # linkless card contributed nothing
    assert {r["page"] for r in rows} == {1, 2, 3}
    by_url = {r["url"]: r for r in rows}
    assert by_url["/anbefalinger-og-vejledninger/d-31"]["status"] == "Ikke anbefalet"
    assert "sag 31" in by_url["/anbefalinger-og-vejledninger/d-31"]["raw_drug_text"]


def test_planning_parses_results_text_and_pagination_fallback():
    r = _PagedReader(_opts(_site(n_results=60)))
    assert len(r.partitions()) == 3  # ceil(60/25) from 'af 60 resultater'
    r = _PagedReader(_opts(_site(n_results=60, pagination_fallback=True)))
    assert len(r.partitions()) == 3  # max page= link fallback (main.py:72-83)


def test_http_error_is_task_fatal():
    """A failing page raises through raise_for_status (main.py:59-61) —
    the task fails (and would be retried), it does NOT silently skip."""
    site = _site(n_results=60, bad_page=2)
    r = _PagedReader(_opts(site))
    parts = {p.page: p for p in r.partitions()}
    assert list(r.read(parts[1]))  # healthy page reads fine
    with pytest.raises(HTTPError) as exc:
        list(r.read(parts[2]))
    assert exc.value.status_code == 500


def test_http_error_on_page_one_fails_planning():
    with pytest.raises(HTTPError):
        _PagedReader(_opts(_site(n_results=60, bad_page=1))).partitions()


def test_session_reuse_and_default_params():
    """One session per partition; every GET carries the reference's default
    query params plus the page number (main.py:45-58)."""
    session = RecordedSession(_site(n_results=30))
    fetch_page_html(session, 2)
    fetch_page_html(session, 1)
    assert len(session.calls) == 2  # same session served both
    url, params = session.calls[0]
    assert params["page"] == "2"
    for k, v in DEFAULT_PARAMS.items():
        assert params[k] == v


def test_streaming_offsets_replay_recorded_pages():
    """Offset semantics on the recorded site: read() advances page by page,
    readBetweenOffsets() replays a committed range bit-identically (the
    exactly-once contract), and the exhausted source returns no rows
    without moving the offset."""
    site = _site(n_results=60)
    r = _PagedStreamReader(_opts(site, pages_per_batch=1))
    off0 = r.initialOffset()
    rows1, off1 = r.read(off0)
    rows1 = list(rows1)
    assert off1 == {"next_page": 2} and len(rows1) == 25
    assert list(r.readBetweenOffsets(off0, off1)) == rows1  # replay == live
    rows2, off2 = r.read(off1)
    rows3, off3 = r.read(off2)
    assert len(list(rows2)) == 25 and len(list(rows3)) == 10
    done_rows, done_off = r.read(off3)
    assert list(done_rows) == [] and done_off == off3  # offset parked


def test_streaming_failed_batch_replays_after_recovery():
    """A failing page aborts the micro-batch (offset NOT advanced by the
    engine on failure); once the site recovers, replaying the same range
    yields the full page — no rows lost or duplicated."""
    bad = _site(n_results=60, bad_page=2)
    r = _PagedStreamReader(_opts(bad, pages_per_batch=1))
    off0 = r.initialOffset()
    _, off1 = r.read(off0)
    with pytest.raises(HTTPError):
        list(r.read(off1)[0])
    # recovery: same offsets against the healed site
    healed = _PagedStreamReader(_opts(_site(n_results=60), pages_per_batch=1))
    replay = list(healed.readBetweenOffsets(off1, {"next_page": 3}))
    assert len(replay) == 25 and replay[0][0] == 2  # page 2, intact


# --- live urllib transport (VERDICT r3 item 3) against a local http.server ---


class _SiteHandler:
    """Request handler factory serving a canned page->(status, html) map
    with the same shape RecordedSession replays, over real sockets."""

    @staticmethod
    def make(site, hits):
        import http.server
        from urllib.parse import parse_qs, urlparse

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                q = parse_qs(urlparse(self.path).query)
                hits.append(
                    {k: v[0] for k, v in q.items()}
                    | {"ua": self.headers.get("User-Agent", "")}
                )
                page = int(q.get("page", ["1"])[0])
                status, html = site.get(page, [404, ""])
                body = html.encode()
                self.send_response(status)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet
                pass

        return H


@pytest.fixture()
def live_site():
    """Local HTTP server serving _site(n_results=60); yields (endpoint,
    hits, site) where hits records every request's query params + UA."""
    import http.server
    import threading

    site = _site(n_results=60)
    hits: list[dict] = []
    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), _SiteHandler.make(site, hits)
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}/api", hits, site
    finally:
        srv.shutdown()
        srv.server_close()


def _live_opts(endpoint, **kw):
    return {
        "live_http": "1",
        "endpoint": endpoint,
        "rate_limit_rps": "0",  # no pacing in tests
        **{k: str(v) for k, v in kw.items()},
    }


def test_live_http_plans_and_reads_all_pages(live_site):
    """HttpSession end-to-end: planning fetches page 1 over a real socket,
    reads parse every card, every request carries the default params + UA."""
    endpoint, hits, _ = live_site
    r = _PagedReader(_live_opts(endpoint))
    parts = r.partitions()
    assert len(parts) == 3  # 'af 60 resultater' parsed from the live page 1
    rows = [row for p in parts for row in r.read(p)]
    assert len(rows) == 60
    assert {row[0] for row in rows} == {1, 2, 3}
    for h in hits:
        assert h["ua"].startswith("etl-data-processor-spark")
        for k, v in DEFAULT_PARAMS.items():
            if v:  # empty-string params may be dropped by urlencode/parse_qs
                assert h[k] == v


def test_live_http_error_statuses_are_task_fatal(live_site):
    """A 404 (page beyond the site) and a 500 both surface through
    raise_for_status as task-fatal errors — requests parity."""
    endpoint, _, site = live_site
    r = _PagedReader(_live_opts(endpoint))
    with pytest.raises(HTTPError) as e404:
        list(r.read(type("P", (), {"page": 99, "total_rows": 0})()))
    assert e404.value.status_code == 404
    site[2] = [500, "boom"]
    with pytest.raises(HTTPError) as e500:
        list(r.read(type("P", (), {"page": 2, "total_rows": 0})()))
    assert e500.value.status_code == 500


def test_live_http_streaming_resume(live_site):
    """Streaming over the live transport: a failing page aborts the batch;
    after the site recovers, replaying the same offset range yields the
    full page (exactly-once resume, same contract as the recorded path)."""
    endpoint, _, site = live_site
    r = _PagedStreamReader(_live_opts(endpoint, pages_per_batch=1))
    off0 = r.initialOffset()
    rows1, off1 = r.read(off0)
    assert len(list(rows1)) == 25 and off1 == {"next_page": 2}
    good_p2 = site[2]
    site[2] = [500, "down"]
    with pytest.raises(HTTPError):
        list(r.read(off1)[0])
    site[2] = good_p2  # site heals; engine retries the SAME range
    replay = list(r.readBetweenOffsets(off1, {"next_page": 3}))
    assert len(replay) == 25 and replay[0][0] == 2


def test_live_http_token_bucket_paces_requests(live_site):
    """rate_limit_rps paces GETs through the shared TokenBucket: 3 fetches
    at 20 rps must take at least ~2/20 s (first is free via burst)."""
    import time as _time

    from etl_data_processor_spark.sources.paged import HttpSession, fetch_page_html

    endpoint, _, _ = live_site
    s = HttpSession(rate=20.0)
    t0 = _time.monotonic()
    for p in (1, 2, 3):
        fetch_page_html(s, p, endpoint)
    assert _time.monotonic() - t0 >= 2 / 20 * 0.9
    assert s.n_calls == 3  # one session served all three
