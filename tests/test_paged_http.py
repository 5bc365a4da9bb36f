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
