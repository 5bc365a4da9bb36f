"""Raw-HTML field extraction (reference main.py:85-133, 140-176, 217-245).

The reference walks a BeautifulSoup DOM: a 3-tier card selector fallback
(div.*card* -> article -> parents of decision links, main.py:85-97), a
per-card link + status-precedence extraction with per-card exception skip
(main.py:98-133), and detail-page lookups — first h1, the
``div#recommendation`` scoped approval date (main.py:218-232), and
label -> parent -> next-sibling text for "Anvendelse" / "ATC-kode"
(main.py:161-169, 234-240).

Spark-first re-expression: HTML parsing is genuinely imperative (DOM
construction + sibling navigation), so it runs as an Arrow-batched
``mapInPandas`` stage — partition-parallel, shuffle-free, one Python
round-trip per partition, never per row. The DOM itself is a ~60-line tree
built on stdlib ``html.parser`` (the container has no bs4); everything
downstream of the extracted fields (status classify, date normalize, ATC
regex) stays in Column expressions via ops/scalar.py, so only the
irreducible DOM walk leaves the JVM.

At 100 TB of crawled pages this is the right shape: the HTML column is read
once per partition, each batch is decoded in one Arrow transfer, extraction
is embarrassingly parallel, and the (much smaller) extracted fields are what
flow into shuffles.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Iterator, Sequence
from html.parser import HTMLParser

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

# Void elements never get a closing tag; pushing them on the open-element
# stack would swallow their siblings.
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

# href marker identifying a decision link (main.py:90-92, 107-109).
DECISION_HREF = "/anbefalinger-og-vejledninger/"

# Status patterns in the REFERENCE's order (main.py:121-125): Delvist first,
# then bare Anbefalet guarded by negative lookbehinds, then Ikke. Python re
# supports the lookbehinds directly (the Column-side classifier in
# ops/scalar.py carries the same semantics into codegen).
STATUS_PATTERNS: list[tuple[str, str]] = [
    (r"Delvist\s+anbefalet", "Delvist anbefalet"),
    (r"(?<!Ikke\s)(?<!Delvist\s)Anbefalet", "Anbefalet"),
    (r"Ikke\s+anbefalet", "Ikke anbefalet"),
]


class Node:
    """One DOM element: tag, attrs, parent, ordered children (Node | str)."""

    __slots__ = ("tag", "attrs", "parent", "children")

    def __init__(self, tag: str, attrs: Iterable = (), parent: "Node | None" = None):
        self.tag = tag
        self.attrs = {k: (v if v is not None else "") for k, v in attrs}
        self.parent = parent
        self.children: list[Node | str] = []

    def iter_nodes(self) -> Iterator["Node"]:
        yield self
        for c in self.children:
            if isinstance(c, Node):
                yield from c.iter_nodes()

    def get_text(self, strip: bool = False) -> str:
        parts: list[str] = []
        stack: list[Node | str] = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, Node):
                stack.extend(reversed(c.children))
            else:
                parts.append(c)
        text = "".join(parts)
        return text.strip() if strip else text

    def own_strings(self) -> list[str]:
        return [c for c in self.children if isinstance(c, str)]

    def next_sibling_element(self) -> "Node | None":
        """bs4's find_next_sibling(): next ELEMENT among the parent's
        children (string siblings are skipped)."""
        if self.parent is None:
            return None
        seen_self = False
        for c in self.parent.children:
            if c is self:
                seen_self = True
            elif seen_self and isinstance(c, Node):
                return c
        return None


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("__root__")
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, attrs, self._stack[-1])
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].children.append(Node(tag, attrs, self._stack[-1]))

    def handle_endtag(self, tag):
        # Tolerant close: pop to the nearest matching open element; ignore
        # stray end tags (html.parser's own leniency model).
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def parse_html(html: str | None) -> Node:
    builder = _TreeBuilder()
    builder.feed(html or "")
    builder.close()
    return builder.root


def find_string_parent(root: Node, pattern: str) -> Node | None:
    """bs4 ``soup.find(string=re)...find_parent()``: the element directly
    containing the first text node matching ``pattern`` (document order)."""
    rx = re.compile(pattern, re.I)
    for node in root.iter_nodes():
        for s in node.own_strings():
            if rx.search(s):
                return node
    return None


def label_sibling_text(root: Node, label_pattern: str) -> str | None:
    """Label -> parent -> next element sibling -> stripped text (the
    reference's 'Anvendelse' / 'ATC-kode' lookup, main.py:161-169,
    234-240); None when the label or the sibling is absent."""
    parent = find_string_parent(root, label_pattern)
    if parent is None:
        return None
    sib = parent.next_sibling_element()
    return sib.get_text(strip=True) if sib is not None else None


def find_cards(root: Node) -> list[Node]:
    """3-tier card selector fallback (main.py:85-97): divs whose class
    mentions 'card'; else every <article>; else the parent of each
    decision link."""
    cards = [
        n
        for n in root.iter_nodes()
        if n.tag == "div" and "card" in n.attrs.get("class", "").lower()
    ]
    if not cards:
        cards = [n for n in root.iter_nodes() if n.tag == "article"]
    if not cards:
        cards = [
            a.parent
            for a in root.iter_nodes()
            if a.tag == "a"
            and DECISION_HREF in a.attrs.get("href", "")
            and a.parent is not None
        ]
    return cards


def card_fields(card: Node) -> dict | None:
    """Per-card extraction (main.py:106-133): decision link href + card
    text + first-match-wins status; None (row dropped) when the link is
    missing or no status pattern matches."""
    link = next(
        (
            n
            for n in card.iter_nodes()
            if n.tag == "a" and DECISION_HREF in n.attrs.get("href", "")
        ),
        None,
    )
    if link is None:
        return None
    card_text = card.get_text()
    status = None
    for pattern, label in STATUS_PATTERNS:
        if re.search(pattern, card_text, re.I):
            status = label
            break
    if status is None:
        return None
    return {"url": link.attrs.get("href", ""), "card_text": card_text, "status": status}


def detail_fields(root: Node) -> dict:
    """Detail-page extraction (main.py:140-176, 217-245): first h1 text,
    ``div#recommendation`` text (the ONLY scope the approval-date regex may
    search — dates elsewhere must not match), the 'Anvendelse' and
    'ATC-kode' label siblings, and the full page text (fallback-date and
    ATC-token scope)."""
    h1 = next((n for n in root.iter_nodes() if n.tag == "h1"), None)
    rec = next(
        (
            n
            for n in root.iter_nodes()
            if n.tag == "div" and n.attrs.get("id") == "recommendation"
        ),
        None,
    )
    return {
        "heading": h1.get_text(strip=True) if h1 is not None else "",
        "rec_text": rec.get_text() if rec is not None else None,
        "indication_sibling": label_sibling_text(root, r"Anvendelse"),
        "atc_sibling": label_sibling_text(root, r"ATC-kode"),
        "full_text": root.get_text(),
    }


def total_pages(html: str, results_per_page: int = 25) -> int:
    """Listing page -> page count (main.py:63-83): 'af N resultater' text ->
    ceil-div; else max page= link inside a pagination div; else 1. Driver-
    side planning (feeds the paged source's partition plan), not a Spark op."""
    root = parse_html(html)
    for node in root.iter_nodes():
        for s in node.own_strings():
            m = re.search(r"af\s+(\d+)\s+resultater", s, re.I)
            if m:
                total = int(m.group(1))
                return -(-total // results_per_page)
    max_page = 1
    for node in root.iter_nodes():
        if node.tag == "div" and "pagination" in node.attrs.get("class", "").lower():
            for a in node.iter_nodes():
                if a.tag == "a":
                    m = re.search(r"page=(\d+)", a.attrs.get("href", ""))
                    if m:
                        max_page = max(max_page, int(m.group(1)))
    return max_page


# ---------------------------------------------------------------------------
# Spark operators (Arrow-batched mapInPandas; shuffle-free)
# ---------------------------------------------------------------------------

CARD_COLUMNS = ["url", "card_text", "status"]
DETAIL_COLUMNS = ["heading", "rec_text", "indication_sibling", "atc_sibling", "full_text"]


def extract_cards(
    df: DataFrame, html_col: str = "html", keep_cols: Sequence[str] = ()
) -> DataFrame:
    """Listing pages -> one row per extracted card: (keep_cols..., url,
    card_text, status). Pages that fail to parse and cards that fail
    extraction are skipped per-record (main.py:98-103); cards without a
    decision link or matching status are dropped (main.py:110, 132-133)."""
    keep = list(keep_cols)
    schema = StructType(
        [df.schema[c] for c in keep]
        + [StructField(c, StringType()) for c in CARD_COLUMNS]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {c: [] for c in keep + CARD_COLUMNS}
            for i in range(len(pdf)):
                try:
                    cards = find_cards(parse_html(pdf[html_col].iloc[i]))
                except Exception:
                    continue  # page-level parse failure -> skip page
                for card in cards:
                    try:
                        fields = card_fields(card)
                    except Exception:
                        continue  # per-card skip (main.py:98-103)
                    if fields is None:
                        continue
                    for c in keep:
                        out[c].append(pdf[c].iloc[i])
                    for c in CARD_COLUMNS:
                        out[c].append(fields[c])
            yield pd.DataFrame(out, columns=keep + CARD_COLUMNS)

    return df.mapInPandas(gen, schema)


def extract_details(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Detail pages -> the same rows widened with the five detail fields
    (heading, rec_text, indication_sibling, atc_sibling, full_text); the
    HTML column is dropped. A page that fails to parse yields NULL fields
    (its row survives — the reference appends the un-enriched decision,
    main.py:283-285)."""
    keep_fields = [f for f in df.schema.fields if f.name != html_col]
    keep = [f.name for f in keep_fields]
    schema = StructType(
        keep_fields + [StructField(c, StringType()) for c in DETAIL_COLUMNS]
    )

    def gen(batches):
        for pdf in batches:
            cols: dict[str, list] = {c: [] for c in DETAIL_COLUMNS}
            for html in pdf[html_col]:
                try:
                    fields = detail_fields(parse_html(html))
                except Exception:
                    fields = {}
                for c in DETAIL_COLUMNS:
                    cols[c].append(fields.get(c))
            out = pdf[keep].copy()
            for c in DETAIL_COLUMNS:
                out[c] = cols[c]
            yield out

    return df.mapInPandas(gen, schema)
