"""Raw-HTML extraction queries (reference main.py:85-133, 140-176, 217-245).

Differential-test design: the HTML inputs are CONSTRUCTED deterministically
from the documents table with pure Column expressions (format_string /
element_at), so the expected extraction output is a closed-form function of
``doc_id``. The Spark side then runs the real DOM pipeline (ops/html.py:
stdlib-parser tree -> 3-tier card fallback / label-sibling navigation in an
Arrow-batched mapInPandas stage -> Column-expression field parsing), while
the DuckDB oracle computes the same closed form directly — any divergence in
the DOM walk, the precedence rules, or the whitespace handling breaks the
exact-value match.

Scale shape: page assembly is one groupBy on the page key (test scaffolding
only — production input IS pages); extraction itself is shuffle-free
mapInPandas; field parsing is codegen Column work.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_processor_spark.ops import html as H
from etl_data_processor_spark.ops import scalar as S
from etl_data_processor_spark.registry import cat as _cat
from etl_data_processor_spark.registry import q

_MONTHS = list(S.DANISH_MONTHS)  # januar..december, insertion-ordered


def _listing_pages(spark, sf_dir):
    """documents(doc_id < 240) -> one listing page per 6 docs; the page's
    tier (page % 3) picks which card markup the page uses, exercising all
    three selector fallbacks (main.py:85-97). doc_id % 4 picks the status
    text — including the 'Ikke anbefalet' lookbehind trap and the
    'Under vurdering' no-match drop."""
    doc = F.col("doc_id")
    status_txt = (
        F.when(doc % 4 == 0, F.format_string("Anbefalet af naevnet i sag %d", doc))
        .when(doc % 4 == 1, F.format_string("Ikke anbefalet i sag %d", doc))
        .when(doc % 4 == 2, F.format_string("Delvist anbefalet i sag %d", doc))
        .otherwise(F.format_string("Under vurdering i sag %d", doc))
    )
    href = F.format_string("/anbefalinger-og-vejledninger/doc-%d", doc)
    tier = (F.floor(doc / 6) % 3).cast("int")
    card_html = (
        F.when(
            tier == 0,
            F.format_string(
                '<div class="result-card"><a href="%s">Se mere</a><p>%s</p></div>',
                href,
                status_txt,
            ),
        )
        .when(
            tier == 1,
            F.format_string(
                '<article><a href="%s">Se mere</a><span>%s</span></article>',
                href,
                status_txt,
            ),
        )
        .otherwise(F.format_string('<p><a href="%s">%s</a></p>', href, status_txt))
    )
    cards = (
        _cat(spark, sf_dir)
        .documents.select("doc_id")
        .filter(doc < 240)
        .select(doc.alias("doc_id"), F.floor(doc / 6).alias("page"), card_html.alias("card_html"))
    )
    return cards.groupBy("page").agg(
        F.concat(
            F.lit("<html><body>\n"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "card_html"))),
                    lambda s: s["card_html"],
                ),
                "\n",
            ),
            F.lit("\n</body></html>"),
        ).alias("html")
    )


@q(
    "q_html_extract",
    """
    SELECT doc_id // 6 AS page,
           '/anbefalinger-og-vejledninger/doc-' || CAST(doc_id AS VARCHAR) AS url,
           CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN 'Anbefalet'
               WHEN 1 THEN 'Ikke anbefalet'
               WHEN 2 THEN 'Delvist anbefalet'
           END AS status,
           doc_id AS sag
    FROM documents
    WHERE doc_id < 240 AND doc_id % 4 <> 3
    ORDER BY sag
    """,
)
def q_html_extract(spark, sf_dir):
    """Listing-page HTML -> cards via the 3-tier DOM fallback + status
    precedence (A5 incl. lookbehinds); 'sag' round-trips the card TEXT
    through the DOM so text extraction is value-checked too."""
    pages = _listing_pages(spark, sf_dir)
    cards = H.extract_cards(pages, html_col="html", keep_cols=["page"])
    return cards.select(
        F.col("page").cast("long").alias("page"),
        "url",
        "status",
        F.regexp_extract("card_text", r"sag (\d+)", 1).cast("long").alias("sag"),
    ).orderBy("sag")


def _detail_pages(spark, sf_dir):
    """documents(doc_id < 300) -> one detail page each, branch-covering:
    heading separator vs 'Anvendelse' label-sibling fallback (doc_id % 2),
    div#recommendation Danish date vs none (doc_id % 3), ATC label-sibling
    vs body-token fallback (doc_id % 5)."""
    doc = F.col("doc_id")
    heading = F.when(
        doc % 2 == 0,
        F.format_string("Drug%d - Behandling af tilstand %d", doc, doc),
    ).otherwise(F.format_string("Drug%d", doc))
    month_name = F.element_at(
        F.array(*[F.lit(m) for m in _MONTHS]), (doc % 12 + 1).cast("int")
    )
    rec_div = F.when(
        doc % 3 == 0,
        F.concat(
            F.lit('<div id="recommendation"><p>Godkendt den '),
            (doc % 28 + 1).cast("string"),
            F.lit(". "),
            month_name,
            F.lit(" "),
            (doc % 5 + 2020).cast("string"),
            F.lit("</p></div>\n"),
        ),
    ).otherwise(F.lit(""))
    anv = F.when(
        doc % 2 == 1,
        F.format_string("<p>Anvendelse</p><p>Behandling af sygdom %d</p>\n", doc),
    ).otherwise(F.lit(""))
    atc = F.format_string("N%02dXY%02d", doc % 90, doc % 73)
    atc_block = F.when(
        doc % 5 != 0,
        F.format_string("<p>ATC-kode</p><p>%s</p>\n", atc),
    ).otherwise(F.format_string("<p>Se ogsaa kode %s i registret</p>\n", atc))
    html = F.concat(
        F.lit("<html><body>\n<h1>"),
        heading,
        F.lit("</h1>\n"),
        rec_div,
        anv,
        atc_block,
        F.lit("</body></html>"),
    )
    return (
        _cat(spark, sf_dir)
        .documents.select("doc_id")
        .filter(doc < 300)
        .select("doc_id", html.alias("html"))
    )


@q(
    "q_html_detail",
    """
    SELECT doc_id,
           'Drug' || CAST(doc_id AS VARCHAR) AS raw_drug_text,
           CASE WHEN doc_id % 2 = 0
                THEN 'Behandling af tilstand ' || CAST(doc_id AS VARCHAR)
                ELSE 'Behandling af sygdom ' || CAST(doc_id AS VARCHAR)
           END AS indication,
           CASE WHEN doc_id % 3 = 0
                THEN printf('%04d-%02d-%02d',
                            2020 + CAST(doc_id % 5 AS INT),
                            1 + CAST(doc_id % 12 AS INT),
                            1 + CAST(doc_id % 28 AS INT))
           END AS decision_date,
           printf('N%02dXY%02d', CAST(doc_id % 90 AS INT), CAST(doc_id % 73 AS INT))
               AS atc_code
    FROM documents
    WHERE doc_id < 300
    ORDER BY doc_id
    """,
)
def q_html_detail(spark, sf_dir):
    """Detail-page HTML -> (raw_drug_text, indication, decision_date,
    atc_code) through the DOM lookups + the existing Column parsers:
    h1 split (A7), label-sibling indication fallback (A8), the
    div#recommendation-SCOPED Danish date (A9) with whole-text fallback
    (A10), and label-sibling ATC with token-regex fallback (A11)."""
    details = H.extract_details(_detail_pages(spark, sf_dir), html_col="html")
    head, tail = S.split_first_separator(F.col("heading"))
    return (
        details.withColumn("raw_drug_text", head)
        .withColumn(
            "indication", S.coalesce_chain(tail, F.col("indication_sibling"))
        )
        .withColumn(
            "decision_date",
            F.coalesce(
                S.normalize_danish_date(F.col("rec_text")),
                S.fallback_date(F.col("full_text")),
            ),
        )
        .withColumn(
            "atc_code",
            S.coalesce_chain(
                F.col("atc_sibling"), S.extract_atc_code(F.col("full_text"))
            ),
        )
        .select("doc_id", "raw_drug_text", "indication", "decision_date", "atc_code")
        .orderBy("doc_id")
    )
