"""Vectorized extraction UDFs (SURVEY.md §2.12; input_hint: "vectorized
pandas/Arrow UDFs (no per-row Python) throughout").

The reference's de-facto scalar UDF is ``ConvertToMarkdown(byte[]) ->
string`` (PdfToMarkdownConverter.cs:88-93); here it becomes an
Arrow-batched pandas UDF over the ``html`` binary column. Regexes are
compiled once per executor at module import (converter.py module
constants), not per row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sharepointcrawler_spark.extraction.converter import (
    ConvertOptions,
    build_lines,
    convert_pages_to_markdown,
)
from sharepointcrawler_spark.extraction.docxwords import (
    UnsupportedDocxError,
    docx_to_markdown,
    is_docx,
)
from sharepointcrawler_spark.extraction.htmlwords import extract_links, parse_word_pages
from sharepointcrawler_spark.extraction.pptxslides import (
    UnsupportedPptxError,
    is_pptx,
    pptx_to_markdown,
)
from sharepointcrawler_spark.extraction.xlsxcells import (
    UnsupportedXlsxError,
    is_xlsx,
    xlsx_to_markdown,
)
from sharepointcrawler_spark.extraction.pdfwords import (
    UnsupportedPdfError,
    is_pdf,
    parse_pdf_word_pages,
)

_OPT = ConvertOptions()


def word_pages_of(blob: bytes) -> tuple[list, list[float]]:
    """Pluggable word-box provider dispatch (the PdfPig seam,
    PdfToMarkdownConverter.cs:81-113): real PDF bytes -> the mini PDF
    text extractor IN STRICT MODE (a construct the interpreter cannot
    extract faithfully raises :class:`UnsupportedPdfError` instead of
    silently yielding empty/wrong text — ADVICE r3 medium); anything
    else -> the synthetic html dialect. Both return the same (pages of
    RawWord, page heights) contract."""
    if is_pdf(blob):
        return parse_pdf_word_pages(blob, strict=True)
    # legacy-encoded html (BOM / non-utf-8 meta label) transcodes to
    # utf-8 for the byte-regex parser; utf-8/ascii input returns the
    # SAME bytes object (charset.to_utf8_bytes is a conservative
    # no-op), preserving the byte-identity extraction contract
    from sharepointcrawler_spark.extraction.charset import to_utf8_bytes

    return parse_word_pages(to_utf8_bytes(blob))


def _extract_one_with_err(
    html: bytes | None, name: str | None
) -> tuple[str | None, str | None]:
    """(markdown, error): markdown is None for a null input OR an input
    flagged undecodable (error carries the issue list then) — a null in
    the output column marks rows needing a real PDF renderer, never
    conflated with legitimately empty documents (empty string).

    Dispatch: ``%PDF-`` -> the PDF interpreter (word boxes), ``PK..``
    with a word/document.xml member -> the OpenXML flow extractor
    (markdown directly — flow XML has no page geometry), ``PK..`` with
    xl/workbook.xml -> the SpreadsheetML table extractor, anything
    else -> the synthetic html word-box dialect."""
    if html is None:
        return None, None
    if is_docx(html):
        try:
            return docx_to_markdown(html, name or "document", strict=True), None
        except UnsupportedDocxError as e:
            return None, str(e)
    if is_xlsx(html):
        try:
            return xlsx_to_markdown(html, name or "workbook", strict=True), None
        except UnsupportedXlsxError as e:
            return None, str(e)
    if is_pptx(html):
        try:
            return pptx_to_markdown(html, name or "presentation", strict=True), None
        except UnsupportedPptxError as e:
            return None, str(e)
    try:
        page_words, heights = word_pages_of(html)
    except UnsupportedPdfError as e:
        return None, str(e)
    pages = [
        build_lines(ws, n + 1, heights[n], _OPT.line_y_tolerance)
        for n, ws in enumerate(page_words)
    ]
    return convert_pages_to_markdown(pages, name or "document", _OPT), None


def _extract_one(html: bytes | None, name: str | None) -> str | None:
    return _extract_one_with_err(html, name)[0]


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series, name: pd.Series) -> pd.Series:  # pragma: no cover
    """(html binary, logical name) -> byte-exact markdown."""
    return pd.Series(
        [_extract_one(h, n) for h, n in zip(html, name)], dtype="object"
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:  # pragma: no cover
    """html -> array of absolute link URLs in document order."""
    return pd.Series(
        [extract_links(h, b) if h is not None else [] for h, b in zip(html, base_url)],
        dtype="object",
    )


_EXTRACT_ALL_TYPE = T.StructType(
    [
        T.StructField("md", T.StringType(), True),
        T.StructField("links", T.ArrayType(T.StringType()), True),
        T.StructField("err", T.StringType(), True),
    ]
)


@F.pandas_udf(_EXTRACT_ALL_TYPE)
def extract_all_udf(html: pd.Series, base_url: pd.Series) -> pd.DataFrame:  # pragma: no cover
    """Fused text+links extraction: the html column crosses the Arrow
    boundary ONCE and is parsed once — at 100 TB the binary column
    transfer dominates, so fusing halves it vs separate UDF calls.
    ``err`` carries the UnsupportedPdfError issue list for inputs the
    PDF interpreter flagged (md is null then) — the per-row error
    lineage a curation pipeline routes to its errors table."""
    mds, links, errs = [], [], []
    for h, b in zip(html, base_url):
        if h is None:
            mds.append(None)
            links.append([])
            errs.append(None)
            continue
        md, err = _extract_one_with_err(h, b)
        mds.append(md)
        errs.append(err)
        links.append(extract_links(h, b))
    return pd.DataFrame({"md": mds, "links": links, "err": errs})


def pages_fetch_probe(pages_df):
    """Fetch-success probe for the pages-table stand-in: a scheduled URL
    'fetches OK' iff the corpus has non-empty html for it (missing row
    == 404, empty html == the reference's empty-payload error,
    SharePointClient.cs:416-421)."""
    from sharepointcrawler_spark.functions.urlnorm import canonicalize_url

    keyed = pages_df.select(
        canonicalize_url("url").alias("url_canon"), F.length("html").alias("_len")
    ).filter(F.col("_len") > 0)

    def probe(scheduled):
        hit = keyed.join(
            scheduled.select("url_canon", "url_key").distinct(), "url_canon", "inner"
        ).select("url_key")
        return (
            scheduled.select("url_key")
            .distinct()
            .join(hit.withColumn("fetch_ok", F.lit(True)), "url_key", "left")
            .withColumn("fetch_ok", F.coalesce(F.col("fetch_ok"), F.lit(False)))
        )

    return probe


def pages_expander(pages_df, respect_nofollow: bool = False):
    """Expander over the ``pages`` table (the sandbox stand-in for the
    fetch stage, SURVEY.md S3): join the wave against materialized html
    by canonical url, extract links, posexplode into (parent_canon,
    child_url, kind, sibling_idx).

    At 100 TB the pages side is the big fact table: the join shuffles on
    url_canon (or is avoided entirely when both sides are bucketed by
    url_key); the wave side is typically smaller and AQE broadcast-joins
    it. Column pruning keeps only (url_canon, html) from pages.

    ``respect_nofollow`` drops pages whose robots meta tag says
    nofollow BEFORE link extraction (one JVM regexp probe — the
    Arrow-crossing link UDF never sees refused parents).
    """
    from sharepointcrawler_spark.functions.htmlmeta import nofollow_parent_filter
    from sharepointcrawler_spark.functions.urlnorm import canonicalize_url

    keyed = pages_df.select(
        canonicalize_url("url").alias("parent_canon"), "html"
    )
    if respect_nofollow:
        keyed = nofollow_parent_filter(keyed, html_col="html")
    # the expander is probed once per WAVE: persist the canonicalized
    # join side so the canonicalize pandas UDF crosses the corpus once
    # per crawl, not once per wave (MEMORY_AND_DISK — blobs spill; the
    # production substitute is a bucketed/sorted pages table, layout.py)
    keyed = keyed.persist()

    def expand(wave):
        fetched = wave.select("url_canon").distinct().join(
            keyed, wave["url_canon"] == keyed["parent_canon"], "inner"
        )
        links = fetched.select(
            "parent_canon",
            F.posexplode(
                extract_links_udf(F.col("html"), F.col("parent_canon"))
            ).alias("sibling_idx", "child_url"),
        )
        return links.withColumn("kind", F.lit("page")).select(
            "parent_canon", "child_url", "kind", "sibling_idx"
        )

    return expand
