"""Anchor-text aggregation — the inbound-link text signal.

Search engines and crawl prioritizers have used the text of links
POINTING AT a page as a first-class description of it since
Brin & Page 1998 (§2.2: anchor propagation); modern corpus pipelines
use the same rollup for link-graph quality features. The shape is a
classic two-stage Spark job:

1. extract ``(src, href, anchor_text)`` triples from every page's
   ``<a>`` tags — pure JVM regex work (one ``regexp_extract_all`` of
   whole tags, per-tag ``regexp_extract`` in a lambda; all patterns
   foldable per the engine's regex rule, no backreferences so the
   DuckDB/RE2 oracle reproduces them)
2. aggregate per target: inbound count, distinct sources, and the
   most frequent anchor phrase (count-desc, text-asc tie-break — a
   deterministic mode())

The aggregation is combine-friendly: ``groupBy(target, text)`` counts
shrink map-side before the shuffle, and the mode is one window over
the already-reduced (target, text) pairs — never over raw links. At
a 10^10-edge link graph the pairs table is the distinct-text subset,
orders of magnitude smaller than the edge list.

The reference records only the link STRUCTURE it enumerates
(``SharePointClient.cs:253-300`` keeps folder/file names, not link
text); anchor rollup is the web-graph generalization its corpus needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ANCHOR_TAG_RE = r"""<a\b[^>]*href\s*=\s*["'][^"']*["'][^>]*>.*?</a>"""
HREF_RE = r"""href\s*=\s*["']([^"']*)["']"""
INNER_RE = r"""^<a\b[^>]*>(.*)</a>$"""
TAG_RE = r"<[^>]*>"


def _clean_text(t: Column) -> Column:
    return F.trim(
        F.regexp_replace(F.regexp_replace(t, TAG_RE, " "), r"\s+", " ")
    )


def anchor_links(
    pages: DataFrame, url_col: str = "url_canon", html_col: str = "html"
) -> DataFrame:
    """One row per ``<a href>`` occurrence: ``(src, href, anchor_text)``.
    ``anchor_text`` is the tag's visible text (inner tags stripped,
    whitespace collapsed); empty hrefs are dropped, empty texts kept
    (image links legitimately have none)."""
    tags = pages.select(
        F.col(url_col).alias("src"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_TAG_RE), 0)
        ).alias("_tag"),
    )
    return tags.select(
        "src",
        F.regexp_extract("_tag", HREF_RE, 1).alias("href"),
        _clean_text(F.regexp_extract("_tag", INNER_RE, 1)).alias(
            "anchor_text"
        ),
    ).filter(F.col("href") != "")


def anchor_text_rollup(
    links: DataFrame,
    target_col: str = "href",
    text_col: str = "anchor_text",
    src_col: str = "src",
) -> DataFrame:
    """Per-target inbound anchor summary:

    - ``n_inlinks``: anchor occurrences pointing at the target
    - ``n_sources``: distinct linking pages
    - ``n_texts``: distinct non-empty anchor phrases
    - ``top_text``: most frequent non-empty phrase (ties: lexical min)
    - ``top_text_n``: its occurrence count

    Two combine-friendly aggregations plus one window over the
    (target, text) pair counts — the window partitions by target, so
    no global single-reducer stage exists at any scale.
    """
    t, x, s = target_col, text_col, src_col
    base = links.groupBy(t).agg(
        F.count(F.lit(1)).cast("long").alias("n_inlinks"),
        F.countDistinct(s).cast("long").alias("n_sources"),
    )
    pair_counts = (
        links.filter(F.col(x) != "")
        .groupBy(t, x)
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    w = Window.partitionBy(t).orderBy(F.desc("_n"), F.col(x))
    top = (
        pair_counts.withColumn("_rk", F.row_number().over(w))
        .withColumn(
            "n_texts",
            F.count(F.lit(1)).over(Window.partitionBy(t)).cast("long"),
        )
        .filter(F.col("_rk") == 1)
        .select(
            F.col(t),
            "n_texts",
            F.col(x).alias("top_text"),
            F.col("_n").alias("top_text_n"),
        )
    )
    return base.join(top, t, "left").select(
        F.col(t).alias("target"),
        "n_inlinks",
        "n_sources",
        F.coalesce("n_texts", F.lit(0).cast("long")).alias("n_texts"),
        "top_text",
        "top_text_n",
    )
