"""Sitemap ingestion (sitemaps.org protocol): the seed-discovery
channel real crawlers pair with robots.txt (whose ``Sitemap:``
directive advertises these files; operators/robots.py parses that
side).

Spark-first: the XML never meets a python parser — ``<url>`` /
``<sitemap>`` blocks are extracted with ``regexp_extract_all`` (JVM,
codegen), exploded ONCE to per-entry rows, and each field (<loc>,
<lastmod>, <changefreq>, <priority>) is one regexp over its own block.
Sitemap INDEX files (``<sitemapindex>``) are classified with
``is_index = true`` and their child locs returned as ordinary rows —
recursion (fetch the child, parse again) is the crawl loop's concern,
exactly like frontier expansion, so the parser stays a pure
DataFrame-in/DataFrame-out operator with no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _field(block, pattern: str):
    ex = F.regexp_extract(block, pattern, 1)
    return F.when(ex == "", None).otherwise(ex)


def sitemap_entries(
    sitemaps: DataFrame, xml_col: str = "xml", id_col: str = "sitemap_id"
) -> DataFrame:
    """(id, xml) -> one row per ``<url>`` entry (or per child
    ``<sitemap>`` for index files): (id, ord, loc, lastmod, changefreq,
    priority, is_index). ``ord`` preserves document order; entries
    without a ``<loc>`` are dropped (they identify nothing); priority
    parses as double. Both block patterns are constant regexes (Spark
    requires foldable patterns) and the index/urlset choice picks
    between the two extracted arrays."""
    is_index = F.col(xml_col).contains("<sitemapindex")
    url_blocks = F.expr(
        f"regexp_extract_all({xml_col}, '(?s)<url>(.*?)</url>', 1)"
    )
    idx_blocks = F.expr(
        f"regexp_extract_all({xml_col}, '(?s)<sitemap>(.*?)</sitemap>', 1)"
    )
    rows = sitemaps.select(
        F.col(id_col),
        is_index.alias("is_index"),
        F.posexplode(F.when(is_index, idx_blocks).otherwise(url_blocks)).alias(
            "ord", "_block"
        ),
    )
    block = F.col("_block")
    return rows.select(
        id_col,
        F.col("ord").cast("long").alias("ord"),
        _field(block, r"<loc>\s*(.*?)\s*</loc>").alias("loc"),
        _field(block, r"<lastmod>\s*(.*?)\s*</lastmod>").alias("lastmod"),
        _field(block, r"<changefreq>\s*(.*?)\s*</changefreq>").alias("changefreq"),
        _field(block, r"<priority>\s*(.*?)\s*</priority>")
        .cast("double")
        .alias("priority"),
        "is_index",
    ).filter(F.col("loc").isNotNull())


def sitemap_seed_frontier(
    sitemaps: DataFrame,
    xml_col: str = "xml",
    id_col: str = "sitemap_id",
) -> DataFrame:
    """Page entries only (index children excluded), deduplicated by loc
    with the smallest (sitemap, ord) kept — the seed list a crawl wave
    unions into its frontier. Composes with the canonicalizer and the
    URL-seen dedup downstream; one extra shuffle on loc for the
    keep-first window."""
    from pyspark.sql import Window

    entries = sitemap_entries(sitemaps, xml_col=xml_col, id_col=id_col).filter(
        ~F.col("is_index")
    )
    w = Window.partitionBy("loc").orderBy(id_col, "ord")
    return (
        entries.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "ord", "loc", "lastmod", "priority")
    )
