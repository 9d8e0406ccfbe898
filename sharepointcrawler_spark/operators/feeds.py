"""RSS 2.0 / Atom feed ingestion — the third seed-discovery channel.

Real crawlers discover URLs three ways: link expansion (the frontier),
sitemaps (operators/sitemap.py), and syndication feeds, which are the
freshness channel — a feed advertises the *newest* documents of a site
minutes after publication, long before a sitemap regenerates or a link
appears. News/blog-heavy corpora (a large share of web training text)
are crawled feed-first for exactly that reason.

Same Spark-first design as the sitemap parser: the XML never meets a
python parser. ``<item>`` (RSS) / ``<entry>`` (Atom) blocks come out
of one constant-pattern ``regexp_extract_all`` (JVM, codegen), explode
ONCE, and each field is one regexp over its own block. Atom's
``<link href=".."/>`` attribute form needs attribute-order/quote
robustness, which RE2-style engines give via two constant patterns +
``coalesce`` (no backreferences). One scan, one Generate, zero Python,
zero shuffles — at 100 TB this is a flat columnar decode.

Feed entries carry a publication timestamp, so they compose with
``operators/recrawl.py`` the same way sitemap ``<lastmod>`` does:
:func:`feed_seed_frontier` output is shaped like
``sitemap_seed_frontier``'s (id, ord, loc, lastmod, priority) and can
be MERGEd into the frontier by the identical chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _field(block, pattern: str):
    ex = F.regexp_extract(block, pattern, 1)
    return F.when(ex == "", None).otherwise(ex)


def feed_entries(
    feeds: DataFrame, xml_col: str = "xml", id_col: str = "feed_id"
) -> DataFrame:
    """(id, xml) -> one row per ``<item>``/``<entry>``: (id, ord, loc,
    title, published, guid, is_atom). ``ord`` preserves document order
    (feeds are newest-first by convention, so ord doubles as a
    freshness rank); entries without a resolvable link are dropped.

    Link resolution: RSS ``<link>url</link>`` text; Atom prefers the
    ``rel="alternate"`` link, falling back to the first ``href``.
    ``published`` coalesces pubDate (RSS) / published / updated (Atom).
    ``guid`` coalesces ``<guid>`` (RSS) / ``<id>`` (Atom) — the dedup
    key feed readers use when a site rewrites its URLs."""
    is_atom = F.col(xml_col).contains("<feed")
    item_blocks = F.expr(
        f"regexp_extract_all({xml_col}, '(?s)<item[ >](.*?)</item>', 1)"
    )
    entry_blocks = F.expr(
        f"regexp_extract_all({xml_col}, '(?s)<entry[ >](.*?)</entry>', 1)"
    )
    rows = feeds.select(
        F.col(id_col),
        is_atom.alias("is_atom"),
        F.posexplode(F.when(is_atom, entry_blocks).otherwise(item_blocks)).alias(
            "ord", "_block"
        ),
    )
    b = F.col("_block")
    rss_link = _field(b, r"<link>\s*(.*?)\s*</link>")
    atom_alt = F.coalesce(
        _field(b, "<link[^>]*rel=[\"']alternate[\"'][^>]*href=[\"']([^\"']*)[\"']"),
        _field(b, "<link[^>]*href=[\"']([^\"']*)[\"'][^>]*rel=[\"']alternate[\"']"),
    )
    atom_any = _field(b, "<link[^>]*href=[\"']([^\"']*)[\"']")
    loc = F.when(
        F.col("is_atom"), F.coalesce(atom_alt, atom_any)
    ).otherwise(rss_link)
    return rows.select(
        id_col,
        F.col("ord").cast("long").alias("ord"),
        loc.alias("loc"),
        _field(b, r"(?s)<title[^>]*>\s*(.*?)\s*</title>").alias("title"),
        F.coalesce(
            _field(b, r"<pubDate>\s*(.*?)\s*</pubDate>"),
            _field(b, r"<published>\s*(.*?)\s*</published>"),
            _field(b, r"<updated>\s*(.*?)\s*</updated>"),
        ).alias("published"),
        F.coalesce(
            _field(b, r"<guid[^>]*>\s*(.*?)\s*</guid>"),
            _field(b, r"<id>\s*(.*?)\s*</id>"),
        ).alias("guid"),
        "is_atom",
    ).filter(F.col("loc").isNotNull())


def feed_seed_frontier(
    feeds: DataFrame, xml_col: str = "xml", id_col: str = "feed_id"
) -> DataFrame:
    """Entries deduplicated by loc, smallest (feed, ord) kept — shaped
    like ``sitemap_seed_frontier`` (id, ord, loc, lastmod, priority) so
    the existing frontier MERGE chain consumes it unchanged. The feed's
    publication timestamp becomes ``lastmod`` (feeding recrawl priors);
    ``priority`` ranks fresher entries higher: 1/(1+ord), the newest-
    first convention made explicit."""
    entries = feed_entries(feeds, xml_col=xml_col, id_col=id_col)
    w = Window.partitionBy("loc").orderBy(id_col, "ord")
    return (
        entries.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(id_col).alias("sitemap_id"),
            "ord",
            "loc",
            F.col("published").alias("lastmod"),
            (F.lit(1.0) / (F.lit(1.0) + F.col("ord").cast("double"))).alias(
                "priority"
            ),
        )
    )
