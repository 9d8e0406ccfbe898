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

from typing import Callable

from pyspark.sql import DataFrame, Window
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


def sitemap_refresh_priors(
    entries: DataFrame,
    now_date: str,
    loc_col: str = "loc",
    lastmod_col: str = "lastmod",
    changefreq_col: str = "changefreq",
) -> DataFrame:
    """Bootstrap refresh priorities from sitemap metadata — the cold-
    start composition of the discovery and recrawl features: before any
    fetch history exists, ``<changefreq>`` is the site's own declared
    change rate and ``<lastmod>`` its last known change, so the Cho &
    Garcia-Molina staleness ranking applies immediately with
    λ = the changefreq as events/day and age = days since lastmod.

    Output matches :func:`operators.recrawl.recrawl_priorities`
    (lambda_per_day, age_days, staleness, due), so
    ``select_refresh_batch`` composes unchanged. All arithmetic is
    IEEE-exact (+ * / of literals) and age uses DATE day-diffs (no
    timezone-dependent epoch math), so the whole surface is
    hash-oracle-safe. Unknown/missing changefreq defaults to the
    monthly prior; 'never' pins λ=0 (never due); missing lastmod
    yields NULL age/staleness and due=false (no evidence — history,
    not priors, must schedule it)."""
    from sharepointcrawler_spark.operators.recrawl import LN2

    freq = F.lower(F.col(changefreq_col))
    lam = (
        F.when(freq == "always", F.lit(48.0))
        .when(freq == "hourly", F.lit(24.0))
        .when(freq == "daily", F.lit(1.0))
        .when(freq == "weekly", F.lit(1.0) / F.lit(7.0))
        .when(freq == "monthly", F.lit(1.0) / F.lit(30.0))
        .when(freq == "yearly", F.lit(1.0) / F.lit(365.0))
        .when(freq == "never", F.lit(0.0))
        .otherwise(F.lit(1.0) / F.lit(30.0))
    )
    age = F.datediff(
        F.to_date(F.lit(now_date)), F.to_date(F.col(lastmod_col))
    ).cast("double")
    lam_age = lam * age
    return entries.select(
        F.col(loc_col),
        lam.alias("lambda_per_day"),
        age.alias("age_days"),
        lam_age.alias("staleness"),
        F.coalesce(lam_age >= F.lit(LN2), F.lit(False)).alias("due"),
    )


def expand_sitemap_tree(
    sitemap_urls: DataFrame,
    sitemap_fetch: Callable[[DataFrame], DataFrame],
    max_depth: int = 3,
    url_col: str = "sitemap_url",
) -> DataFrame:
    """Resolve a set of advertised sitemap URLs — including
    ``<sitemapindex>`` files, whose children are fetched and parsed in
    further rounds — into one page-entry table
    ``(sitemap_id, ord, loc, lastmod, priority)``.

    ``sitemap_fetch(df)`` receives a one-column ``sitemap_url`` frame
    and returns ``(sitemap_url, xml)`` rows (the crawl loop's fetch
    analog; a fixture table lookup in tests). The index recursion is a
    bounded driver loop exactly like the crawl's wave loop (sitemaps.org
    caps nesting in practice; ``max_depth`` defaults to 3); all parsing
    stays JVM-side in :func:`sitemap_entries`. Already-fetched sitemap
    URLs are anti-joined out, so an index cycle cannot loop."""
    pending = sitemap_urls.select(
        F.col(url_col).alias("sitemap_url")
    ).distinct().persist()
    fetched: DataFrame | None = None
    pages: DataFrame | None = None
    cached = [pending]  # every persist released after the final checkpoint
    for _ in range(max_depth):
        # pending is persisted, so the isEmpty probe and the fetch join
        # below share one evaluation instead of recomputing the level
        if pending.isEmpty():
            break
        xml = sitemap_fetch(pending).withColumnRenamed("sitemap_url", "sitemap_id")
        entries = sitemap_entries(xml, xml_col="xml", id_col="sitemap_id").persist()
        cached.append(entries)
        level_pages = entries.filter(~F.col("is_index")).select(
            "sitemap_id", "ord", "loc", "lastmod", "priority"
        )
        pages = level_pages if pages is None else pages.unionByName(level_pages)
        fetched = (
            pending if fetched is None else fetched.unionByName(pending)
        ).distinct()
        pending = (
            entries.filter(F.col("is_index"))
            .select(F.col("loc").alias("sitemap_url"))
            .distinct()
            .join(fetched, "sitemap_url", "left_anti")
            .persist()
        )
        cached.append(pending)
    if pages is None:
        for df in cached:
            df.unpersist()
        return sitemap_urls.sparkSession.createDataFrame(
            [],
            "sitemap_id string, ord long, loc string, lastmod string, priority double",
        )
    # keep-first dedup across files: smallest (sitemap_id, ord) wins.
    # The result MATERIALIZES (eager checkpoint — a sitemap seed list is
    # small by construction) so every per-level persist can be released
    # here instead of leaking for the session lifetime.
    w = Window.partitionBy("loc").orderBy("sitemap_id", "ord")
    out = (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .localCheckpoint(eager=True)
    )
    for df in cached:
        df.unpersist()
    return out


def sitemap_frontier_rows(
    pages: DataFrame,
    start_idx: int = 0,
    priority: int = 0,
    approx_rows: int | None = None,
) -> DataFrame:
    """Page entries from :func:`expand_sitemap_tree` -> frontier seed
    rows (FRONTIER_SCHEMA) appended AFTER the crawl's explicit seeds:
    seed index ``start_idx + rank`` where rank orders by (sitemap_id,
    ord) — a deterministic total order, assigned scale-safely with the
    same range-partitioned sequence the crawl order uses (sitemaps cap
    at 50k URLs per FILE but a large site ships thousands of files).

    Entries are canonicalized and deduplicated by canonical URL before
    ranking; ``kind`` is 'folder' like explicit seeds (the expander
    decides whether anything hangs below them)."""
    from sharepointcrawler_spark.operators.frontier import (
        FRONTIER_SCHEMA,
        PENDING,
        global_sequence,
    )
    from sharepointcrawler_spark.functions.urlnorm import (
        canonicalize_url,
        url_host,
        url_key,
    )

    canon = (
        pages.withColumn("url_canon", canonicalize_url("loc"))
        .filter(F.col("url_canon").isNotNull())
    )
    w = Window.partitionBy("url_canon").orderBy("sitemap_id", "ord")
    uniq = canon.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    # single synthetic order column for the global sequence: ord is
    # 8-hex fixed width; '\n' can't appear in a URL, so the concat's
    # lexicographic order == (sitemap_id, ord)
    ordered = global_sequence(
        uniq.withColumn(
            "_ok",
            F.concat(
                F.col("sitemap_id"),
                F.lit("\n"),
                F.lpad(F.conv(F.col("ord").cast("string"), 10, 16), 8, "0"),
            ),
        ),
        "_ok",
        out_col="_seq",
        # the checkpointed pages table has no planner stats (LogicalRDD
        # reports the unknown-size sentinel), which silently forces the
        # two-pass ranked path — and ITS range-sampling + count pass is
        # an EAGER job at plan-build time. Callers that know their
        # discovery scale pass the hint; small ones take the one-window
        # path with zero build-time actions.
        approx_rows=approx_rows,
    )
    return (
        ordered.withColumn("url", F.col("loc"))
        .withColumn("url_key", url_key("url_canon"))
        .withColumn("host", url_host("url_canon"))
        .withColumn("parent_canon", F.lit(None).cast("string"))
        .withColumn("depth", F.lit(0))
        .withColumn("priority", F.lit(priority))
        .withColumn("kind", F.lit("folder"))
        .withColumn(
            "path_key",
            F.lpad(
                F.conv(
                    (F.lit(start_idx) + F.col("_seq") - F.lit(1)).cast("string"),
                    10,
                    16,
                ),
                8,
                "0",
            ),
        )
        .withColumn("state", F.lit(PENDING))
        .withColumn("wave_id", F.lit(0))
        .withColumn("attempt", F.lit(0))
        .select([f.name for f in FRONTIER_SCHEMA.fields])
    )


def sitemap_blob_to_xml(blob: bytes | None) -> str | None:
    """Raw fetched sitemap body -> xml string: gzip members
    (sitemaps.org: 'sitemap files may be compressed using gzip')
    inflate via the 1f 8b magic, everything else decodes through the
    charset sniffer (BOM'd UTF-16 sitemaps exist in the wild)."""
    if blob is None:
        return None
    if blob[:2] == b"\x1f\x8b":
        import gzip

        try:
            blob = gzip.decompress(blob)
        except (OSError, EOFError):
            # BadGzipFile is OSError; a truncated member raises EOFError
            return None  # corrupt member: no entries, never a crash
    from sharepointcrawler_spark.extraction.charset import sniff_and_decode

    text, _, _ = sniff_and_decode(blob)
    return text


import pandas as _pd
from pyspark.sql import types as _T


@F.pandas_udf(_T.StringType())
def _inflate_udf(blobs: _pd.Series) -> _pd.Series:
    return blobs.map(sitemap_blob_to_xml)


def sitemap_entries_from_blobs(
    sitemaps: DataFrame, blob_col: str = "body", id_col: str = "sitemap_id"
) -> DataFrame:
    """BINARY sitemap bodies -> the same entry table as
    :func:`sitemap_entries`: one Arrow crossing inflates/decodes, the
    JVM regex path parses. Undecodable members yield zero entries."""
    staged = sitemaps.select(
        F.col(id_col), _inflate_udf(F.col(blob_col)).alias("xml")
    ).filter(F.col("xml").isNotNull())
    return sitemap_entries(staged, xml_col="xml", id_col=id_col)
