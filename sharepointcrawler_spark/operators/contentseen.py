"""Content-digest seen set: dedup by WHAT was fetched, not what URL it
came from.

URL canonicalization (P7), redirect landing (operators/redirects.py) and
page-side rel=canonical (functions/htmlmeta.py) collapse *spellings* of
the same resource; none of them catch true mirrors — the same bytes
served from different hosts/paths with no declared relationship. Large
crawlers close that gap with a digest-of-content seen set (Heritrix's
"content digest history" dedup; the reference has no analog because its
sequential loop visits each SharePoint item exactly once,
SharePointClient.cs:201-342 — at web scale mirrors are ~30% of fetches).

Three composable pieces, all JVM-side (no Python in the path):

* :func:`content_digest` — a portable 60-bit digest column (top 15 hex
  chars of md5, base-converted). 60 bits keeps the value positive in a
  signed 64-bit lane in both Spark and DuckDB; collision probability at
  10^10 documents is ~4% for ONE collision somewhere (birthday bound),
  and a collision only ever *drops one true page* — acceptable for
  dedup, and swappable for ``xxhash64`` when cross-engine parity is not
  needed.
* :func:`mark_content_dups` — within one crawl: keep-first by digest in
  crawl order (one window, one shuffle on the digest).
* :func:`content_seen_outcomes` — across crawls: join current digests
  against the previous snapshot's digest store and classify every page
  as ``new`` / ``unchanged`` / ``changed`` / ``dup_in_crawl``. The
  ``changed`` boolean feeds :func:`operators.recrawl.
  apply_refresh_outcome` directly — the digest store IS the change
  detector the recrawl scheduler learns from.

At 100 TB: digests are one narrow (url_key, digest) table bucketed like
the URL-seen set; the within-crawl window shuffles only (digest, order)
pairs — the html/text column never moves. The cross-crawl join is an
equi-join on url_key against a bucketed store (the same
storage-partitioned-join shape as the bucketed URL-seen confirm).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "content_digest",
    "mark_content_dups",
    "content_seen_outcomes",
]


def content_digest(col: Column | str) -> Column:
    """Portable 60-bit content digest: ``conv(substr(md5(x),1,15),16,10)``
    cast to long. Identical bit-for-bit to DuckDB's
    ``('0x' || substr(md5(x),1,15))::UBIGINT`` — the cross-engine hash
    lane this repo uses everywhere parity matters."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def mark_content_dups(
    df: DataFrame,
    *,
    content_col: str = "text",
    order_cols: tuple[str, ...] = ("url_canon",),
    digest_out: str = "content_digest",
    flag_out: str = "is_content_dup",
) -> DataFrame:
    """Within-crawl content dedup: the FIRST page (in crawl order) with
    a given digest is the canonical copy; every later page with the same
    digest is flagged, not dropped — flag-don't-drop so the caller
    chooses (skip ingestion, keep link expansion: the Heritrix policy).

    One window over the digest; ties broken by ``order_cols`` (pass the
    crawl sequence for true crawl-order semantics, or the canonical URL
    for a deterministic batch tie-break)."""
    out = df.withColumn(digest_out, content_digest(content_col))
    w = Window.partitionBy(digest_out).orderBy(*[F.col(c) for c in order_cols])
    return out.withColumn(
        flag_out, F.row_number().over(w) > F.lit(1)
    )


def content_seen_outcomes(
    current: DataFrame,
    prior_digests: DataFrame | None,
    *,
    id_col: str = "url_canon",
    content_col: str = "text",
    order_cols: tuple[str, ...] | None = None,
    digest_out: str = "content_digest",
) -> DataFrame:
    """Classify every fetched page against the previous crawl's digest
    store.

    ``current``: this crawl's fetched pages (``id_col``, ``content_col``,
    + passthrough columns). ``prior_digests``: the stored
    (``id_col``, ``content_digest``) table from the last crawl, or None
    for a first crawl.

    Output = ``current`` + ``content_digest`` + ``status``:

    * ``dup_in_crawl`` — another page THIS crawl already has the digest
      (keep-first in ``order_cols`` order); mirrors detected now.
    * ``unchanged``    — same url, same digest as last crawl: skip
      re-extraction/re-ingestion, report ``changed = false`` to the
      recrawl history.
    * ``changed``      — same url, different digest: re-ingest, report
      ``changed = true``.
    * ``new``          — url not in the prior store.

    The companion ``changed`` boolean column makes the frame directly
    consumable by :func:`operators.recrawl.apply_refresh_outcome`
    (id_col + changed). Statuses are disjoint and total: every input row
    gets exactly one.
    """
    order_cols = order_cols or (id_col,)
    flagged = mark_content_dups(
        current,
        content_col=content_col,
        order_cols=order_cols,
        digest_out=digest_out,
        flag_out="_dup_in_crawl",
    )
    if prior_digests is None:
        joined = flagged.withColumn("_prior_digest", F.lit(None).cast("long"))
    else:
        prior = prior_digests.select(
            F.col(id_col).alias("_prior_id"),
            F.col(digest_out).alias("_prior_digest"),
        )
        joined = flagged.join(
            prior, flagged[id_col] == prior["_prior_id"], "left"
        ).drop("_prior_id")
    out = joined.withColumn(
        "status",
        F.when(F.col("_dup_in_crawl"), F.lit("dup_in_crawl"))
        .when(F.col("_prior_digest").isNull(), F.lit("new"))
        .when(F.col("_prior_digest") == F.col(digest_out), F.lit("unchanged"))
        .otherwise(F.lit("changed")),
    ).withColumn(
        # recrawl-history signal: a dup-in-crawl page is NOT evidence the
        # url's own content changed — null there, boolean elsewhere
        "changed",
        F.when(F.col("_dup_in_crawl"), F.lit(None).cast("boolean")).otherwise(
            F.col("_prior_digest").isNotNull()
            & (F.col("_prior_digest") != F.col(digest_out))
        ),
    )
    return out.drop("_dup_in_crawl", "_prior_digest")
