"""CDXJ capture-index ingestion (the Common Crawl / pywb index format).

A CDXJ file is the lookup index over a WARC collection: one line per
capture, ``<surt-key> <14-digit-timestamp> <json>``, sorted by key —
the format behind Common Crawl's columnar index and every Wayback
deployment (pywb CDXJ spec; ISO 28500's WARC is the payload side,
``sources/warc.py``). Crawlers consume it two ways, both provided
here:

- :func:`cdx_records` parses lines to typed rows entirely JVM-side:
  one constant-pattern regexp splits the three fields (the JSON blob
  may contain spaces, so a plain split would shred it), then
  ``get_json_object`` pulls the typed fields. One scan, zero shuffles,
  zero Python — at Common-Crawl scale (300 M lines/crawl) this is a
  plain columnar decode.
- :func:`latest_captures` answers "current state of every URL" — the
  cross-crawl dedup step: keep the newest capture per SURT key, the
  digest column then feeds the content-seen set (a URL whose digest is
  unchanged since the last crawl needs no re-fetch). One window over
  the key — and because CDXJ is already sorted by key, a sort-aware
  layout turns that shuffle into a merge.

The reference has no index format (it re-enumerates the tenant every
run); CDX is what lets a web-scale recrawl START from the previous
crawl instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# surt key, 14-digit timestamp, JSON blob (greedy — JSON may hold spaces)
_LINE_RE = r"^(\S+) (\d{14}) (\{.*\})$"


def cdx_records(
    lines: DataFrame, line_col: str = "line", strict_col: str = "cdx_issue"
) -> DataFrame:
    """Parse CDXJ ``line`` rows to typed capture rows: (surt, ts,
    url, status, mime, digest, length, offset, filename, cdx_issue).
    Malformed lines are kept with NULL fields and a non-NULL
    ``cdx_issue`` (errors-as-rows, the engine-wide convention) —
    never silently dropped."""
    line = F.col(line_col)
    surt = F.nullif(F.regexp_extract(line, _LINE_RE, 1), F.lit(""))
    ts = F.nullif(F.regexp_extract(line, _LINE_RE, 2), F.lit(""))
    js = F.nullif(F.regexp_extract(line, _LINE_RE, 3), F.lit(""))
    bad = js.isNull()
    return lines.select(
        surt.alias("surt"),
        ts.alias("ts"),
        F.get_json_object(js, "$.url").alias("url"),
        F.get_json_object(js, "$.status").cast("long").alias("status"),
        F.get_json_object(js, "$.mime").alias("mime"),
        F.get_json_object(js, "$.digest").alias("digest"),
        F.get_json_object(js, "$.length").cast("long").alias("length"),
        F.get_json_object(js, "$.offset").cast("long").alias("offset"),
        F.get_json_object(js, "$.filename").alias("filename"),
        F.when(bad, F.lit("malformed CDXJ line")).alias(strict_col),
    )


def latest_captures(records: DataFrame) -> DataFrame:
    """Newest capture per SURT key (ties broken by descending status
    presence then filename/offset for determinism). Malformed rows
    (NULL surt) are excluded — they identify no URL."""
    w = Window.partitionBy("surt").orderBy(
        F.col("ts").desc(), F.col("filename").desc(), F.col("offset").desc()
    )
    return (
        records.filter(F.col("surt").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def unchanged_since(
    current: DataFrame, previous: DataFrame, key: str = "surt"
) -> DataFrame:
    """Captures in ``current`` whose content digest matches the
    previous crawl's capture of the same key — the rows a recrawl can
    skip (the CDX analog of the content-digest seen set in
    ``operators/dedup.py``). Join keyed on the SURT key; with both
    sides written sorted by key this is the merge-join case."""
    prev = previous.select(
        F.col(key).alias("_pk"), F.col("digest").alias("_pdigest")
    )
    return (
        current.join(
            prev,
            (F.col(key) == F.col("_pk"))
            & (F.col("digest") == F.col("_pdigest")),
            "inner",
        )
        .drop("_pk", "_pdigest")
    )
