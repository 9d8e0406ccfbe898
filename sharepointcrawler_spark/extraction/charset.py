"""Charset sniffing + decoding for binary web pages.

The engine's input table carries ``html`` as BINARY (Common-Crawl
shape): real web pages arrive in utf-8, utf-16 with BOMs, and a long
tail of legacy single-byte encodings. Decoding them wrong silently
corrupts every downstream text stage, so this is admission-control
infrastructure, not a convenience.

Detection order follows the WHATWG encoding sniffing algorithm's
practical core (https://encoding.spec.whatwg.org/#specifying-the-document-s-character-encoding):

1. BOM (utf-8-sig, utf-16 LE/BE) — authoritative, overrides meta
2. ``<meta charset=...>`` / ``<meta http-equiv="Content-Type"
   content="...; charset=...">`` scanned in the first 1024 bytes
   (the spec's prescan window), ASCII-compatible byte regex
3. strict utf-8 trial decode
4. fallback to latin-1 (ISO-8859-1 — every byte decodes, the WHATWG
   default family for unlabeled legacy bytes)

This is per-blob leaf work — the same Arrow-batched pandas-UDF lane
as PDF/Office extraction (one Arrow crossing, no JVM equivalent for
codec work). The output carries ``charset`` and ``charset_src``
(bom/meta/utf8/fallback) so a pipeline can audit its decode mix.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PRESCAN = 1024
_META_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([A-Za-z0-9_:.-]+)""", re.I
)

# python codec aliases for the labels web pages actually use
_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "iso-8859-1": "latin-1", "latin-1": "latin-1", "latin1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
    "us-ascii": "ascii", "ascii": "ascii",
}


def sniff_and_decode(data: bytes | None) -> tuple[str | None, str, str]:
    """-> (text, charset, charset_src). Never raises: undecodable
    bytes under the declared codec fall through to latin-1 (which
    always decodes) with ``charset_src='fallback'``."""
    if data is None:
        return None, "none", "none"
    if data.startswith(b"\xef\xbb\xbf"):
        return data[3:].decode("utf-8", "replace"), "utf-8", "bom"
    if data.startswith(b"\xff\xfe"):
        return data[2:].decode("utf-16-le", "replace"), "utf-16-le", "bom"
    if data.startswith(b"\xfe\xff"):
        return data[2:].decode("utf-16-be", "replace"), "utf-16-be", "bom"
    m = _META_RE.search(data[:_PRESCAN])
    if m:
        label = m.group(1).decode("ascii", "replace").lower()
        codec = _LABELS.get(label)
        if codec:
            try:
                return data.decode(codec), label, "meta"
            except UnicodeDecodeError:
                pass  # mislabeled page: fall through to trial decode
    try:
        return data.decode("utf-8"), "utf-8", "utf8"
    except UnicodeDecodeError:
        return data.decode("latin-1"), "iso-8859-1", "fallback"


_OUT_SCHEMA = T.StructType(
    [
        T.StructField("html_text", T.StringType()),
        T.StructField("charset", T.StringType()),
        T.StructField("charset_src", T.StringType()),
    ]
)


@F.pandas_udf(_OUT_SCHEMA)
def decode_html_udf(blobs: pd.Series) -> pd.DataFrame:
    rows = [sniff_and_decode(b) for b in blobs]
    return pd.DataFrame(rows, columns=["html_text", "charset", "charset_src"])


def decode_pages(
    pages: DataFrame, bytes_col: str = "html", out_prefix: str = ""
) -> DataFrame:
    """Add ``html_text`` / ``charset`` / ``charset_src`` decoded from
    the binary ``bytes_col`` — ONE Arrow crossing for all three."""
    p = out_prefix
    s = decode_html_udf(F.col(bytes_col))
    return (
        pages.withColumn("_cs", s)
        .withColumn(p + "html_text", F.col("_cs.html_text"))
        .withColumn(p + "charset", F.col("_cs.charset"))
        .withColumn(p + "charset_src", F.col("_cs.charset_src"))
        .drop("_cs")
    )


def to_utf8_bytes(data: bytes | None) -> bytes | None:
    """Transcode html bytes to utf-8 FOR THE BYTE-REGEX PARSERS —
    conservative by construction: only a BOM or a meta label that
    names a non-utf-8 codec (and strictly decodes) triggers a
    transcode; every other input returns the ORIGINAL bytes object
    untouched, so utf-8/ascii pages keep exact byte identity through
    the extraction contract."""
    if data is None:
        return None
    if data.startswith((b"\xef\xbb\xbf", b"\xff\xfe", b"\xfe\xff")):
        text, _, _ = sniff_and_decode(data)
        return text.encode("utf-8")
    m = _META_RE.search(data[:_PRESCAN])
    if m:
        label = m.group(1).decode("ascii", "replace").lower()
        codec = _LABELS.get(label)
        if codec and codec not in ("utf-8", "ascii"):
            try:
                return data.decode(codec).encode("utf-8")
            except UnicodeDecodeError:
                pass  # mislabeled: leave bytes for the default path
    return data
