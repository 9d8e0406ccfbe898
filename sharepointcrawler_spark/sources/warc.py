"""WARC ingestion (ISO 28500): the wire format web archives actually
arrive in — Common Crawl ships per-record-gzipped WARC files, and the
engine's ``pages`` input table (url, warc_ts, html, ...) is exactly
what a WARC response record flattens to. This module closes the gap
between "a bucket of .warc.gz blobs" and that table.

Spark shape: WARC blobs are opaque ``binary`` cells; record splitting,
header parsing, and HTTP-payload separation run per-blob inside an
Arrow-batched ``mapInPandas`` (per-blob python is inherent to a
container format, same stance as the image/audio codecs) and emit
skinny typed rows. Both storage layouts are handled: plain
concatenated records AND the per-record-gzip members Common Crawl uses
(each record its own gzip stream, so a reader can seek to an offset
and inflate one record — the multi-member walk here mirrors that).

``write_warc`` produces spec-correct fixture bytes (warcinfo +
request/response records, optional per-record gzip) so round trips and
the DuckDB oracle pin the parser.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gunzip_members(blob: bytes) -> bytes:
    """Concatenate every gzip member in ``blob`` (the Common Crawl
    layout: one member per record). A plain (non-gzip) blob passes
    through unchanged."""
    if blob[:2] != b"\x1f\x8b":
        return blob
    out = bytearray()
    pos = 0
    while pos < len(blob) and blob[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(blob[pos:])
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member did not advance")
        pos += consumed
    if pos != len(blob):
        raise ValueError("trailing garbage after gzip members")
    return bytes(out)


def parse_warc(blob: bytes) -> list[dict]:
    """WARC bytes -> list of records. Each record dict carries
    ``warc_type``, ``url`` (WARC-Target-URI), ``warc_ts`` (WARC-Date),
    ``http_status`` and ``body`` — for ``application/http`` blocks
    (requests AND responses) the HTTP headers are stripped so body is
    the HTTP payload (empty for a GET request); other records keep the
    raw block. Records are delimited per spec: header lines to
    CRLFCRLF, then exactly Content-Length payload bytes, then
    CRLFCRLF."""
    data = _gunzip_members(blob or b"")
    records: list[dict] = []
    pos = 0
    while True:
        start = data.find(b"WARC/1.", pos)
        if start < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            raise ValueError("WARC header block not terminated")
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing Content-Length") from None
        body_start = hdr_end + 4
        block = data[body_start : body_start + length]
        if len(block) != length:
            raise ValueError("WARC record truncated")
        pos = body_start + length
        rec: dict = {
            "warc_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri"),
            "warc_ts": headers.get("warc-date"),
            "http_status": None,
            "body": block,
        }
        if headers.get("content-type", "").startswith("application/http"):
            http_end = block.find(b"\r\n\r\n")
            if http_end >= 0:
                status_line = block[:http_end].split(b"\r\n", 1)[0]
                parts = status_line.split()
                if len(parts) >= 2 and parts[1].isdigit():
                    rec["http_status"] = int(parts[1])
                rec["body"] = block[http_end + 4 :]
        records.append(rec)
    return records


WARC_RECORD_SCHEMA = (
    "warc_id long, record_ord long, warc_type string, url string,"
    " warc_ts string, http_status int, body binary"
)


def warc_records(
    warcs: DataFrame, blob_col: str = "warc", id_col: str = "warc_id"
) -> DataFrame:
    """(id, warc blob) -> one typed row per record, in file order.
    Undecodable blobs yield a single NULL-typed row (errors-as-rows,
    the engine-wide policy) rather than crashing the task."""

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        for pdf in batches:
            rows = []
            for wid, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    recs = parse_warc(bytes(blob) if blob is not None else b"")
                except (ValueError, zlib.error, OSError):
                    rows.append((wid, None, None, None, None, None, None))
                    continue
                for i, r in enumerate(recs):
                    rows.append(
                        (
                            wid,
                            i,
                            r["warc_type"],
                            r["url"],
                            r["warc_ts"],
                            r["http_status"],
                            r["body"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "record_ord", "warc_type", "url",
                    "warc_ts", "http_status", "body",
                ],
            )

    return warcs.select(id_col, blob_col).mapInPandas(split, WARC_RECORD_SCHEMA)


def warc_pages(
    warcs: DataFrame, blob_col: str = "warc", id_col: str = "warc_id"
) -> DataFrame:
    """The pages-table projection (the engine's input contract:
    url, warc_ts timestamp, html): successful (2xx) response records
    only."""
    recs = warc_records(warcs, blob_col=blob_col, id_col=id_col)
    return (
        recs.filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") >= 200)
            & (F.col("http_status") < 300)
        )
        .select(
            F.col("url"),
            F.to_timestamp(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
                "warc_ts"
            ),
            F.col("body").alias("html"),
        )
    )


def write_warc(
    pages: list[tuple[str, str, int, bytes]], per_record_gzip: bool = False
) -> bytes:
    """Fixture writer: (url, iso_ts, http_status, html) -> WARC bytes
    with a leading warcinfo record and a request + response pair per
    page (the Common Crawl record mix). ``per_record_gzip`` emits each
    record as its own gzip member, the CC storage layout."""

    def record(headers: list[tuple[str, str]], block: bytes) -> bytes:
        head = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}\r\n".encode("latin-1") for k, v in headers
        )
        head += f"Content-Length: {len(block)}\r\n".encode()
        return head + b"\r\n" + block + b"\r\n\r\n"

    out: list[bytes] = []
    info = b"software: fixture-writer\r\nformat: WARC File Format 1.0\r\n"
    out.append(
        record(
            [("WARC-Type", "warcinfo"), ("Content-Type", "application/warc-fields")],
            info,
        )
    )
    for url, ts, status, html in pages:
        req = (
            f"GET {url} HTTP/1.1\r\nHost: fixture\r\n\r\n".encode("latin-1")
        )
        out.append(
            record(
                [
                    ("WARC-Type", "request"),
                    ("WARC-Target-URI", url),
                    ("WARC-Date", ts),
                    ("Content-Type", "application/http; msgtype=request"),
                ],
                req,
            )
        )
        http = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(html)}\r\n\r\n"
        ).encode("latin-1") + html
        out.append(
            record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Target-URI", url),
                    ("WARC-Date", ts),
                    ("Content-Type", "application/http; msgtype=response"),
                ],
                http,
            )
        )
    if per_record_gzip:
        parts = []
        for rec in out:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(rec)
            parts.append(buf.getvalue())
        return b"".join(parts)
    return b"".join(out)
