"""WARC ingestion (ISO 28500, the Common Crawl wire format): record
splitting, header parse, HTTP payload separation, per-record gzip
members, and the pages-table projection the engine's input contract
names (url, warc_ts, html)."""

from __future__ import annotations

import pytest

from sharepointcrawler_spark.sources.warc import (
    parse_warc,
    warc_pages,
    warc_records,
    write_warc,
)

PAGES = [
    ("https://a.example.com/x", "2024-01-02T03:04:05Z", 200, b"<html>alpha</html>"),
    ("https://b.example.com/y", "2024-02-03T04:05:06Z", 404, b"<html>gone</html>"),
    ("https://a.example.com/z", "2024-03-04T05:06:07Z", 200, b"<html>beta beta</html>"),
]


@pytest.mark.parametrize("gz", [False, True], ids=["plain", "per-record-gzip"])
def test_parse_round_trip(gz):
    blob = write_warc(PAGES, per_record_gzip=gz)
    recs = parse_warc(blob)
    assert [r["warc_type"] for r in recs] == (
        ["warcinfo"] + ["request", "response"] * 3
    )
    resp = [r for r in recs if r["warc_type"] == "response"]
    assert [r["http_status"] for r in resp] == [200, 404, 200]
    assert [r["body"] for r in resp] == [h for _, _, _, h in PAGES]
    assert [r["url"] for r in resp] == [u for u, _, _, _ in PAGES]
    # request bodies are the (empty) GET payload, headers stripped
    req = [r for r in recs if r["warc_type"] == "request"]
    assert all(r["body"] == b"" for r in req)
    # binary html containing CRLFCRLF must not split a record
    tricky = [("https://c.example.com/t", "2024-04-05T06:07:08Z", 200,
               b"<html>\r\n\r\nWARC/1.0\r\n\r\nnot a record</html>")]
    recs2 = parse_warc(write_warc(tricky, per_record_gzip=gz))
    resp2 = [r for r in recs2 if r["warc_type"] == "response"]
    assert resp2[0]["body"] == tricky[0][3]


def test_truncation_and_garbage_flagged():
    blob = write_warc(PAGES)
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(blob[:-30])
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n\r\n")
    gz = write_warc(PAGES, per_record_gzip=True)
    with pytest.raises(ValueError, match="trailing garbage"):
        parse_warc(gz + b"JUNKJUNK")


def test_spark_pages_projection(spark):
    """warc_pages yields the engine's input-table shape (2xx responses
    only, parsed timestamp); corrupt blobs become NULL rows."""
    blob = write_warc(PAGES, per_record_gzip=True)
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"WARC/1.0\r\nbroken"))],
        "warc_id long, warc binary",
    )
    pages = warc_pages(df).orderBy("url").collect()
    assert [p.url for p in pages] == [
        "https://a.example.com/x", "https://a.example.com/z"
    ]
    assert str(pages[0].warc_ts) == "2024-01-02 03:04:05"
    assert bytes(pages[0].html) == b"<html>alpha</html>"
    recs = warc_records(df).collect()
    bad = [r for r in recs if r.warc_id == 2]
    assert len(bad) == 1 and bad[0].record_ord is None
