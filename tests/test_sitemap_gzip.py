"""Gzip/binary sitemap ingestion (operators/sitemap.py
sitemap_entries_from_blobs): inflate, BOM decode, corrupt members."""

from __future__ import annotations

import gzip

from sharepointcrawler_spark.operators.sitemap import (
    sitemap_blob_to_xml,
    sitemap_entries_from_blobs,
)

XML = (
    '<urlset><url><loc>https://e.com/a</loc><priority>0.5</priority></url>'
    "<url><loc>https://e.com/b</loc></url></urlset>"
)


def test_blob_variants():
    assert sitemap_blob_to_xml(XML.encode()) == XML
    assert sitemap_blob_to_xml(gzip.compress(XML.encode(), mtime=0)) == XML
    assert sitemap_blob_to_xml(b"\xff\xfe" + XML.encode("utf-16-le")) == XML
    assert sitemap_blob_to_xml(b"\x1f\x8b\x08\x00nope") is None
    assert sitemap_blob_to_xml(None) is None


def test_spark_lane(spark):
    rows = [
        (1, bytearray(gzip.compress(XML.encode(), mtime=0))),
        (2, bytearray(XML.encode())),
        (3, bytearray(b"\x1f\x8b\x08\x00nope")),
    ]
    df = spark.createDataFrame(rows, "sitemap_id long, body binary")
    got = sitemap_entries_from_blobs(df).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["sitemap_id"], []).append(r["loc"])
    assert by_id == {
        1: ["https://e.com/a", "https://e.com/b"],
        2: ["https://e.com/a", "https://e.com/b"],
    }
