"""URL-seen fixture part 1: canonicalization collapses spelling variants
(SURVEY.md §5 item 2; reference P7 SharePointClient.cs:92-94,138-139)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sharepointcrawler_spark.functions.urlnorm import (
    _canon_one,
    canonicalize_url,
    url_extension,
    url_host,
    with_url_columns,
)

VARIANTS = [
    # (raw, expected canonical)
    ("HTTP://Example.COM/a/b", "http://example.com/a/b"),
    ("http://example.com:80/a/b", "http://example.com/a/b"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com/a/b/", "http://example.com/a/b"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/%7Euser", "http://example.com/~user"),
    ("http://example.com/a/./b/../c", "http://example.com/a/c"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a%2fb", "http://example.com/a/b"),
    ("  http://example.com/a  ", "http://example.com/a"),
    ("http://example.com/sp%20ace", "http://example.com/sp%20ace"),
    ("http://example.com/a?q=1&r=2", "http://example.com/a?q=1&r=2"),
]


def test_canon_one_local():
    for raw, want in VARIANTS:
        assert _canon_one(raw) == want, raw


def test_canonicalize_udf(spark):
    df = spark.createDataFrame([(r,) for r, _ in VARIANTS], ["url"])
    got = [r.c for r in df.select(canonicalize_url("url").alias("c")).collect()]
    assert got == [w for _, w in VARIANTS]


def test_dedup_after_canon(spark):
    dupes = [
        "http://Example.com/a/",
        "http://example.com:80/a",
        "http://example.com/a",
        "http://example.com/x/../a",
    ]
    df = with_url_columns(spark.createDataFrame([(u,) for u in dupes], ["url"]))
    assert df.select("url_canon").distinct().count() == 1
    assert df.select("url_key").distinct().count() == 1


def test_host_and_extension(spark):
    df = spark.createDataFrame(
        [
            ("https://A.B.com:8080/x/report.PDF?dl=1",),
            ("http://h.io/path/file.tar.gz",),
            ("http://h.io/noext",),
        ],
        ["url"],
    )
    rows = df.select(
        url_host("url").alias("h"), url_extension("url").alias("e")
    ).collect()
    assert [(r.h, r.e) for r in rows] == [
        ("a.b.com", "pdf"),
        ("h.io", "gz"),
        ("h.io", ""),
    ]


def test_null_and_garbage(spark):
    df = spark.createDataFrame([(None,), ("",), ("   ",)], "url string")
    got = [r.c for r in df.select(canonicalize_url("url").alias("c")).collect()]
    assert got == [None, None, None]
