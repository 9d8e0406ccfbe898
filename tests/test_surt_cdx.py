"""SURT keys (functions/surt.py) and CDXJ index ingestion
(sources/cdx.py): canonicalizer rules (scheme/userinfo/www/port/
fragment/query-sort), no-host edge cases, typed CDXJ parsing with
errors-as-rows, latest-capture dedup, unchanged-digest skip set, and
the shuffle-free plan shape of the key expression."""

from __future__ import annotations

import pyspark.sql.functions as F

from sharepointcrawler_spark.functions.surt import surt_key, with_surt_column
from sharepointcrawler_spark.sources.cdx import (
    cdx_records,
    latest_captures,
    unchanged_since,
)

SURT_CASES = {
    "https://user@WWW.Example.COM:443/A/b?b=2&a=1#frag": "com,example)/a/b?a=1&b=2",
    "http://example.com": "com,example)/",
    "http://example.com/": "com,example)/",
    "http://example.com:8080/x": "com,example:8080)/x",
    "http://www2.news.bbc.co.uk/p?z=1": "uk,co,bbc,news)/p?z=1",
    "//cdn.example.net/lib.js": "net,example,cdn)/lib.js",
    "example.com/bare": "com,example)/bare",
    "http://10.0.0.1/x": "1,0,0,10)/x",
    "http://host.com/p?a=1&a=0&B=2": "com,host)/p?a=0&a=1&b=2",
    "https://www.ex.com/a%20b?q=%2F": "com,ex)/a%20b?q=%2f",
    # no host -> no key
    "mailto:me@x.com": None,
    "javascript:void(0)": None,
    "": None,
    None: None,
}

CDX_LINES = [
    'org,example)/page 20240101120000 {"url": "http://example.org/page", '
    '"status": "200", "mime": "text/html", "digest": "sha1:AAA", '
    '"length": "123", "offset": "0", "filename": "a.warc.gz"}',
    'org,example)/page 20250101120000 {"url": "http://example.org/page", '
    '"status": "200", "digest": "sha1:BBB", "length": "99", "offset": "10", '
    '"filename": "b.warc.gz"}',
    'org,example)/other 20240601000000 {"url": "http://example.org/other", '
    '"status": "404", "digest": "sha1:CCC", "filename": "a.warc.gz"}',
    "garbage line without json",
]


def test_surt_cases(spark):
    rows = [(i, u) for i, u in enumerate(SURT_CASES)]
    df = spark.createDataFrame(rows, "i long, url string")
    got = {r.i: r.s for r in df.select("i", surt_key("url").alias("s")).collect()}
    for i, (u, exp) in enumerate(SURT_CASES.items()):
        assert got[i] == exp, (u, got[i], exp)


def test_surt_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([("http://a.com/x",)], "url string")
    plan = (
        with_surt_column(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan.split("== Initial Plan ==")[0]
    assert "Python" not in plan


def test_cdx_parse_and_errors_as_rows(spark):
    df = spark.createDataFrame([(l,) for l in CDX_LINES], "line string")
    recs = cdx_records(df).collect()
    ok = [r for r in recs if r.cdx_issue is None]
    bad = [r for r in recs if r.cdx_issue is not None]
    assert len(ok) == 3 and len(bad) == 1
    first = next(r for r in ok if r.digest == "sha1:AAA")
    assert first.surt == "org,example)/page"
    assert first.ts == "20240101120000"
    assert first.status == 200 and first.length == 123 and first.offset == 0
    assert first.mime == "text/html" and first.filename == "a.warc.gz"
    # missing JSON field -> NULL, not an error
    second = next(r for r in ok if r.digest == "sha1:BBB")
    assert second.mime is None and second.cdx_issue is None
    assert bad[0].surt is None and bad[0].cdx_issue == "malformed CDXJ line"


def test_latest_captures(spark):
    df = spark.createDataFrame([(l,) for l in CDX_LINES], "line string")
    latest = {r.surt: r for r in latest_captures(cdx_records(df)).collect()}
    assert set(latest) == {"org,example)/page", "org,example)/other"}
    assert latest["org,example)/page"].digest == "sha1:BBB"  # newest ts wins


def test_unchanged_since(spark):
    df = spark.createDataFrame([(l,) for l in CDX_LINES], "line string")
    recs = cdx_records(df)
    prev = recs.filter(F.col("digest") == "sha1:AAA")
    cur_same = recs.filter(F.col("digest") == "sha1:AAA")
    cur_diff = recs.filter(F.col("digest") == "sha1:BBB")
    assert unchanged_since(cur_same, prev).count() == 1
    assert unchanged_since(cur_diff, prev).count() == 0
