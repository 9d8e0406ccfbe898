"""Feed ingestion (operators/feeds.py): RSS item parsing, Atom entry
parsing with rel=alternate link preference and attribute-order/quote
robustness, published/guid coalescing, entries without links dropped,
keep-first dedup in feed_seed_frontier, and frontier-compatible
output shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from sharepointcrawler_spark.operators.feeds import feed_entries, feed_seed_frontier

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Site News</title><link>http://ex.org/</link>
  <item><title>Newest</title><link>http://ex.org/a</link>
    <pubDate>Mon, 02 Jun 2025 10:00:00 GMT</pubDate>
    <guid isPermaLink="false">tag:a</guid></item>
  <item><title>Older</title><link>http://ex.org/b</link>
    <pubDate>Sun, 01 Jun 2025 10:00:00 GMT</pubDate></item>
  <item><title>No link, dropped</title></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Blog</title><updated>2025-06-02T00:00:00Z</updated>
  <entry><title>Alt wins</title>
    <link rel="self" href="http://ex.org/entry1.atom"/>
    <link rel="alternate" href="http://ex.org/post1"/>
    <id>urn:1</id><published>2025-06-02T00:00:00Z</published></entry>
  <entry><title>Reversed attrs, single quotes</title>
    <link href='http://ex.org/post2' rel='alternate'/>
    <id>urn:2</id><updated>2025-06-01T00:00:00Z</updated></entry>
  <entry><title>No rel at all</title>
    <link href="http://ex.org/post3"/><id>urn:3</id></entry>
</feed>"""

# same loc advertised by both feeds: keep-first must pick feed order
DUP = RSS.replace("http://ex.org/a", "http://ex.org/post1")


def _feeds(spark, rows):
    return spark.createDataFrame(rows, "feed_id string, xml string")


def test_rss_items(spark):
    out = feed_entries(_feeds(spark, [("f1", RSS)])).collect()
    assert [r.loc for r in out] == ["http://ex.org/a", "http://ex.org/b"]
    assert out[0].title == "Newest"
    assert out[0].published == "Mon, 02 Jun 2025 10:00:00 GMT"
    assert out[0].guid == "tag:a"
    assert out[1].guid is None
    assert not out[0].is_atom
    assert [r.ord for r in out] == [0, 1]


def test_atom_entries(spark):
    out = feed_entries(_feeds(spark, [("f2", ATOM)])).collect()
    assert [r.loc for r in out] == [
        "http://ex.org/post1",  # rel=alternate beats rel=self
        "http://ex.org/post2",  # reversed attribute order, single quotes
        "http://ex.org/post3",  # bare href fallback
    ]
    assert out[0].guid == "urn:1"
    assert out[0].published == "2025-06-02T00:00:00Z"
    assert out[1].published == "2025-06-01T00:00:00Z"  # updated fallback
    assert all(r.is_atom for r in out)


def test_seed_frontier_dedup_and_shape(spark):
    seeds = feed_seed_frontier(
        _feeds(spark, [("a_feed", DUP), ("b_feed", ATOM)])
    )
    assert seeds.columns == ["sitemap_id", "ord", "loc", "lastmod", "priority"]
    rows = {r.loc: r for r in seeds.collect()}
    # post1 advertised by both: smallest (feed_id, ord) = a_feed's item 0
    assert rows["http://ex.org/post1"].sitemap_id == "a_feed"
    assert rows["http://ex.org/post1"].lastmod == "Mon, 02 Jun 2025 10:00:00 GMT"
    # freshness priority: 1/(1+ord)
    assert rows["http://ex.org/post1"].priority == 1.0
    assert rows["http://ex.org/b"].priority == 0.5
    assert len(rows) == 4  # post1, b, post2, post3


def test_plan_single_generate_no_python(spark):
    df = feed_entries(_feeds(spark, [("f1", RSS), ("f2", ATOM)]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Generate") == 1
    assert "Python" not in plan and "Exchange" not in plan
