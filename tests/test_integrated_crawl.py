"""End-to-end integration of the round-5 discovery/refresh features
into the crawl loop (r5 VERDICT item 1): the reference's whole value is
the driven loop (SharePointClient.cs:201-342), so sitemap discovery
(robots ``Sitemap:`` directive -> sitemap tree -> seed frontier) and
recrawl refresh (history -> due batch -> re-enqueue -> re-fetch) must
compose inside ``run_crawl``/``enqueue_refresh``, not just exist as
standalone oracle-checked operators.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sharepointcrawler_spark.operators.frontier import graph_expander
from sharepointcrawler_spark.operators.recrawl import apply_refresh_outcome
from sharepointcrawler_spark.plans.crawl import (
    CrawlConfig,
    crawl_order,
    enqueue_refresh,
    run_crawl,
)
from sharepointcrawler_spark.plans.snapshot import SnapshotStore

A = "https://a.example.com"
B = "https://b.example.com"


def _edges(spark):
    """Two components: the linked tree under the explicit seed (host a,
    including a robots-denied subtree) and an ORPHAN subtree on host b
    reachable only through the sitemap — no link edge crosses over."""
    rows = [
        # linked component under the seed
        (f"{A}/lib", f"{A}/lib/doc0.pdf", "file", 0),
        (f"{A}/lib", f"{A}/lib/doc1.pdf", "file", 1),
        (f"{A}/lib", f"{A}/lib/secret", "folder", 0),
        (f"{A}/lib/secret", f"{A}/lib/secret/hidden.pdf", "file", 0),
        # orphan component, sitemap-advertised only
        (f"{B}/orphan", f"{B}/orphan/d0.pdf", "file", 0),
        (f"{B}/orphan", f"{B}/orphan/sub", "folder", 0),
        (f"{B}/orphan/sub", f"{B}/orphan/sub/d1.pdf", "file", 0),
    ]
    return spark.createDataFrame(
        rows, "parent_url string, child_url string, kind string, sibling_idx int"
    )


def _robots_texts(spark):
    return spark.createDataFrame(
        [
            (
                "a.example.com",
                "User-agent: *\nDisallow: /lib/secret\n"
                f"Sitemap: {B}/sitemap_index.xml\n",
            ),
            ("b.example.com", "User-agent: *\nCrawl-delay: 0.5\n"),
        ],
        "host string, robots_txt string",
    )


def _sitemap_fetch(spark):
    """Fixture fetch: an index file pointing at a child sitemap whose
    entries advertise the orphan subtree root (plus the explicit seed
    again, which the frontier dedup must drop)."""
    xml_table = spark.createDataFrame(
        [
            (
                f"{B}/sitemap_index.xml",
                "<sitemapindex>"
                f"<sitemap><loc>{B}/sitemap_0.xml</loc></sitemap>"
                "</sitemapindex>",
            ),
            (
                f"{B}/sitemap_0.xml",
                "<urlset>"
                f"<url><loc>{B}/orphan</loc><priority>0.9</priority></url>"
                f"<url><loc>{A}/lib</loc></url>"
                "</urlset>",
            ),
        ],
        "sitemap_url string, xml string",
    )

    def fetch(urls_df):
        return urls_df.join(xml_table, "sitemap_url", "inner")

    return fetch


@pytest.fixture(scope="module")
def integrated(spark, tmp_path_factory):
    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("snap_integrated")))
    res = run_crawl(
        spark,
        store,
        graph_expander(_edges(spark)),
        seeds=[(f"{A}/lib", 0)],
        config=CrawlConfig(),
        resume=False,
        robots_texts_df=_robots_texts(spark),
        sitemap_fetch=_sitemap_fetch(spark),
    )
    return store, res


def test_sitemap_subtree_discovered_without_link_edge(spark, integrated):
    _, res = integrated
    states = {r["url_canon"]: r["state"] for r in res.frontier.collect()}
    # the orphan subtree — zero link edges from the seed component — is
    # fully crawled via the sitemap chain
    for u in (f"{B}/orphan", f"{B}/orphan/d0.pdf", f"{B}/orphan/sub",
              f"{B}/orphan/sub/d1.pdf"):
        assert states.get(u) == "fetched", (u, states.get(u))
    # robots rules distilled from the SAME robots_texts still gate:
    # the denied subtree is marked, its child never discovered
    assert states.get(f"{A}/lib/secret") == "denied"
    assert f"{A}/lib/secret/hidden.pdf" not in states
    # the sitemap's duplicate advertisement of the explicit seed did
    # not produce a second frontier row
    assert res.frontier.filter(F.col("url_canon") == f"{A}/lib").count() == 1


def test_sitemap_seeds_order_after_explicit_seeds(spark, integrated):
    _, res = integrated
    seq = {
        r["url_canon"]: r["crawl_seq"]
        for r in crawl_order(res.frontier).collect()
    }
    # explicit-seed subtree first (seed_idx 0), sitemap seeds after
    # (seed_idx continues): every a-host page precedes every orphan page
    a_max = max(s for u, s in seq.items() if u.startswith(A))
    b_min = min(s for u, s in seq.items() if u.startswith(B))
    assert a_max < b_min


def test_sitemap_crawl_resume_skips_rediscovery(spark, tmp_path):
    """Kill after wave 1, resume WITHOUT the discovery inputs: the
    frontier already holds the sitemap seeds; zero re-fetches."""
    store = SnapshotStore(spark, str(tmp_path / "snap_resume"))
    run_crawl(
        spark,
        store,
        graph_expander(_edges(spark)),
        seeds=[(f"{A}/lib", 0)],
        config=CrawlConfig(),
        resume=False,
        stop_after_wave=1,
        robots_texts_df=_robots_texts(spark),
        sitemap_fetch=_sitemap_fetch(spark),
    )
    res = run_crawl(
        spark,
        store,
        graph_expander(_edges(spark)),
        config=CrawlConfig(),
        resume=True,
        robots_texts_df=_robots_texts(spark),
        sitemap_fetch=_sitemap_fetch(spark),
    )
    log = res.fetch_log.toPandas()
    assert (log.groupby("url_canon").size() > 1).sum() == 0
    states = {r["url_canon"]: r["state"] for r in res.frontier.collect()}
    assert states.get(f"{B}/orphan/sub/d1.pdf") == "fetched"


def test_sitemap_priors_compose_with_refresh_batch(spark):
    """Cold-start composition: sitemap <changefreq>/<lastmod> priors
    produce the same feature shape as recrawl_priorities, so
    select_refresh_batch consumes them unchanged; 'never' pages are
    never due, missing lastmod yields no evidence (not due)."""
    from sharepointcrawler_spark.functions.urlnorm import url_host
    from sharepointcrawler_spark.operators.recrawl import select_refresh_batch
    from sharepointcrawler_spark.operators.sitemap import sitemap_refresh_priors

    entries = spark.createDataFrame(
        [
            ("https://s.example.com/hot", "2024-03-01", "daily"),     # 35 days stale
            ("https://s.example.com/cold", "2024-04-04", "yearly"),   # fresh
            ("https://s.example.com/frozen", "2020-01-01", "never"),  # lambda 0
            ("https://s.example.com/mystery", None, "daily"),         # no lastmod
        ],
        "loc string, lastmod string, changefreq string",
    )
    pr = sitemap_refresh_priors(entries, now_date="2024-04-05")
    rows = {r["loc"]: r for r in pr.collect()}
    assert rows["https://s.example.com/hot"]["due"]
    assert not rows["https://s.example.com/cold"]["due"]
    assert not rows["https://s.example.com/frozen"]["due"]
    assert not rows["https://s.example.com/mystery"]["due"]
    assert rows["https://s.example.com/mystery"]["staleness"] is None
    batch = select_refresh_batch(
        pr.withColumn("host", url_host("loc")), per_host=2, id_col="loc"
    )
    assert [r["loc"] for r in batch.collect()] == ["https://s.example.com/hot"]


def test_refresh_wave_refetches_due_urls(spark, integrated):
    store, res = integrated
    now_s = 1_700_000_000
    day = 86_400
    hot = f"{B}/orphan/d0.pdf"  # changes often, fetched long ago -> due
    cold = f"{A}/lib/doc0.pdf"  # never changed, fetched recently -> not due
    history = spark.createDataFrame(
        [
            (hot, now_s - 40 * day, now_s - 20 * day, 20, 18),
            (cold, now_s - 40 * day, now_s - 1 * day, 5, 0),
        ],
        "url_canon string, first_fetch_s long, last_fetch_s long, "
        "n_fetches long, n_changes long",
    )
    n = enqueue_refresh(spark, store, history, now_s, per_host=4)
    assert n == 1  # exactly the due URL
    res2 = run_crawl(
        spark,
        store,
        graph_expander(_edges(spark)),
        config=CrawlConfig(),
        resume=True,
    )
    log = res2.fetch_log.toPandas()
    per_url = log.groupby("url_canon").size()
    assert per_url[hot] == 2, "due URL re-fetched on schedule"
    assert (per_url.drop(hot) == 1).all(), "refresh touched ONLY the due URL"
    # the refresh wave re-fetched without re-discovering: frontier rows
    # stayed unique per url
    assert (
        res2.frontier.groupBy("url_canon").count().filter(F.col("count") > 1).count()
        == 0
    )
    # history update: the refreshed URL's counters fold forward
    upd = apply_refresh_outcome(
        history,
        spark.createDataFrame([(hot, True)], "url_canon string, changed boolean"),
        now_s,
    )
    row = {r["url_canon"]: r for r in upd.collect()}
    assert row[hot]["n_fetches"] == 21 and row[hot]["n_changes"] == 19
    assert row[hot]["last_fetch_s"] == now_s
    assert row[cold]["n_fetches"] == 5 and row[cold]["n_changes"] == 0


def test_priority_scores_order_the_per_host_budget(spark, tmp_path):
    """Importance-ordered crawling: with a per-host budget of 1 and a
    PageRank-style score table, the budget goes to the high-score URL
    first even though sibling order would crawl the other one; without
    scores, sibling order wins."""
    H = "https://prio.example.com"
    edges = spark.createDataFrame(
        [
            (f"{H}/root", f"{H}/first.pdf", "file", 0),
            (f"{H}/root", f"{H}/famous.pdf", "file", 1),
        ],
        "parent_url string, child_url string, kind string, sibling_idx int",
    )
    scores = spark.createDataFrame(
        [(f"{H}/famous.pdf", 10_000)], "url_canon string, score long"
    )

    def wave_of(res, url):
        log = res.fetch_log.toPandas()
        return int(log.loc[log.url_canon == url, "wave_id"].iloc[0])

    base = run_crawl(
        spark,
        SnapshotStore(spark, str(tmp_path / "snap_noprio")),
        graph_expander(edges),
        seeds=[(f"{H}/root", 0)],
        config=CrawlConfig(per_host_wave_budget=1),
        resume=False,
    )
    assert wave_of(base, f"{H}/first.pdf") < wave_of(base, f"{H}/famous.pdf")

    scored = run_crawl(
        spark,
        SnapshotStore(spark, str(tmp_path / "snap_prio")),
        graph_expander(edges),
        seeds=[(f"{H}/root", 0)],
        config=CrawlConfig(per_host_wave_budget=1),
        resume=False,
        priority_scores=scores,
    )
    assert wave_of(scored, f"{H}/famous.pdf") < wave_of(scored, f"{H}/first.pdf")
    # both crawls reach everything in the end
    assert scored.frontier.filter("state = 'fetched'").count() == 3


def test_cold_start_refresh_from_sitemap_priors(spark, integrated):
    """No fetch history: sitemap <changefreq>/<lastmod> priors select
    the due batch and the same one-delta enqueue drives a refresh wave.
    Runs after the history-based refresh test on the shared store, so
    the previously-refreshed URL already has 2 fetches."""
    from sharepointcrawler_spark.operators.sitemap import sitemap_refresh_priors
    from sharepointcrawler_spark.plans.crawl import enqueue_refresh_from_priors

    store, _ = integrated
    stale = f"{B}/orphan/sub/d1.pdf"   # daily + months old -> due
    fresh = f"{A}/lib/doc1.pdf"        # yearly + recent -> not due
    ghost = f"{B}/never/crawled"       # prior for a never-fetched URL: inert
    entries = spark.createDataFrame(
        [
            (stale, "2024-01-01", "daily"),
            (fresh, "2024-04-04", "yearly"),
            (ghost, "2020-01-01", "daily"),
        ],
        "loc string, lastmod string, changefreq string",
    )
    priors = sitemap_refresh_priors(entries, now_date="2024-04-05")
    n = enqueue_refresh_from_priors(spark, store, priors, per_host=4)
    assert n == 1, "only the stale FETCHED page enqueues (ghost is inert)"
    res = run_crawl(
        spark, store, graph_expander(_edges(spark)),
        config=CrawlConfig(), resume=True,
    )
    per_url = res.fetch_log.toPandas().groupby("url_canon").size()
    assert per_url[stale] == 2
    assert per_url[fresh] == 1
    assert ghost not in per_url.index


C = "https://c.example.com"


def test_feed_discovery_composes_with_sitemaps(spark, tmp_path):
    """Feeds are the third discovery channel: a feed-only orphan
    subtree (host c, zero link edges, absent from every sitemap) is
    crawled; a URL advertised by BOTH the sitemap and the feed still
    yields one frontier row; explicit seeds still crawl first."""
    edges = _edges(spark).unionByName(
        spark.createDataFrame(
            [
                (f"{C}/blog", f"{C}/blog/post1", "file", 0),
                (f"{C}/blog", f"{C}/blog/post2", "file", 1),
            ],
            "parent_url string, child_url string, kind string, sibling_idx int",
        )
    )
    feeds = spark.createDataFrame(
        [(
            f"{C}/rss.xml",
            "<rss><channel>"
            f"<item><title>new</title><link>{C}/blog</link>"
            "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>"
            # cross-channel duplicate: the sitemap advertises this too
            f"<item><title>dup</title><link>{B}/orphan</link></item>"
            "</channel></rss>",
        )],
        "feed_id string, xml string",
    )
    store = SnapshotStore(spark, str(tmp_path / "snap_feeds"))
    res = run_crawl(
        spark,
        store,
        graph_expander(edges),
        seeds=[(f"{A}/lib", 0)],
        config=CrawlConfig(),
        resume=False,
        robots_texts_df=_robots_texts(spark),
        sitemap_fetch=_sitemap_fetch(spark),
        feeds_df=feeds,
    )
    states = {r["url_canon"]: r["state"] for r in res.frontier.collect()}
    # feed-only subtree fully crawled
    for u in (f"{C}/blog", f"{C}/blog/post1", f"{C}/blog/post2"):
        assert states.get(u) == "fetched", (u, states.get(u))
    # sitemap-only subtree still crawled alongside
    assert states.get(f"{B}/orphan/sub/d1.pdf") == "fetched"
    # the doubly-advertised URL has exactly one frontier row
    assert res.frontier.filter(F.col("url_canon") == f"{B}/orphan").count() == 1
    # explicit seed subtree still orders first
    seq = {
        r["url_canon"]: r["crawl_seq"]
        for r in crawl_order(res.frontier).collect()
    }
    a_max = max(s for u, s in seq.items() if u.startswith(A))
    disc_min = min(s for u, s in seq.items() if not u.startswith(A))
    assert a_max < disc_min


def test_feed_only_discovery(spark, tmp_path):
    """feeds_df without any sitemap chain seeds the frontier on its
    own (discovery table = feeds alone)."""
    edges = spark.createDataFrame(
        [(f"{C}/blog", f"{C}/blog/post1", "file", 0)],
        "parent_url string, child_url string, kind string, sibling_idx int",
    )
    feeds = spark.createDataFrame(
        [(
            f"{C}/rss.xml",
            f"<rss><channel><item><link>{C}/blog</link></item></channel></rss>",
        )],
        "feed_id string, xml string",
    )
    store = SnapshotStore(spark, str(tmp_path / "snap_feedonly"))
    res = run_crawl(
        spark,
        store,
        graph_expander(edges),
        seeds=[(f"{A}/standalone.pdf", 0)],
        config=CrawlConfig(),
        resume=False,
        feeds_df=feeds,
    )
    states = {r["url_canon"]: r["state"] for r in res.frontier.collect()}
    assert states.get(f"{C}/blog") == "fetched"
    assert states.get(f"{C}/blog/post1") == "fetched"
