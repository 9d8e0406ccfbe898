"""Fetch-failure semantics: errors lineage (S6), bounded retry, terminal
failed state — errors do NOT abort the crawl (SharePointClient.cs:283-293
catches per-file, logs, skips)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sharepointcrawler_spark.extraction.udfs import pages_expander, pages_fetch_probe
from sharepointcrawler_spark.plans.crawl import CrawlConfig, run_crawl
from sharepointcrawler_spark.plans.snapshot import SnapshotStore
from sharepointcrawler_spark.sources.pages import PAGES_SCHEMA, build_pages_rows


def test_missing_pages_fail_with_retry_and_errors(spark, tmp_path):
    # corpus of 8 docs, but doc3 REMOVED (404 analog) and doc5 emptied
    rows = build_pages_rows(n_docs=8, n_hosts=2, seed=42)
    rows = [r for r in rows if not r[0].endswith("doc3")]
    rows = [
        (u, ts, b"" if u.endswith("doc5") else h, t, lang)
        for (u, ts, h, t, lang) in rows
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA).cache()
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    res = run_crawl(
        spark,
        store,
        pages_expander(pages),
        seeds=[("https://site0.example.com/docs/doc0", 0)],
        config=CrawlConfig(max_waves=12, max_fetch_attempts=2),
        resume=False,
        fetch_probe=pages_fetch_probe(pages),
    )

    frontier = res.frontier
    failed = {r.url_canon for r in frontier.filter("state = 'failed'").collect()}
    assert failed == {
        "https://site1.example.com/docs/doc3",
        "https://site1.example.com/docs/doc5",
    }
    # crawl did NOT abort: reachable healthy docs all fetched
    fetched = {r.url_canon for r in frontier.filter("state = 'fetched'").collect()}
    # doc3's subtree (children 7) unreachable through doc3; doc5 has no
    # children in an 8-doc binary tree; reachable: 0,1,2,4,6 (7 via doc3 only)
    assert {u.rsplit("doc", 1)[1] for u in fetched} == {"0", "1", "2", "4", "6"}

    # bounded retry: each failed URL attempted exactly max_fetch_attempts times
    errors = res.errors
    err_counts = {
        r.url_canon: r["count"]
        for r in errors.groupBy("url_canon").count().collect()
    }
    assert err_counts == {u: 2 for u in failed}
    # error rows carry stage + attempt message
    msg = errors.filter("url_canon like '%doc3'").orderBy("wave_id").collect()
    assert [m.stage for m in msg] == ["fetch", "fetch"]
    assert "attempt 1" in msg[0].message and "attempt 2" in msg[1].message

    # fetch_log counts the retries as real attempts
    log3 = res.fetch_log.filter("url_canon like '%doc3'").count()
    assert log3 == 2
