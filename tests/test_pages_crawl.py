"""End-to-end over the Common-Crawl-style pages table: crawl from the
root doc via extracted links (binary tree + cycle back-links), dedup,
extract text byte-identically (SURVEY.md §3.1 Spark redesign)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sharepointcrawler_spark.extraction.udfs import extract_text_udf, pages_expander
from sharepointcrawler_spark.functions.urlnorm import canonicalize_url
from sharepointcrawler_spark.plans.crawl import CrawlConfig, run_crawl
from sharepointcrawler_spark.plans.snapshot import SnapshotStore
from sharepointcrawler_spark.sources.pages import pages_df


def test_pages_crawl_and_extract(spark, tmp_path):
    n_docs = 16
    pages = pages_df(spark, n_docs=n_docs, n_hosts=3, seed=42).cache()
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    root_url = pages.orderBy("url").limit(1).collect()  # not the seed; just warm cache
    seed = "https://site0.example.com/docs/doc0"

    res = run_crawl(
        spark,
        store,
        pages_expander(pages),
        seeds=[(seed, 0)],
        config=CrawlConfig(max_waves=10),
        resume=False,
    )
    # every doc reachable from doc0 (binary tree => all) fetched exactly once
    fetched = res.fetch_log.select("url_canon").distinct()
    assert fetched.count() == n_docs
    assert res.fetch_log.count() == n_docs  # no re-fetch despite cycle links

    # extraction over fetched pages: byte-identical to golden text column
    keyed = pages.withColumn("url_canon", canonicalize_url("url"))
    joined = keyed.join(fetched, "url_canon", "left_semi")
    extracted = joined.withColumn(
        "extracted", extract_text_udf(F.col("html"), F.col("url"))
    )
    assert extracted.filter(F.col("extracted") != F.col("text")).count() == 0
    assert extracted.count() == n_docs
