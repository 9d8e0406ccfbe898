"""End-to-end switchover pipeline: crawl -> extract (byte-identity) ->
chunk -> RagIngestDocument envelope -> status sink (SURVEY §3.1-3.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sharepointcrawler_spark.plans.crawl import CrawlConfig
from sharepointcrawler_spark.plans.pipelines import crawl_extract_ingest
from sharepointcrawler_spark.plans.snapshot import SnapshotStore
from sharepointcrawler_spark.sources.pages import PAGES_SCHEMA, build_pages_rows


def test_crawl_extract_ingest_end_to_end(spark, tmp_path):
    rows = build_pages_rows(n_docs=15, n_hosts=3, seed=42)
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    store = SnapshotStore(spark, str(tmp_path / "snap"))

    out = crawl_extract_ingest(
        spark,
        store,
        pages,
        seeds=[("https://site0.example.com/docs/doc0", 0)],
        config=CrawlConfig(max_waves=10, bloom_capacity=1000),
        chunk_size=300,
        chunk_overlap=60,
    )

    # the whole corpus is reachable from doc0 (binary tree) -> every page fetched
    n_fetched = out.crawl.frontier.filter(F.col("state") == "fetched").count()
    assert n_fetched == 15

    env = out.documents.cache()
    assert env.count() == 15
    # extraction inside the pipeline is byte-identical: rebuild the golden
    # map and compare the reassembled first chunks' prefixes via title=url
    golden = {r[0]: r[3] for r in rows}
    got = {
        r.Title: "".join(
            c.TextContent[: 300 - 60] if i < len(r.Chunks) - 1 else c.TextContent
            for i, c in enumerate(r.Chunks)
        )
        for r in env.collect()
    }
    assert set(got) == set(golden)
    for url, text in golden.items():
        assert got[url] == text  # chunks reassemble to the exact markdown

    # envelope shape + sink lineage: every document posted OK
    statuses = out.statuses.collect()
    assert len(statuses) == 15
    assert all(r.ok for r in statuses)

    # poisoned sink: failures surface as status rows, partition completes
    def poison(row):
        import json

        body = json.loads(row["payload"])
        if body["Title"].endswith("doc3"):
            raise RuntimeError("ingest rejected")
        return row

    out2 = crawl_extract_ingest(
        spark,
        store,
        pages,
        seeds=[("https://site0.example.com/docs/doc0", 0)],
        config=CrawlConfig(max_waves=10, bloom_capacity=1000),
        chunk_size=300,
        chunk_overlap=60,
        make_payload=poison,
        resume=True,  # zero re-crawl: reuse the committed frontier
    )
    st = out2.statuses.collect()
    failed = [r for r in st if not r.ok]
    assert len(failed) == 1 and "ingest rejected" in failed[0].error
    assert len(st) == 15
