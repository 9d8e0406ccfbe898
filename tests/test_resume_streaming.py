"""Resume fixture (SURVEY.md §5 item 5) + streaming incremental mode."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from sharepointcrawler_spark.operators.frontier import graph_expander
from sharepointcrawler_spark.plans.crawl import CrawlConfig, crawl_order, run_crawl
from sharepointcrawler_spark.plans.snapshot import SnapshotStore
from sharepointcrawler_spark.sources import sitegraph as sg
from sharepointcrawler_spark.sources.pages import build_pages_rows, PAGES_SCHEMA


def test_kill_and_resume_no_refetch(spark, tmp_path):
    root = sg.balanced_tree(depth=3, files_per_folder=2, folders_per_folder=2)
    edges_df = spark.createDataFrame(
        sg.edges_from_tree(root),
        "parent_url string, child_url string, kind string, sibling_idx int",
    )
    expander = graph_expander(edges_df)

    # uninterrupted reference run
    store_a = SnapshotStore(spark, str(tmp_path / "a"))
    full = run_crawl(spark, store_a, expander, seeds=[(root.url, 0)], resume=False)

    # killed after wave 1, then resumed
    store_b = SnapshotStore(spark, str(tmp_path / "b"))
    run_crawl(
        spark, store_b, expander, seeds=[(root.url, 0)], resume=False, stop_after_wave=1
    )
    resumed = run_crawl(spark, store_b, expander, resume=True)

    # zero re-fetches
    dupes = resumed.fetch_log.groupBy("url_canon").count().filter("count > 1")
    assert dupes.count() == 0
    # final state identical to the uninterrupted run
    a_seen = {r.url_canon for r in full.seen.collect()}
    b_seen = {r.url_canon for r in resumed.seen.collect()}
    assert a_seen == b_seen
    a_order = [r.url_canon for r in crawl_order(full.frontier).orderBy("crawl_seq").collect()]
    b_order = [r.url_canon for r in crawl_order(resumed.frontier).orderBy("crawl_seq").collect()]
    assert a_order == b_order
    # waves <= 1 untouched by the resume (fetch counts per wave equal)
    a_w1 = full.fetch_log.filter("wave_id <= 1").count()
    b_w1 = resumed.fetch_log.filter("wave_id <= 1").count()
    assert a_w1 == b_w1


def test_streaming_incremental_ingest(spark, tmp_path):
    from sharepointcrawler_spark.streaming.incremental import incremental_ingest

    watch = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    seen_dir = str(tmp_path / "seen")

    rows = build_pages_rows(n_docs=12, n_hosts=2, seed=42)
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    # batch 1: first 8 docs
    df.filter(F.col("url").rlike("doc[0-7]$")).write.mode("append").parquet(watch)
    q = incremental_ingest(spark, watch, out, ckpt, seen_dir)
    q.awaitTermination(120)

    first = spark.read.parquet(out)
    assert first.count() == 8
    # batch 2: overlapping window (4 old + 4 new) -> only new pass dedup
    df.filter(F.col("url").rlike("doc(4|5|6|7|8|9|10|11)$")).write.mode("append").parquet(watch)
    q2 = incremental_ingest(spark, watch, out, ckpt, seen_dir)
    q2.awaitTermination(120)

    result = spark.read.parquet(out)
    assert result.count() == 12
    assert result.select("url_canon").distinct().count() == 12
    # extraction rode along (byte-identity spot check)
    golden = {r[0]: r[3] for r in rows}  # url -> text
    got = {r.url: r.text_md for r in result.collect()}
    assert got == {u: golden[u] for u in got}


def test_streaming_metrics(spark, tmp_path):
    from sharepointcrawler_spark.streaming.incremental import metrics_stream

    watch = str(tmp_path / "incoming2")
    rows = build_pages_rows(n_docs=10, n_hosts=2, seed=42)
    spark.createDataFrame(rows, PAGES_SCHEMA).write.mode("append").parquet(watch)
    q = metrics_stream(spark, watch)
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM crawl_metrics")
    # append mode + watermark: windows may be withheld until watermark
    # passes; schema must be right and the query must have consumed input
    assert set(out.columns) == {"window", "host", "n_pages", "avg_html_bytes"}
    assert q.lastProgress is None or q.lastProgress["numInputRows"] >= 0


def test_stateful_politeness_stream(spark, tmp_path):
    """applyInPandasWithState custom operator: per-host virtual clocks
    stay monotone across micro-batches AND across a query restart (state
    store in the checkpoint)."""
    from sharepointcrawler_spark.streaming.incremental import stateful_politeness_stream

    watch = str(tmp_path / "in_slots")
    out = str(tmp_path / "out_slots")
    ckpt = str(tmp_path / "ckpt_slots")
    rows = build_pages_rows(n_docs=12, n_hosts=2, seed=42)
    df = spark.createDataFrame(rows, PAGES_SCHEMA)

    df.filter(F.col("url").rlike("doc[0-7]$")).write.mode("append").parquet(watch)
    q = stateful_politeness_stream(spark, watch, out, ckpt, delays={"site0.example.com": 2.0})
    q.awaitTermination(120)
    first = spark.read.parquet(out)
    n_first_per_host = {
        r.host: r.n for r in first.groupBy("host").agg(F.count("*").alias("n")).collect()
    }

    # restart with 4 more docs: ranks must CONTINUE, not reset
    df.filter(F.col("url").rlike("doc(8|9|10|11)$")).write.mode("append").parquet(watch)
    q2 = stateful_politeness_stream(spark, watch, out, ckpt, delays={"site0.example.com": 2.0})
    q2.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() == 12
    for host_rows in (
        got.filter(F.col("host") == h).orderBy("host_rank").collect()
        for h in n_first_per_host
    ):
        ranks = [r.host_rank for r in host_rows]
        assert ranks == list(range(1, len(ranks) + 1))  # dense, monotone, no reuse
    # per-host crawl-delay respected in the virtual clock
    s0 = got.filter(F.col("host") == "site0.example.com").orderBy("host_rank").collect()
    assert [r.fetch_slot for r in s0] == [(r.host_rank - 1) * 2.0 for r in s0]


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data contract: a row arriving after the watermark passed its
    window is dropped — the window emits once and its count never moves."""
    import datetime as dt

    from sharepointcrawler_spark.streaming.incremental import windowed_metrics_parquet

    watch = str(tmp_path / "in_wm")
    out = str(tmp_path / "out_wm")
    ckpt = str(tmp_path / "ckpt_wm")
    base = dt.datetime(2024, 1, 1, 1, 0, tzinfo=dt.timezone.utc)

    def write(rows):
        spark.createDataFrame(rows, "ts timestamp, host string, v double").coalesce(
            1
        ).write.mode("append").parquet(watch)

    # batch 1: three rows in window [01:00, 01:10) + a watermark-advancer
    write([
        (base, "h", 1.0),
        (base + dt.timedelta(minutes=2), "h", 2.0),
        (base + dt.timedelta(minutes=4), "h", 3.0),
        (base + dt.timedelta(hours=2), "h", 9.0),  # watermark -> 02:30
    ])
    windowed_metrics_parquet(spark, watch, out, ckpt).awaitTermination(120)

    # batch 2: a LATE row for the finalized window + another advancer
    write([
        (base + dt.timedelta(minutes=5), "h", 99.0),  # LATE: must be dropped
        (base + dt.timedelta(hours=3), "h", 9.0),
    ])
    windowed_metrics_parquet(spark, watch, out, ckpt).awaitTermination(120)
    # batch 3: flush any finalized-but-unemitted windows
    write([(base + dt.timedelta(hours=4), "h", 9.0)])
    windowed_metrics_parquet(spark, watch, out, ckpt).awaitTermination(120)

    got = spark.read.parquet(out).collect()
    first = [r for r in got if r.window.start.minute == 0 and r.window.start.hour == 1]
    assert len(first) == 1          # emitted exactly once, never updated
    assert first[0].n == 3          # the late row is NOT counted
    assert abs(first[0].avg_v - 2.0) < 1e-9
