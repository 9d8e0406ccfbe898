#!/usr/bin/env python
"""spark-submit entry point for the crawl engine (north_rule: "launched
via spark-submit --py-files on multi-executor clusters").

Cluster launch:

    zip -r spark_crawler.zip sharepointcrawler_spark/
    spark-submit --py-files spark_crawler.zip \\
        submit_crawl.py --pages s3://bucket/pages_parquet \\
        --seeds seeds.txt --snapshot-dir s3://bucket/crawl_state \\
        --out s3://bucket/crawl_out --max-waves 50

Local smoke (what the test does):

    python submit_crawl.py --synthetic-docs 64 --seeds-inline \\
        https://site0.example.com/docs/doc0 --snapshot-dir /tmp/snap \\
        --out /tmp/out

The job resumes from the snapshot dir if a manifest exists (kill/resume
with zero re-fetches); per-wave metrics stream to stdout as JSON lines
and land in the snapshot's metrics table either way.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_session(app_name: str, local_cpus: int | None):
    """Under spark-submit the master/resources come from the launcher;
    --local-cpus forces a local[N] master for smoke runs."""
    if local_cpus:
        from sharepointcrawler_spark.session import get_spark

        return get_spark(app_name=app_name, cpus=local_cpus, shuffle_partitions=local_cpus)
    from pyspark.sql import SparkSession

    return SparkSession.builder.appName(app_name).getOrCreate()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="parquet path of (url, warc_ts, html, text, lang) pages")
    src.add_argument("--synthetic-docs", type=int, help="generate a synthetic corpus of N pages")
    ap.add_argument("--seeds", help="file with one seed URL per line")
    ap.add_argument("--seeds-inline", nargs="*", default=[], help="seed URLs on the command line")
    ap.add_argument("--snapshot-dir", required=True, help="crawl state dir (resume point)")
    ap.add_argument("--out", required=True, help="output dir: crawl_order/ and seen/ parquet")
    ap.add_argument("--max-waves", type=int, default=50)
    ap.add_argument("--per-host-budget", type=int, default=None)
    ap.add_argument("--crawl-delay", type=float, default=1.0)
    ap.add_argument("--no-bloom", action="store_true")
    ap.add_argument("--local-cpus", type=int, default=None, help="force local[N] (smoke runs)")
    ap.add_argument(
        "--robots-txt",
        help="parquet of (host, robots_txt) bodies: rules are distilled "
        "from them and their Sitemap: directives drive seed discovery",
    )
    ap.add_argument(
        "--sitemaps",
        help="parquet of (sitemap_url, xml) — the fetch table sitemap "
        "discovery resolves advertised URLs against (with --robots-txt)",
    )
    ap.add_argument(
        "--feeds",
        help="parquet of (feed_id, xml) RSS/Atom bodies — feed entries "
        "seed the frontier alongside sitemap discovery (fresh crawls)",
    )
    ap.add_argument(
        "--seen-buckets", type=int, default=None,
        help="bucket-partition the seen table by pmod(url_key, N) so the "
        "per-wave exact-confirm join prunes its scan",
    )
    ap.add_argument(
        "--priority-scores",
        help="parquet of (url_canon, score): with --per-host-budget, "
        "each wave's budget is spent highest-score-first "
        "(importance-ordered crawling, e.g. PageRank from a prior run)",
    )
    ap.add_argument(
        "--refresh-history",
        help="parquet fetch history (url_canon, first_fetch_s, "
        "last_fetch_s, n_fetches, n_changes): after the crawl drains, "
        "due URLs are re-enqueued and drained as a refresh wave",
    )
    ap.add_argument("--refresh-per-host", type=int, default=8)
    ap.add_argument(
        "--refresh-now-s", type=int, default=None,
        help="refresh evaluation instant (epoch seconds; default: now)",
    )
    ap.add_argument(
        "--trap-gate", action="store_true",
        help="refuse crawler-trap URLs (cycle paths, session-id params, "
        "calendar runs, param blowup) at frontier admission",
    )
    ap.add_argument("--trap-max-depth", type=int, default=16)
    ap.add_argument("--trap-max-length", type=int, default=2048)
    ap.add_argument(
        "--respect-nofollow", action="store_true",
        help="drop links from pages whose robots meta tag says nofollow",
    )
    ap.add_argument(
        "--redirects", default=None,
        help="parquet path of (src, dst) one-hop redirect edges; children "
        "land on final URLs, redirect loops are refused at admission",
    )
    args = ap.parse_args(argv)

    spark = build_session("sharepointcrawler-spark-crawl", args.local_cpus)

    from sharepointcrawler_spark.extraction.udfs import pages_expander
    from sharepointcrawler_spark.plans.crawl import (
        CrawlConfig,
        crawl_order,
        enqueue_refresh,
        run_crawl,
    )
    from sharepointcrawler_spark.plans.snapshot import SnapshotStore
    from sharepointcrawler_spark.sources.pages import pages_df_distributed

    if args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        pages = pages_df_distributed(spark, n_docs=args.synthetic_docs, n_hosts=4)

    seeds = list(args.seeds_inline)
    if args.seeds:
        with open(args.seeds) as f:
            seeds += [ln.strip() for ln in f if ln.strip()]
    store = SnapshotStore(spark, args.snapshot_dir)
    resume = store.latest_wave() is not None
    if not seeds and not resume:
        ap.error("fresh crawl needs --seeds or --seeds-inline")

    trap_rules = None
    if args.trap_gate:
        from sharepointcrawler_spark.operators.traps import TrapRules

        trap_rules = TrapRules(
            max_depth=args.trap_max_depth, max_length=args.trap_max_length
        )
    cfg = CrawlConfig(
        max_waves=args.max_waves,
        per_host_wave_budget=args.per_host_budget,
        default_crawl_delay_s=args.crawl_delay,
        use_bloom=not args.no_bloom,
        seen_buckets=args.seen_buckets,
        trap_rules=trap_rules,
    )
    robots_texts_df = (
        spark.read.parquet(args.robots_txt) if args.robots_txt else None
    )
    sitemap_fetch = None
    if args.sitemaps:
        sitemap_table = spark.read.parquet(args.sitemaps)

        def sitemap_fetch(urls_df, _t=sitemap_table):
            return urls_df.join(_t, "sitemap_url", "inner")

    feeds_df = spark.read.parquet(args.feeds) if args.feeds else None
    expander = pages_expander(pages, respect_nofollow=args.respect_nofollow)
    priority_scores = (
        spark.read.parquet(args.priority_scores) if args.priority_scores else None
    )
    result = run_crawl(
        spark,
        store,
        expander,
        seeds=[(u, 0) for u in seeds] if not resume else None,
        config=cfg,
        resume=resume,
        robots_texts_df=robots_texts_df,
        sitemap_fetch=sitemap_fetch,
        feeds_df=feeds_df,
        priority_scores=priority_scores,
    )
    for m in result.metrics:
        print(json.dumps({"wave_metrics": m}))

    refreshed = 0
    if args.refresh_history:
        import time

        now_s = args.refresh_now_s or int(time.time())
        refreshed = enqueue_refresh(
            spark,
            store,
            spark.read.parquet(args.refresh_history),
            now_s,
            per_host=args.refresh_per_host,
            config=cfg,
        )
        if refreshed:
            # the refresh drain keeps the SAME gates as the main crawl:
            # robots rules/delays and priority ordering still apply
            result = run_crawl(
                spark,
                store,
                expander,
                config=cfg,
                resume=True,
                robots_texts_df=robots_texts_df,
                priority_scores=priority_scores,
            )
            for m in result.metrics:
                print(json.dumps({"refresh_wave_metrics": m}))

    crawl_order(result.frontier).write.mode("overwrite").parquet(f"{args.out}/crawl_order")
    result.seen.write.mode("overwrite").parquet(f"{args.out}/seen")
    summary = {
        "waves": result.waves,
        "resumed": resume,
        "fetched": result.fetch_log.count(),
        "seen": result.seen.count(),
        "refresh_enqueued": refreshed,
        "out": args.out,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
