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
    args = ap.parse_args(argv)

    spark = build_session("sharepointcrawler-spark-crawl", args.local_cpus)

    from sharepointcrawler_spark.extraction.udfs import pages_expander
    from sharepointcrawler_spark.plans.crawl import CrawlConfig, crawl_order, run_crawl
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

    cfg = CrawlConfig(
        max_waves=args.max_waves,
        per_host_wave_budget=args.per_host_budget,
        default_crawl_delay_s=args.crawl_delay,
        use_bloom=not args.no_bloom,
    )
    result = run_crawl(
        spark,
        store,
        pages_expander(pages),
        seeds=[(u, 0) for u in seeds] if not resume else None,
        config=cfg,
        resume=resume,
    )
    for m in result.metrics:
        print(json.dumps({"wave_metrics": m}))

    crawl_order(result.frontier).write.mode("overwrite").parquet(f"{args.out}/crawl_order")
    result.seen.write.mode("overwrite").parquet(f"{args.out}/seen")
    summary = {
        "waves": result.waves,
        "resumed": resume,
        "fetched": result.fetch_log.count(),
        "seen": result.seen.count(),
        "out": args.out,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
