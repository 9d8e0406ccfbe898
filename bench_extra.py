#!/usr/bin/env python
"""Supplementary measurement harness for the optimization round
(bench.py is frozen for the driver; per guide §1.4 this file isolates
individual queries with the noop sink and labels jobs).

Usage:
    python bench_extra.py --queries t7_trap_detection dedup_spans ...
    python bench_extra.py --reps 3 --queries ...
    python bench_extra.py --crawl            # instrumented crawl loop
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _spark(cpus: int):
    from sharepointcrawler_spark.session import get_spark

    return get_spark(app_name="bench_extra", cpus=cpus, shuffle_partitions=cpus)


def time_queries(spark, sf_dir: str, names: list[str], reps: int) -> dict:
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    # warm-up (JIT/codegen/parquet footers), same as bench.py
    queries["a1_count_by_state"](spark, sf_dir).count()
    out = {}
    for name in names:
        samples = []
        for _ in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bx:{name}")
            t0 = time.monotonic()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
    return out


def crawl_instrumented(spark, n_docs: int = 2000) -> dict:
    """run_crawl_waves with per-wave stats surfaced (plan_s/write_s)."""
    import shutil
    import tempfile

    from bench import ensure_corpus
    from sharepointcrawler_spark.extraction.udfs import pages_expander
    from sharepointcrawler_spark.plans.crawl import CrawlConfig, run_crawl
    from sharepointcrawler_spark.plans.snapshot import SnapshotStore

    corpus = ensure_corpus(spark, n_docs, 0)
    pages = spark.read.parquet(corpus)
    snapdir = tempfile.mkdtemp(prefix="bx_crawl_")
    # per-write timing: wrap the store methods
    write_log: list = []
    _w, _wp = SnapshotStore.write, SnapshotStore.write_partitioned

    def timed_write(self, df, name, wave):
        t = time.monotonic()
        r = _w(self, df, name, wave)
        write_log.append((wave, name, round(time.monotonic() - t, 3)))
        return r

    def timed_wp(self, df, name, wave, *a, **kw):
        t = time.monotonic()
        r = _wp(self, df, name, wave, *a, **kw)
        write_log.append((wave, name, round(time.monotonic() - t, 3)))
        return r

    SnapshotStore.write = timed_write
    SnapshotStore.write_partitioned = timed_wp
    t0 = time.monotonic()
    res = run_crawl(
        spark,
        SnapshotStore(spark, snapdir),
        pages_expander(pages),
        seeds=[("https://site0.example.com/docs/doc0", 0)],
        config=CrawlConfig(max_waves=10, bloom_capacity=max(n_docs * 2, 1000)),
        resume=False,
    )
    dt = time.monotonic() - t0
    SnapshotStore.write, SnapshotStore.write_partitioned = _w, _wp
    fetched = res.fetch_log.count()
    shutil.rmtree(snapdir, ignore_errors=True)
    return {
        "total_sec": round(dt, 3),
        "pages_fetched": fetched,
        "metrics": res.metrics,
        "write_log": write_log,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=[])
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--crawl", action="store_true")
    ap.add_argument("--crawl-reps", type=int, default=1)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _spark(cpus)
    out: dict = {}
    if args.queries:
        out["queries"] = time_queries(spark, sf_dir, args.queries, args.reps)
    if args.crawl:
        out["crawl"] = [crawl_instrumented(spark) for _ in range(args.crawl_reps)]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
