"""Site-level politeness (functions/psl.py + politeness group_col +
CrawlConfig.politeness_by_site): subdomains of one registrable domain
share a single virtual-clock sequence; sibling private-registry sites
keep separate ones; the crawl loop wires it end-to-end."""

from __future__ import annotations

import pyspark.sql.functions as F

from sharepointcrawler_spark.functions.psl import with_site_column
from sharepointcrawler_spark.operators.politeness import (
    assign_fetch_slots,
    top_k_per_host,
)


def _wave(spark):
    rows = []
    hosts = [
        # one site, three hosts (must share ONE slot sequence)
        ("www.bbc.co.uk", 4),
        ("news.bbc.co.uk", 4),
        ("m.bbc.co.uk", 2),
        # two sites on the same private-registry suffix (separate clocks)
        ("a.blogspot.com", 3),
        ("b.blogspot.com", 3),
    ]
    for h, (host, n) in enumerate(hosts):
        for i in range(n):
            rows.append(
                (
                    f"https://{host}/p{i}",
                    f"https://{host}/p{i}",
                    hash((host, i)),
                    host,
                    0,
                    f"{h:02d}{i:06d}",
                )
            )
    return spark.createDataFrame(
        rows,
        "url string, url_canon string, url_key long, host string, "
        "priority int, path_key string",
    )


def test_one_site_one_clock(spark):
    wave = with_site_column(_wave(spark))
    slotted = assign_fetch_slots(wave, default_delay_s=1.0, group_col="site")
    rows = slotted.select("site", "host", "fetch_slot").collect()
    by_site: dict = {}
    for r in rows:
        by_site.setdefault(r.site, []).append(r.fetch_slot)
    # bbc.co.uk: 10 URLs over 3 hosts -> one sequence 0..9
    assert sorted(by_site["bbc.co.uk"]) == [float(i) for i in range(10)]
    # the blogspot SITES are distinct: each starts its own clock at 0
    assert sorted(by_site["a.blogspot.com"]) == [0.0, 1.0, 2.0]
    assert sorted(by_site["b.blogspot.com"]) == [0.0, 1.0, 2.0]


def test_per_host_grouping_unchanged_by_default(spark):
    # regression guard: the default group stays per raw host
    slotted = assign_fetch_slots(_wave(spark), default_delay_s=1.0)
    per_host_zeroes = (
        slotted.filter(F.col("fetch_slot") == 0.0).select("host").distinct().count()
    )
    assert per_host_zeroes == 5  # every host starts its own clock


def test_budget_per_site(spark):
    wave = with_site_column(_wave(spark))
    kept = top_k_per_host(
        wave, 2, order_cols=["priority", "path_key"], group_col="site"
    )
    counts = {
        r["site"]: r["n"]
        for r in kept.groupBy("site").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"bbc.co.uk": 2, "a.blogspot.com": 2, "b.blogspot.com": 2}


def test_crawl_loop_site_politeness(spark, tmp_path):
    from sharepointcrawler_spark.operators.frontier import graph_expander
    from sharepointcrawler_spark.plans.crawl import CrawlConfig, run_crawl
    from sharepointcrawler_spark.plans.snapshot import SnapshotStore

    # a seed on www. linking to sibling-subdomain children: with
    # politeness_by_site the whole family shares one clock, so the
    # wave's slots are a single 0..n-1 ramp (per-host would restart
    # at 0 for every subdomain)
    seed = "https://www.bbc.co.uk/root"
    children = [
        f"https://{sub}.bbc.co.uk/c{i}"
        for i, sub in enumerate(["news", "sport", "m", "www"])
    ]
    edges = [(seed, c, "file", i) for i, c in enumerate(children)]
    edges_df = spark.createDataFrame(
        edges, "parent_url string, child_url string, kind string, sibling_idx int"
    )
    res = run_crawl(
        spark,
        SnapshotStore(spark, str(tmp_path / "snap")),
        graph_expander(edges_df),
        seeds=[(seed, 0)],
        config=CrawlConfig(max_waves=3, politeness_by_site=True, bloom_capacity=100),
        resume=False,
    )
    log = res.fetch_log.select("url_canon", "fetch_slot").collect()
    wave2 = sorted(
        r["fetch_slot"] for r in log if r["url_canon"] != seed.lower()
    )
    assert wave2 == [0.0, 1.0, 2.0, 3.0]
    # the schema of crawl outputs is unchanged (site column dropped)
    assert "site" not in res.fetch_log.columns
