"""Hot-host skew (SURVEY.md §7 hard part #3): one host owning 90% of
URLs must not collapse politeness ranking onto one task, and the
schedule must still be exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from sharepointcrawler_spark.functions.urlnorm import with_url_columns
from sharepointcrawler_spark.operators.politeness import (
    assign_fetch_slots,
    grouped_rank_window,
    grouped_sequence,
)
from sharepointcrawler_spark.sources.pages import build_pages_rows, PAGES_SCHEMA


def test_hot_host_politeness_exact_and_distributed(spark):
    rows = build_pages_rows(n_docs=2000, n_hosts=8, seed=42, hot_host_fraction=0.9)
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    keyed = with_url_columns(pages).select("url_canon", "host", "url_key")
    hot_n = keyed.filter(F.col("host") == "hot.example.com").count()
    assert hot_n == 1800  # 90% skew is real

    # two-pass path (force it: approx_rows above threshold not needed,
    # call grouped_sequence directly)
    ranked = grouped_sequence(keyed, "host", ["url_canon"], out_col="rk")

    # exactness: identical ranks to the naive window
    want = {
        (r.url_canon, r.rk)
        for r in grouped_rank_window(keyed, "host", ["url_canon"], "rk").collect()
    }
    got = {(r.url_canon, r.rk) for r in ranked.collect()}
    assert got == want

    # distribution: the hot host's rows span multiple range partitions
    # (the naive window would put all 1800 on ONE task)
    spread = (
        keyed.repartitionByRange(8, "host", "url_canon")
        .withColumn("pid", F.spark_partition_id())
        .filter(F.col("host") == "hot.example.com")
        .select("pid")
        .distinct()
        .count()
    )
    assert spread >= 4

    # virtual-clock budget holds per host despite skew
    slotted = assign_fetch_slots(
        keyed.withColumn("priority", F.lit(0)).withColumn("path_key", F.col("url_canon")),
        default_delay_s=0.25,
    )
    hot_slots = sorted(
        r.fetch_slot for r in slotted.filter(F.col("host") == "hot.example.com").collect()
    )
    assert hot_slots[0] == 0.0
    assert all(abs((b - a) - 0.25) < 1e-9 for a, b in zip(hot_slots, hot_slots[1:]))
