"""Per-host politeness scheduler + priority ranking (SURVEY.md §2.3
T3/T4, §2.5 W5).

The reference is polite by accident: a fully sequential await chain means
exactly one request is ever in flight (SharePointClient.cs:217,271,279).
Our engine is massively parallel, so politeness becomes explicit: a
deterministic **virtual-clock schedule**. For each host, fetches are
ordered by (priority, crawl order) and assigned slots

    fetch_slot_s = (rank_within_host - 1) * crawl_delay(host)

so consecutive fetches per host are >= the host's crawl-delay budget
apart, while different hosts proceed in parallel.

Skew: a single hot host (the "one SharePoint tenant owns 90% of URLs"
case) would collapse ``Window.partitionBy(host)`` to one task. The
per-host rank is therefore computed with a range-partitioned two-pass
(``grouped_sequence``): sort by (host, priority, path_key) across range
partitions — a hot host spans MANY partitions — then add per-(partition,
host) offsets computed from a tiny driver-side count table. Exact same
ranks as the naive window, no single-task stage.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_CRAWL_DELAY_S = 1.0

# below this row count the plain one-shuffle window is cheaper than the
# two-pass range-partition machinery (no skew risk worth 3 extra jobs)
SMALL_WAVE_THRESHOLD = 200_000


def grouped_rank_window(
    df: DataFrame, group_col: str, order_cols: list[str], out_col: str = "host_rank"
) -> DataFrame:
    """Naive single-window rank — the small-wave fast path. Identical
    output to grouped_sequence (equivalence is pytest-asserted); one
    shuffle, no driver collect, but a hot group lands on one task."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return df.withColumn(out_col, F.row_number().over(w).cast("long"))


def grouped_sequence(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    out_col: str = "host_rank",
    approx_rows: int | None = None,
) -> DataFrame:
    """1-based rank within ``group_col`` by ``order_cols`` — skew-proof.

    Equivalent to ``row_number() OVER (PARTITION BY g ORDER BY ...)`` but
    executed as range-repartition on (group, order...) + per-partition
    cumcount + cross-partition offsets. Range partitioning keeps each
    group contiguous, so only groups SPANNING a partition boundary need a
    nonzero offset — at most O(n_partitions) rows regardless of group
    count. Those offsets are computed as a window over the per-(partition,
    group) count table (fully distributed — nothing is ever collected to
    the driver) and broadcast-joined back, which preserves the sorted
    per-partition layout (narrow BroadcastHashJoin).

    ``approx_rows`` (when the caller knows the wave size) picks the
    small-wave window fast path below SMALL_WAVE_THRESHOLD; without it,
    the planner's size estimate gates the same choice (under ~32 MB the
    one-shuffle window cannot OOM a task and the two-pass machinery is
    pure overhead — 3 extra jobs). Output identical either way
    (pytest-asserted equivalence).
    """
    if approx_rows is not None and approx_rows < SMALL_WAVE_THRESHOLD:
        return grouped_rank_window(df, group_col, order_cols, out_col)
    if approx_rows is None:
        from sharepointcrawler_spark.plans.layout import estimated_size_bytes

        if estimated_size_bytes(df) <= (32 << 20):
            return grouped_rank_window(df, group_col, order_cols, out_col)
    spark = df.sparkSession
    n = max(spark.sparkContext.defaultParallelism, 1)
    cols = [group_col] + order_cols
    sorted_df = (
        df.repartitionByRange(n, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    # offset for (pid, g) = total rows of g in partitions with smaller
    # pid; nonzero only for boundary-spanning groups (<= n_partitions of
    # them under range partitioning), so the broadcast side is tiny.
    counts = sorted_df.groupBy("_pid", group_col).agg(F.count("*").alias("_cnt"))
    w = (
        Window.partitionBy(group_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        counts.withColumn("_goff", F.sum("_cnt").over(w))
        .filter(F.col("_goff").isNotNull() & (F.col("_goff") > 0))
        .select("_pid", group_col, "_goff")
    )
    joined = sorted_df.join(F.broadcast(offsets), ["_pid", group_col], "left")
    out_schema = T.StructType(
        sorted_df.schema.fields + [T.StructField(out_col, T.LongType(), False)]
    )

    out_cols = [f.name for f in out_schema.fields]

    def assign(it):
        seen: dict = {}
        for pdf in it:
            if len(pdf) == 0:
                continue
            local = pdf.groupby(group_col, sort=False).cumcount()
            carry = pdf[group_col].map(lambda g: seen.get(g, 0))
            base = pdf["_goff"].fillna(0).astype("int64")
            pdf = pdf.copy()
            pdf[out_col] = (local + carry + base + 1).astype("int64")
            for g, c in pdf[group_col].value_counts().items():
                seen[g] = seen.get(g, 0) + int(c)
            yield pdf[out_cols]

    return joined.mapInPandas(assign, out_schema).drop("_pid")


def assign_fetch_slots(
    wave: DataFrame,
    delays: DataFrame | None = None,
    default_delay_s: float = DEFAULT_CRAWL_DELAY_S,
    order_cols: list[str] | None = None,
    approx_rows: int | None = None,
    group_col: str = "host",
) -> DataFrame:
    """Attach ``host_rank`` and virtual-clock ``fetch_slot`` (seconds).

    ``delays`` is a small (host, crawl_delay_s) table — broadcast-joined
    (robots_cache analog, SURVEY T5). Missing hosts get the default.

    ``group_col="site"`` (a registrable-domain column, functions/psl.py)
    spaces fetches per SITE instead of per raw host — the web-scale
    politeness unit where ``www.``/``cdn.``/``m.`` subdomains share one
    origin server. Delays still join on the row's host (robots.txt is
    per-host); the rank that multiplies them is per group.
    """
    order_cols = order_cols or ["priority", "path_key"]
    ranked = grouped_sequence(
        wave, group_col, order_cols, out_col="host_rank", approx_rows=approx_rows
    )
    if delays is not None:
        ranked = ranked.join(
            F.broadcast(delays.select("host", "crawl_delay_s")), "host", "left"
        )
        delay = F.coalesce(F.col("crawl_delay_s"), F.lit(default_delay_s))
    else:
        delay = F.lit(default_delay_s)
    return ranked.withColumn(
        "fetch_slot", ((F.col("host_rank") - 1) * delay).cast("double")
    )


def top_k_per_host(
    wave: DataFrame,
    k: int,
    order_cols: list[str] | None = None,
    group_col: str = "host",
) -> DataFrame:
    """Per-wave per-host budget: keep the k best URLs by (priority,
    crawl order) — the min-heap of the north_rule materialized as a
    ranked DataFrame (skew-proof). Rows beyond k stay pending for the
    next wave (caller handles the split). ``group_col="site"`` budgets
    per registrable domain instead of per raw host."""
    order_cols = order_cols or ["depth", "priority", "path_key"]
    ranked = grouped_sequence(wave, group_col, order_cols, out_col="host_rank")
    return ranked.filter(F.col("host_rank") <= k)


def salt_hosts(df: DataFrame, n_salts: int = 8) -> DataFrame:
    """Execution-side salting for downstream per-host work that does NOT
    need a total per-host order (e.g. the fetch mapInPandas stage): a hot
    host's rows spread across ``n_salts`` hash buckets. The politeness
    budget still holds because fetch_slot was already assigned."""
    return df.withColumn(
        "host_salt",
        F.concat_ws("#", F.col("host"), F.pmod(F.col("url_key"), F.lit(n_salts)).cast("string")),
    ).repartition(F.col("host_salt"))
