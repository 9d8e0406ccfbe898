"""Bucketed table layout — shuffle-free co-located joins.

At 10^10 frontier rows the recurring cost is not one join but the SAME
join every wave: frontier-vs-seen, scores-vs-frontier, links-vs-pages,
all keyed by the url hash. Spark's answer is bucketing: write both
sides pre-hash-partitioned into the same number of buckets on the join
key and the SortMergeJoin reads co-located buckets with NO Exchange on
either side — the per-wave shuffle disappears from the plan entirely
(the Iceberg storage-partitioned-join equivalent; the engine's seen
table already emulates the pruning half via ``seen_buckets``).

``write_bucketed`` / ``read_table`` wrap the saveAsTable ceremony
(bucketing metadata lives in the session catalog, not the parquet
footer — a plain ``spark.read.parquet`` of the same files would NOT
know the layout), and ``exchange_count`` is the plan probe the tests
assert with. The catalog dependency is why the crawl's own state
tables use explicit hash-partition columns instead; this module is the
layout lever for the CORPUS side, where tables are written once and
joined constantly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed catalog table (overwrite). Both sides
    of a co-located join must use the SAME ``n_buckets`` and key
    column(s). ``sort_cols`` additionally sorts within buckets so the
    SortMergeJoin skips its per-bucket sort."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    w = df.write.mode("overwrite").format("parquet")
    if path is not None:
        w = w.option("path", path)
    w = w.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — REQUIRED for the bucket metadata to reach the
    planner (reading the parquet path directly loses the layout)."""
    return spark.table(table)


def estimated_size_bytes(df: DataFrame) -> int:
    """Planner size estimate for ``df`` (bytes) — free, driver-side, no
    job. Column pruning is accounted for (projects scale the estimate
    by output row width); UDF/filter estimates are rough, so treat the
    number as an order-of-magnitude gate, not a measurement. Returns a
    huge sentinel when the estimate is unavailable so callers fall back
    to their scale-safe path."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # noqa: BLE001
        return 1 << 62


def spread_small_scan(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Round-robin a narrow-scan DataFrame across the session's
    parallelism when its source cannot split (guide rule: "one huge
    unsplittable file -> repartition immediately after the read").

    A single parquet file with one row group yields exactly ONE scan
    split no matter what ``maxPartitionBytes`` says, so every per-row
    expression upstream of the first Exchange — URL synthesis, regex
    probes, shingle/window explodes, Arrow UDF batches — runs on one
    core. Spreading the base rows once (a few MB of skinny source
    columns) unlocks the full core count for that compute.

    Scale-adaptive by construction: the check is the *scan's actual
    split count* against the session's ``defaultParallelism``; a
    production table written as many files / row groups already scans
    at >= cluster parallelism and this returns the input unchanged, so
    nothing here is tuned to local[32].
    """
    sc = df.sparkSession.sparkContext
    par = min_parallelism or max(sc.defaultParallelism, 1)
    try:
        n_parts = df.rdd.getNumPartitions()  # driver-side split count
    except Exception:  # noqa: BLE001 - never let the probe kill a query
        return df
    if n_parts >= par:
        return df
    return df.repartition(par)


def compact_small(df: DataFrame, bytes_per_part: int = 16 << 20) -> DataFrame:
    """Shuffle a small DataFrame down to ~``bytes_per_part`` partitions.

    The inverse knob to :func:`spread_small_scan`: a stage whose
    per-task fixed cost (python worker dispatch, broadcast fetch,
    per-task LUT/model build) dwarfs its per-row work should not run
    as dozens of near-empty tasks. Gated on the planner's size
    estimate, so a genuinely large input keeps its partitioning —
    nothing here is tuned to a core count. Uses ``repartition`` (a
    shuffle) rather than ``coalesce`` so upstream stages keep their
    parallelism."""
    est = estimated_size_bytes(df)
    target = int(est // bytes_per_part) + 1
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001
        return df
    if target >= cur:
        return df
    return df.repartition(target)


def exchange_count(df: DataFrame) -> int:
    """Shuffle operators in the final executed plan (AQE's initial-plan
    section excluded) — the co-location assertion probe."""
    plan = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    return plan.count("Exchange")
