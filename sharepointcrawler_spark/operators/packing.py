"""Sequence packing — the training-batch preparation stage.

Language-model training consumes fixed-length token sequences, not
documents: the corpus's token streams are concatenated in a
deterministic order and cut every ``seq_len`` tokens (the GPT-2/3 /
The-Pile "concat-and-chunk" regime). A document can span a sequence
boundary, so the packing output is the OVERLAP TABLE: one row per
(document, sequence) pair with the document-relative token span and
the in-sequence offset — exactly what a data loader needs to slice
document token arrays into training rows, and what attribution
tooling needs to map a training sequence back to its source docs.

The only global computation is a prefix sum of token counts over the
packing order. A naive ``sum() over (ORDER BY ...)`` window collapses
to one reducer; this module reuses the engine's skew-proof two-pass
shape (operators/frontier.py ``global_sequence``): range-repartition
on the order key, ONE window per partition (parallel), then add each
partition's cumulative offset via a broadcast join of a tiny
(partition, offset) table. Everything stays JVM-side; the span
explosion is one ``sequence()`` Generate. Every value is integer
arithmetic — deterministic under any partitioning and bit-identical
to a SQL window oracle.

The reference has no notion of training batches (it ships markdown to
an ingest API one document at a time); packing is what its corpus
must pass through before a GPU ever sees it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_prefix_sum(
    df: DataFrame, order_col: str, value_col: str, out_col: str = "prefix_sum"
) -> DataFrame:
    """Inclusive prefix sum of ``value_col`` over the total order given
    by ``order_col`` (must be unique), without a single-reducer global
    window: range-repartition, per-partition window cumsum, broadcast
    partition offsets. The values are partitioning-independent (the
    order is total), so results are identical at any parallelism."""
    spark = df.sparkSession
    n = max(spark.sparkContext.defaultParallelism, 1)
    parted = (
        df.repartitionByRange(n, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    # tiny: one row per partition
    sums = parted.groupBy("_pid").agg(
        F.sum(F.col(value_col)).cast("long").alias("_psum")
    )
    rows = sorted((r["_pid"], r["_psum"]) for r in sums.collect())
    offsets, acc = [], 0
    for pid, s in rows:
        offsets.append((pid, acc))
        acc += int(s or 0)
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        parted.join(F.broadcast(off_df), "_pid", "left")
        .withColumn(
            out_col,
            (F.sum(F.col(value_col)).over(w) + F.coalesce("_off", F.lit(0))).cast(
                "long"
            ),
        )
        .drop("_pid", "_off")
    )
    return out


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
) -> DataFrame:
    """Pack documents (ordered by ``id_col``, which must be unique)
    into ``seq_len``-token training sequences. Returns one row per
    (document, sequence) overlap:

    - ``seq_id``: 0-based sequence index
    - ``seq_offset``: where the span starts inside the sequence
    - ``doc_tok_start`` / ``doc_tok_end``: document-relative token
      span (end exclusive) — slice the doc's token array with these
    - ``n_tokens``: the document's total tokens (passthrough)

    Zero-token documents contribute nothing and are dropped. The final
    sequence is emitted partially filled (standard practice is to pad
    or drop it; that is the loader's policy, not the packer's)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    nonempty = docs.filter(F.col(n_tokens_col) > 0)
    cum = global_prefix_sum(nonempty, id_col, n_tokens_col, out_col="_cum_end")
    L = F.lit(int(seq_len)).cast("long")
    start = (F.col("_cum_end") - F.col(n_tokens_col)).alias("_start")
    staged = cum.select(
        F.col(id_col),
        F.col(n_tokens_col).cast("long").alias(n_tokens_col),
        start,
        F.col("_cum_end"),
        F.expr(f"(_cum_end - {n_tokens_col}) div {int(seq_len)}L").alias("_s0"),
        F.expr(f"(_cum_end - 1L) div {int(seq_len)}L").alias("_s1"),
    )
    spans = staged.select(
        id_col,
        n_tokens_col,
        "_start",
        F.explode(F.sequence(F.col("_s0"), F.col("_s1"))).alias("seq_id"),
    )
    g_start = F.greatest(F.col("_start"), F.col("seq_id") * L)
    g_end = F.least(
        F.col("_start") + F.col(n_tokens_col), (F.col("seq_id") + 1) * L
    )
    return spans.select(
        id_col,
        n_tokens_col,
        "seq_id",
        (g_start - F.col("seq_id") * L).cast("long").alias("seq_offset"),
        (g_start - F.col("_start")).cast("long").alias("doc_tok_start"),
        (g_end - F.col("_start")).cast("long").alias("doc_tok_end"),
    )
