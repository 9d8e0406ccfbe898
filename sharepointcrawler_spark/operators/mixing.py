"""Deterministic corpus mixture sampling — the domain-reweighting
stage of a training-data pipeline.

Training corpora are never fed raw: each source/domain gets a target
weight (The Pile's per-set epochs, LLaMA's sampling proportions,
DoReMi's learned domain weights), realized as down-sampling (weight<1)
or up-sampling with repeated epochs (weight>1). At 100 TB this must be
a *deterministic, stateless, per-row* decision — a global shuffle or a
driver-side random draw would serialize the pipeline and make reruns
irreproducible.

Mechanism: weights are parts-per-million integers. Each document
hashes to a uniform residue u in [0, 1e6) via the engine's portable
md5 hash (stable across engines, reruns, partitionings, and cluster
sizes). A weight of w ppm yields ``w div 1e6`` whole copies plus one
more iff ``u < w mod 1e6`` — so expected copies = w/1e6 exactly, with
zero coordination: one scan, one broadcast join against the (tiny)
weights table, one Generate for the copy explosion. Sampling never
shuffles; only the optional report aggregates.

Copies carry ``copy_idx`` (0-based epoch index) so downstream
sequence-packing can interleave epochs instead of concatenating them.
The reference ingests its tenant wholesale (no mixture stage); this
operator is what turns its raw crawl output into a training mix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def sample_hash(col: Column | str, salt: str = "") -> Column:
    """Uniform residue in [0, PPM) from the portable md5 hash of the
    (stringified) column — bit-identical in Spark and DuckDB, and
    independent of partitioning. ``salt`` decorrelates multiple
    sampling decisions over the same ids."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(PPM))


def mix_corpus(
    docs: DataFrame,
    weights: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    default_ppm: int = PPM,
    salt: str = "",
) -> DataFrame:
    """Resample ``docs`` to the mixture given by ``weights`` (columns:
    ``group_col``, ``weight_ppm``). Emits one row per kept copy with
    ``copy_idx`` (0-based) appended; weight 0 drops the group, weight
    PPM keeps it unchanged, 2_500_000 yields 2 copies plus a third for
    half the docs. Groups absent from ``weights`` get ``default_ppm``.

    Plan: broadcast the weights, derive n_copies row-locally from the
    portable hash, explode — no shuffle anywhere."""
    w = F.broadcast(
        weights.select(
            F.col(group_col), F.col("weight_ppm").cast("long").alias("_wppm")
        )
    )
    u = sample_hash(id_col, salt=salt)
    n = F.expr(
        f"coalesce(_wppm, {int(default_ppm)}L) div {PPM}L"
    ) + (u < F.expr(f"coalesce(_wppm, {int(default_ppm)}L) % {PPM}L")).cast(
        "long"
    )
    staged = (
        docs.join(w, [group_col], "left")
        .withColumn("_n_copies", n)
        .drop("_wppm")
    )
    return (
        staged.select(
            *[c for c in staged.columns if c != "_n_copies"],
            F.explode(
                F.when(
                    F.col("_n_copies") > 0,
                    F.sequence(F.lit(0), F.col("_n_copies") - 1),
                ).otherwise(F.array().cast("array<long>"))
            ).alias("copy_idx"),
        )
    )


def mixture_report(
    docs: DataFrame,
    mixed: DataFrame,
    group_col: str = "source",
) -> DataFrame:
    """Achieved mixture: per group, input docs, emitted copies, and the
    realized rate in ppm ((copies*PPM) div input — integer, oracle-
    safe). The audit table a mixture run logs next to its output."""
    inp = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_input"))
    out = mixed.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_copies"))
    return (
        inp.join(out, [group_col], "left")
        .select(
            group_col,
            "n_input",
            F.coalesce("n_copies", F.lit(0)).alias("n_copies"),
            F.expr(f"(coalesce(n_copies, 0L) * {PPM}L) div n_input").alias(
                "achieved_ppm"
            ),
        )
    )
