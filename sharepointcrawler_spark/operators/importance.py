"""DSIR-style importance weighting for domain-targeted data selection.

Data Selection via Importance Resampling (Xie et al. 2023, public
method): represent every document as a bag of HASHED n-gram features,
fit unigram feature distributions on the raw pool and on a small
target corpus (the domain you want more of), and weight each raw
document by its importance ratio

    log w(doc) = sum_f count_f * [ log p_target(f) - log p_raw(f) ]

Selection then keeps the top-weighted (or Gumbel-resampled) docs.

This implementation keeps every quantity an INTEGER so results are
deterministic under any partitioning and bit-identical to a SQL
oracle: log2 is taken as whole bits via binary-string length
(``floor(log2(q))`` == ``length(bin(q)) - 1``, the same device as
``functions/lm.py``), with the ratio pre-scaled by ``2**scale_bits``.
The per-feature ratio and the corpus-size normalizer are split into
two whole-bits terms — ``bits(t*S div r) + bits(Nr*S div Nt) - 2s`` —
so no product ever exceeds ``count * 2**scale_bits`` (overflow-safe to
~2^43 feature occurrences per bucket at the default scale; a 100 TB
pool stays far under that per 4096-bucket cell).

Scale shape: two token explodes (raw + target) feed map-side-combined
``groupBy(bucket)`` counts — the shuffle carries at most ``n_buckets``
rows per partition after partial aggregation; the fitted model (<=
``n_buckets`` rows) broadcasts to the scoring join, and the per-doc
sum is one more combine-friendly aggregation. No Python anywhere.

The reference crawler has no notion of corpus targeting (it ingests
everything it fetches — ``SharePointClient.cs:201-342``); at
Common-Crawl scale, importance selection is how a pipeline tilts a
99%-noise pool toward a curated target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sharepointcrawler_spark.functions.lm import tokens_expr
from sharepointcrawler_spark.functions.textanalysis import portable_hash64

DEFAULT_N_BUCKETS = 4096
DEFAULT_SCALE_BITS = 20


def hashed_doc_features(
    docs: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    bigrams: bool = True,
) -> DataFrame:
    """One row per hashed feature OCCURRENCE: ``(id, bucket)`` with
    multiplicity. Features are lowercased alphanumeric unigrams plus
    (optionally) ``head_word`` bigram strings; the bucket is the
    portable 64-bit hash mod ``n_buckets`` so a DuckDB oracle can
    reproduce every bucket id exactly."""
    staged = docs.select(
        F.col(id_col).alias("_id"), tokens_expr(text_col).alias("_w")
    ).withColumn("_n1", F.size("_w") - 1)
    uni = staged.select(
        "_id", F.explode("_w").alias("feat")
    ).filter(F.col("feat") != "")
    feats = uni
    if bigrams:
        bi = (
            staged.select(
                "_id",
                F.arrays_zip(
                    F.slice("_w", 1, F.col("_n1")).alias("h"),
                    F.expr("slice(_w, 2, _n1)").alias("t"),
                ).alias("_p"),
            )
            .select("_id", F.explode("_p").alias("_b"))
            .filter((F.col("_b.h") != "") & (F.col("_b.t") != ""))
            .select(
                "_id", F.concat_ws("_", "_b.h", "_b.t").alias("feat")
            )
        )
        feats = uni.unionByName(bi)
    return feats.select(
        F.col("_id").alias(id_col),
        (portable_hash64("feat") % n_buckets).cast("long").alias("bucket"),
    )


def dsir_importance(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    scale_bits: int = DEFAULT_SCALE_BITS,
    id_col: str = "doc_id",
    text_col: str = "text",
    bigrams: bool = True,
) -> DataFrame:
    """Integer importance weight of every raw document against the
    target distribution. Returns one row per raw doc:

    - ``n_feats``: feature occurrences (0 for empty docs)
    - ``weight_bits``: sum of per-feature whole-bit log2 ratios,
      add-one smoothed and normalizer-corrected (NULL when no feats);
      higher = more target-like
    - ``avg_millibits``: ``(1000 * weight_bits) div n_feats`` (NULL
      when no feats) — the length-normalized rank key

    Deterministic: pure integer arithmetic end to end.
    """
    s = int(scale_bits)
    if not 1 <= s <= 32:
        # the avg_millibits offset trick needs per-feature bits >= -64
        raise ValueError(f"scale_bits must be in [1, 32], got {s}")
    scale = 1 << s
    raw_feats = hashed_doc_features(
        raw_docs, n_buckets, id_col, text_col, bigrams
    )
    tgt_feats = hashed_doc_features(
        target_docs, n_buckets, id_col, text_col, bigrams
    )
    c_r = raw_feats.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c_r")
    )
    c_t = tgt_feats.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c_t")
    )
    model = (
        c_r.join(c_t, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("c_r", F.lit(0)).cast("long").alias("c_r"),
            F.coalesce("c_t", F.lit(0)).cast("long").alias("c_t"),
        )
    )
    # the fitted model is <= n_buckets rows but its lineage is two full
    # corpus explodes; checkpoint it so totals + the broadcast scoring
    # join don't re-run the fit (one fit pass + one score pass is the
    # DSIR minimum — without this the plan re-scans the corpus per
    # downstream reference). LAZY: the first consumer's broadcast build
    # materializes it inside the caller's one action — the eager
    # variant was an extra blocking driver job
    model = model.localCheckpoint(eager=False)
    totals = model.agg(
        F.sum("c_r").cast("long").alias("n_r"),
        F.sum("c_t").cast("long").alias("n_t"),
    )
    b = int(n_buckets)
    # per-feature ratio and the corpus normalizer as SEPARATE whole-bits
    # terms (keeps every product <= count * 2^s — overflow headroom)
    bits = F.expr(
        f"""
        (length(bin(greatest((c_t + 1L) * {scale}L div (c_r + 1L), 1L))) - 1)
        + (length(bin(greatest((n_r + {b}L) * {scale}L div (n_t + {b}L), 1L))) - 1)
        - {2 * s}L
        """
    ).cast("long")
    scored = (
        raw_feats.join(F.broadcast(model), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(id_col, bits.alias("_bits"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_feats"),
        F.sum("_bits").cast("long").alias("weight_bits"),
    )
    return (
        raw_docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0).cast("long")).alias("n_feats"),
            "weight_bits",
            # floor(1000*w/n) via a +64000-per-feature offset: each
            # per-feature term is >= -2*scale_bits >= -64, so the
            # shifted numerator is non-negative and truncating `div`
            # (Spark) == flooring `//` (DuckDB oracle) — negative
            # averages stay cross-engine exact
            F.expr(
                "(1000L * weight_bits + 64000L * n_feats) div n_feats"
                " - 64000L"
            ).alias("avg_millibits"),
        )
    )
