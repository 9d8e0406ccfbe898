"""Corpus-scale deduplication operators (training-data pipeline layer).

Five dedup families over a ``documents(doc_id, text, ...)`` table, each
designed for the 100 TB shape:

* exact            — hash-groupBy on a normalized fingerprint. One
                     shuffle on the md5 key; partial agg map-side.
* minhash LSH      — shingle -> portable 64-bit hash -> k minhash
                     lanes -> bands -> bucket join. Only docs sharing a
                     band bucket ever meet: no O(n^2) pair stage.
* simhash          — 64-bit sign-aggregated token hashes (vectorized
                     numpy inside a pandas UDF); near-dup = small
                     hamming distance on a single long.
* n-gram jaccard   — shingle inverted index join; exact similarity on
                     LSH candidates (or small corpora).
* embedding cosine — see operators/similarity.py.

Hashes are the engine-portable md5-derived int64 (functions/
textanalysis.portable_hash64) so every step has a byte-equal DuckDB
oracle; at pure-production scale xxhash64 is a drop-in (faster, no
oracle parity).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sharepointcrawler_spark.functions.textanalysis import (
    doc_fingerprint,
    normalize_text,
    portable_hash64,
)

# minhash parameters — shared constants so oracle SQL can inline them
MINHASH_P = 1_000_000_007
MINHASH_K = 16
MINHASH_BANDS = 4  # 4 rows per band
SHINGLE_N = 3


def minhash_params() -> list[tuple[int, int, int]]:
    """(i, a_i, b_i) — deterministic affine hash params, small enough
    that a*h+b stays inside int64 (h < p ~ 2^30, a < p)."""
    return [
        (i, (2 * i + 1) * 2654435761 % MINHASH_P, (i * 40503 + 17) % MINHASH_P)
        for i in range(MINHASH_K)
    ]


# ----------------------------------------------------------- exact dedup


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct normalized text: keeper = min id, plus the
    duplicate count. Single hash-shuffle on the fingerprint."""
    return (
        docs.withColumn("fingerprint", doc_fingerprint(text_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dupes"),
        )
    )


def dedup_keep_first(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The filtered corpus: drop all but the min-id row per fingerprint."""
    keep = exact_dedup(docs, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return docs.join(keep, id_col, "left_semi")


# ------------------------------------------------------------- shingles


def word_shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = SHINGLE_N) -> DataFrame:
    """(id, shingle) rows: n-word shingles over normalized text.
    Documents shorter than n words yield their full text as the single
    shingle (so no document silently disappears from dedup)."""
    words = F.split(normalize_text(text_col), " ")
    n_sh = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    shingles = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return docs.select(
        F.col(id_col), F.explode(F.array_distinct(shingles)).alias("shingle")
    )


# ----------------------------------------------------------- minhash LSH


def minhash_signatures(shingled: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, i, minhash) — k lanes per doc. The shingle set is hashed
    once (portable md5->int64 mod p) and crossed with the tiny (k)
    param table (broadcast): |shingles| x k rows, min-combined map-side
    before the groupBy shuffle."""
    spark = shingled.sparkSession
    params = spark.createDataFrame(minhash_params(), "i int, a long, b long")
    hashed = shingled.withColumn("h", F.pmod(portable_hash64("shingle"), F.lit(MINHASH_P)))
    return (
        hashed.join(F.broadcast(params))
        .withColumn("hv", (F.col("a") * F.col("h") + F.col("b")) % MINHASH_P)
        .groupBy(id_col, "i")
        .agg(F.min("hv").alias("minhash"))
    )


def lsh_bucket_pairs(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Candidate pairs: docs agreeing on ALL rows of any band.

    band key = md5 of the ordered minhash lane values in the band
    (portable string agg). Pairs are produced by a self-join on
    (band, band_key) — the join key is high-entropy, so the shuffle is
    uniform; a pathological mega-bucket (all-identical docs) is the
    data's fault, and AQE skew-split handles it.
    """
    rows_per_band = MINHASH_K // MINHASH_BANDS
    banded = (
        signatures.withColumn("band", (F.col("i") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",", F.transform(F.array_sort(
                        F.collect_list(F.struct("i", "minhash"))
                    ), lambda s: s["minhash"].cast("string"))
                )
            ).alias("band_key")
        )
    )
    left = banded.select(F.col(id_col).alias("id_a"), "band", "band_key")
    right = banded.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        left.join(right, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
    n: int = SHINGLE_N,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (inverted-index join).

    Without ``candidates`` every shingle-sharing pair is scored (small
    corpora / oracle path); with LSH candidates only those pairs are
    scored (the scale path: minhash_lsh_dedup below).
    """
    sh = shingled if shingled is not None else word_shingles(docs, text_col, id_col, n)
    # the shingle expansion feeds three consumers (both join sides +
    # sizes): persist once instead of recomputing the explode 3x.
    sh = sh.persist()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    if candidates is not None:
        # prune BOTH sides to docs that appear in any candidate pair
        # BEFORE the inverted-index shuffle — the whole point of LSH is
        # that this set is tiny relative to the corpus
        candidates = candidates.persist()
        a = a.join(
            candidates.select(F.col("id_a")).distinct(), "id_a", "left_semi"
        )
        b = b.join(
            candidates.select(F.col("id_b")).distinct(), "id_b", "left_semi"
        )
    shared = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    if candidates is not None:
        shared = shared.join(candidates, ["id_a", "id_b"], "left_semi")
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The scale path end-to-end: shingle -> minhash -> LSH buckets ->
    exact-jaccard verification of candidates only."""
    sh = word_shingles(docs, text_col, id_col).persist()
    sigs = minhash_signatures(sh, id_col)
    cands = lsh_bucket_pairs(sigs, id_col)
    return jaccard_pairs(
        docs, threshold, text_col, id_col, candidates=cands, shingled=sh
    )


# ---------------------------------------------------------------- simhash


def _simhash64_batch(texts: pd.Series) -> pd.Series:
    """Vectorized-ish simhash: per doc, sum ±1 per bit over md5-derived
    64-bit token hashes; sign -> bit. numpy inner loop over unique
    tokens (no per-character python)."""
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        toks = str(t).lower().split()
        if not toks:
            out.append(0)
            continue
        hs = np.frombuffer(
            b"".join(hashlib.md5(tok.encode()).digest()[:8] for tok in toks),
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for b in np.nonzero(v > 0)[0]:
            sim |= np.uint64(1) << np.uint64(b)
        out.append(int(sim.astype(np.int64)))
    return pd.Series(out, dtype="object")


@F.pandas_udf(T.LongType())
def simhash64(texts: pd.Series) -> pd.Series:  # pragma: no cover
    return _simhash64_batch(texts)


def simhash_pairs(docs: DataFrame, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by simhash hamming distance.

    Scale path: block by the 4 16-bit chunks of the simhash (a pair
    within hamming<=3 must agree on at least one chunk — pigeonhole), so
    the self-join key is a chunk value, not a cross join.
    """
    sh = docs.select(F.col(id_col), simhash64(F.col(text_col)).alias("sim"))
    chunks = sh.select(
        id_col,
        "sim",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk_idx"),
                    F.shiftright("sim", 16 * c).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
                )
                for c in range(4)
            ])
        ).alias("ck"),
    ).select(id_col, "sim", "ck.chunk_idx", "ck.chunk")
    a = chunks.select(
        F.col(id_col).alias("id_a"), F.col("sim").alias("sim_a"), "chunk_idx", "chunk"
    )
    b = chunks.select(
        F.col(id_col).alias("id_b"), F.col("sim").alias("sim_b"), "chunk_idx", "chunk"
    )
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
