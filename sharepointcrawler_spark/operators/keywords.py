"""Per-document keyword extraction — integer TF-IDF top-k.

The classic corpus summarization signal (Sparck Jones 1972): a term
matters to a document in proportion to its in-document frequency and
the rarity of documents containing it. Training pipelines use it for
topic tagging, index pruning, and per-shard vocabulary reports; a
crawler uses it to describe pages whose titles lie.

All-integer contract (the engine's cross-engine determinism rule):
IDF is the whole-bits log2 ``floor(log2(N * 2^10 / df))`` computed by
binary-string length — no float ever enters the score, so ranks are
bit-stable under any partitioning and a SQL oracle recomputes them
exactly. Score = tf * idf_bits10 (both integers); ties break on the
term string ascending.

Scale shape: one token explode feeds TWO combine-friendly
aggregations — tf = groupBy(doc, term) count (map-side combined), and
df = distinct-doc count per term derived FROM the tf table (already
one row per (doc, term) — no second explode, no countDistinct over
raw tokens). The idf join hashes on the term; the top-k window
partitions by doc over rows already reduced to distinct terms. N
arrives via a broadcast one-row aggregate, so the plan stays fully
lazy (no driver collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sharepointcrawler_spark.functions.lm import tokens_expr

IDF_SCALE_BITS = 10


def tfidf_keywords(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_token_len: int = 2,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document. Returns one row per
    (doc, rank): ``(id, rank, term, tf, score)`` where
    ``score = tf * (length(bin(N * 1024 div df)) - 1)``. Documents
    with no qualifying tokens emit no rows. Deterministic: integer
    score, term-ascending tie-break."""
    staged = docs.select(
        F.col(id_col).alias("_id"), tokens_expr(text_col).alias("_w")
    )
    toks = (
        staged.select("_id", F.explode("_w").alias("term"))
        .filter(F.length("term") >= min_token_len)
    )
    # tf feeds BOTH the df derivation and the scoring join — persist
    # so the token explode runs once (MEMORY_AND_DISK spills at scale;
    # recomputing the explode costs more than spilling skinny rows)
    tf = toks.groupBy("_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    ).persist()
    df_counts = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    scale = 1 << IDF_SCALE_BITS
    scored = (
        tf.join(df_counts, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "_id",
            "term",
            "tf",
            (
                F.col("tf")
                * (
                    F.length(F.bin(F.expr(f"_n * {scale}L div df"))) - 1
                ).cast("long")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_id").alias(id_col),
            F.col("rank").cast("long"),
            "term",
            "tf",
            "score",
        )
    )
