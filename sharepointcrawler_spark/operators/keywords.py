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


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_token_len: int = 2,
) -> DataFrame:
    """Term -> posting-list construction (the original MapReduce
    example, Dean & Ghemawat 2004 §2.1; every search/dedup-audit stack
    materializes one). One row per term:

    - ``df``: document frequency
    - ``total_tf``: corpus-wide occurrences
    - ``postings``: sorted doc ids, DELTA-ENCODED (first id, then
      gaps) — the classic compression transform (gaps are small for
      frequent terms, so varint/bit-packing downstream gets its wins;
      here the transform itself is the operator)

    Shape: the tf table (one explode, map-side combined) groups by
    term with ``sort_array(collect_list(...))`` — postings order is
    by doc id, deterministic under any partitioning. The gap transform
    is a JVM zip_with over the sorted array; nothing leaves the JVM.

    Scale note: stopword terms make single giant rows (the classic
    index-build skew). Production layouts split hot posting lists into
    fixed-size segments keyed (term, segment) — compose this operator
    after a ``pmod(doc_id, k)`` pre-split when a corpus's head terms
    overflow a task; the transform is unchanged per segment.
    """
    staged = docs.select(
        F.col(id_col).alias("_id"), tokens_expr(text_col).alias("_w")
    )
    toks = staged.select("_id", F.explode("_w").alias("term")).filter(
        F.length("term") >= min_token_len
    )
    tf = toks.groupBy("_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    per_term = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("total_tf"),
        F.sort_array(F.collect_list("_id")).alias("_ids"),
    )
    # delta encode: ids[0], ids[1]-ids[0], ... via a shifted zip
    return per_term.select(
        "term",
        "df",
        "total_tf",
        F.expr(
            """
            zip_with(_ids,
                     concat(array(CAST(0 AS BIGINT)),
                            slice(_ids, 1, size(_ids) - 1)),
                     (cur, prev) -> cur - prev)
            """
        ).alias("postings"),
    )
