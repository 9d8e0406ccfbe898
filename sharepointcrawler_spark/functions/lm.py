"""Statistical language-model quality scoring (the CCNet perplexity
stage) with an exact-integer surprisal core.

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
KenLM 5-gram model trained on a clean reference corpus and keeps the
head/middle of the distribution; it is the canonical model-based
quality filter in web-text pipelines (CCNet, LLaMA, RedPajama). This
module implements the same *shape* — train an n-gram LM on a reference
slice, score every document, bucket by score — as pure DataFrame
operators:

- ``train_bigram_lm`` fits an add-one-smoothed bigram model: three
  small DataFrames (pair counts, head counts, vocabulary size). At
  production scale the reference corpus is curated and the model is
  bounded by vocabulary, not corpus size — like a KenLM binary, it is
  a *model artifact* that ships to every executor, so the score join
  broadcasts it by default.
- ``score_documents`` explodes each document's bigrams once
  (one Generate), joins the model (two broadcast hash joins, no
  shuffle), and aggregates per-document surprisal (one shuffle keyed
  by doc id). That plan survives 100 TB: corpus-size work is a single
  scan + a skinny aggregate.

Exactness: floating-point ``log`` is transcendental and differs by
1 ulp between JVM and glibc libm, so hash-compared scores use
**integer whole-bit surprisal** instead:

    bits(w | h) = floor(log2( (c(h) + V) / (c(h,w) + 1) ))

and for positive integers ``a >= b``,
``floor(log2(a / b)) == length(bin(a div b)) - 1`` (proof: both equal
the unique k with ``2^k <= a/b < 2^(k+1)``, and ``2^k <= a/b`` iff
``2^k <= a div b`` because ``2^k`` is an integer). Every step is
integer arithmetic, bit-identical in Spark and DuckDB. The float
log2 score is also exposed (``float_score=True``) for API users and
is pytest-verified against python ``math.log2`` — it is simply kept
out of hash-compared oracle columns.

The reference crawler has no statistical quality stage (it trusts a
curated SharePoint tenant); this operator is the web-scale admission
filter its corpus would need before training use.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# avg_millibits defaults for bucket():  head < T_HEAD <= middle < T_TAIL <= tail
DEFAULT_T_HEAD = 9_000
DEFAULT_T_TAIL = 12_000


def tokens_expr(text: Column | str) -> Column:
    """Lowercased alphanumeric tokens of ``text`` as an array<string>.
    Non-alphanumeric runs collapse to a single separator, so the array
    never contains empty tokens (whole-empty text gives a 1-element
    [''] array, which the bigram pairing then drops)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(F.regexp_replace(F.lower(t), "[^a-z0-9]+", " ")), " ")


def bigram_rows(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per (id, head, word) bigram. Stages the token array as
    its own projection column first (lambda-CSE rule: HOF lambdas must
    reference only attributes), then zips w[0:n-1] with w[1:n-1] and
    explodes once."""
    toks = docs.select(
        F.col(id_col).alias("_lm_id"), tokens_expr(text_col).alias("_w")
    ).select(
        "_lm_id",
        "_w",
        (F.size("_w") - 1).alias("_n1"),
    )
    pairs = toks.select(
        "_lm_id",
        F.arrays_zip(
            F.slice("_w", 1, F.col("_n1")).alias("head"),
            F.expr("slice(_w, 2, _n1)").alias("word"),
        ).alias("_p"),
    )
    return (
        pairs.select("_lm_id", F.explode("_p").alias("_b"))
        .select(
            F.col("_lm_id"),
            F.col("_b.head").alias("head"),
            F.col("_b.word").alias("word"),
        )
        .filter((F.col("head") != "") & (F.col("word") != ""))
    )


@dataclass
class BigramLM:
    """Fitted add-one-smoothed bigram model: ``pair_counts``
    (head, word, c_hw), ``head_counts`` (head, c_h) and ``vocab``
    (a single-row DataFrame with the vocabulary size ``v``). All
    three stay DataFrames so training is fully declarative — no
    driver-side action is ever taken on the model."""

    pair_counts: DataFrame
    head_counts: DataFrame
    vocab: DataFrame


def train_bigram_lm(
    ref_docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> BigramLM:
    """Fit the bigram LM on a reference corpus (CCNet trains on
    Wikipedia; callers pass any clean slice). One bigram explode, two
    aggregates, one distinct — all skinny (strings + counts)."""
    bg = bigram_rows(ref_docs, id_col, text_col)
    pair_counts = bg.groupBy("head", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c_hw")
    )
    head_counts = bg.groupBy("head").agg(
        F.count(F.lit(1)).cast("long").alias("c_h")
    )
    # vocabulary = distinct tokens (heads plus the final token of each
    # doc: union both bigram sides before distinct)
    vocab = (
        bg.select(F.col("head").alias("tok"))
        .unionAll(bg.select(F.col("word").alias("tok")))
        .agg(F.countDistinct("tok").cast("long").alias("v"))
    )
    return BigramLM(pair_counts, head_counts, vocab)


def _whole_bits(q: Column) -> Column:
    """floor(log2(q)) for a positive integer column, via the binary
    string length (exact — no floating point anywhere)."""
    return (F.length(F.bin(q)) - 1).cast("long")


def score_documents(
    docs: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool = True,
    float_score: bool = False,
) -> DataFrame:
    """Per-document integer surprisal under ``lm``:

    - ``n_bigrams``: scored bigram count (0 for docs under 2 tokens)
    - ``sum_bits``: total whole-bit surprisal (NULL when n_bigrams=0)
    - ``avg_millibits``: (1000*sum_bits) div n_bigrams — the
      perplexity-rank analog (lower = more reference-like)
    - with ``float_score=True`` also ``avg_log2``: the true float
      bits/bigram (libm — NOT cross-engine hash-stable; API use only)

    ``broadcast_lm=True`` (default) marks the three model tables as
    broadcast — the KenLM-analog deployment where the model is a
    bounded artifact. Pass False to shuffle-join a model too large to
    broadcast."""
    hint = F.broadcast if broadcast_lm else (lambda d: d)
    bg = bigram_rows(docs, id_col, text_col)
    joined = (
        bg.join(hint(lm.pair_counts), ["head", "word"], "left")
        .join(hint(lm.head_counts), ["head"], "left")
        .crossJoin(hint(lm.vocab))
    )
    q = F.expr("(coalesce(c_h, 0L) + v) div (coalesce(c_hw, 0L) + 1L)")
    scored = joined.select(
        "_lm_id",
        _whole_bits(q).alias("_bits"),
        *(
            [
                (
                    F.log2(
                        (F.coalesce("c_h", F.lit(0)) + F.col("v")).cast("double")
                        / (F.coalesce("c_hw", F.lit(0)) + F.lit(1)).cast("double")
                    )
                ).alias("_fbits")
            ]
            if float_score
            else []
        ),
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("_bits").alias("sum_bits"),
    ]
    if float_score:
        aggs.append(F.avg("_fbits").alias("avg_log2"))
    per_doc = scored.groupBy("_lm_id").agg(*aggs)
    out = (
        docs.select(F.col(id_col).alias("_lm_id"))
        .join(per_doc, "_lm_id", "left")
        .select(
            F.col("_lm_id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            F.col("sum_bits"),
            F.expr("(1000L * sum_bits) div n_bigrams").alias("avg_millibits"),
            *(["avg_log2"] if float_score else []),
        )
    )
    return out


def quality_bucket(
    avg_millibits: Column | str,
    t_head: int = DEFAULT_T_HEAD,
    t_tail: int = DEFAULT_T_TAIL,
) -> Column:
    """CCNet's head/middle/tail split on the integer score; documents
    too short to score (no bigrams) land in 'short'. Lower surprisal =
    closer to the reference corpus = 'head'."""
    s = F.col(avg_millibits) if isinstance(avg_millibits, str) else avg_millibits
    return (
        F.when(s.isNull(), F.lit("short"))
        .when(s < t_head, F.lit("head"))
        .when(s < t_tail, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
