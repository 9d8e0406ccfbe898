"""Bigram-LM quality scoring (functions/lm.py — the CCNet perplexity
stage): integer whole-bit surprisal exactness vs python math, the
float path vs math.log2, edge docs (short/null/empty), score direction
(reference-like < junk), bucket mapping, and the broadcast plan shape."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from sharepointcrawler_spark.functions.lm import (
    BigramLM,
    bigram_rows,
    quality_bucket,
    score_documents,
    tokens_expr,
    train_bigram_lm,
)

REF_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox naps under the old tree",
    "a lazy dog naps under the quick brown tree",
]
JUNK = "zzq wxv qqj vvk zzq pplm wxv qqj"


def _docs(spark, extra=()):
    rows = [(i, t) for i, t in enumerate(REF_TEXTS)] + list(extra)
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_model(texts):
    """Reference model in plain python."""
    pairs, heads, vocab = {}, {}, set()
    for t in texts:
        w = [x for x in t.lower().split() if x]
        vocab.update(w)
        for a, b in zip(w, w[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
            heads[a] = heads.get(a, 0) + 1
    return pairs, heads, len(vocab)


def _py_bits(text, pairs, heads, v):
    w = [x for x in text.lower().split() if x]
    out = []
    for a, b in zip(w, w[1:]):
        q = (heads.get(a, 0) + v) // (pairs.get((a, b), 0) + 1)
        out.append(q.bit_length() - 1)
    return out


def test_integer_bits_match_python(spark):
    docs = _docs(spark, [(10, JUNK)])
    lm = train_bigram_lm(docs.filter("doc_id < 3"))
    got = {r.doc_id: r for r in score_documents(docs, lm).collect()}
    pairs, heads, v = _py_model(REF_TEXTS)
    for i, t in list(enumerate(REF_TEXTS)) + [(10, JUNK)]:
        bits = _py_bits(t, pairs, heads, v)
        assert got[i].n_bigrams == len(bits)
        assert got[i].sum_bits == sum(bits)
        assert got[i].avg_millibits == (1000 * sum(bits)) // len(bits)


def test_whole_bits_is_floor_log2_of_ratio(spark):
    """The identity the module rests on: floor(log2(a/b)) ==
    bit_length(a div b) - 1, swept over awkward ratios."""
    for a in [1, 2, 3, 5, 7, 8, 9, 15, 16, 17, 100, 1023, 1024, 10**9]:
        for b in [1, 2, 3, 7, a]:
            if a < b:
                continue
            assert (a // b).bit_length() - 1 == math.floor(math.log2(a / b)), (a, b)


def test_float_score_matches_libm(spark):
    docs = _docs(spark, [(10, JUNK)])
    lm = train_bigram_lm(docs.filter("doc_id < 3"))
    got = {
        r.doc_id: r
        for r in score_documents(docs, lm, float_score=True).collect()
    }
    pairs, heads, v = _py_model(REF_TEXTS)
    w = [x for x in JUNK.split() if x]
    exp = [
        math.log2((heads.get(a, 0) + v) / (pairs.get((a, b), 0) + 1))
        for a, b in zip(w, w[1:])
    ]
    assert abs(got[10].avg_log2 - sum(exp) / len(exp)) < 1e-9


def test_direction_and_buckets(spark):
    """Reference-like docs land below junk; bucket() maps thresholds
    and routes unscorable docs to 'short'."""
    docs = _docs(spark, [(10, JUNK), (11, "x"), (12, None), (13, "")])
    lm = train_bigram_lm(docs.filter("doc_id < 3"))
    scored = score_documents(docs, lm)
    rows = {r.doc_id: r for r in scored.collect()}
    ref_max = max(rows[i].avg_millibits for i in range(3))
    assert rows[10].avg_millibits > ref_max
    for i in (11, 12, 13):
        assert rows[i].n_bigrams == 0 and rows[i].sum_bits is None
    mid = (ref_max + rows[10].avg_millibits) // 2
    b = {
        r.doc_id: r.bucket
        for r in scored.select(
            "doc_id", quality_bucket("avg_millibits", mid, mid).alias("bucket")
        ).collect()
    }
    assert all(b[i] == "head" for i in range(3))
    assert b[10] == "tail"
    assert b[11] == b[12] == b[13] == "short"


def test_tokens_and_bigram_edges(spark):
    df = spark.createDataFrame(
        [(1, "A,b!!c"), (2, "  "), (3, "one")], "doc_id long, text string"
    )
    toks = {r.doc_id: r.w for r in df.select("doc_id", tokens_expr("text").alias("w")).collect()}
    assert toks[1] == ["a", "b", "c"]
    assert toks[2] == [""]
    bg = bigram_rows(df).collect()
    assert {(r._lm_id, r.head, r.word) for r in bg} == {(1, "a", "b"), (1, "b", "c")}


def test_broadcast_plan_shape(spark):
    """The score join must broadcast the model (no SortMergeJoin) and
    explode bigrams exactly once."""
    docs = _docs(spark, [(10, JUNK)])
    lm = train_bigram_lm(docs.filter("doc_id < 3"))
    scored = score_documents(docs, lm)
    scored.collect()  # AQE finalizes the plan only after execution
    plan = scored._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin") >= 3


def test_shuffle_join_fallback(spark):
    """broadcast_lm=False must produce identical results."""
    docs = _docs(spark, [(10, JUNK)])
    lm = train_bigram_lm(docs.filter("doc_id < 3"))
    a = sorted(map(tuple, score_documents(docs, lm).collect()))
    b = sorted(map(tuple, score_documents(docs, lm, broadcast_lm=False).collect()))
    assert a == b
