"""DSIR importance weighting (operators/importance.py): feature
hashing vs a python reference, integer whole-bits score simulation,
target-likeness ordering, empty-doc handling, plan shape."""

from __future__ import annotations

import hashlib
import re

import pyspark.sql.functions as F

from sharepointcrawler_spark.operators.importance import (
    dsir_importance,
    hashed_doc_features,
)

B = 64  # small bucket count so collisions are exercised
S = 20


def _tokens(text):
    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ") if t]


def _feats(text):
    toks = _tokens(text)
    return toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]


def _bucket(feat):
    return int(hashlib.md5(feat.encode()).hexdigest()[:15], 16) % B


def _py_weights(raw, target):
    c_r, c_t = {}, {}
    for _, t in raw:
        for f in _feats(t):
            c_r[_bucket(f)] = c_r.get(_bucket(f), 0) + 1
    for t in target:
        for f in _feats(t):
            c_t[_bucket(f)] = c_t.get(_bucket(f), 0) + 1
    n_r, n_t = sum(c_r.values()), sum(c_t.values())
    norm = ((n_r + B) << S) // (n_t + B)
    k = norm.bit_length() - 1
    out = {}
    for i, t in raw:
        bits, n = 0, 0
        for f in _feats(t):
            bkt = _bucket(f)
            q = max((((c_t.get(bkt, 0) + 1) << S) // (c_r[bkt] + 1)), 1)
            bits += (q.bit_length() - 1) + k - 2 * S
            n += 1
        out[i] = (n, bits if n else None)
    return out


def test_matches_python_reference(spark):
    raw = [(i, f"word{i % 5} common text number {i} here") for i in range(30)]
    target = [raw[i][1] for i in range(0, 30, 3)]
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    tdf = spark.createDataFrame([(t,) for t in target], "text string").withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["weight_bits"])
        for r in dsir_importance(rdf, tdf, n_buckets=B, scale_bits=S).collect()
    }
    assert got == _py_weights(raw, target)


def test_target_like_docs_rank_higher(spark):
    # raw pool: half science-ish, half noise; target: pure science-ish
    sci = "quantum field theory predicts particle interactions precisely"
    noise = "buy cheap pills click here winner prize claim now"
    raw = [(i, sci if i % 2 == 0 else noise) for i in range(40)]
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    tdf = spark.createDataFrame(
        [(100 + j, sci) for j in range(5)], "doc_id long, text string"
    )
    w = dsir_importance(rdf, tdf, n_buckets=B).collect()
    sci_w = {r["avg_millibits"] for r in w if r["doc_id"] % 2 == 0}
    noise_w = {r["avg_millibits"] for r in w if r["doc_id"] % 2 == 1}
    assert min(sci_w) > max(noise_w)


def test_empty_doc(spark):
    rdf = spark.createDataFrame(
        [(1, "real words in this document"), (2, "   "), (3, "!!!")],
        "doc_id long, text string",
    )
    tdf = spark.createDataFrame([(9, "real words")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in dsir_importance(rdf, tdf, n_buckets=B).collect()}
    assert rows[2]["n_feats"] == 0 and rows[2]["weight_bits"] is None
    assert rows[2]["avg_millibits"] is None
    assert rows[3]["n_feats"] == 0
    assert rows[1]["n_feats"] == 5 + 4


def test_feature_multiplicity(spark):
    df = spark.createDataFrame([(1, "a a a")], "doc_id long, text string")
    f = hashed_doc_features(df, n_buckets=B).collect()
    # 3 unigrams + 2 bigrams, with multiplicity
    assert len(f) == 5


def test_no_python_in_plan(spark):
    rdf = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    tdf = spark.createDataFrame([(2, "x y")], "doc_id long, text string")
    plan = (
        dsir_importance(rdf, tdf, n_buckets=B)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "EvalPython" not in plan
