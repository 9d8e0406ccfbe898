"""Mixture sampling (operators/mixing.py): exact copy-count law
(floor + fractional-by-hash), determinism across reruns and
partitionings, drop/keep/upsample weights, default weight for unknown
groups, salt decorrelation, report arithmetic, and the no-shuffle
plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from sharepointcrawler_spark.operators.mixing import (
    PPM,
    mix_corpus,
    mixture_report,
    sample_hash,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
        F.lit("text ").alias("text"),
    )


def _weights(spark):
    return spark.createDataFrame(
        [("src0", 0), ("src1", PPM), ("src2", 2_500_000)],
        "source string, weight_ppm long",
    )  # src3 intentionally absent -> default


def test_copy_count_law(spark):
    docs = _docs(spark)
    mixed = mix_corpus(docs, _weights(spark)).cache()
    per = {
        r.source: r.n
        for r in mixed.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert "src0" not in per  # weight 0 drops
    assert per["src1"] == 100  # weight PPM keeps 1:1
    assert per["src3"] == 100  # default PPM
    # 2.5M: every doc gets 2 copies, docs with u < 500000 get a third
    u = {r.doc_id: r.u for r in docs.filter("source = 'src2'")
         .select("doc_id", sample_hash("doc_id").alias("u")).collect()}
    extra = sum(1 for v in u.values() if v < 500_000)
    assert per["src2"] == 2 * 100 + extra
    # per-doc law exactly
    per_doc = {r.doc_id: r.n for r in mixed.filter("source = 'src2'")
               .groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    for d, uu in u.items():
        assert per_doc[d] == 2 + (1 if uu < 500_000 else 0)
    # copy_idx is a clean 0..n-1 sequence
    idx = mixed.filter("source = 'src2'").groupBy("doc_id").agg(
        F.sort_array(F.collect_list("copy_idx")).alias("ix"),
        F.count("*").alias("n"),
    ).collect()
    for r in idx:
        assert r.ix == list(range(r.n))
    mixed.unpersist()


def test_determinism_across_partitionings(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, mix_corpus(docs, _weights(spark)).collect()))
    b = sorted(
        map(tuple, mix_corpus(docs.repartition(13), _weights(spark)).collect())
    )
    assert a == b


def test_salt_decorrelates(spark):
    docs = _docs(spark)
    u1 = docs.select(sample_hash("doc_id").alias("u")).collect()
    u2 = docs.select(sample_hash("doc_id", salt="s2").alias("u")).collect()
    assert [r.u for r in u1] != [r.u for r in u2]
    # both roughly uniform: halves within a loose band
    frac = sum(1 for r in u1 if r.u < PPM // 2) / len(u1)
    assert 0.35 < frac < 0.65


def test_report(spark):
    docs = _docs(spark)
    mixed = mix_corpus(docs, _weights(spark))
    rep = {r.source: r for r in mixture_report(docs, mixed).collect()}
    assert rep["src0"].n_copies == 0 and rep["src0"].achieved_ppm == 0
    assert rep["src1"].achieved_ppm == PPM
    assert rep["src3"].n_input == 100 and rep["src3"].n_copies == 100
    assert 2_000_000 <= rep["src2"].achieved_ppm <= 3_000_000


def test_no_shuffle_plan(spark):
    docs = _docs(spark)
    mixed = mix_corpus(docs, _weights(spark))
    mixed.collect()
    plan = mixed._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange hashpartitioning" not in final
    assert "SortMergeJoin" not in final
    assert "Python" not in final
