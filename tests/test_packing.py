"""Sequence packing (operators/packing.py): span math vs a python
reference simulation, boundary alignment, multi-sequence giant docs,
zero-token drops, partial final sequence, prefix-sum correctness and
partitioning invariance."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from sharepointcrawler_spark.operators.packing import (
    global_prefix_sum,
    pack_sequences,
)


def _py_pack(token_counts, L):
    """Reference: concatenate docs in id order, cut every L tokens."""
    out, pos = [], 0
    for doc_id, n in sorted(token_counts.items()):
        if n <= 0:
            continue
        start, end = pos, pos + n
        for s in range(start // L, (end - 1) // L + 1):
            g0, g1 = max(start, s * L), min(end, (s + 1) * L)
            out.append((doc_id, n, s, g0 - s * L, g0 - start, g1 - start))
        pos = end
    return sorted(out)


def _docs(spark, counts):
    return spark.createDataFrame(
        sorted(counts.items()), "doc_id long, n_tokens long"
    )


def test_matches_python_reference(spark):
    counts = {i: (i * 37) % 23 + 1 for i in range(200)}
    counts[13] = 0       # dropped
    counts[50] = 4096    # giant doc spanning many sequences
    got = sorted(
        map(tuple, pack_sequences(_docs(spark, counts), 128).collect())
    )
    assert got == _py_pack(counts, 128)


def test_boundary_exact_fit(spark):
    # doc ends exactly on a boundary; next doc starts the next sequence
    counts = {1: 64, 2: 64, 3: 10}
    got = sorted(map(tuple, pack_sequences(_docs(spark, counts), 64).collect()))
    assert got == [
        (1, 64, 0, 0, 0, 64),
        (2, 64, 1, 0, 0, 64),
        (3, 10, 2, 0, 0, 10),
    ]


def test_spans_cover_documents_and_fill_sequences(spark):
    counts = {i: (i * 61) % 200 + 1 for i in range(150)}
    packed = pack_sequences(_docs(spark, counts), 100).cache()
    # every doc's spans concatenate to exactly its tokens
    per_doc = packed.groupBy("doc_id").agg(
        F.sum(F.col("doc_tok_end") - F.col("doc_tok_start")).alias("covered"),
        F.first("n_tokens").alias("n"),
        F.min("doc_tok_start").alias("lo"),
        F.max("doc_tok_end").alias("hi"),
    )
    assert per_doc.filter("covered <> n or lo <> 0 or hi <> n").count() == 0
    # every sequence except the last is exactly full
    per_seq = packed.groupBy("seq_id").agg(
        F.sum(F.col("doc_tok_end") - F.col("doc_tok_start")).alias("fill")
    )
    last = per_seq.agg(F.max("seq_id")).collect()[0][0]
    assert per_seq.filter(f"seq_id <> {last} and fill <> 100").count() == 0
    total = sum(counts.values())
    assert per_seq.agg(F.sum("fill")).collect()[0][0] == total
    packed.unpersist()


def test_partitioning_invariance(spark):
    counts = {i: (i * 7) % 50 + 1 for i in range(300)}
    a = sorted(map(tuple, pack_sequences(_docs(spark, counts), 77).collect()))
    b = sorted(
        map(
            tuple,
            pack_sequences(_docs(spark, counts).repartition(17), 77).collect(),
        )
    )
    assert a == b


def test_prefix_sum_and_validation(spark):
    df = _docs(spark, {i: i + 1 for i in range(100)})
    got = {
        r.doc_id: r.prefix_sum
        for r in global_prefix_sum(df, "doc_id", "n_tokens").collect()
    }
    acc = 0
    for i in range(100):
        acc += i + 1
        assert got[i] == acc
    with pytest.raises(ValueError):
        pack_sequences(df, 0)
