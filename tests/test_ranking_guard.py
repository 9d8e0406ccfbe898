"""Overflow guards for the integer-scaled ranking operators (VERDICT r6
item 2): past the documented node-count envelope the default scale must
RAISE instead of silently wrapping 64-bit sums. The guard is an in-plan
``assert_true`` over the node count, so it costs no extra driver action;
these tests exercise it with a raised ``scale`` so a small fixture graph
crosses the bound (the bound is ``2^63/scale`` for pagerank and
``2^63/scale^2`` for hits — mechanism-identical to a 9e6-node graph at
the default scales, without building one)."""

from __future__ import annotations

import pytest
from pyspark.errors.exceptions.captured import SparkRuntimeException

from sharepointcrawler_spark.operators.ranking import hits, pagerank


def _chain_edges(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )


def test_pagerank_guard_raises_past_envelope(spark):
    # scale 2^56 -> bound = 2^63/2^56 = 128 nodes; 200-node chain trips it
    edges = _chain_edges(spark, 200)
    with pytest.raises(SparkRuntimeException, match="n_nodes . scale exceeds int64"):
        pagerank(edges, n_iters=1, scale=2**56).collect()


def test_pagerank_guard_passes_inside_envelope(spark):
    edges = _chain_edges(spark, 100)
    out = pagerank(edges, n_iters=1, scale=2**56).collect()
    assert len(out) == 101


def test_hits_guard_raises_past_envelope(spark):
    # scale 2^28 -> bound = 2^63/2^56 = 128 nodes; 200-node chain trips it
    edges = _chain_edges(spark, 200)
    with pytest.raises(SparkRuntimeException, match="n_nodes . scale.2 exceeds int64"):
        hits(edges, n_iters=1, scale=2**28).collect()


def test_hits_guard_passes_inside_envelope(spark):
    edges = _chain_edges(spark, 100)
    out = hits(edges, n_iters=1, scale=2**28).collect()
    assert len(out) == 101
