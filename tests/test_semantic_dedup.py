"""SemDeDup semantics over hand-built vectors: keep-min-id within a
cell, cross-cell pairs untouched, scaled copies treated as duplicates.
DuckDB parity for the planted-twin fixture: dedup_semantic entry."""

from __future__ import annotations

import numpy as np

from sharepointcrawler_spark.operators.similarity import semantic_dedup


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _centroids():
    # two orthogonal cells
    return np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])


def test_keep_min_id_within_cell(spark):
    corpus = _df(
        spark,
        [
            (1, [1.0, 0.05, 0.0]),
            (2, [2.0, 0.1, 0.0]),  # scaled copy of 1 -> dup
            (3, [0.0, 1.0, 0.0]),  # other cell, untouched
            (4, [1.0, -0.05, 0.0]),  # same cell as 1 but cos ~0.995? keep low threshold check below
        ],
    )
    out = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(corpus, _centroids(), threshold=0.999).collect()
    }
    assert out == {1: True, 2: False, 3: True, 4: True}


def test_transitive_chain_keeps_smallest(spark):
    corpus = _df(
        spark,
        [
            (10, [1.0, 0.0, 0.0]),
            (11, [2.0, 0.0, 0.0]),
            (12, [4.0, 0.0, 0.0]),
        ],
    )
    out = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(corpus, _centroids(), threshold=0.99).collect()
    }
    assert out == {10: True, 11: False, 12: False}


def test_cross_cell_identical_direction_not_compared(spark):
    """Cell blocking is the contract: a pair split across cells is
    never scored (that is WHY SemDeDup scales) — centroid choice
    controls recall, the operator only promises within-cell dedup."""
    corpus = _df(
        spark,
        [
            (1, [1.0, 0.9, 0.0]),  # cell 0 (x-axis closer)
            (2, [0.9, 1.0, 0.0]),  # cell 1 — cosine ~0.994 but different cells
        ],
    )
    out = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(corpus, _centroids(), threshold=0.99).collect()
    }
    assert out == {1: True, 2: True}
