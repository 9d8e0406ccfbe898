"""Similarity search over embedding columns (``array<float>``).

Two paths, as a training-data pipeline needs both:

* brute-force cosine top-k — the exact baseline. The query side is tiny
  and broadcast; the corpus side streams through one pass; per-query
  top-k via window rank on (score desc, id). All vector math is
  ``zip_with`` + ``aggregate`` (JVM-side, codegen) — no Python.
* LSH-bucketed ANN — random-hyperplane signatures (seeded, broadcast
  numpy matrix inside a pandas UDF, one Arrow batch per call) bucket
  the corpus; a query only meets its own bucket (plus optional
  multi-probe neighbors). The scale path: the join key is the bucket,
  so the shuffle is |corpus| + |queries|, never |corpus| x |queries|.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cosine_sim(a, b):
    """Cosine similarity of two array columns — built-ins only."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors per query. Queries broadcast; one corpus
    scan; rank ties broken by neighbor id for determinism."""
    q = queries.select(
        F.col(query_id_col), F.col(query_vec_col).cast("array<double>").alias("_qv")
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv"))
    scored = c.join(F.broadcast(q)).withColumn("score", cosine_sim(F.col("_cv"), F.col("_qv")))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, F.round("score", 6).alias("score"))
    )


# per-executor plane cache: one matrix per (dim, n_planes, seed), not
# one per Arrow batch
_PLANES_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    key = (dim, n_planes, seed)
    planes = _PLANES_CACHE.get(key)
    if planes is None:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, n_planes))
        _PLANES_CACHE[key] = planes
    return planes


def lsh_bucket_udf(dim: int, n_planes: int = 12, seed: int = 7):
    """Pandas UDF: embedding -> random-hyperplane bucket id (int).
    One matmul per Arrow batch (vectorized); planes generated ONCE per
    executor from the seed (module-level cache — cheaper than
    broadcasting the matrix, and never per-batch)."""
    @F.pandas_udf(T.IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:  # pragma: no cover
        planes = _hyperplanes(dim, n_planes, seed)
        mat = np.stack(vecs.to_numpy())
        bits = (mat @ planes) > 0
        vals = (bits * (1 << np.arange(n_planes))).sum(axis=1)
        return pd.Series(vals.astype("int32"))

    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """ANN top-k: corpus and queries bucketed by the same hyperplanes;
    exact cosine within the shared bucket only. Approximate: recall
    depends on n_planes (fewer planes => bigger buckets => higher
    recall, more compute)."""
    bucket = lsh_bucket_udf(dim, n_planes)
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_cv"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col).cast("array<double>").alias("_qv"),
        bucket(F.col(query_vec_col)).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").withColumn(
        "score", cosine_sim(F.col("_cv"), F.col("_qv"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, F.round("score", 6).alias("score"))
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.98,
    dim: int = 64,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vectors: LSH self-join (same bucket) + exact
    cosine >= threshold. The all-pairs version of lsh_topk; near-dups
    at cosine ~1 collide in the same bucket with high probability."""
    bucket = lsh_bucket_udf(dim, n_planes)
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    a = c.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), "bucket")
    b = c.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("score", cosine_sim(F.col("_va"), F.col("_vb")))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", F.round("score", 6).alias("score"))
    )
