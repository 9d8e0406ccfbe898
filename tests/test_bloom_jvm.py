"""JVM broadcast bloom probe == cogroup numpy probe, bit for bit.

The broadcast path recomputes splitmix64 double hashing in DECIMAL(38)
modular arithmetic (Spark 4 ANSI mode forbids wrapping longs) and
tests bits with substring/hex/conv expressions; any deviation in hash,
signedness handling (url_keys are xxhash64 outputs, so half are
negative) or bit order flips a membership answer somewhere in a few
thousand random keys.
"""

import random

import pytest
from pyspark.sql import functions as F

from sharepointcrawler_spark.operators import dedup as dd


@pytest.fixture(scope="module")
def spark():
    from sharepointcrawler_spark.session import get_spark

    return get_spark(app_name="test_bloom_jvm", cpus=4, shuffle_partitions=4)


def test_bloom_probe_jvm_matches_cogroup(spark):
    rng = random.Random(0xB100F)
    n_shards = 8
    geometry = dd.bloom_params(200, 0.01)
    seen_keys = [rng.randint(-(2**63), 2**63 - 1) for _ in range(1200)]
    seen = spark.createDataFrame([(k,) for k in seen_keys], "url_key long")
    shards = dd.build_bloom_shards(seen, n_shards=n_shards, geometry=geometry)

    # half members (true positives), half random (mostly negatives +
    # whatever false positives the filter produces — both paths must
    # agree on those too)
    probe_keys = seen_keys[:600] + [
        rng.randint(-(2**63), 2**63 - 1) for _ in range(600)
    ]
    cand = spark.createDataFrame([(k,) for k in probe_keys], "url_key long")

    via_cogroup = {
        r["url_key"]: r["maybe_seen"]
        for r in dd.bloom_probe(cand, shards, n_shards=n_shards).collect()
    }
    via_jvm = {
        r["url_key"]: r["maybe_seen"]
        for r in dd.bloom_probe_broadcast(
            cand, shards, n_shards=n_shards, geometry=geometry
        ).collect()
    }
    assert via_jvm == via_cogroup
    # sanity: every member is maybe_seen on both paths (no false negatives)
    assert all(via_jvm[k] for k in seen_keys[:600])
    # plan shape: the broadcast path must not shuffle the candidates or
    # cross into Python
    plan = (
        dd.bloom_probe_broadcast(cand, shards, n_shards=n_shards, geometry=geometry)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "FlatMapCoGroupsInPandas" not in plan


def test_bloom_probe_gate_prefers_cogroup_above_limit(spark):
    """A geometry over the broadcast byte limit must keep the cogroup
    path (the scale-safe co-partitioned shape)."""
    cand = spark.createDataFrame([(1,)], "url_key long")
    shards = spark.createDataFrame([], dd.BLOOM_SHARD_SCHEMA)
    big_geometry = (dd.BLOOM_BROADCAST_LIMIT_BYTES * 8 + 8, 3)  # one shard over
    df = dd.bloom_probe(cand, shards, n_shards=1, geometry=big_geometry)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan


def test_bloom_probe_broadcast_missing_shard_rows(spark):
    """Candidates whose shard has no bitset yet are definitely unseen."""
    geometry = dd.bloom_params(64, 0.01)
    seen = spark.createDataFrame([(0,), (4,)], "url_key long")  # shard 0 only
    shards = dd.build_bloom_shards(seen, n_shards=4, geometry=geometry)
    cand = spark.createDataFrame([(0,), (1,), (2,), (3,)], "url_key long")
    got = {
        r["url_key"]: r["maybe_seen"]
        for r in dd.bloom_probe_broadcast(cand, shards, 4, geometry).collect()
    }
    assert got[0] is True  # member, shard exists
    assert got[1] is False and got[2] is False and got[3] is False
