"""Bucketed-layout co-location (plans/layout.py): a matched bucketed
join plans with ZERO Exchange; a mismatched or path-read join brings
the shuffle back; values are identical either way."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sharepointcrawler_spark.plans.layout import (
    exchange_count,
    read_table,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _tables(spark, tmp_path, nb_left=8, nb_right=8):
    left = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("a")
    )
    right = spark.range(0, 2000, 2).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("b")
    )
    write_bucketed(left, "t_left", ["k"], nb_left,
                   path=str(tmp_path / "l"), sort_cols=["k"])
    write_bucketed(right, "t_right", ["k"], nb_right,
                   path=str(tmp_path / "r"), sort_cols=["k"])
    return left, right


def test_matched_buckets_join_without_exchange(spark, tmp_path, no_broadcast):
    left, right = _tables(spark, tmp_path)
    j = read_table(spark, "t_left").join(read_table(spark, "t_right"), "k")
    rows = j.count()
    assert rows == 1000
    assert exchange_count(j) == 0  # co-located: no shuffle either side
    # identical values to the shuffled baseline
    base = left.join(right, "k")
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, base.collect()))
    spark.sql("DROP TABLE t_left"); spark.sql("DROP TABLE t_right")


def test_mismatched_buckets_shuffle_returns(spark, tmp_path, no_broadcast):
    _tables(spark, tmp_path, nb_left=8, nb_right=4)
    j = read_table(spark, "t_left").join(read_table(spark, "t_right"), "k")
    j.count()
    # one side (at most) can reuse its layout; a shuffle must appear
    assert exchange_count(j) >= 1
    spark.sql("DROP TABLE t_left"); spark.sql("DROP TABLE t_right")


def test_path_read_loses_layout(spark, tmp_path, no_broadcast):
    _tables(spark, tmp_path)
    j = spark.read.parquet(str(tmp_path / "l")).join(
        spark.read.parquet(str(tmp_path / "r")), "k"
    )
    j.count()
    assert exchange_count(j) >= 2  # both sides shuffle: metadata lost
    spark.sql("DROP TABLE t_left"); spark.sql("DROP TABLE t_right")


def test_write_bucketed_validates(spark):
    with pytest.raises(ValueError):
        write_bucketed(spark.range(1), "t_bad", ["id"], 0)
