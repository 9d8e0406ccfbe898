"""Streaming admission control (streaming/incremental.py
curation_stream): arriving files are curated exactly once, admits and
rejects split with audit flags, restart processes only new arrivals."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

GOOD = (
    "this is a perfectly ordinary english sentence with many common words.\n"
    "the second line also ends with proper punctuation and enough words.\n"
    "a third retained line keeps the c4 gate satisfied for this page."
)
BAD = "lorem ipsum dolor sit amet right here today.\n" + GOOD


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_admits_and_rejects(spark, tmp_path):
    from sharepointcrawler_spark.streaming.incremental import curation_stream

    watch = str(tmp_path / "in")
    out = str(tmp_path / "out")
    rej = str(tmp_path / "rej")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)
    _write_batch(spark, watch, [(1, GOOD), (2, BAD)])
    q = curation_stream(spark, watch, out, ckpt, reject_dir=rej)
    q.awaitTermination(120)

    kept = spark.read.parquet(out)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    r = kept.first()
    assert "lorem" not in r["curated_text"]
    rej_rows = {x["doc_id"]: x for x in spark.read.parquet(rej).collect()}
    assert rej_rows[2]["flag_c4"] is True

    # second wave: a restart with availableNow processes ONLY the new file
    _write_batch(spark, watch, [(3, GOOD), (4, "short words only here.")])
    q2 = curation_stream(spark, watch, out, ckpt, reject_dir=rej)
    q2.awaitTermination(120)
    kept2 = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept2 == [1, 3]  # doc 1 NOT re-admitted (exactly-once)
    rej2 = sorted(r["doc_id"] for r in spark.read.parquet(rej).collect())
    assert rej2 == [2, 4]
