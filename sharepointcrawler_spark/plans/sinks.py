"""Pluggable result sinks (SURVEY.md §2.12).

The reference's extension point is ``SendToExternalApiAsync`` — a
protected virtual method subclasses override to change where documents
go (SharePointClient.cs:35-37,405; README.md:41). The Spark analog is a
sink stage applied per partition with a per-executor connection pool
(the reference churns one HttpClient per upload, :442 — the pool fixes
exactly that).

In this sandbox no network leaves the box, so the HTTP sink is a
deterministic stub recording what WOULD be posted; the parquet/console
sinks are real. The contract mirrors the reference's catch-log-skip
(SharePointClient.cs:283-293 + ErrorLogger.cs:17-28): a failing row
never aborts its partition, and every failure surfaces as a STATUS ROW
(ok=false + error message) that the caller routes to the errors table —
failures are lineage, never silently swallowed.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# response contracts of the two ingest endpoints, mirroring the
# reference DTOs (snake_case wire names per their JsonPropertyName
# attributes; the reference parses case-insensitively,
# SharePointClient.cs:473-476 — the wire format itself is snake_case):
# UploadResponse.cs (/upload-document) and IngestUploadResponse.cs
UPLOAD_RESPONSE_SCHEMA = "struct<document_id:string, message:string, source_url:string>"
INGEST_UPLOAD_RESPONSE_SCHEMA = (
    "struct<status:string, doc_id:string, chunks:int, reason:string, "
    "category:string, keywords:array<string>>"
)


def parse_upload_response(body: Column | str) -> Column:
    """Typed UploadResponse from the /upload-document body
    (UploadResponse.cs:10-18): (document_id, message, source_url)."""
    c = F.col(body) if isinstance(body, str) else body
    return F.from_json(c, UPLOAD_RESPONSE_SCHEMA)


def parse_ingest_upload_response(body: Column | str) -> Column:
    """Typed IngestUploadResponse (IngestUploadResponse.cs:12-23):
    (status, doc_id, chunks, reason, category, keywords)."""
    c = F.col(body) if isinstance(body, str) else body
    return F.from_json(c, INGEST_UPLOAD_RESPONSE_SCHEMA)


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

    def post(self, payload: Any) -> str:
        # STUB: a real deployment does pooled HTTP here (multipart form
        # with file bytes + source_url, SharePointClient.cs:449-462) and
        # returns the response body. The stub answers a deterministic
        # UploadResponse-shaped body so the parse contract is exercised.
        self.sent += 1
        # deterministic, structure-faithful stub id: key-ordered JSON for
        # dicts, plain str otherwise (anagram payloads must NOT collide)
        if isinstance(payload, dict):
            rep = json.dumps(payload, sort_keys=True, default=str)
        else:
            rep = str(payload)
        doc_id = hashlib.md5(rep.encode()).hexdigest()[:12]
        source_url = ""
        if isinstance(payload, dict):
            source_url = str(payload.get("source_url", ""))
        return json.dumps(
            {"document_id": doc_id, "message": "ok", "source_url": source_url}
        )


def sink_with_status(
    df: DataFrame,
    target: str,
    make_payload: Callable[[dict], Any] | None = None,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Post every row to the sink, returning a per-row STATUS DataFrame
    ``(id_cols..., ok boolean, error string)``.

    Executed as one ``mapInPandas`` pass: one connection pool per
    executor, rows posted sequentially within a partition (per-partition
    ordering preserved — politeness slots were assigned upstream). A row
    whose payload raises yields ``ok=false`` with the exception message —
    the reference's catch-log-skip (SharePointClient.cs:283-293) with the
    ErrorLogger lineage (ErrorLogger.cs:17-28) — and the partition
    continues. Route ``filter(~ok)`` to the errors table (S6).
    """
    id_cols = id_cols or [df.columns[0]]
    payload_fn = make_payload or (lambda row: row)
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name in id_cols]
        + [
            T.StructField("ok", T.BooleanType(), False),
            T.StructField("error", T.StringType(), True),
            T.StructField("response", T.StringType(), True),
        ]
    )

    def send(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pool = ConnectionPool.get(target)
        for pdf in batches:
            oks: list[bool] = []
            errs: list[str | None] = []
            bodies: list[str | None] = []
            for row in pdf.to_dict("records"):
                try:
                    bodies.append(pool.post(payload_fn(row)))
                    oks.append(True)
                    errs.append(None)
                except Exception as exc:  # catch-log-skip, as status row
                    bodies.append(None)
                    oks.append(False)
                    errs.append(f"{type(exc).__name__}: {exc}")
            out = pdf[id_cols].copy()
            out["ok"] = oks
            out["error"] = errs
            out["response"] = bodies
            yield out

    return df.mapInPandas(send, out_schema)


def foreach_partition_sink(
    df: DataFrame,
    target: str,
    make_payload: Callable[[dict], Any] | None = None,
    id_cols: list[str] | None = None,
) -> dict:
    """Eager convenience wrapper over :func:`sink_with_status`: runs the
    sink and returns aggregate counts. Failures are COUNTED (and
    retrievable via sink_with_status), never silently dropped."""
    status = sink_with_status(df, target, make_payload, id_cols)
    agg = status.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("ok"), 0).otherwise(1)).alias("failed"),
    ).collect()[0]
    return {"total": int(agg["total"] or 0), "failed": int(agg["failed"] or 0)}


def parquet_sink(df: DataFrame, path: str, mode: str = "append") -> None:
    """The Iceberg-append analog in the sandbox (S5 'df.writeTo')."""
    df.write.mode(mode).parquet(path)
