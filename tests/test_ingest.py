"""Ingest payload assembly over real extracted markdown (S5/§2.10)."""

from __future__ import annotations

import base64
import json
import random

from pyspark.sql import functions as F

from sharepointcrawler_spark.operators.ingest import (
    assemble_ingest_chunks,
    ingest_payload_json,
)
from sharepointcrawler_spark.sources.pages import expected_markdown, make_doc_spec


def test_ingest_chunks_over_markdown(spark):
    specs = [make_doc_spec(i, random.Random(42)) for i in range(3)]
    docs = spark.createDataFrame(
        [(i, expected_markdown(s), s.title) for i, s in enumerate(specs)],
        "doc_id long, text string, title string",
    )
    chunks = assemble_ingest_chunks(
        docs, chunk_size=300, chunk_overlap=60, title_col="title"
    ).cache()
    rows = chunks.orderBy("doc_id", "ChunkIndex").collect()
    # base64 decodes back to the chunk text
    for r in rows:
        assert base64.b64decode(r.ContentBytes).decode() == r.TextContent
    # breadcrumbs pick up a real heading where one exists in the chunk
    crumbs = {r.Breadcrumbs for r in rows}
    assert any(c.startswith(("1.0", "2.0", "4.0", "6.0", "7.0")) for c in crumbs if c)
    # DTO defaults ride along
    assert all(r.Domain == "MS Documents" for r in rows)
    assert all(r.AllowedGroups == ["AllEmployees"] for r in rows)
    assert all(r.ChunkSize == 300 and r.ChunkOverlap == 60 for r in rows)

    # JSON payload round-trips and carries the contract keys
    payloads = ingest_payload_json(chunks).collect()
    body = json.loads(payloads[0].payload)
    for key in ("ChunkIndex", "TextContent", "ContentBytes", "Breadcrumbs",
                "collection", "Domain", "AllowedGroups"):
        assert key in body


def test_sink_failure_lineage(spark):
    """A poisoned payload yields an error STATUS row (ErrorLogger.cs:17-28
    catch-log-skip) and never aborts the partition."""
    from sharepointcrawler_spark.plans.sinks import foreach_partition_sink, sink_with_status

    df = spark.createDataFrame(
        [(i, f"payload-{i}") for i in range(20)], "doc_id long, body string"
    ).repartition(4)

    def make_payload(row):
        if row["doc_id"] % 7 == 3:
            raise ValueError(f"poisoned row {row['doc_id']}")
        return row

    status = sink_with_status(df, "stub://ingest", make_payload, id_cols=["doc_id"])
    rows = status.collect()
    assert len(rows) == 20  # every row has a status — partition completed
    failed = {r.doc_id for r in rows if not r.ok}
    assert failed == {3, 10, 17}
    assert all("poisoned row" in r.error for r in rows if not r.ok)
    assert all(r.error is None for r in rows if r.ok)

    # eager wrapper counts failures instead of swallowing them
    counts = foreach_partition_sink(df, "stub://ingest", make_payload, id_cols=["doc_id"])
    assert counts == {"total": 20, "failed": 3}


def test_ingest_document_envelope(spark):
    """Document-level RagIngestDocument DTO: nested Chunks list ordered by
    ChunkIndex, doc-level defaults, to_json serialization round-trip."""
    from sharepointcrawler_spark.operators.ingest import (
        assemble_ingest_documents,
        ingest_document_json,
    )

    specs = [make_doc_spec(i, random.Random(42)) for i in range(3)]
    docs = spark.createDataFrame(
        [(i, expected_markdown(s), s.title) for i, s in enumerate(specs)],
        "doc_id long, text string, title string",
    )
    env = assemble_ingest_documents(
        docs, chunk_size=300, chunk_overlap=60, title_col="title",
        keywords=["procedure", "sop"],
    ).cache()
    rows = {r.doc_id: r for r in env.collect()}
    assert len(rows) == 3
    for i, s in enumerate(specs):
        r = rows[i]
        assert r.Title == s.title
        assert r.Domain == "MS Documents"
        assert r.ChunkSize == 300 and r.ChunkOverlap == 60
        assert r.Keywords == ["procedure", "sop"]
        # document-level wire name is snake_case per the Foundation DTO's
        # [JsonPropertyName("allowed_groups")] (RagIngestDocument.cs:34)
        assert r.allowed_groups == ["AllEmployees"]
        # chunks nested, in ChunkIndex order, round-tripping the text
        idxs = [c.ChunkIndex for c in r.Chunks]
        assert idxs == list(range(len(idxs)))
        for c in r.Chunks:
            assert base64.b64decode(c.ContentBytes).decode() == c.TextContent

    body = json.loads(ingest_document_json(env).collect()[0].payload)
    for key in ("Title", "Domain", "Collection", "ChunkSize", "ChunkOverlap",
                "Keywords", "allowed_groups", "Chunks"):
        assert key in body
    assert isinstance(body["Chunks"], list) and body["Chunks"]
    assert {"ChunkIndex", "TextContent", "ContentBytes", "Breadcrumbs"} <= set(body["Chunks"][0])


def test_upload_response_contract(spark):
    """UploadResponse parse (UploadResponse.cs / SharePointClient.cs:473-476):
    the sink's response body decodes to the typed DTO."""
    from pyspark.sql import functions as F

    from sharepointcrawler_spark.plans.sinks import (
        parse_ingest_upload_response,
        parse_upload_response,
        sink_with_status,
    )

    df = spark.createDataFrame(
        [(i, f"https://site/doc{i}") for i in range(6)], "doc_id long, source_url string"
    )
    status = sink_with_status(
        df, "stub://upload", lambda row: {"source_url": row["source_url"]},
        id_cols=["doc_id"],
    )
    parsed = status.select(
        "doc_id", parse_upload_response("response").alias("r")
    ).select("doc_id", "r.document_id", "r.message", "r.source_url")
    rows = {r.doc_id: r for r in parsed.collect()}
    assert len(rows) == 6
    assert all(r.message == "ok" and len(r.document_id) == 12 for r in rows.values())
    assert rows[2].source_url == "https://site/doc2"

    # IngestUploadResponse shape (IngestUploadResponse.cs:12-23)
    body = '{"status":"ok","doc_id":"abc","chunks":7,"reason":null,"category":"HR","keywords":["badge","policy"]}'
    one = spark.createDataFrame([(body,)], "body string").select(
        parse_ingest_upload_response("body").alias("r")
    ).select("r.*").collect()[0]
    assert one.status == "ok" and one.doc_id == "abc" and one.chunks == 7
    assert one.keywords == ["badge", "policy"] and one.category == "HR"
