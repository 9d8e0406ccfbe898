"""Ingest payload assembly (SURVEY.md §2.1 S5, §2.10) — the declared
contract the reference ships to its ingest API, materialized as a
first-class operator.

Reference shape: RagIngestDocument (RagIngestDocument.cs:10-50) /
IngestChunk (Foundation/Models/IngestChunk.cs) — per-chunk rows carrying
title/org/category metadata, base64 ContentBytes OR markdown TextContent,
ChunkSize/ChunkOverlap/ChunkIndex (defaults 1400/300 from
RagIngestDocument.cs:40-41; the crawler passes 350/80 tokens at
MainForm.cs:92), Breadcrumbs (IngestChunk.cs), collection name, and the
Domain='MS Documents' / AllowedGroups=['AllEmployees'] defaults.

Spark realization: chunk the extracted markdown (operators/chunking),
attach metadata + breadcrumbs (= heading path of the chunk's first
heading), serialize with ``to_json``. The network POST (multipart form,
SharePointClient.cs:449-462) is a deployment concern: at scale the
payload DataFrame is written to the ingest topic/table, or shipped via
``foreachPartition`` with a per-executor connection pool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sharepointcrawler_spark.operators.chunking import chunk_text

DEFAULT_DOMAIN = "MS Documents"
DEFAULT_ALLOWED_GROUPS = ["AllEmployees"]
DEFAULT_COLLECTION = "docs_v2"


def breadcrumb_of_chunk(chunk_col) -> F.Column:
    """Breadcrumb = first markdown heading inside the chunk (e.g.
    '6.0 Process'), else empty — the 'Telecommuting Process' example in
    IngestChunk.cs. JVM regex, no Python."""
    c = F.col(chunk_col) if isinstance(chunk_col, str) else chunk_col
    return F.regexp_extract(c, r"(?m)^#{1,6}\s+(.+)$", 1)


def assemble_ingest_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    title_col: str | None = None,
    chunk_size: int = 1400,
    chunk_overlap: int = 300,
    collection: str = DEFAULT_COLLECTION,
    persist: bool = False,
) -> DataFrame:
    """documents -> one IngestChunk-shaped row per chunk."""
    chunks = chunk_text(docs, chunk_size, chunk_overlap, text_col, id_col)
    if title_col is not None:
        chunks = chunks.join(
            docs.select(id_col, F.col(title_col).alias("title")), id_col, "left"
        )
    else:
        chunks = chunks.withColumn("title", F.lit(None).cast("string"))
    return chunks.select(
        F.col(id_col),
        "title",
        F.col("chunk_index").alias("ChunkIndex"),
        F.lit(chunk_size).alias("ChunkSize"),
        F.lit(chunk_overlap).alias("ChunkOverlap"),
        F.col("chunk").alias("TextContent"),
        F.base64(F.encode("chunk", "utf-8")).alias("ContentBytes"),
        breadcrumb_of_chunk("chunk").alias("Breadcrumbs"),
        F.lit(collection).alias("collection"),
        F.lit(persist).alias("persist"),
        F.lit(DEFAULT_DOMAIN).alias("Domain"),
        F.array(*[F.lit(g) for g in DEFAULT_ALLOWED_GROUPS]).alias("AllowedGroups"),
    )


def assemble_ingest_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    title_col: str | None = None,
    chunk_size: int = 1400,
    chunk_overlap: int = 300,
    collection: str = DEFAULT_COLLECTION,
    keywords: list[str] | None = None,
) -> DataFrame:
    """The document-level RagIngestDocument DTO (RagIngestDocument.cs:10-50):
    doc metadata + ``Chunks: List<IngestChunk>`` nested in ONE row per
    document. Chunk defaults (1400/300, RagIngestDocument.cs:40-41) and
    the Domain/'AllEmployees' defaults (:28-33) thread through.

    Spark shape: the per-chunk rows of :func:`assemble_ingest_chunks`
    collapse via ``collect_list(struct(...))`` (one shuffle on doc id,
    map-side partial agg) and ``array_sort`` restores ChunkIndex order —
    ``ArrayType(StructType)``, serialized by :func:`ingest_document_json`.
    """
    chunks = assemble_ingest_chunks(
        docs, text_col, id_col, title_col, chunk_size, chunk_overlap, collection
    )
    nested = chunks.groupBy(id_col, "title").agg(
        F.array_sort(
            F.collect_list(
                F.struct("ChunkIndex", "TextContent", "ContentBytes", "Breadcrumbs")
            )
        ).alias("Chunks")
    )
    kw = keywords or []
    return nested.select(
        F.col(id_col),
        F.coalesce(F.col("title"), F.lit("")).alias("Title"),
        F.lit(DEFAULT_DOMAIN).alias("Domain"),
        F.lit(collection).alias("Collection"),
        F.lit(chunk_size).alias("ChunkSize"),
        F.lit(chunk_overlap).alias("ChunkOverlap"),
        F.array(*[F.lit(k) for k in kw]).cast("array<string>").alias("Keywords"),
        # wire name: the Foundation DTO declares
        # [JsonPropertyName("allowed_groups")] (RagIngestDocument.cs:34),
        # so the document-level envelope serializes snake_case here (the
        # chunk-level AllowedGroups has no attribute and stays PascalCase)
        F.array(*[F.lit(g) for g in DEFAULT_ALLOWED_GROUPS]).alias("allowed_groups"),
        F.col("Chunks"),
    )


def ingest_document_json(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Serialize each RagIngestDocument row to the JSON body the ingest
    API receives — ``to_json`` over the nested struct (chunks included)."""
    payload_cols = [c for c in documents.columns if c != id_col]
    return documents.select(
        F.col(id_col), F.to_json(F.struct(*payload_cols)).alias("payload")
    )


def ingest_payload_json(chunks: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Serialize each chunk row to the JSON body the ingest API receives
    (IngestJsonPayload analog) — ``to_json`` over the struct."""
    payload_cols = [c for c in chunks.columns if c != id_col]
    return chunks.select(
        F.col(id_col),
        F.col("ChunkIndex"),
        F.to_json(F.struct(*payload_cols)).alias("payload"),
    )
