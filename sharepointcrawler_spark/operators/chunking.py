"""Sliding-window document chunking (SURVEY.md §2.10).

The reference declares the chunking contract but delegates execution to
its ingest API: chunkSizeTokens=350 / overlapTokens=80 flow through
MainForm.cs:92 -> SharePointClient.cs:84-86; DTO defaults ChunkSize=1400
/ ChunkOverlap=300 (RagIngestDocument.cs:40-41); IngestChunk carries
ChunkIndex + Breadcrumbs (IngestChunk.cs:50-51). Here chunking is a
first-class operator: posexplode over a sequence of chunk starts +
substring — all JVM built-ins, one narrow projection, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference DTO defaults (RagIngestDocument.cs:40-41)
DEFAULT_CHUNK_CHARS = 1400
DEFAULT_OVERLAP_CHARS = 300


def chunk_text(
    docs: DataFrame,
    chunk_size: int = DEFAULT_CHUNK_CHARS,
    overlap: int = DEFAULT_OVERLAP_CHARS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_index, chunk) rows; stride = size - overlap; the last
    chunk may be shorter; empty/short docs yield exactly one chunk.
    ChunkIndex = position from posexplode (IngestChunk.cs:50)."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    n_chunks = F.greatest(
        F.ceil((F.length(F.col(text_col)) - F.lit(overlap)) / F.lit(stride)),
        F.lit(1),
    ).cast("int")
    return docs.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_index", "_i"),
        F.col(text_col),
    ).select(
        id_col,
        "chunk_index",
        F.substring(
            F.col(text_col), F.col("chunk_index") * stride + 1, chunk_size
        ).alias("chunk"),
    )


def chunk_tokens(
    docs: DataFrame,
    chunk_tokens_n: int = 350,
    overlap_tokens: int = 80,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-based variant (the 350/80 contract from MainForm.cs:92):
    whitespace tokens, window = slice over the split array, re-joined."""
    if overlap_tokens >= chunk_tokens_n:
        raise ValueError("overlap must be < chunk size")
    stride = chunk_tokens_n - overlap_tokens
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.greatest(
        F.ceil((F.size(toks) - F.lit(overlap_tokens)) / F.lit(stride)), F.lit(1)
    ).cast("int")
    return docs.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_index", "_i"),
        toks.alias("_toks"),
    ).select(
        id_col,
        "chunk_index",
        F.concat_ws(
            " ",
            F.slice(F.col("_toks"), F.col("chunk_index") * stride + 1, chunk_tokens_n),
        ).alias("chunk"),
    )
