"""The reference user's end-to-end workflow in one call (SURVEY §3.1-3.2):
crawl the tree -> fetch -> byte-identity extract -> chunk -> assemble the
RagIngestDocument envelope -> post to the ingest sink with per-row status
lineage. This is the switchover surface: MainForm "Start" -> this.

Reference flow: MainForm.cs:94-133 drives GetDocumentsAsync per folder,
each document is converted (PdfToMarkdownConverter) and uploaded
(SendToExternalApiAsync) sequentially. Here the crawl is the wave loop
(plans/crawl.py), extraction is one fused Arrow UDF pass over fetched
pages, and the upload is a partition-parallel status sink — failures
become error rows (ErrorLogger semantics), never aborts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sharepointcrawler_spark.extraction.udfs import (
    extract_text_udf,
    pages_expander,
    pages_fetch_probe,
)
from sharepointcrawler_spark.functions.urlnorm import canonicalize_url
from sharepointcrawler_spark.operators import frontier as fr
from sharepointcrawler_spark.operators.ingest import (
    assemble_ingest_documents,
    ingest_document_json,
)
from sharepointcrawler_spark.plans.crawl import (
    CrawlConfig,
    CrawlResult,
    crawl_order,
    run_crawl,
)
from sharepointcrawler_spark.plans.sinks import sink_with_status
from sharepointcrawler_spark.plans.snapshot import SnapshotStore


@dataclass
class PipelineResult:
    crawl: CrawlResult
    documents: DataFrame  # RagIngestDocument envelope rows
    statuses: DataFrame | None  # per-document sink status (None if no sink)
    # content-digest outcomes (url_canon, content_digest, status, changed)
    # when content_dedup was requested; the digest store for the NEXT
    # crawl and the `changed` feed for the recrawl history
    content_outcomes: DataFrame | None = None


def crawl_extract_ingest(
    spark: SparkSession,
    store: SnapshotStore,
    pages: DataFrame,
    seeds: list[tuple[str, int]],
    config: CrawlConfig | None = None,
    robots_df: DataFrame | None = None,
    chunk_size: int = 1400,
    chunk_overlap: int = 300,
    collection: str = "docs_v2",
    sink_target: str | None = "stub://ingest",
    make_payload=None,
    resume: bool = False,
    respect_meta_robots: bool = False,
    content_dedup: bool = False,
    prior_content_digests: DataFrame | None = None,
) -> PipelineResult:
    """Crawl from ``seeds`` over the ``pages`` corpus, extract markdown for
    every FETCHED url (byte-identity contract), assemble one
    RagIngestDocument per page and post it.

    The extraction join is pages ⋈ fetched-frontier on canonical url —
    at scale the pages side is the fact table and the fetched set the
    (often broadcastable) filter; column pruning keeps only
    (url, url_canon, html) flowing into the Arrow UDF."""
    res = run_crawl(
        spark,
        store,
        pages_expander(pages, respect_nofollow=respect_meta_robots),
        seeds=seeds,
        robots_df=robots_df,
        config=config,
        resume=resume,
        fetch_probe=pages_fetch_probe(pages),
    )
    fetched = res.frontier.filter(F.col("state") == fr.FETCHED).select(
        "url_canon", "url_key"
    )
    keyed = pages.select(
        canonicalize_url("url").alias("url_canon"), "url", "html"
    )
    docs = keyed.join(fetched, "url_canon", "left_semi")
    if respect_meta_robots:
        # page-side directives (P9): noindex pages are crawled (their
        # links may be followed) but never ingested; canonical
        # duplicates collapse to ONE envelope row — the declared
        # canonical page when it was fetched, else the first spelling.
        from pyspark.sql import Window

        from sharepointcrawler_spark.functions.htmlmeta import (
            effective_canonical,
            html_meta_columns,
        )

        flagged = html_meta_columns(
            docs.withColumn("_html_str", F.col("html").cast("string")),
            html_col="_html_str",
        ).drop("_html_str")
        flagged = flagged.filter(~F.col("noindex")).withColumn(
            "_eff",
            effective_canonical(
                F.col("url_canon"), canonicalize_url(F.col("canonical_href"))
            ),
        )
        w = Window.partitionBy("_eff").orderBy(
            (F.col("url_canon") != F.col("_eff")).cast("int"), F.col("url_canon")
        )
        docs = (
            flagged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_eff", "canonical_href", "meta_robots", "noindex", "nofollow")
        )
    content_outcomes = None
    if content_dedup:
        # content-digest seen set (Heritrix-style): mirrors — same bytes,
        # unrelated URLs — collapse to the FIRST-crawled copy; pages whose
        # digest matches the previous crawl's store skip re-ingestion.
        # Crawl order comes from the frontier ranking (one narrow join);
        # the digest windows over (digest, crawl_seq) only — html stays put.
        from sharepointcrawler_spark.operators.contentseen import (
            content_seen_outcomes,
        )

        seq = crawl_order(res.frontier).select("url_canon", "crawl_seq")
        content_outcomes = content_seen_outcomes(
            docs.join(seq, "url_canon", "left"),
            prior_content_digests,
            content_col="html",
            order_cols=("crawl_seq", "url_canon"),
        )
        docs = content_outcomes.filter(
            ~F.col("status").isin("dup_in_crawl", "unchanged")
        ).drop("crawl_seq", "status", "changed", "content_digest")
        content_outcomes = content_outcomes.select(
            "url_canon", "content_digest", "status", "changed"
        )
    extracted = docs.select(
        F.xxhash64("url_canon").alias("doc_id"),
        F.col("url").alias("title"),
        extract_text_udf(F.col("html"), F.col("url")).alias("text"),
    )
    envelope = assemble_ingest_documents(
        extracted,
        title_col="title",
        chunk_size=chunk_size,
        chunk_overlap=chunk_overlap,
        collection=collection,
    )
    statuses = None
    if sink_target is not None:
        payloads = ingest_document_json(envelope)
        statuses = sink_with_status(
            payloads, sink_target, make_payload, id_cols=["doc_id"]
        )
    return PipelineResult(
        crawl=res,
        documents=envelope,
        statuses=statuses,
        content_outcomes=content_outcomes,
    )
