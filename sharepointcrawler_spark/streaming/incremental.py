"""Structured Streaming incremental crawl mode (SURVEY.md §2.11).

The reference is a one-shot batch program whose only "streaming" is a
per-document progress callback marshalled to the UI thread
(ConsoleWindow.CompleteDocument, ConsoleWindow.cs:49-61; MainForm.cs:
107-133). There are no watermarks or event-time semantics to match —
the contract path is wave-based batch (plans/crawl.py).

This module adds the OPTIONAL streaming front-end a production crawler
wants: newly discovered pages arrive as a stream (here: parquet-file
arrival in a watched directory — the sandbox stand-in for a Kafka topic
of fetch results); ``foreachBatch`` applies the same wave logic —
canonicalize, dedup against the persistent seen table, extract, append
results + metrics — with exactly-once per-batch semantics via the
snapshot store's atomic commit.

Also included: a processing-time metrics stream (running counts/avgs
per event window), the streaming analog of A2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sharepointcrawler_spark.extraction.udfs import extract_text_udf
from sharepointcrawler_spark.functions.urlnorm import with_url_columns
from sharepointcrawler_spark.operators.dedup import anti_join_unseen
from sharepointcrawler_spark.sources.pages import PAGES_SCHEMA


def incremental_ingest(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    seen_table_dir: str,
):
    """readStream over arriving page files -> foreachBatch: dedup vs the
    persistent seen set, extract text, append results + update seen.

    Exactly-once: foreachBatch output goes to per-batch subdirectories;
    the streaming checkpoint makes batch replay idempotent (same
    batch_id -> overwrite the same subdir).
    """
    from pyspark.sql.types import _parse_datatype_string

    schema = _parse_datatype_string(PAGES_SCHEMA)
    stream = spark.readStream.schema(schema).parquet(watch_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        keyed = with_url_columns(batch_df)
        try:
            seen = spark.read.parquet(seen_table_dir)
        except Exception:
            seen = None
        fresh = anti_join_unseen(keyed, seen) if seen is not None else keyed
        # within-batch dedup (first occurrence wins)
        fresh = fresh.dropDuplicates(["url_key"])
        extracted = fresh.select(
            "url",
            "url_canon",
            "url_key",
            "host",
            "warc_ts",
            extract_text_udf(F.col("html"), F.col("url")).alias("text_md"),
        )
        # idempotent per-batch append: a replayed batch overwrites its own dir
        extracted.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
        fresh.select("url_key", "url_canon").write.mode("overwrite").parquet(
            f"{seen_table_dir}/batch={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def metrics_stream(spark: SparkSession, watch_dir: str):
    """Streaming A2: windowed count/avg of page sizes by host — the
    ConsoleWindow counters as a real stream (memory sink for tests)."""
    from pyspark.sql.types import _parse_datatype_string

    schema = _parse_datatype_string(PAGES_SCHEMA)
    stream = spark.readStream.schema(schema).parquet(watch_dir)
    agg = (
        with_url_columns(stream)
        .withWatermark("warc_ts", "1 hour")
        .groupBy(F.window("warc_ts", "10 minutes"), "host")
        .agg(
            F.count("*").alias("n_pages"),
            F.avg(F.length("html")).alias("avg_html_bytes"),
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("crawl_metrics")
        .trigger(availableNow=True)
        .start()
    )


def stateful_politeness_stream(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    default_delay_s: float = 1.0,
    delays: dict[str, float] | None = None,
):
    """Streaming T3 via ``applyInPandasWithState``: per-host virtual-clock
    fetch slots that stay MONOTONE across micro-batches.

    The batch engine ranks a whole wave at once (operators/politeness);
    a streaming crawler sees each host's URLs dribble in over many
    micro-batches, so the next free slot per host is CUSTOM STATE: a
    GroupState holding ``next_rank``, persisted in the streaming state
    store (checkpoint) — a restarted query resumes its virtual clocks
    with no slot reuse. Within a batch, a host's rows are ordered by
    (warc_ts, url_canon) for determinism.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import _parse_datatype_string

    delays_map = dict(delays or {})
    schema = _parse_datatype_string(PAGES_SCHEMA)
    out_schema = _parse_datatype_string(
        "host string, url_canon string, host_rank long, fetch_slot double"
    )
    state_schema = _parse_datatype_string("next_rank long")

    def assign(key, pdfs, state: GroupState):
        host = key[0]
        (next_rank,) = state.get if state.exists else (1,)
        delay = delays_map.get(host, default_delay_s)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["warc_ts", "url_canon"], kind="mergesort")
            n = len(pdf)
            ranks = list(range(next_rank, next_rank + n))
            next_rank += n
            yield pd.DataFrame(
                {
                    "host": [host] * n,
                    "url_canon": list(pdf["url_canon"]),
                    "host_rank": ranks,
                    "fetch_slot": [(r - 1) * delay for r in ranks],
                }
            )
        state.update((int(next_rank),))

    stream = spark.readStream.schema(schema).parquet(watch_dir)
    ranked = (
        with_url_columns(stream)
        .select("host", "url_canon", "warc_ts")
        .groupBy("host")
        .applyInPandasWithState(
            assign, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )
    return (
        ranked.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_metrics_parquet(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
):
    """Event-time windowed metrics with LATE-DATA semantics: append-mode
    windowed counts over a watermark. A window emits exactly once, when
    the watermark passes its end; rows arriving after that are DROPPED
    (never double-counted) — the contract a streaming crawl's metrics
    need to stay idempotent. Watermark state persists in the checkpoint
    across availableNow restarts."""
    from pyspark.sql.types import _parse_datatype_string

    schema = _parse_datatype_string("ts timestamp, host string, v double")
    stream = spark.readStream.schema(schema).parquet(watch_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "host")
        .agg(F.count("*").alias("n"), F.avg("v").alias("avg_v"))
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def curation_stream(
    spark: SparkSession,
    watch_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    reject_dir: str | None = None,
):
    """Streaming admission control for arriving documents: the batch
    curation gates (C4 line/page heuristics, language, quality, PII
    redaction — plans/curation.py stages 2-4) applied to a stream of
    (doc_id, text) parquet arrivals, with exactly-once per-batch file
    semantics.

    The per-row stages are stateless projections, so they run INSIDE
    the micro-batch with no state store; cross-document stages (exact
    dedup, decontamination) stay in the batch pipeline where they have
    a persistent seen side — the standard lambda split: admit cheap
    and stateless at the edge, reconcile stateful in the warehouse.
    Kept rows append to ``out_dir`` with ``curated_text``; rejects
    (with their flag columns) append to ``reject_dir`` when given —
    the flag-don't-drop audit trail, streamed.
    """
    from sharepointcrawler_spark.functions.c4 import c4_clean
    from sharepointcrawler_spark.functions.pii import with_pii_columns
    from sharepointcrawler_spark.functions.textanalysis import (
        lang_id,
        quality_score,
        token_count,
    )

    src = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 8)
        .parquet(watch_dir)
    )

    def _admit(batch_df: DataFrame, epoch_id: int) -> None:
        cur = c4_clean(batch_df, text_col="text")
        cur = (
            cur.withColumn("_ct", F.col("c4_kept_text"))
            .withColumn("lang_pred", lang_id(F.col("_ct")))
            .withColumn("quality", quality_score(F.col("_ct")))
            .withColumn("n_tokens", token_count(F.col("_ct")))
        )
        cur = with_pii_columns(cur, text_col="_ct").withColumnRenamed(
            "text_redacted", "curated_text"
        )
        cur = cur.withColumn(
            "admit",
            F.col("c4_keep")
            & (F.col("lang_pred") == "en")
            & (F.col("quality") >= 0.3)
            & (F.col("n_tokens") >= 5),
        ).persist()
        keep_cols = ["doc_id", "curated_text", "lang_pred", "quality", "n_tokens"]
        cur.filter("admit").select(*keep_cols).write.mode("append").parquet(
            out_dir
        )
        if reject_dir is not None:
            cur.filter(~F.col("admit")).select(
                "doc_id",
                "curated_text",
                "lang_pred",
                "quality",
                "n_tokens",
                (~F.col("c4_keep")).alias("flag_c4"),
                (F.col("lang_pred") != "en").alias("flag_lang"),
                (F.col("quality") < 0.3).alias("flag_quality"),
                (F.col("n_tokens") < 5).alias("flag_short"),
            ).write.mode("append").parquet(reject_dir)
        cur.unpersist()

    return (
        src.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
