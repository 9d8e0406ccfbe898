"""The full webtext curation chain in one call — raw pages to
training sequences.

``crawl_extract_ingest`` (plans/pipelines.py) ends where the
reference's workflow ends: extracted text in an envelope. A
training-data pipeline continues from there, and every public corpus
recipe (C4, The Pile, Gopher/MassiveText, RefinedWeb, Dolma) runs the
same ordered chain over the extracted text. This module composes the
engine's already-tested stages into that chain with ONE design rule:
FLAG, don't drop, until the single ``keep`` verdict at the end — so
the per-stage audit (what would each filter cost?) falls out of the
same pass that curates.

Stage order (cheapest-first, the 100 TB ordering):

1. main-content extraction (optional, when an ``html`` column is
   present) — boilerplate blocks never reach later stages
2. C4 line/page heuristics (functions/c4.py)
3. language ID + Gopher-style quality/repetition floors
   (functions/textanalysis.py)
4. PII redaction (functions/pii.py) — rewrites text, never drops
5. exact dedup keep-first over the REDACTED text (operators/corpus.py)
6. benchmark decontamination vs an eval set (optional; flag only)
7. DSIR importance weights vs a target corpus (optional; rank signal)
8. sequence packing of the survivors (optional, operators/packing.py)

Plan shape: stages 1-4 fuse into scan-side projections (no shuffle);
the dedup window is the first shuffle and carries skinny
(id, fingerprint) rows for rows already passing the cheap gates; the
optional stages add their own documented shapes (broadcast eval
shingles, two-pass DSIR, two-pass prefix sum). The per-stage report
is conditional aggregation over the flags — one extra reduce, no
extra scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sharepointcrawler_spark.functions.boilerplate import (
    extract_main_content,
)
from sharepointcrawler_spark.functions.c4 import c4_clean
from sharepointcrawler_spark.functions.pii import with_pii_columns
from sharepointcrawler_spark.functions.textanalysis import (
    lang_id,
    quality_score,
    token_count,
)


@dataclass
class CurationResult:
    docs: DataFrame
    """One row per input doc: signals, flags, ``keep`` verdict, and
    ``curated_text`` (main content, PII-redacted) for survivors."""
    report: DataFrame
    """Single-row audit: input count, per-stage would-drop counts,
    final kept count."""
    packed: DataFrame | None
    """(doc, sequence) overlap table for survivors (when ``seq_len``)."""


def curate_webtext(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    html_col: str | None = None,
    lang: str = "en",
    min_quality: float = 0.5,
    min_tokens: int = 5,
    eval_set: DataFrame | None = None,
    target_docs: DataFrame | None = None,
    seq_len: int | None = None,
) -> CurationResult:
    """Run the curation chain; see module docstring for stage order.
    ``docs`` needs (``id_col``, ``text_col``) and optionally
    ``html_col`` for the boilerplate stage."""
    from sharepointcrawler_spark.plans.layout import spread_small_scan

    # callers often hand a raw single-file parquet read (one scan
    # split); the whole stage-1..4 chain is scan-side per-row compute,
    # so spread it across the cores first (no-op at production split
    # counts — see spread_small_scan)
    cur = spread_small_scan(docs)
    if html_col is not None:
        cur = extract_main_content(cur, html_col=html_col)
        cur = cur.withColumn("_cur_text", F.col("bp_main_text"))
    else:
        cur = cur.withColumn("_cur_text", F.col(text_col))

    cur = c4_clean(cur, text_col="_cur_text")
    # C4 keeps only its retained lines; later stages see the cleaned text
    cur = cur.withColumn("_cur_text", F.col("c4_kept_text"))
    cur = (
        cur.withColumn("lang_pred", lang_id(F.col("_cur_text")))
        .withColumn("quality", quality_score(F.col("_cur_text")))
        .withColumn("n_tokens", token_count(F.col("_cur_text")))
    )
    cur = with_pii_columns(cur, text_col="_cur_text").withColumnRenamed(
        "text_redacted", "curated_text"
    )

    flags = (
        cur.withColumn("flag_c4", ~F.col("c4_keep"))
        .withColumn("flag_lang", F.col("lang_pred") != lang)
        .withColumn("flag_quality", F.col("quality") < min_quality)
        .withColumn("flag_short", F.col("n_tokens") < min_tokens)
    )
    gate = ~(
        F.col("flag_c4")
        | F.col("flag_lang")
        | F.col("flag_quality")
        | F.col("flag_short")
    )
    # dedup over the redacted text of gate-passing rows only: the
    # window carries skinny (id, fp) rows, text dropped before the
    # first shuffle; losers get flag_dup, winners rank first by id.
    # Gate-failing rows get a UNIQUE synthetic fingerprint — a shared
    # NULL/constant would funnel every dropped row into one window
    # partition (the skew the gate exists to avoid)
    w = Window.partitionBy("_fp").orderBy(id_col)
    flags = flags.withColumn(
        "_fp",
        F.when(gate, F.md5(F.col("curated_text"))).otherwise(
            F.concat(F.lit("skip:"), F.col(id_col).cast("string"))
        ),
    ).withColumn(
        "flag_dup",
        gate & (F.row_number().over(w) > 1),
    )

    if eval_set is not None:
        from sharepointcrawler_spark.operators.corpus import decontaminate

        cont = decontaminate(
            flags.select(id_col, F.col("curated_text").alias("text")),
            eval_set,
        ).select(id_col, F.col("contaminated").alias("flag_eval"))
        flags = flags.join(cont, id_col, "left").withColumn(
            "flag_eval", F.coalesce("flag_eval", F.lit(False))
        )
    else:
        flags = flags.withColumn("flag_eval", F.lit(False))

    flags = flags.withColumn(
        "keep", gate & ~F.col("flag_dup") & ~F.col("flag_eval")
    )

    if target_docs is not None:
        from sharepointcrawler_spark.operators.importance import (
            dsir_importance,
        )

        wts = dsir_importance(
            flags.select(id_col, F.col("curated_text").alias("text")),
            target_docs,
        ).select(id_col, "weight_bits", "avg_millibits")
        flags = flags.join(wts, id_col, "left")

    out_cols = [
        id_col,
        "curated_text",
        "lang_pred",
        "quality",
        "n_tokens",
        "flag_c4",
        "flag_lang",
        "flag_quality",
        "flag_short",
        "flag_dup",
        "flag_eval",
        "keep",
    ]
    if target_docs is not None:
        out_cols += ["weight_bits", "avg_millibits"]
    result = flags.select(*out_cols)

    # the report aggregate and the packing pass both consume the flag/
    # meta columns (never the text): persist that SKINNY projection once
    # so the heavy scan-side chain (c4 -> lang/quality -> PII -> dedup
    # window) runs a single pass for both actions instead of twice; the
    # full docs table (with curated_text) stays lazy for callers that
    # actually read it.
    slim = result.drop("curated_text").persist()

    report = slim.agg(
        F.count(F.lit(1)).cast("long").alias("n_in"),
        *[
            F.sum(F.col(c).cast("long")).cast("long").alias(c)
            for c in (
                "flag_c4",
                "flag_lang",
                "flag_quality",
                "flag_short",
                "flag_dup",
                "flag_eval",
            )
        ],
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
    )

    packed = None
    if seq_len is not None:
        from sharepointcrawler_spark.operators.packing import pack_sequences

        packed = pack_sequences(
            slim.filter("keep").select(id_col, "n_tokens"),
            seq_len,
            id_col=id_col,
        )
    return CurationResult(docs=result, report=report, packed=packed)
