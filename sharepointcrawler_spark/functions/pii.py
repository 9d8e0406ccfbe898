"""PII detection and redaction for training-data pipelines.

The standard pre-training privacy stage (C4 keeps a badwords gate;
Dolma/BigScience ROOTS document regex-based PII handling): detect
span-level personal identifiers — emails, US SSNs, NANP phone numbers,
IPv4 addresses — count them per document, and rewrite the text with
typed placeholder tokens. Flag-and-count feeds corpus audits; redaction
feeds the actual training corpus.

Everything here is JVM-side builtins (``regexp_extract_all`` /
``regexp_replace`` — whole-stage codegen, no Python), so the scan cost
at 100 TB is one pass over the text column with no shuffle at all.
Patterns are restricted to syntax that Java regex and RE2 (DuckDB)
interpret identically — no backreferences, no lookaround — so every
count and every redacted byte is oracle-checkable.

Reference: the crawler has no PII stage (its SOP corpus is intranet
documents, SharePointClient.cs fetches them verbatim); this is part of
the training-data layer the Spark engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Detection patterns, in REDACTION ORDER (fixed so rewritten bytes are
# deterministic). The email pattern requires an alphabetic TLD; an
# address with a raw-IP domain (x@1.2.3.4) is caught by the ipv4 pass
# instead — either way the identifying span is removed. SSN (3-2-4)
# and NANP phone (3-3-4) shapes are disjoint by construction.
# Syntax intersection of Java regex and RE2 only.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrence count of one PII kind (non-overlapping matches,
    leftmost-first — identical semantics in Java regex and RE2)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[kind]), F.lit(0)))


def redact_pii(col: Column | str, kinds: tuple[str, ...] | None = None) -> Column:
    """Rewrite every PII span with its typed placeholder (``[EMAIL]``,
    ``[SSN]``, ``[PHONE]``, ``[IPV4]``), applied in PII_PATTERNS order
    so cross-kind substring captures resolve deterministically."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in kinds or tuple(PII_PATTERNS):
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return c


def with_pii_columns(
    df: DataFrame, text_col: str = "text", redact: bool = True
) -> DataFrame:
    """Per-document PII audit columns: one ``n_<kind>`` count per
    pattern (counted on the RAW text, before any rewriting), ``n_pii``
    total, ``has_pii``, and — when ``redact`` — ``text_redacted``.

    One projection, zero shuffles, zero Python: the 100 TB cost is the
    text scan itself. Counts are int (cast long by callers that feed
    hash-compared oracles, per the engine-wide convention).
    """
    counts = {k: pii_count(F.col(text_col), k) for k in PII_PATTERNS}
    out = df
    for kind, c in counts.items():
        out = out.withColumn(f"n_{kind}", c)
    total = None
    for kind in PII_PATTERNS:
        col = F.col(f"n_{kind}")
        total = col if total is None else total + col
    out = out.withColumn("n_pii", total).withColumn("has_pii", F.col("n_pii") > 0)
    if redact:
        out = out.withColumn("text_redacted", redact_pii(F.col(text_col)))
    return out
