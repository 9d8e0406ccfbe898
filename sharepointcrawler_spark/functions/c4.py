"""C4-style heuristic page cleaning (Raffel et al. 2020, §2.2).

The classic webtext curation stage between raw extraction and dedup:
line-level filters (keep only lines that end in terminal punctuation,
carry at least five words, and do not mention javascript) and
page-level filters (at least three retained lines, no "lorem ipsum",
no curly brace, no word from a blocklist). The reference crawler ships
extracted markdown straight to its ingest API
(``SharePointClient.cs:201-342`` has no cleaning pass); at corpus
scale this stage decides what a model ever trains on, so it is part
of the engine's first-class surface.

Everything here is whole-stage-codegen JVM expression work: one
``split`` to lines, array lambdas for the line filters, ``rlike`` /
``contains`` for the page flags. Per the engine's lambda-CSE rule the
lambdas reference only lambda variables and plain column attributes —
callers must pass the *column name* of a staged lines array, never a
nested expression.

Flag-don't-drop convention (same as PII / decontamination): the
operator returns every page with a ``c4_keep`` verdict and the
individual flags, so a pipeline can audit what it would lose before
committing to the drop.

C4's final heuristic — deduplicating any three-sentence span that
occurs twice in the corpus — is the engine's existing
``operators.corpus.duplicated_window_stats`` (``dedup_spans``); this
module covers the per-page half.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Terminal punctuation per C4: period, exclamation, question mark,
# closing quote (straight or curly).
TERMINAL_PUNCT_RE = '[.!?"”’\']$'

C4_MIN_WORDS_PER_LINE = 5
C4_MIN_LINES_PER_PAGE = 3

# Stand-in for the public "List of Dirty, Naughty, Obscene..." C4
# uses; the real list is a drop-in replacement (word-boundary union).
NAUGHTY_WORDS = ("badword1", "badword2", "badword3")


def _naughty_re() -> str:
    return r"\b(" + "|".join(NAUGHTY_WORDS) + r")\b"


def c4_line_keep(line: Column) -> Column:
    """Per-line C4 predicate: ends in terminal punctuation, has at
    least five words, and does not mention javascript."""
    t = F.trim(line)
    return (
        t.rlike(TERMINAL_PUNCT_RE)
        & (F.size(F.split(t, " +")) >= C4_MIN_WORDS_PER_LINE)
        & ~F.lower(t).contains("javascript")
    )


def c4_clean(
    pages: DataFrame,
    text_col: str = "text",
    out_prefix: str = "c4_",
) -> DataFrame:
    """Apply the C4 page-cleaning heuristics to newline-delimited
    ``text_col``. Adds (``out_prefix``-named):

    - ``kept_text``: retained lines joined with ``\\n``
    - ``n_lines`` / ``n_kept_lines``: before/after line filtering
    - ``has_lorem_ipsum`` / ``has_brace`` / ``has_naughty``: page flags
    - ``keep``: the combined verdict (>=3 kept lines, no page flag)

    No rows are dropped — filter on ``{out_prefix}keep`` downstream.
    The plan is one projection over the scan: a ``split`` Generate-free
    array, two lambda passes, and constant-pattern ``rlike``s, all
    inside whole-stage codegen.
    """
    p = out_prefix
    lines = F.split(F.col(text_col), "\n")
    staged = pages.withColumn("_c4_lines", lines)
    kept = F.filter(F.col("_c4_lines"), c4_line_keep)
    lower_text = F.lower(F.col(text_col))
    out = (
        staged.withColumn(f"{p}kept_text", F.array_join(kept, "\n"))
        .withColumn(f"{p}n_lines", F.size("_c4_lines").cast("long"))
        .withColumn(
            f"{p}n_kept_lines",
            F.size(F.filter(F.col("_c4_lines"), c4_line_keep)).cast("long"),
        )
        .withColumn(f"{p}has_lorem_ipsum", lower_text.contains("lorem ipsum"))
        .withColumn(f"{p}has_brace", F.col(text_col).contains("{"))
        .withColumn(f"{p}has_naughty", lower_text.rlike(_naughty_re()))
        .drop("_c4_lines")
    )
    return out.withColumn(
        f"{p}keep",
        (F.col(f"{p}n_kept_lines") >= C4_MIN_LINES_PER_PAGE)
        & ~F.col(f"{p}has_lorem_ipsum")
        & ~F.col(f"{p}has_brace")
        & ~F.col(f"{p}has_naughty"),
    )
