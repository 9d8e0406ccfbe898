"""Crawler-trap detection over candidate URLs (frontier admission gate).

The reference never needs this: SharePoint's folder tree is finite and
server-enumerated (SharePointClient.cs:201-342 walks what the OData
endpoint returns), so its queue cannot blow up. An open-web frontier at
10^10 URLs can — calendar pages that link "next month" forever,
session-id query params that mint unbounded spellings of one resource,
and symlink-style loops that grow `/a/b/a/b/a/b/...` paths without
bound are the classic crawler traps (Heydon & Najork, "Mercator: A
Scalable, Extensible Web Crawler", 1999, §3.3 "the URL frontier" — and
every production crawler since ships the same structural heuristics).

Spark-first shape: one projection of pure built-in expressions over the
candidate table — split/filter/transform HOFs on the path-segment
array, `regexp` probes with constant (foldable) patterns, zero UDFs,
zero shuffles. The gate composes with `expand_wave` as a cheap filter
BEFORE the URL-seen probe, so trap spellings never reach the bloom
shards or the seen table at all: at 10^10-frontier scale the win is not
the fetch you skip but the state you never write.

Per the repo-wide lambda rule (PLANS.md): every HOF lambda below
references only its own lambda variables or a staged attribute column —
outer expressions are staged as their own projections first, so nothing
re-evaluates per array element.

Signals (all tunable via TrapRules):

* ``path_depth``          — path segments beyond max_depth: the
                            unbounded-recursion trap.
* ``max_segment_repeat``  — the same segment appearing k>=max_repeat
                            times in one path: the cycle trap
                            (`/a/b/a/b/a/...`).
* ``query_param_count``   — params beyond max_params: faceted-search /
                            cartesian-filter traps.
* ``session_param``       — a param whose NAME matches the well-known
                            session/tracking set (sessionid, phpsessid,
                            jsessionid, sid, utm_*): infinite-spelling
                            traps (also the reason P7 canonicalization
                            alone is not enough — the values differ per
                            fetch).
* ``numeric_run``         — >=min_numeric_run consecutive all-numeric
                            segments: the calendar trap
                            (`/2024/01/03/2024/...` pagination walks).
* ``url_length``          — beyond max_length: the catch-all bound
                            every real frontier enforces.

``is_trap`` is the OR of the individual flags; `trap_flags` keeps every
signal as its own column so the frontier can log WHY a URL was refused
(the reference's error-sink discipline, SharePointClient.cs:318-329,
applied to admission control).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Param names that mint unbounded URL spellings of one resource.
# Public, well-known set (cf. the default strip-lists of wget --reject,
# Heritrix, and the `utm_*` convention) — matched against the NAME part
# of each query param, case-insensitively.
SESSION_PARAM_RE = r"(?i)^(sessionid|phpsessid|jsessionid|aspsessionid[a-z]*|sid|cfid|cftoken|utm_[a-z]+)$"

_NUMERIC_SEG_RE = r"^[0-9]+$"


@dataclass(frozen=True)
class TrapRules:
    """Thresholds for the structural trap heuristics. Defaults follow
    the conventional production settings (Mercator used depth ~ 20 and
    length ~ few KB; repeats >= 3 is the standard cycle probe)."""

    max_depth: int = 16
    max_repeat: int = 3
    max_params: int = 12
    min_numeric_run: int = 4
    max_length: int = 2048


def _path_of(url_col):
    """Path part of a URL column: strip scheme://host, then ?query and
    #fragment. Constant patterns -> foldable -> codegen-friendly."""
    no_scheme = F.regexp_replace(url_col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
    return F.regexp_replace(no_scheme, r"[?#].*$", "")


def _query_of(url_col):
    """Query part (without '?'), '' when absent."""
    no_frag = F.regexp_replace(url_col, r"#.*$", "")
    return F.when(no_frag.contains("?"), F.regexp_replace(no_frag, r"^[^?]*\?", "")).otherwise(F.lit(""))


def trap_flags(
    df: DataFrame,
    rules: TrapRules = TrapRules(),
    url_col: str = "url",
) -> DataFrame:
    """Candidate URLs -> per-signal trap columns + ``is_trap``.

    One projection, no shuffle, no UDF. Array work uses HOFs over a
    STAGED segment column (`_segs`) so lambdas only touch attributes;
    the O(d^2) `max_segment_repeat` probe is bounded by d <= the
    segment count of one URL (tiny, and entirely JVM-side).
    """
    url = F.col(url_col)
    path = _path_of(url)
    query = _query_of(url)

    # Stage arrays as their own columns first (lambda CSE rule).
    staged = df.withColumn(
        "_segs", F.filter(F.split(path, "/"), lambda s: s != F.lit(""))
    ).withColumn(
        "_params",
        F.when(query == "", F.array().cast("array<string>")).otherwise(
            F.split(query, "&")
        ),
    )

    staged = staged.withColumn("_segs_sorted", F.array_sort("_segs"))

    depth = F.size("_segs")
    # max multiplicity of any one segment, via sort + longest run of
    # equal ADJACENT elements (the per-element count-occurrences
    # lambda is O(d^2) and measured 50 s at sf0.1 on 2 KB URLs with
    # ~220 segments; this is O(d log d) and computes the same value).
    # zip_with pads the 1-shorter shifted side with NULL -> '0'.
    eq_bits = F.concat_ws(
        "",
        F.zip_with(
            F.col("_segs_sorted"),
            F.expr("slice(_segs_sorted, 2, size(_segs_sorted))"),
            lambda x, y: F.when(y.isNull() | (x != y), F.lit("0")).otherwise(
                F.lit("1")
            ),
        ),
    )
    eq_runs = F.transform(F.split(eq_bits, "0"), lambda r: F.length(r))
    max_repeat = F.when(depth == 0, F.lit(0)).otherwise(
        F.coalesce(F.array_max(eq_runs), F.lit(0)) + 1
    )

    n_params = F.size("_params")
    param_names = F.transform(F.col("_params"), lambda p: F.split(p, "=")[0])
    has_session = F.exists(param_names, lambda n: n.rlike(SESSION_PARAM_RE))

    # longest run of consecutive all-numeric segments: mark segments as
    # '1'/'0', join to a bitstring, split on '0' — the longest '1'-block
    # IS the longest run. Pure string builtins on both engines (the
    # fold-based alternative has no DuckDB list_reduce mirror).
    bits = F.concat_ws(
        "",
        F.transform(
            F.col("_segs"),
            lambda s: F.when(s.rlike(_NUMERIC_SEG_RE), F.lit("1")).otherwise(F.lit("0")),
        ),
    )
    run_lengths = F.transform(F.split(bits, "0"), lambda r: F.length(r))
    numeric_run = F.coalesce(F.array_max(run_lengths), F.lit(0))

    length = F.length(url)

    out = staged.withColumns(
        {
            "path_depth": depth.cast("int"),
            "max_segment_repeat": max_repeat.cast("int"),
            "query_param_count": n_params.cast("int"),
            "session_param": has_session,
            "numeric_run": numeric_run.cast("int"),
            "url_length": length.cast("int"),
        }
    ).drop("_segs", "_segs_sorted", "_params")

    is_trap = (
        (F.col("path_depth") > rules.max_depth)
        | (F.col("max_segment_repeat") >= rules.max_repeat)
        | (F.col("query_param_count") > rules.max_params)
        | F.col("session_param")
        | (F.col("numeric_run") >= rules.min_numeric_run)
        | (F.col("url_length") > rules.max_length)
    )
    return out.withColumn("is_trap", is_trap)


def reject_traps(
    df: DataFrame,
    rules: TrapRules = TrapRules(),
    url_col: str = "url",
) -> DataFrame:
    """Admission filter: drop trap URLs, keep the original schema.

    The frontier-side composition point: run on newly-extracted child
    links BEFORE the seen probe, so trap spellings never cost bloom
    writes or seen-table rows."""
    flagged = trap_flags(df, rules=rules, url_col=url_col)
    # ``~is_trap != (monotonically_increasing_id() < 0)`` is value-
    # identical to ``~is_trap`` (the id is never negative) but pins the
    # admission filter ABOVE the staged projections: a plain filter on
    # the computed column is pushed down with the column definitions
    # SUBSTITUTED into the predicate — every signal's staged ``_segs``
    # array re-derived per reference (the corpus_curate finding; lambda
    # subtrees are invisible to codegen CSE).
    keep = ~F.col("is_trap")
    return flagged.filter(
        keep != (F.monotonically_increasing_id() < F.lit(0).cast("long"))
    ).select(*df.columns)
