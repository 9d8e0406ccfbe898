"""Page-level crawl directives from HTML: rel=canonical and the robots
meta tag (P9 — the page-side half of the robots gate).

The reference only honors server-side ACLs (SharePoint permissions
filter what the OData endpoint returns); on the open web pages carry
their OWN directives: `<link rel="canonical">` names the preferred
spelling of duplicated content (the frontier must dedup on it or every
print/mobile/tracking variant is crawled and ingested separately), and
`<meta name="robots" content="noindex, nofollow">` (the Robots
Exclusion Protocol's HTML form, same grammar as the X-Robots-Tag
header) forbids indexing the page and/or following its links.

Spark-first shape: constant-pattern ``regexp_extract`` over the html
string — foldable patterns, whole-stage codegen, zero UDFs, zero
shuffles. This deliberately does NOT use the python html parser the
extraction UDFs use: directives live in well-formed head markup, the
regex form is what production crawlers ship for this probe, and
keeping it JVM-side means the admission decision costs no Arrow
crossing (the expensive full parse runs only on pages that survive).

Both attribute orders are probed (``rel`` before ``href`` and after;
same for ``name``/``content``) because RE2-class engines have no
backreferences and real-world emitters use both orders. Quotes:
double or single, no-backreference alternation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# <link rel="canonical" href="..."> in either attribute order
_CANON_REL_FIRST = (
    r"""(?i)<link[^>]*rel=["']canonical["'][^>]*href=["']([^"']*)["']"""
)
_CANON_HREF_FIRST = (
    r"""(?i)<link[^>]*href=["']([^"']*)["'][^>]*rel=["']canonical["']"""
)

# <meta name="robots" content="..."> in either attribute order
_ROBOTS_NAME_FIRST = (
    r"""(?i)<meta[^>]*name=["']robots["'][^>]*content=["']([^"']*)["']"""
)
_ROBOTS_CONTENT_FIRST = (
    r"""(?i)<meta[^>]*content=["']([^"']*)["'][^>]*name=["']robots["']"""
)

# directive tokens are comma/space separated; anchor both sides so
# 'noindexing' or 'nofollowup' never match
_NOINDEX_RE = r"(?i)(^|[,\s])noindex($|[,\s])"
_NOFOLLOW_RE = r"(?i)(^|[,\s])nofollow($|[,\s])"


def canonical_href(html: Column) -> Column:
    """First rel=canonical href, NULL when the page declares none."""
    return F.nullif(
        F.coalesce(
            F.nullif(F.regexp_extract(html, _CANON_REL_FIRST, 1), F.lit("")),
            F.regexp_extract(html, _CANON_HREF_FIRST, 1),
        ),
        F.lit(""),
    )


def robots_meta(html: Column) -> Column:
    """Raw robots-meta content string, NULL when absent."""
    return F.nullif(
        F.coalesce(
            F.nullif(F.regexp_extract(html, _ROBOTS_NAME_FIRST, 1), F.lit("")),
            F.regexp_extract(html, _ROBOTS_CONTENT_FIRST, 1),
        ),
        F.lit(""),
    )


def html_meta_columns(
    df: DataFrame, html_col: str = "html_text", prefix: str = ""
) -> DataFrame:
    """Add directive columns: ``canonical_href`` (string, NULL when
    undeclared), ``meta_robots`` (raw content, NULL when absent),
    ``noindex``/``nofollow`` booleans. One projection; the robots
    string is staged once so the two directive probes don't re-run
    the tag extraction."""
    html = F.col(html_col)
    staged = df.withColumn(prefix + "meta_robots", robots_meta(html)).withColumn(
        prefix + "canonical_href", canonical_href(html)
    )
    robots = F.col(prefix + "meta_robots")
    return staged.withColumn(
        prefix + "noindex", F.coalesce(robots.rlike(_NOINDEX_RE), F.lit(False))
    ).withColumn(
        prefix + "nofollow", F.coalesce(robots.rlike(_NOFOLLOW_RE), F.lit(False))
    )


def effective_canonical(url_canon: Column, canonical: Column) -> Column:
    """The URL a page's content should be attributed to: its declared
    canonical when present, else its own canonical spelling. (The
    declared value is trusted as-is here; run it back through P7
    ``canonicalize_url`` before keying a frontier with it.)"""
    return F.coalesce(canonical, url_canon)


def nofollow_parent_filter(pages_keyed: DataFrame, html_col: str = "html") -> DataFrame:
    """Drop pages whose robots meta says nofollow — composed in front
    of link extraction so a nofollow page's links never enter the
    frontier. The html column may be binary: it is decoded lazily and
    only the regexp probe reads it (column pruning keeps the decode in
    this one stage)."""
    html_str = F.col(html_col).cast("string")
    return pages_keyed.filter(
        ~F.coalesce(robots_meta(html_str).rlike(_NOFOLLOW_RE), F.lit(False))
    )


# ------------------------------------------------------------------
# Descriptive metadata (beyond directives): title, description, og:*,
# declared language. Same engineering rules as the directive probes —
# foldable constant patterns, both attribute orders, both quote
# styles, NULL when absent — so a corpus can carry typed page
# metadata columns without an Arrow crossing.

_TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
_DESC_NAME_FIRST = (
    r"""(?i)<meta[^>]*name=["']description["'][^>]*content=["']([^"']*)["']"""
)
_DESC_CONTENT_FIRST = (
    r"""(?i)<meta[^>]*content=["']([^"']*)["'][^>]*name=["']description["']"""
)
_OG_PROP_FIRST = (
    r"""(?i)<meta[^>]*property=["']og:{p}["'][^>]*content=["']([^"']*)["']"""
)
_OG_CONTENT_FIRST = (
    r"""(?i)<meta[^>]*content=["']([^"']*)["'][^>]*property=["']og:{p}["']"""
)
_HTML_LANG_RE = r"""(?i)<html[^>]*\blang=["']([^"']*)["']"""


def _first_nonempty(html: Column, *patterns: str) -> Column:
    probes = [
        F.nullif(F.regexp_extract(html, p, 1), F.lit("")) for p in patterns
    ]
    return probes[0] if len(probes) == 1 else F.coalesce(*probes)


def html_title(html: Column) -> Column:
    """<title> text (inner tags stripped, whitespace collapsed),
    NULL when absent or empty."""
    raw = F.regexp_extract(html, _TITLE_RE, 1)
    return F.nullif(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(raw, r"<[^>]*>", " "), r"\s+", " "
            )
        ),
        F.lit(""),
    )


def meta_description(html: Column) -> Column:
    """<meta name=description> content, NULL when absent."""
    return _first_nonempty(html, _DESC_NAME_FIRST, _DESC_CONTENT_FIRST)


def og_property(html: Column, prop: str) -> Column:
    """<meta property="og:{prop}"> content, NULL when absent. ``prop``
    must be a literal tag name ([a-z_:]+) — it is spliced into a regex."""
    if not prop or not all(c.isalnum() or c in "_:" for c in prop):
        raise ValueError(f"bad og property name: {prop!r}")
    return _first_nonempty(
        html,
        _OG_PROP_FIRST.replace("{p}", prop),
        _OG_CONTENT_FIRST.replace("{p}", prop),
    )


def html_lang(html: Column) -> Column:
    """Declared <html lang> attribute, lowercased, NULL when absent."""
    return F.lower(_first_nonempty(html, _HTML_LANG_RE))


def html_describe_columns(
    df: DataFrame, html_col: str = "html_text", prefix: str = ""
) -> DataFrame:
    """Add descriptive metadata columns: ``page_title``,
    ``meta_description``, ``og_title``, ``og_type``, ``declared_lang``.
    One projection, all whole-stage-codegen regex probes."""
    html = F.col(html_col)
    return (
        df.withColumn(prefix + "page_title", html_title(html))
        .withColumn(prefix + "meta_description", meta_description(html))
        .withColumn(prefix + "og_title", og_property(html, "title"))
        .withColumn(prefix + "og_type", og_property(html, "type"))
        .withColumn(prefix + "declared_lang", html_lang(html))
    )
