"""SURT (Sort-friendly URI Reordering Transform) canonical URL keys.

SURT is the key format of the web-archive ecosystem (Wayback/
webarchive-commons, pywb, Common Crawl's CDX index):
``https://user@WWW.Example.COM:443/A/b?b=2&a=1#frag`` becomes
``com,example)/a/b?a=1&b=2``. Reversed, comma-joined host labels make
one registrable domain's captures lexicographically contiguous, so a
sorted-by-key index answers "all captures of this site" with a range
scan — the property that makes cross-crawl dedup and prefix queries a
merge instead of a shuffle at Common-Crawl scale.

The transform composed here follows the public canonicalizer rules
(webarchive-commons ``SURT.java`` + the default Wayback canonicalizer):
lowercase; strip scheme and userinfo; strip a leading ``www`` (with
optional digits) label; reverse host labels with commas; drop default
ports 80/443, keep others as ``:port``; drop the fragment; sort query
parameters bytewise; empty path becomes ``/``.

Everything is a single Column expression (constant-pattern regexes,
split/reverse/sort array ops) — whole-stage codegen, zero shuffles,
zero Python — and every step has an exact DuckDB mirror, so SURT keys
are hash-oracle-safe. The reference crawler keys URLs on the raw
lowercase string (single-tenant, one host); SURT is what that key must
become when the frontier spans the open web.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def surt_key(url: Column | str) -> Column:
    """The SURT form of ``url`` (see module docstring). NULL for
    NULL/empty input and for URLs with no host (``mailto:``,
    scheme-only strings)."""
    u = F.lower(F.trim(F.col(url) if isinstance(url, str) else url))
    # scheme:// off, then userinfo@ off (host cannot contain '@', so the
    # greedy match up to the last '@' before any /?# is the delimiter)
    # '^//' alone covers scheme-relative URLs ("//cdn.example.net/x")
    no_scheme = F.regexp_replace(u, "^([a-z][a-z0-9+.-]*:)?//", "")
    no_user = F.regexp_replace(no_scheme, "^[^/?#]*@", "")
    authority = F.regexp_extract(no_user, "^([^/?#]*)", 1)
    # path+query+fragment = everything after the authority
    rest = F.substring(no_user, F.length(authority) + 1, F.lit(2**31 - 1))
    host = F.regexp_replace(authority, ":[0-9]*$", "")
    port = F.regexp_extract(authority, ":([0-9]+)$", 1)
    host_key = F.array_join(
        F.reverse(F.split(F.regexp_replace(host, r"^www[0-9]*\.", ""), r"\.")),
        ",",
    )
    port_part = F.when(
        port.isin("", "80", "443"), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    pq = F.regexp_replace(rest, "#.*$", "")  # fragment off
    path = F.regexp_extract(pq, "^([^?]*)", 1)
    query = F.substring(pq, F.length(path) + 2, F.lit(2**31 - 1))
    path_part = F.when(path == "", F.lit("/")).otherwise(path)
    query_part = F.when(
        query == "", F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(query, "&")), "&")))
    out = F.concat(host_key, port_part, F.lit(")"), path_part, query_part)
    # a scheme WITHOUT an authority (mailto:, javascript:, data:) has no
    # host — never a web capture key
    no_authority = u.rlike("^[a-z][a-z0-9+.-]*:") & ~u.rlike(
        "^[a-z][a-z0-9+.-]*://"
    )
    return F.when(
        u.isNull() | (u == "") | (host == "") | no_authority,
        F.lit(None).cast("string"),
    ).otherwise(out)


def with_surt_column(
    df: DataFrame, url_col: str = "url", out_col: str = "surt"
) -> DataFrame:
    """Attach the SURT key column — the sort/partition key for
    archive-index layouts (write the captures table sorted or bucketed
    by it and same-site rows co-locate for free)."""
    return df.withColumn(out_col, surt_key(url_col))
