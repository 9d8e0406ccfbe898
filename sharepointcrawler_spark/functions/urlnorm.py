"""URL canonicalization + hashing (operator P7 in SURVEY.md §2.2).

Reference semantics: ad-hoc URL munging in SharePointClient.cs:92-94
(trim trailing '/'), :138-139/:207-208 (strip leading '/', append query),
:387 (quote escaping). The north_rule generalizes this to full RFC 3986
canonicalization: scheme+host lowercase, percent-decode unreserved chars,
uppercase remaining escapes, dot-segment removal, default-port strip,
fragment strip — so that the URL-seen set dedups all spelling variants of
the same resource.

Implementation: one vectorized pandas UDF (Arrow-batched; the string
munging itself is pure-python per element, which is fine inside an Arrow
batch — there is no JVM builtin for full RFC 3986 canonicalization).
Cheap derived columns (host, extension, 64-bit key) use JVM builtins
(``parse_url``-equivalents, ``xxhash64``) so they stay inside
whole-stage codegen.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit, unquote, quote

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}
# RFC 3986 unreserved + sub-delims we keep literal in paths/queries.
_SAFE_PATH = "/:@!$&'()*+,;=~-._"
_SAFE_QUERY = "=&:@!$'()*+,;/?~-._"

# Already-canonical fast path: lowercase http(s) scheme, lowercase
# host with no port/userinfo, a non-empty path whose characters are
# all kept literal by quote(unquote(.), _SAFE_PATH), no '%' (so the
# decode/re-encode is the identity), no query/fragment, no '/.'
# substring (so dot-segment removal is the identity; this also sends
# '/.hidden' segments to the slow path, which keeps them), and no
# trailing slash except the bare root (count('/')==3). For a URL
# passing all of that the full normalization below provably returns
# the input unchanged, so it is skipped — ~13x less CPU per URL on
# the dominant clean-absolute-URL shape, and the slow path is the
# byte-for-byte authority for everything else. Fuzz-pinned equal in
# tests/test_urlnorm.py::test_canonicalize_fast_path_matches_slow.
import re as _re

_CANON_FAST_RE = _re.compile(
    r"^https?://[a-z0-9.-]+(/[A-Za-z0-9_.~:@!$&'()*+,;=-]*)+\Z"
)


def _canon_one(url: str | None) -> str | None:
    """Canonicalize a single URL string (RFC 3986 syntax-based norm)."""
    if url is None:
        return None
    u = url.strip()
    if not u:
        return None
    if (
        _CANON_FAST_RE.match(u)
        and "/." not in u
        and (not u.endswith("/") or u.count("/") == 3)
    ):
        return u
    try:
        parts = urlsplit(u)
    except ValueError:
        return u  # unparseable: pass through verbatim (never drop silently)
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    # IDN hosts: keep as-is (already-lowercased); punycode out of scope.
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"

    # percent-decode then re-encode with a canonical safe set: this both
    # decodes unreserved escapes (%7E -> ~) and uppercases remaining ones.
    path = quote(unquote(parts.path), safe=_SAFE_PATH)
    path = _remove_dot_segments(path)
    if not path:
        path = "/"
    # trailing-slash normalization: /a/b/ == /a/b (root stays "/")
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"
    query = quote(unquote(parts.query), safe=_SAFE_QUERY)
    # fragment is never sent to the server: drop it.
    return urlunsplit((scheme, netloc, path, query, ""))


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
        else:
            out.append(seg)
    res = "/".join(out)
    if path.startswith("/") and not res.startswith("/"):
        res = "/" + res
    return res


@F.pandas_udf(T.StringType())
def canonicalize_url(urls: pd.Series) -> pd.Series:  # pragma: no cover - runs on executors
    return urls.map(_canon_one)


def url_host(col: Column | str) -> Column:
    """Lowercased host of an (already canonical or raw) URL — JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1))


def url_extension(col: Column | str) -> Column:
    """Lowercased file extension of the URL path (reference P3/F7:
    SharePointClient.cs:408 ``Path.GetExtension(...).ToLowerInvariant()``).
    Empty string when none. JVM-side regex — stays in codegen."""
    c = F.col(col) if isinstance(col, str) else col
    path = F.regexp_replace(c, r"[?#].*$", "")
    return F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]+)$", 1))


def url_key(col: Column | str) -> Column:
    """64-bit xxHash of the canonical URL — the dedup/shard key
    (north_rule). JVM builtin, no Python round-trip."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c)


def with_url_columns(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach url_canon / host / url_key in one pass."""
    return (
        df.withColumn("url_canon", canonicalize_url(F.col(url_col)))
        .withColumn("host", url_host(F.col("url_canon")))
        .withColumn("url_key", url_key(F.col("url_canon")))
    )
