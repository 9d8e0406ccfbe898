"""URL-seen fixture part 1: canonicalization collapses spelling variants
(SURVEY.md §5 item 2; reference P7 SharePointClient.cs:92-94,138-139)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sharepointcrawler_spark.functions.urlnorm import (
    _canon_one,
    canonicalize_url,
    url_extension,
    url_host,
    with_url_columns,
)

VARIANTS = [
    # (raw, expected canonical)
    ("HTTP://Example.COM/a/b", "http://example.com/a/b"),
    ("http://example.com:80/a/b", "http://example.com/a/b"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com/a/b/", "http://example.com/a/b"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/%7Euser", "http://example.com/~user"),
    ("http://example.com/a/./b/../c", "http://example.com/a/c"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a%2fb", "http://example.com/a/b"),
    ("  http://example.com/a  ", "http://example.com/a"),
    ("http://example.com/sp%20ace", "http://example.com/sp%20ace"),
    ("http://example.com/a?q=1&r=2", "http://example.com/a?q=1&r=2"),
]


def test_canon_one_local():
    for raw, want in VARIANTS:
        assert _canon_one(raw) == want, raw


def test_canonicalize_udf(spark):
    df = spark.createDataFrame([(r,) for r, _ in VARIANTS], ["url"])
    got = [r.c for r in df.select(canonicalize_url("url").alias("c")).collect()]
    assert got == [w for _, w in VARIANTS]


def test_dedup_after_canon(spark):
    dupes = [
        "http://Example.com/a/",
        "http://example.com:80/a",
        "http://example.com/a",
        "http://example.com/x/../a",
    ]
    df = with_url_columns(spark.createDataFrame([(u,) for u in dupes], ["url"]))
    assert df.select("url_canon").distinct().count() == 1
    assert df.select("url_key").distinct().count() == 1


def test_host_and_extension(spark):
    df = spark.createDataFrame(
        [
            ("https://A.B.com:8080/x/report.PDF?dl=1",),
            ("http://h.io/path/file.tar.gz",),
            ("http://h.io/noext",),
        ],
        ["url"],
    )
    rows = df.select(
        url_host("url").alias("h"), url_extension("url").alias("e")
    ).collect()
    assert [(r.h, r.e) for r in rows] == [
        ("a.b.com", "pdf"),
        ("h.io", "gz"),
        ("h.io", ""),
    ]


def test_null_and_garbage(spark):
    df = spark.createDataFrame([(None,), ("",), ("   ",)], "url string")
    got = [r.c for r in df.select(canonicalize_url("url").alias("c")).collect()]
    assert got == [None, None, None]


def test_canonicalize_fast_path_matches_slow():
    """The already-canonical fast path in _canon_one must be a strict
    identity subset of the full RFC 3986 normalization: fuzz the
    predicate against a reference copy of the slow path (the code below
    mirrors the module's slow branch verbatim) over adversarial and
    random URLs."""
    import random
    import string
    from urllib.parse import quote, unquote, urlsplit, urlunsplit

    from sharepointcrawler_spark.functions.urlnorm import (
        _DEFAULT_PORTS,
        _SAFE_PATH,
        _SAFE_QUERY,
        _canon_one,
        _remove_dot_segments,
    )

    def slow(url):
        u = url.strip()
        if not u:
            return None
        try:
            parts = urlsplit(u)
        except ValueError:
            return u
        scheme = parts.scheme.lower()
        host = (parts.hostname or "").lower()
        port = parts.port
        netloc = host
        if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
            netloc = f"{host}:{port}"
        if parts.username:
            cred = parts.username + (
                f":{parts.password}" if parts.password else ""
            )
            netloc = f"{cred}@{netloc}"
        path = quote(unquote(parts.path), safe=_SAFE_PATH)
        path = _remove_dot_segments(path)
        if not path:
            path = "/"
        if len(path) > 1 and path.endswith("/"):
            path = path.rstrip("/") or "/"
        query = quote(unquote(parts.query), safe=_SAFE_QUERY)
        return urlunsplit((scheme, netloc, path, query, ""))

    urls = [
        "https://site29.example.com/docs/doc93", "https://a.com/",
        "https://a.com", "https://a.com//x", "https://a.com/x/",
        "https://a.com/x/y.pdf", "https://a.com/.hidden",
        "https://a.com/a/../b", "https://a.com/a/./b", "https://A.com/x",
        "HTTPS://a.com/x", "https://a.com:443/x", "https://a.com:8080/x",
        "https://u:p@a.com/x", "https://a.com/x?q=1", "https://a.com/x#f",
        "https://a.com/x%20y", "https://a.com/x%7Ey", "https://a.com/x y",
        "https://a.com/x~y", "https://a.com/x@y:z", "https://a.com/x;y=z",
        "http://a.com/x", "ftp://a.com/x",
    ]
    rng = random.Random(7)
    chars = string.ascii_lowercase + string.digits + "/.-_~%?#:@!$&'()*+,;= ABC"
    for _ in range(30000):
        host = "".join(rng.choice("abc.-09") for _ in range(rng.randint(1, 10)))
        path = "".join(rng.choice(chars) for _ in range(rng.randint(0, 20)))
        urls.append(f"https://{host}/{path}")
    for u in urls:
        assert _canon_one(u) == slow(u), u
