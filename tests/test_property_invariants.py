"""Property-based invariants (hypothesis) for the column-function layer —
the randomized complement to the example-based suites (SURVEY §5: the
reference has no tests at all; we add generative coverage).

Each property generates a whole BATCH per example and runs one Spark job
over it (hypothesis example count kept small; Spark jobs are the cost)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# url-ish strings: scheme/host casings, ports, dot segments, queries
_url = st.builds(
    lambda scheme, host, port, path, q: f"{scheme}://{host}{port}{path}{q}",
    st.sampled_from(["http", "HTTP", "https", "HTTPS", "hTtPs"]),
    st.sampled_from(["Example.COM", "a.b.example.com", "SITE7.net", "x-y.org"]),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.sampled_from(["", "/", "/a/b", "/a/./b", "/a/../b", "/Dir%7Ex", "/p q"]),
    st.sampled_from(["", "?b=2&a=1", "?x=%41"]),
)

_words = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=6), min_size=1, max_size=40
)


@settings(max_examples=5, deadline=None)
@given(st.lists(_url, min_size=1, max_size=25))
def test_canonicalize_idempotent(spark, urls):
    """canonicalize(canonicalize(u)) == canonicalize(u): the canonical
    form is a fixed point (RFC 3986 normalization is idempotent)."""
    from sharepointcrawler_spark.functions.urlnorm import canonicalize_url

    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    out = df.select(
        canonicalize_url("url").alias("c1"),
    ).select("c1", canonicalize_url("c1").alias("c2")).collect()
    for r in out:
        assert r.c1 == r.c2


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.text(alphabet="abc XY.\n", min_size=0, max_size=400), min_size=1, max_size=12),
    st.integers(min_value=2, max_value=50),
    st.integers(min_value=0, max_value=30),
)
def test_chunk_text_matches_python_slicing(spark, texts, size, overlap):
    """chunk i == text[i*stride : i*stride + size] and the chunks cover
    the whole text (last chunk reaches the end)."""
    from sharepointcrawler_spark.operators.chunking import chunk_text

    if overlap >= size:
        overlap = size - 1
    stride = size - overlap
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = chunk_text(df, chunk_size=size, overlap=overlap).collect()
    by_doc: dict[int, dict[int, str]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_index] = r.chunk
    for i, t in enumerate(texts):
        chunks = by_doc[i]
        n = len(chunks)
        assert sorted(chunks) == list(range(n))  # dense indexes
        for j in range(n):
            assert chunks[j] == t[j * stride : j * stride + size]
        assert (n - 1) * stride + size >= len(t)  # full coverage
        if n > 1:  # no spurious trailing chunk
            assert (n - 2) * stride + size < len(t)


@settings(max_examples=5, deadline=None)
@given(_words, _words, st.data())
def test_winnowing_shared_run_guarantee(spark, a_words, b_words, data):
    """Winnowing guarantee: two docs sharing a run of >= k+w-1 words
    (k=3, w=4 -> 6 words) share at least one fingerprint."""
    from sharepointcrawler_spark.functions.textanalysis import winnowing_fingerprints

    run = data.draw(st.lists(st.sampled_from(["q", "rr", "sss", "tt"]), min_size=6, max_size=6))
    doc_a = " ".join(a_words + run)
    doc_b = " ".join(run + b_words)
    df = spark.createDataFrame([(0, doc_a), (1, doc_b)], "doc_id long, text string")
    rows = winnowing_fingerprints(df, k=3, w=4).collect()
    fps = {0: set(), 1: set()}
    for r in rows:
        fps[r.doc_id].add(r.fp)
    assert fps[0] & fps[1]


@settings(max_examples=5, deadline=None)
@given(_words, st.randoms())
def test_simhash_is_token_order_invariant(spark, words, rnd):
    """SimHash sums ±1 per bit over the token MULTISET — permuting the
    tokens must not change the signature; equal docs have hamming 0."""
    from sharepointcrawler_spark.operators.corpus import simhash_signature

    shuffled = list(words)
    rnd.shuffle(shuffled)
    df = spark.createDataFrame(
        [(0, " ".join(words)), (1, " ".join(shuffled))], "doc_id long, text string"
    )
    sims = {r.doc_id: r.sim for r in simhash_signature(df).collect()}
    assert sims[0] == sims[1]


# word-ish tokens including the PDF-string escape characters and both
# latin-1 printable ranges; no bare whitespace (the layout engine owns
# word segmentation)
_pdf_word = st.text(
    alphabet="abcXYZ089()\\%/#<>[]&éü~",
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(_pdf_word, min_size=0, max_size=30).map(" ".join),
        min_size=1,
        max_size=60,
    ).map("\n".join)
)
def test_pdf_round_trip_is_exact(text):
    """parse(write(layout(text))) reproduces the layout's word boxes
    EXACTLY — text (incl. parens/backslash escaping, latin-1 accents),
    all four box floats, page heights, page breaks. Pure python: no
    Spark job per example."""
    from sharepointcrawler_spark.extraction.pdfwords import (
        layout_words,
        parse_pdf_word_pages,
        write_pdf,
    )

    pages, heights = layout_words(text)
    got_pages, got_heights = parse_pdf_word_pages(write_pdf(pages, heights))
    assert got_heights == heights
    assert [len(p) for p in got_pages] == [len(p) for p in pages]
    for want, got in zip(pages, got_pages):
        for a, b in zip(want, got):
            assert a == b


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcxyz THEANDundderleetla .',-\n", min_size=0, max_size=120),
        min_size=1,
        max_size=15,
    )
)
def test_lang_id_staged_tokens_equivalent(spark, texts):
    """lang_id(text) == lang_id_from_tokens(staged empty-free split):
    the curation pipeline's staging must be a pure refactor — empty
    tokens and outer trim never change marker counts."""
    from pyspark.sql import functions as F

    from sharepointcrawler_spark.functions.textanalysis import (
        lang_id,
        lang_id_from_tokens,
    )

    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    staged = df.select(
        lang_id("text").alias("direct"),
        lang_id_from_tokens(
            F.filter(
                F.split(F.lower(F.trim("text")), r"\W+"),
                lambda x: x != F.lit(""),
            )
        ).alias("staged"),
    )
    for r in staged.collect():
        assert r.direct == r.staged


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_png_codec_lossless_round_trip(data):
    """Pure-python property: decode(write_png(px)) == px exactly for any
    uint8 array, both channel layouts, both filter modes (the five PNG
    filters are mod-256 reversible by construction)."""
    import numpy as np

    from sharepointcrawler_spark.operators.multimodal import decode_png, write_png

    h = data.draw(st.integers(1, 16))
    w = data.draw(st.integers(1, 16))
    ch = data.draw(st.sampled_from([1, 3]))
    seed = data.draw(st.integers(0, 2**31 - 1))
    mode = data.draw(st.sampled_from(["cycle", "none"]))
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    W, H, C, got = decode_png(write_png(px, filter_mode=mode))
    assert (W, H, C) == (w, h, ch)
    assert np.array_equal(got, px)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_wav_codec_lossless_round_trip(data):
    """decode(write_wav(samples)) == samples exactly for any int16 PCM."""
    import numpy as np

    from sharepointcrawler_spark.operators.multimodal import decode_wav, write_wav

    n = data.draw(st.integers(1, 300))
    ch = data.draw(st.sampled_from([1, 2]))
    rate = data.draw(st.sampled_from([8000, 16000, 44100]))
    seed = data.draw(st.integers(0, 2**31 - 1))
    s = (
        np.random.default_rng(seed)
        .integers(-32768, 32768, size=(n, ch))
        .astype(np.int16)
    )
    got_rate, got_ch, got = decode_wav(write_wav(s, rate))
    assert (got_rate, got_ch) == (rate, ch)
    assert np.array_equal(got, s)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdefghij ", min_size=1, max_size=60),
        min_size=1,
        max_size=8,
    )
)
def test_pdf_proportional_round_trip_property(lines):
    """Helvetica-metrics layout -> PDF bytes -> parse reproduces every
    word box EXACTLY (per-glyph width sums are integer-then-one-divide,
    so writer and parser land on identical floats)."""
    from sharepointcrawler_spark.extraction.pdfwords import (
        HELVETICA,
        layout_words,
        parse_pdf_word_pages,
        write_pdf,
    )

    text = "\n".join(lines)
    pages, heights = layout_words(text, font=HELVETICA)
    got_pages, got_heights = parse_pdf_word_pages(
        write_pdf(pages, heights, font_metrics=HELVETICA), strict=False
    )
    assert got_heights == heights
    assert [w for p in got_pages for w in p] == [w for p in pages for w in p]


@settings(max_examples=25, deadline=None)
@given(
    st.text(alphabet="/abc.%*$?", min_size=0, max_size=20),
    st.text(alphabet="/abc.%?", min_size=0, max_size=20),
)
def test_robots_wildcard_matches_python_regex_model(pattern, path):
    """The robots matcher equals an independent python model: plain
    prefixes are startswith; '*'/'$' patterns behave like the fnmatch-
    style regex translation (RFC 9309 2.2.3). Pure python — no Spark
    job per example."""
    import re as _re

    from sharepointcrawler_spark.operators.robots import (
        compile_robots_pattern,
        robots_path_matches,
    )

    got = robots_path_matches(path, pattern)
    if "*" not in pattern and not pattern.endswith("$"):
        assert compile_robots_pattern(pattern) is None
        assert got == path.startswith(pattern)
    else:
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        rx = "".join(".*" if c == "*" else _re.escape(c) for c in body)
        want = (
            _re.match("^" + rx + ("$" if anchored else ""), path) is not None
        )
        assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_pagerank_mass_and_determinism(spark, raw_edges, iters):
    """Integer PageRank invariants on random small graphs: total score
    never exceeds the initial mass (teleport + damped redistribution
    can only leak via dangling nodes and integer floors), every score
    is at least the teleport floor, and a second run is bit-identical."""
    from sharepointcrawler_spark.operators.ranking import SCALE, pagerank

    edges = [(a, b) for a, b in raw_edges if a != b]
    if not edges:
        edges = [(0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    s = {r["node"]: r["score"] for r in pagerank(df, n_iters=iters).collect()}
    n = len(s)
    assert sum(s.values()) <= n * SCALE
    floor = (15 * SCALE) // 100
    assert all(v >= floor for v in s.values())
    s2 = {r["node"]: r["score"] for r in pagerank(df, n_iters=iters).collect()}
    assert s == s2


@settings(max_examples=20, deadline=None)
@given(
    st.binary(min_size=0, max_size=120),
    st.sampled_from([16, 32]),
    st.integers(min_value=0, max_value=2**31),
)
def test_aes_cbc_roundtrip_property(data, keylen, seed):
    """AES-CBC decrypt(encrypt(x)) == x for random payloads, AES-128
    and AES-256 keys, and arbitrary IVs; ciphertext length is the
    padded block count + one IV block. Pure python — no Spark."""
    import hashlib

    from sharepointcrawler_spark.extraction.aes import (
        aes_cbc_decrypt,
        aes_cbc_encrypt,
    )

    key = hashlib.sha256(seed.to_bytes(8, "big")).digest()[:keylen]
    iv = hashlib.md5(seed.to_bytes(8, "big")).digest()
    enc = aes_cbc_encrypt(key, iv, data)
    assert len(enc) == 16 + (len(data) // 16 + 1) * 16
    assert aes_cbc_decrypt(key, enc) == data
