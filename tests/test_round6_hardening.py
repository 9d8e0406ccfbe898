"""Round-6 hardening regressions (r5 ADVICE closures).

1. A progressive JPEG whose scan references an undefined Huffman table
   must raise inside the DECODE_ERRORS envelope (flagged NULL-stat row),
   never an AttributeError that crashes the Spark task.
2. Inline images honor the /L sample-data length parameter, so binary
   data containing a spurious ' EI' no longer truncates the strip; the
   scan fallback flags a stray ID token instead of silently tokenizing
   image bytes as text operators.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pytest

from sharepointcrawler_spark.extraction.pdfwords import (
    UnsupportedPdfError,
    _strip_inline_images,
    append_pdf_update,
    layout_words,
    parse_pdf_word_pages,
    write_pdf,
)
from sharepointcrawler_spark.operators.jpeg import (
    decode_jpeg,
    write_jpeg_progressive,
)
from sharepointcrawler_spark.operators.multimodal import DECODE_ERRORS


def test_progressive_jpeg_missing_dht_flags_not_crashes():
    """Excising the DHT segment ahead of the first progressive scan
    leaves huffs.get(...) == None at decode time; the decoder must
    raise a DECODE_ERRORS member (ValueError/KeyError), not
    AttributeError (r5 ADVICE medium, jpeg.py:875)."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(24, 24), dtype=np.uint8)
    blob = write_jpeg_progressive(img, 75)
    first_sos = blob.find(b"\xff\xda")
    i = blob.find(b"\xff\xc4")
    assert 0 < i < first_sos, "fixture must define DHT before the first scan"
    # drop every DHT that precedes the first SOS (tables may arrive in
    # one combined or several segments)
    out = blob
    while True:
        j = out.find(b"\xff\xc4")
        if j < 0 or j > out.find(b"\xff\xda"):
            break
        seglen = int.from_bytes(out[j + 2 : j + 4], "big")
        out = out[:j] + out[j + 2 + seglen :]
    with pytest.raises(DECODE_ERRORS) as exc:
        decode_jpeg(out)
    assert not isinstance(exc.value, AttributeError)


def test_pq_query_batching_bounded_driver(spark, monkeypatch):
    """r5 VERDICT 'What's wrong' #1: the PQ/IVF-PQ query side must not
    collect() the full query set to the driver. 10k queries stream in
    chunks (toLocalIterator); results are IDENTICAL for any chunking
    because per-partition top-k is per-query and one global window
    finishes."""
    from pyspark.sql import functions as F

    from sharepointcrawler_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_topk,
        pq_encode,
        pq_topk,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = train_pq_codebooks(emb, m=8, n_codes=16)
    codes = pq_encode(emb, books).persist()

    queries = (
        emb.filter(F.col("vec_id") < 50)
        .select(
            "vec_id",
            "embedding",
            F.explode(F.sequence(F.lit(0), F.lit(199))).alias("j"),
        )
        .select(
            (F.col("vec_id") * 200 + F.col("j")).alias("query_id"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: x * (F.lit(1.0) + F.col("j").cast("double") / 1000.0),
            ).alias("query_vec"),
        )
    )
    assert queries.count() == 10_000

    # the operator must never .collect() the query set — patch the
    # classic-DataFrame collect (pyspark 4 subclass shadows the base)
    def no_collect(self):
        raise AssertionError("pq query path collected a full DataFrame")

    monkeypatch.setattr(type(queries), "collect", no_collect)
    try:
        chunked = pq_topk(
            codes, queries, books, k=3, query_batch_size=700
        ).toPandas()
    finally:
        monkeypatch.undo()
    single = pq_topk(
        codes, queries, books, k=3, query_batch_size=1 << 30
    ).toPandas()
    key = ["query_id", "rank"]
    assert (
        chunked.sort_values(key).reset_index(drop=True).equals(
            single.sort_values(key).reset_index(drop=True)
        )
    ), "chunked PQ results differ from single-chunk results"
    assert len(chunked) == 10_000 * 3

    # IVF-PQ: same contract, per-chunk cell pruning
    cts = train_ivf_centroids(emb, n_centroids=8)
    index = ivfpq_encode(emb, cts, books).persist()
    small_q = queries.filter(F.col("query_id") % 5 == 0)
    a = ivfpq_topk(
        index, small_q, cts, books, k=3, n_probe=2, query_batch_size=300
    ).toPandas()
    b = ivfpq_topk(
        index, small_q, cts, books, k=3, n_probe=2, query_batch_size=1 << 30
    ).toPandas()
    assert (
        a.sort_values(key).reset_index(drop=True).equals(
            b.sort_values(key).reset_index(drop=True)
        )
    ), "chunked IVF-PQ results differ from single-chunk results"
    codes.unpersist()
    index.unpersist()


def _content_obj(raw: bytes) -> bytes:
    fl = zlib.compress(raw)
    return (
        b"<< /Length " + str(len(fl)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + fl + b"\nendstream"
    )


_SPURIOUS = b"\x01\x02 EI\x03 ID \x04\x05"  # 12 bytes; ' EI' mid-data


def _pdf_with_inline(img: bytes) -> bytes:
    text = "1.0 Heading One\n\nSome plain paragraph here for layout baseline.\n"
    pages, heights = layout_words(text)
    base = write_pdf(pages, heights)
    around = (
        b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (before) Tj ET\n" + img
        + b"\nBT /F1 12 Tf 1 0 0 1 72 680 Tm (after) Tj ET"
    )
    return append_pdf_update(base, {3: _content_obj(around)})


def test_inline_image_length_param_survives_spurious_ei():
    """/L declares the sample-data byte count (§8.9.5.1): the strip
    skips it verbatim, so a spurious ' EI' inside the data cannot
    truncate the image and desync the tokenizer (r5 ADVICE low)."""
    img = (
        b"BI /W 4 /H 3 /BPC 8 /CS /G /L "
        + str(len(_SPURIOUS)).encode()
        + b" ID "
        + _SPURIOUS
        + b"\nEI"
    )
    got, _ = parse_pdf_word_pages(_pdf_with_inline(img), strict=True)
    assert [w.text for w in got[0]] == ["before", "after"]


def test_inline_image_spurious_ei_without_length_flags_stray_id():
    """Without /L the EI scan terminates at the spurious ' EI'; the
    leftover image bytes contain a standalone ID token, which must be
    flagged (strict) instead of silently emitting garbage words."""
    img = b"BI /W 4 /H 3 /BPC 8 /CS /G ID " + _SPURIOUS + b"\nEI"
    with pytest.raises(UnsupportedPdfError, match="stray ID"):
        parse_pdf_word_pages(_pdf_with_inline(img), strict=True)
    # lenient mode still survives and keeps the honest words
    got, _ = parse_pdf_word_pages(_pdf_with_inline(img), strict=False)
    texts = [w.text for w in got[0]]
    assert "before" in texts and "after" in texts
    issues: list[str] = []
    _strip_inline_images(b"(t) Tj " + img, issues)
    assert any("stray ID" in i for i in issues)


def test_encrypted_pdf_empty_user_password_roundtrips():
    """Standard security handler (§7.6.3) with an EMPTY user password —
    the common owner-protected document-library shape PdfPig opens
    transparently: both RC4-40 (R2) and RC4-128 (R3) files must decrypt
    and reproduce the plaintext word boxes EXACTLY."""
    from sharepointcrawler_spark.extraction.pdfwords import encrypt_pdf

    text = (
        "1.0 Policy Overview\n\n"
        "This encrypted document describes the corporate retention policy "
        "and responsibilities of all staff when archiving records.\n\n"
        "1.1 Scope\nThe policy applies to every full time employee.\n"
    )
    pages, heights = layout_words(text)
    plain = write_pdf(pages, heights)
    want, _ = parse_pdf_word_pages(plain, strict=True)
    for r, bits in ((2, 40), (3, 128), (4, 128)):
        enc = encrypt_pdf(plain, r=r, length_bits=bits)
        assert enc != plain and b"/Encrypt" in enc
        if r == 4:
            assert b"/AESV2" in enc  # crypt-filter layer, not bare RC4
        got, _ = parse_pdf_word_pages(enc, strict=True)
        assert [
            (w.text, w.left, w.bottom) for p in got for w in p
        ] == [(w.text, w.left, w.bottom) for p in want for w in p], f"R{r}"


def test_encrypted_modern_pdf_structure_roundtrips():
    """Encryption composed with MODERN file structure: an ObjStm +
    XRef-stream PDF encrypts in place (RC4 preserves offsets, so the
    binary xref entries stay valid; the xref stream itself stays
    plaintext per §7.5.8.2) and the ObjStm container decrypts BEFORE
    inflation/expansion — word boxes round-trip exactly."""
    from sharepointcrawler_spark.extraction.pdfwords import (
        encrypt_pdf,
        write_pdf_modern,
    )

    text = (
        "1.0 Modern Encrypted\n\n"
        "This object-stream document must decrypt before its compressed "
        "object stream expands into the object table correctly.\n\n"
        "1.1 Scope\nApplies to the combined crypt and xref-stream path.\n"
    )
    pages, heights = layout_words(text)
    plain = write_pdf_modern(pages, heights)
    want, _ = parse_pdf_word_pages(plain, strict=True)
    assert want and want[0], "modern fixture must yield words"
    for r in (2, 3):
        enc = encrypt_pdf(plain, r=r)
        got, _ = parse_pdf_word_pages(enc, strict=True)
        assert [
            (w.text, w.left, w.bottom) for p in got for w in p
        ] == [(w.text, w.left, w.bottom) for p in want for w in p], f"R{r}"
    # password-protected modern file flags cleanly too
    locked = encrypt_pdf(plain, r=3, user_pwd=b"pw")
    with pytest.raises(UnsupportedPdfError, match="password required"):
        parse_pdf_word_pages(locked, strict=True)


def test_encrypt_dict_acrobat_key_order_and_literal_id():
    """Review findings: (a) Acrobat writes /Encrypt keys alphabetically
    — the /CF sub-dictionary (with its own /Length 16 in BYTES and
    /CFM name) precedes the top-level /Length and /V, and some files
    omit the top-level /Length entirely (implied 128 for V4); (b) /ID
    may use literal-string form. Both must still decrypt."""
    from sharepointcrawler_spark.extraction.pdfwords import encrypt_pdf

    pages, heights = layout_words(
        "1.0 Order\n\nAcrobat ordered dictionary body text here.\n"
    )
    plain = write_pdf(pages, heights)
    want = [
        w.text for p in parse_pdf_word_pages(plain, strict=True)[0] for w in p
    ]
    enc = encrypt_pdf(plain, r=4)
    m = re.search(
        rb"/O <([0-9a-f]+)>\s*/U <([0-9a-f]+)>", enc
    )
    assert m, "fixture enc dict shape changed"
    o_hex, u_hex = m.group(1), m.group(2)
    orig = re.search(rb"<< /Filter /Standard /V 4 .*?>>endobj", enc, re.S)
    assert orig, "enc dict not found"
    for extra_len in (b" /Length 128", b""):  # omitted -> implied 128
        acro = (
            b"<< /CF << /StdCF << /AuthEvent /DocOpen /CFM /AESV2"
            b" /Length 16 >> >> /Filter /Standard" + extra_len
            + b" /O <" + o_hex + b"> /P -4 /R 4"
            + b" /StmF /StdCF /StrF /StdCF /U <" + u_hex + b"> /V 4 >>endobj"
        )
        reordered = enc[: orig.start()] + acro + enc[orig.end() :]
        got = [
            w.text
            for p in parse_pdf_word_pages(reordered, strict=True)[0]
            for w in p
        ]
        assert got == want, f"extra_len={extra_len!r}"
    # literal-string /ID form
    idraw = bytes(range(16))
    lit = enc.replace(
        b"/ID [<" + idraw.hex().encode() + b"> <" + idraw.hex().encode() + b">]",
        b"/ID [(" + idraw + b") (" + idraw + b")]",
    )
    assert lit != enc, "ID rewrite did not apply"
    got = [
        w.text for p in parse_pdf_word_pages(lit, strict=True)[0] for w in p
    ]
    assert got == want


def test_stray_id_heuristic_ignores_string_literals():
    """Honest text like '(User ID 5)' must not trip the stray-ID
    truncation flag when an inline image without /L is on the page."""
    img = b"BI /W 4 /H 3 /BPC 8 /CS /G ID " + bytes(range(240, 252)) + b"\nEI"
    content = (
        b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (User ID 5) Tj ET\n" + img
        + b"\nBT /F1 12 Tf 1 0 0 1 72 680 Tm (after) Tj ET"
    )
    issues: list[str] = []
    _strip_inline_images(content, issues)
    assert not any("stray ID" in i for i in issues), issues
    got, _ = parse_pdf_word_pages(_pdf_with_inline(img), strict=True)
    assert [w.text for w in got[0]] == ["before", "after"]


def test_aes_fips_vectors_and_password_gate():
    """The AES core anchors to the FIPS-197 appendix C known-answer
    vectors; an AES-encrypted PDF with a real user password still
    flags clearly."""
    from sharepointcrawler_spark.extraction.aes import (
        aes_cbc_decrypt,
        aes_cbc_encrypt,
        aes_encrypt_block,
    )
    from sharepointcrawler_spark.extraction.pdfwords import encrypt_pdf

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    k128 = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    assert aes_encrypt_block(k128, pt).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    k256 = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"
    )
    assert aes_encrypt_block(k256, pt).hex() == "8ea2b7ca516745bfeafc49904b496089"
    for ln in (0, 1, 15, 16, 17, 100):
        data = bytes(range(256))[:ln]
        assert aes_cbc_decrypt(k128, aes_cbc_encrypt(k128, bytes(16), data)) == data
    with pytest.raises(ValueError, match="padding"):
        aes_cbc_decrypt(k128, bytes(48))

    pages, heights = layout_words("1.0 Locked\n\nSecret body text here.\n")
    locked = encrypt_pdf(write_pdf(pages, heights), r=4, user_pwd=b"secret")
    with pytest.raises(UnsupportedPdfError, match="password required"):
        parse_pdf_word_pages(locked, strict=True)


def test_encrypted_pdf_password_protected_flags_clearly():
    """A REAL user password (not empty) fails the /U check: strict mode
    raises a clear 'encrypted PDF' issue — never an opaque filter error
    or silent garbage words — and lenient mode yields zero pages."""
    from sharepointcrawler_spark.extraction.pdfwords import encrypt_pdf

    pages, heights = layout_words("1.0 Secret\n\nHidden body text here.\n")
    plain = write_pdf(pages, heights)
    locked = encrypt_pdf(plain, user_pwd=b"secret123")
    with pytest.raises(UnsupportedPdfError, match="password required"):
        parse_pdf_word_pages(locked, strict=True)
    got, _ = parse_pdf_word_pages(locked, strict=False)
    assert got == [] or all(not p for p in got)


def test_encrypted_pdf_unsupported_handler_flags_clearly():
    """AES (/V 4+) and non-Standard handlers are out of scope: the
    issue names the construct instead of failing inside a filter."""
    from sharepointcrawler_spark.extraction.pdfwords import encrypt_pdf

    pages, heights = layout_words("1.0 Title\n\nBody words here.\n")
    plain = write_pdf(pages, heights)
    enc = encrypt_pdf(plain)
    v5 = enc.replace(b"/Filter /Standard /V 2 /R 3", b"/Filter /Standard /V 5 /R 6")
    with pytest.raises(UnsupportedPdfError, match="unsupported standard-handler"):
        parse_pdf_word_pages(v5, strict=True)
    custom = enc.replace(b"/Filter /Standard", b"/Filter /MyCrypto")
    with pytest.raises(UnsupportedPdfError, match="unsupported security handler"):
        parse_pdf_word_pages(custom, strict=True)
    # V4 with an unknown crypt filter method flags the filter, not a
    # generic revision error
    aes4 = encrypt_pdf(plain, r=4)
    weird = aes4.replace(b"/CFM /AESV2", b"/CFM /AESV3")
    with pytest.raises(UnsupportedPdfError, match="unsupported crypt filter"):
        parse_pdf_word_pages(weird, strict=True)


def test_bucketed_seen_confirm_prunes_partitions(spark, tmp_path):
    """r5 VERDICT 'What's wrong' #4: the exact-confirm join against a
    seen table written hive-partitioned by pmod(url_key, n) must scan
    ONLY the wave's candidate buckets — the executed plan carries the
    bucket IN partition filter, and results equal the flat anti-join."""
    from pyspark.sql import functions as F

    from sharepointcrawler_spark.operators.dedup import (
        SEEN_BUCKET_COL,
        anti_join_unseen,
        bucketed_confirm_unseen,
        with_seen_bucket,
    )

    n_buckets = 8
    seen = spark.range(0, 1000).select(F.col("id").alias("url_key"))
    path = str(tmp_path / "seen_bucketed")
    with_seen_bucket(seen, n_buckets).write.partitionBy(SEEN_BUCKET_COL).parquet(path)
    seen_b = spark.read.parquet(path)
    # maybe-survivors touch exactly two buckets: keys == 1 or 2 (mod 8)
    maybe = spark.createDataFrame(
        [(1,), (9,), (2,), (500 * 8 + 1,), (997 * 8 + 2,)], "url_key long"
    )
    res = bucketed_confirm_unseen(maybe, seen_b, n_buckets)
    plan = res._jdf.queryExecution().executedPlan().toString()
    scan = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and "PartitionFilters" in ln and "url_key" in ln
    ]
    assert scan, plan
    pf = scan[0].split("PartitionFilters: [")[1].split("]")[0]
    assert f"{SEEN_BUCKET_COL}#" in pf and " IN (1,2)" in pf, pf
    got = sorted(r.url_key for r in res.collect())
    want = sorted(
        r.url_key for r in anti_join_unseen(maybe, seen).collect()
    )
    assert got == want == [500 * 8 + 1, 997 * 8 + 2]
    # empty wave short-circuits without touching seen at all
    empty = maybe.filter(F.lit(False))
    assert bucketed_confirm_unseen(empty, seen_b, n_buckets).count() == 0


def test_crawl_with_bucketed_seen_matches_flat(spark, tmp_path):
    """End-to-end: seen_buckets config produces the identical crawl
    (states, order, zero re-fetches on resume) while writing the seen
    set bucket-partitioned."""
    import os as _os

    from sharepointcrawler_spark.operators.frontier import graph_expander
    from sharepointcrawler_spark.operators.dedup import SEEN_BUCKET_COL
    from sharepointcrawler_spark.plans.crawl import CrawlConfig, run_crawl
    from sharepointcrawler_spark.plans.snapshot import SnapshotStore

    edges = spark.createDataFrame(
        [
            ("https://h.example.com/lib", f"https://h.example.com/lib/d{i}.pdf",
             "file", i)
            for i in range(6)
        ]
        + [
            ("https://h.example.com/lib", "https://h.example.com/lib/sub", "folder", 0),
            ("https://h.example.com/lib/sub", "https://h.example.com/lib/sub/x.pdf", "file", 0),
            # cycle back to the root — the seen set must absorb it
            ("https://h.example.com/lib/sub", "https://h.example.com/lib", "folder", 1),
        ],
        "parent_url string, child_url string, kind string, sibling_idx int",
    )
    results = {}
    for label, cfg in (
        ("flat", CrawlConfig(compact_every=2)),
        ("bucketed", CrawlConfig(compact_every=2, seen_buckets=8)),
    ):
        store = SnapshotStore(spark, str(tmp_path / f"snap_{label}"))
        res = run_crawl(
            spark, store, graph_expander(edges),
            seeds=[("https://h.example.com/lib", 0)],
            config=cfg, resume=False,
        )
        results[label] = {
            r["url_canon"]: r["state"] for r in res.frontier.collect()
        }
        log = res.fetch_log.toPandas()
        assert (log.groupby("url_canon").size() > 1).sum() == 0
        if label == "bucketed":
            seen_root = str(tmp_path / "snap_bucketed" / "seen")
            waves = sorted(_os.listdir(seen_root))
            assert any(
                d.startswith(f"{SEEN_BUCKET_COL}=")
                for d in _os.listdir(_os.path.join(seen_root, waves[0]))
            ), "seen table must be hive-partitioned by bucket"
    assert results["flat"] == results["bucketed"]


def test_pagerank_integer_power_iteration(spark):
    """Integer-scaled PageRank: a symmetric 2-cycle stays at the scale
    fixpoint (teleport + damped full score), a star center accumulates
    its leaves' mass, and frontier rows without a score get the 0
    floor. All arithmetic 64-bit integer — deterministic across runs."""
    from pyspark.sql import functions as F

    from sharepointcrawler_spark.operators.ranking import (
        SCALE,
        pagerank,
        pagerank_priorities,
    )

    cyc = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    s = {r["node"]: r["score"] for r in pagerank(cyc, n_iters=4).collect()}
    # each node always receives the other's full score: 15% + 85% of
    # SCALE stays SCALE at every iteration (the exact fixpoint)
    assert s == {1: SCALE, 2: SCALE}

    star = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)], "src long, dst long"
    )
    st = {r["node"]: r["score"] for r in pagerank(star, n_iters=3).collect()}
    assert st[0] > 4 * st[1], st  # the hub dominates its leaves
    assert all(st[i] == st[1] for i in range(2, 6))  # leaves identical
    # leaves get teleport only after iteration 1 (no in-links)
    assert st[1] == (15 * SCALE) // 100

    frontier = spark.createDataFrame(
        [("a",), ("b",)], ["url_canon"]
    )
    scores = spark.createDataFrame([("a", 7)], "node string, score long")
    pri = {
        r["url_canon"]: r["score"]
        for r in pagerank_priorities(frontier, scores).collect()
    }
    assert pri == {"a": 7, "b": 0}


def test_sq8_compression_recall(spark):
    """SQ8 scalar quantization: planted 2x-scaled twins share the
    normalized vector, hence identical codes and identical ADC scores
    (rank-1 or exact tie broken by id); jittered queries recover the
    exact top-1 inside their SQ8 top-5 at high recall (the codec keeps
    ~8 bits/dim of the direction)."""
    from pyspark.sql import functions as F

    from sharepointcrawler_spark.operators.similarity import (
        brute_force_topk,
        sq8_encode,
        sq8_topk,
        train_sq8,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    mins, maxs = train_sq8(emb)
    assert len(mins) == len(maxs) and all(a <= b for a, b in zip(mins, maxs))
    codes = sq8_encode(emb, mins, maxs)
    row = codes.limit(1).collect()[0]
    assert all(0 <= c <= 255 for c in row.sq_code)

    twins = emb.filter(F.col("vec_id") < 8).select(
        (F.col("vec_id") + 1000000).alias("query_id"),
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x * 2.0
        ).alias("query_vec"),
    )
    top1 = {
        r.query_id: r.vec_id
        for r in sq8_topk(codes, twins, mins, maxs, k=1).collect()
    }
    assert top1 == {1000000 + i: i for i in range(8)}

    jitter = emb.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 500000).alias("query_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: x
            * (
                F.lit(1.0)
                + F.lit(0.05)
                * (((F.col("vec_id") * 31 + i * 17) % 13 - 6).cast("double") / 6.0)
            ),
        ).alias("query_vec"),
    )
    exact1 = {
        r.query_id: r.vec_id
        for r in brute_force_topk(emb, jitter, k=1).filter("rank = 1").collect()
    }
    got5: dict = {}
    for r in sq8_topk(codes, jitter, mins, maxs, k=5).collect():
        got5.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(1 for q, v in exact1.items() if v in got5.get(q, set()))
    assert hits >= 22, f"SQ8 recall@5 of exact top-1: {hits}/25"


def test_pagerank_hub_no_int64_overflow(spark):
    """Review finding: a 120k-leaf star concentrates ~1.2e17 of scaled
    mass on the hub; the naive 85*sum damping product would wrap int64
    negative. The split-division identity keeps every intermediate in
    range: hub score stays positive, bounded by total mass, and equals
    teleport + 85% of the leaf mass."""
    from pyspark.sql import functions as F

    from sharepointcrawler_spark.operators.ranking import SCALE, pagerank

    n = 120_000
    edges = spark.range(1, n + 1).select(
        F.col("id").alias("src"), F.lit(0).cast("long").alias("dst")
    )
    s = pagerank(edges, n_iters=1)
    hub = s.filter("node = 0").collect()[0]["score"]
    teleport = (15 * SCALE) // 100
    assert hub > 0, "int64 overflow wrapped the hub score"
    expect = teleport + 85 * ((n * SCALE) // 100) + (85 * ((n * SCALE) % 100)) // 100
    assert hub == expect
    assert hub <= (n + 1) * SCALE


def test_seen_buckets_mismatch_raises_on_resume(spark, tmp_path):
    """Review finding: resuming a FLAT snapshot with seen_buckets set
    would NULL-out the bucket column and the confirm filter would prune
    every seen row (silent recrawl). The resume now fails loudly."""
    from sharepointcrawler_spark.operators.frontier import graph_expander
    from sharepointcrawler_spark.plans.crawl import CrawlConfig, run_crawl
    from sharepointcrawler_spark.plans.snapshot import SnapshotStore

    edges = spark.createDataFrame(
        [("https://m.example.com/lib", "https://m.example.com/lib/a.pdf", "file", 0)],
        "parent_url string, child_url string, kind string, sibling_idx int",
    )
    store = SnapshotStore(spark, str(tmp_path / "snap_flat"))
    run_crawl(
        spark, store, graph_expander(edges),
        seeds=[("https://m.example.com/lib", 0)],
        config=CrawlConfig(), resume=False, stop_after_wave=1,
    )
    with pytest.raises(ValueError, match="not bucket-partitioned"):
        run_crawl(
            spark, store, graph_expander(edges),
            config=CrawlConfig(seen_buckets=8), resume=True,
        )


def test_dedup_paragraph_lines_planted(spark):
    """CCNet paragraph dedup: a footer repeated across docs vanishes
    from ALL of them (including the first copy); unique lines survive
    in original order; max_occurrences=2 tolerates a twice-used line."""
    from sharepointcrawler_spark.operators.corpus import dedup_paragraph_lines

    footer = "(c) corp all rights reserved"
    docs = spark.createDataFrame(
        [
            (1, f"alpha one\n{footer}\nbeta two"),
            (2, f"{footer}\ngamma three"),
            (3, f"delta four\n{footer}"),
            (4, "unique only\nlines here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_paragraph_lines(docs).collect()}
    assert out[1]["clean_text"] == "alpha one\nbeta two"
    assert out[2]["clean_text"] == "gamma three"
    assert out[3]["clean_text"] == "delta four"
    assert out[4]["clean_text"] == "unique only\nlines here"
    assert [out[i]["n_dropped"] for i in (1, 2, 3, 4)] == [1, 1, 1, 0]
    # a line used exactly twice survives at max_occurrences=2
    docs2 = spark.createDataFrame(
        [(1, "twice used"), (2, "twice used"), (3, "thrice\nthrice")],
        "doc_id long, text string",
    )
    out2 = {
        r["doc_id"]: r
        for r in dedup_paragraph_lines(docs2, max_occurrences=2).collect()
    }
    assert out2[1]["clean_text"] == "twice used"
    assert out2[2]["clean_text"] == "twice used"
    assert out2[3]["clean_text"] == "thrice\nthrice"  # 2 copies, same doc


def test_repetition_signals_planted(spark):
    """Gopher repetition signals against hand-computed values: repeated
    lines, a dominant bigram, and the empty/one-word degenerate cases
    (zeros, never NULL)."""
    from sharepointcrawler_spark.functions.textanalysis import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "alpha beta\nalpha beta\ngamma delta\n\n  alpha beta  \n"),
            (2, ""),
            (3, "single"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    r1 = out[1]
    assert r1["n_lines"] == 4
    assert r1["dup_line_frac"] == 2 / 4
    assert r1["dup_line_char_frac"] == 20 / 41  # 2 extra "alpha beta" lines
    assert r1["top_bigram_char_frac"] == (3 * 9) / 37  # "alpha beta" x3
    for d in (2, 3):
        assert out[d]["n_lines"] in (0, 1)
        assert out[d]["dup_line_frac"] == 0.0
        assert out[d]["top_bigram_char_frac"] == 0.0


def test_repetition_signals_udf_matches_exchange_formulation(spark):
    """The zero-shuffle Arrow-UDF path (round 7) must agree value-for-
    value — including exact IEEE division results — with the
    explode/groupBy formulation `_repetition_signals_exchange` (the
    operator-for-operator mirror of the DuckDB oracle SQL) on the
    fixture corpus AND adversarial inputs: null/empty text, whitespace
    lines, unicode words, bigram count/length/lexicographic ties,
    one-word and no-word docs."""
    from sharepointcrawler_spark.functions.textanalysis import (
        _repetition_signals_exchange,
        repetition_signals,
    )

    fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    adversarial = spark.createDataFrame(
        [
            (1000, None),
            (1001, ""),
            (1002, "a\n\n a \na"),
            (1003, "x y x y x y"),
            (1004, "solo"),
            (1005, "ü ö ü ö ü ö"),
            (1006, "!!!\n!!!"),
            (1007, "w1 w2 w2 w1 w2 w2"),  # count tie -> longer/greater bigram
            (1008, "a b\na b\na b"),
            (1009, "zz zz aa aa zz zz"),  # tie broken lexicographically (max)
        ],
        "doc_id long, text string",
    )
    for docs in (fixture, adversarial):
        new = {r["doc_id"]: tuple(r) for r in repetition_signals(docs).collect()}
        old = {
            r["doc_id"]: tuple(r)
            for r in _repetition_signals_exchange(docs).collect()
        }
        assert new == old


def test_decontaminate_flags_planted_overlap(spark):
    """Planted contamination: a training doc embedding a verbatim
    13-gram from an eval question is flagged with the exact collision
    count; clean docs pass with zero collisions; flag-don't-drop (every
    input row present)."""
    from sharepointcrawler_spark.operators.corpus import decontaminate

    eval_q = (
        "what is the boiling point of water at sea level in degrees "
        "celsius under standard atmospheric pressure conditions today"
    )  # 19 words -> 7 distinct 13-grams
    docs = spark.createDataFrame(
        [
            # doc 1: contains the full eval question verbatim mid-text
            (1, f"As every student knows {eval_q} which is basic physics."),
            # doc 2: clean — no shared 13-gram
            (2, "completely unrelated text about crawling parquet tables "
                "with spark executors and shuffle partitions in a cluster "
                "deployment scenario for web scale data processing"),
            # doc 3: shares only a 5-word fragment (below n) — clean
            (3, "the boiling point of water is interesting but this "
                "sentence diverges immediately into other topics entirely "
                "unrelated to the evaluation suite"),
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame([(100, eval_q)], "eval_id long, text string")
    out = {r["doc_id"]: r for r in decontaminate(docs, evals, n=13).collect()}
    assert set(out) == {1, 2, 3}, "flag-don't-drop: all docs present"
    assert out[1]["contaminated"] and out[1]["n_collisions"] == 7
    assert not out[2]["contaminated"] and out[2]["n_collisions"] == 0
    assert not out[3]["contaminated"] and out[3]["n_collisions"] == 0
    assert all(out[i]["n_shingles"] > 0 for i in (1, 2, 3))


def test_docx_extraction_roundtrip_and_flags():
    """DOCX packages (ECMA-376 WordprocessingML) extract to markdown
    under the converter's conventions via the PK-magic dispatch:
    Title/Heading styles, multi-run paragraph concatenation, escaping,
    and tables; malformed packages flag (strict) instead of yielding
    silent empties."""
    from sharepointcrawler_spark.extraction.docxwords import (
        UnsupportedDocxError,
        docx_to_markdown,
        expected_docx_markdown,
        is_docx,
        write_docx,
    )
    from sharepointcrawler_spark.extraction.udfs import _extract_one_with_err

    title = "Telecommuting Policy"
    blocks: list[tuple] = [
        ("h", 1, "1.0 Purpose"),
        ("p", "This document defines the corporate telecommuting process "
              "with special chars like a|b and c*d and e_f in it."),
        ("h", 2, "1.1 Scope"),
        ("p", "Applies to all full time employees."),
        ("li", 0, "step one"),
        ("li", 1, "nested detail with a*star"),
        ("li", 0, "step two"),
        ("tbl", [["Field", "Value"], ["Doc No", "SOP-042"], ["Rev | x", "3"]]),
    ]
    blob = write_docx(title, blocks)
    assert is_docx(blob) and not is_docx(b"%PDF-1.4") and not is_docx(None)
    got = docx_to_markdown(blob, "ignored-name", strict=True)
    assert got == expected_docx_markdown(title, blocks)
    assert got.startswith("# Telecommuting Policy\n\n## 1.0 Purpose\n")
    assert "a\\|b and c\\*d and e\\_f" in got
    assert "| Rev \\| x | 3 |" in got
    assert "- step one\n  - nested detail with a\\*star\n- step two\n\n" in got
    # write/extract determinism at the byte level
    assert write_docx(title, blocks) == blob

    # the UDF dispatch seam: same bytes through _extract_one_with_err
    md, err = _extract_one_with_err(blob, "dispatchname")
    assert err is None and md == got

    # malformed: truncated zip flags, docx without document.xml flags
    with pytest.raises(UnsupportedDocxError, match="ZIP"):
        docx_to_markdown(blob[:40] + b"word/document.xml", strict=True)
    import io as _io
    import zipfile as _zf

    buf = _io.BytesIO()
    with _zf.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml.bak", b"x")
        z.writestr("word/document.xml_not_really", b"y")
    fake = buf.getvalue()
    if is_docx(fake):
        with pytest.raises(UnsupportedDocxError, match="missing"):
            docx_to_markdown(fake, strict=True)
    # empty body flags as zero text
    empty = write_docx("T", [])
    md2 = docx_to_markdown(empty, strict=False)
    assert md2.startswith("# T\n")  # title alone still counts as text


def test_xlsx_extraction_roundtrip_and_flags():
    """XLSX workbooks (SpreadsheetML) extract sheet tables under the
    shared markdown conventions via the PK dispatch: shared strings,
    numerics, sparse cells, multiple sheets; malformed packages flag."""
    from sharepointcrawler_spark.extraction.udfs import _extract_one_with_err
    from sharepointcrawler_spark.extraction.xlsxcells import (
        UnsupportedXlsxError,
        expected_xlsx_markdown,
        is_xlsx,
        write_xlsx,
        xlsx_to_markdown,
    )

    sheets = [
        ("Summary", [["Field", "Value"], ["Doc No", "SOP-042"], ["Count", 17]]),
        ("Data | raw", [["a*b", None, "c_d"], [1, 2, None], [None, "x", "y"]]),
    ]
    blob = write_xlsx(sheets)
    assert is_xlsx(blob) and not is_xlsx(b"%PDF-1.4")
    got = xlsx_to_markdown(blob, "wb", strict=True)
    assert got == expected_xlsx_markdown("wb", sheets)
    assert "## Data \\| raw\n" in got and "| a\\*b |  | c\\_d |" in got
    assert write_xlsx(sheets) == blob  # byte determinism
    md, err = _extract_one_with_err(blob, "wb")
    assert err is None and md == got
    with pytest.raises(UnsupportedXlsxError):
        xlsx_to_markdown(blob[:50] + b"xl/workbook.xml", strict=True)
    # a shared-string index out of range flags, never silently blanks
    # (members are deflated, so build the malformed package directly)
    import io as _io
    import zipfile as _zf

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    buf = _io.BytesIO()
    with _zf.ZipFile(buf, "w") as z:
        z.writestr(
            "xl/workbook.xml",
            f'<workbook xmlns="{ns}" xmlns:r="{rns}">'
            '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets>'
            "</workbook>",
        )
        z.writestr(
            "xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{ns}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>99</v></c></row>'
            "</sheetData></worksheet>",
        )
        z.writestr(
            "xl/sharedStrings.xml", f'<sst xmlns="{ns}"><si><t>x</t></si></sst>'
        )
    with pytest.raises(UnsupportedXlsxError, match="shared-string"):
        xlsx_to_markdown(buf.getvalue(), strict=True)


def test_pptx_extraction_roundtrip_and_flags():
    """PPTX decks (PresentationML) extract via the PK dispatch: slide
    order from relationship ids, title placeholders, multi-run
    paragraph concatenation, nested bullet levels; malformed packages
    flag."""
    from sharepointcrawler_spark.extraction.pptxslides import (
        UnsupportedPptxError,
        expected_pptx_markdown,
        is_pptx,
        pptx_to_markdown,
        write_pptx,
    )
    from sharepointcrawler_spark.extraction.udfs import _extract_one_with_err

    slides = [
        ("Quarterly Review | 2024",
         [(None, "Intro paragraph with a*star."),
          (0, "first bullet"), (1, "nested b_ullet"), (0, "second bullet")]),
        (None, [(None, "Slide two plain text only.")]),
    ]
    blob = write_pptx(slides)
    assert is_pptx(blob) and not is_pptx(b"%PDF-")
    got = pptx_to_markdown(blob, "deck", strict=True)
    assert got == expected_pptx_markdown("deck", slides)
    assert "## Slide 1: Quarterly Review \\| 2024\n" in got
    assert "- first bullet\n  - nested b\\_ullet\n- second bullet\n\n" in got
    assert "## Slide 2\n" in got
    assert write_pptx(slides) == blob
    md, err = _extract_one_with_err(blob, "deck")
    assert err is None and md == got
    with pytest.raises(UnsupportedPptxError):
        pptx_to_markdown(blob[:60] + b"ppt/presentation.xml", strict=True)


def test_inline_image_bad_length_falls_back_to_scan():
    """A lying /L (does not land on EI) falls back to the EI scan with
    an explicit issue, never a parse abort."""
    img = b"BI /W 4 /H 3 /BPC 8 /CS /G /L 3 ID " + bytes(range(240, 248)) + b"\nEI"
    got, _ = parse_pdf_word_pages(_pdf_with_inline(img), strict=False)
    assert [w.text for w in got[0]] == ["before", "after"]
    issues: list[str] = []
    stripped = _strip_inline_images(img, issues)
    assert any("does not land on EI" in i for i in issues)
    assert b"EI" not in stripped or stripped.strip() in (b"", b" ")
