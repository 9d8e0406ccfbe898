"""Text-analysis column functions for training-data pipelines.

All hot-path functions are JVM-side builtins (whole-stage codegen, no
Python round-trip); each has an exact DuckDB-SQL oracle equivalent in
``__spark_entry__.oracle_sql`` (portable constructs only: md5-hex ->
int64, regexp counts, list ops).

Reference analogs: the dormant classifier map SharePointClient.cs:54-60
(F2) and stopword list :61-64 — generalized to language-ID scoring,
quality scoring, token counting and fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker words per language, scored by \b-regex occurrence counts —
# deterministic and portable between Spark (Java regex) and DuckDB (RE2)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "que", "es", "una"],
}

STOPWORDS_EN = [
    "the", "and", "or", "of", "to", "a", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "an", "be", "this", "that",
]


def normalize_text(col: Column | str) -> Column:
    """lower + trim + collapse whitespace — the canonical form used by
    every dedup fingerprint."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (BPE-ish sub-tokens: see bpe_ish_count)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    )


def bpe_ish_count(col: Column | str) -> Column:
    """Sub-word token estimate: count of letter-runs, digit-runs and
    single punctuation marks (a BPE-like segmentation regex)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


def lang_marker_score(col: Column | str, lang: str) -> Column:
    """Per-language marker count (kept for single-language scoring; the
    multi-language argmax in lang_id uses the fused one-pass extraction
    instead of 20 regexp_count scans)."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    score = F.lit(0)
    for w in LANG_MARKERS[lang]:
        score = score + F.regexp_count(low, F.lit(rf"\b{w}\b"))
    return score


# one alternation over every marker word (longest-first so e.g. 'est'
# wins over 'es' without relying on backtracking): a single regex pass
# extracts all marker hits, then each language counts its own words
# with an array filter — 1 scan of the text instead of 20
_ALL_MARKERS = sorted({w for ws in LANG_MARKERS.values() for w in ws}, key=len, reverse=True)
_MARKER_PATTERN = r"\b(" + "|".join(_ALL_MARKERS) + r")\b"


def lang_id_from_tokens(toks: Column) -> Column:
    """Argmax of marker scores over a PRE-TOKENIZED word array; ties and
    zero-evidence rows -> 'und'. Tie-break: language order en,de,fr,es
    (strictly-greater comparison).

    Take the tokens as a staged ATTRIBUTE column where possible: codegen
    subexpression elimination does not share lambda-containing subtrees,
    so the four per-language score expressions re-run whatever
    tokenization is nested inside them (the curate pipeline measured
    3.9s -> 2.4s at sf0.01 from staging the split once)."""
    scores = {
        lang: F.size(F.filter(toks, lambda x: x.isin(*LANG_MARKERS[lang])))
        for lang in LANG_MARKERS
    }
    return _lang_argmax(scores)


def lang_id(col: Column | str) -> Column:
    """Argmax of marker scores; ties and zero-evidence rows -> 'und'.
    Identical semantics to per-word ``\\b``-regex counting: the ``\\W+``
    split yields exactly the ``\\b``-delimited words, so token-in-set
    counts equal whole-word match counts (multiplicity included). For
    hot paths prefer staging the split as its own column and calling
    :func:`lang_id_from_tokens` (see its note on lambda CSE)."""
    c = F.col(col) if isinstance(col, str) else col
    return lang_id_from_tokens(F.split(F.lower(c), r"\W+"))


def _lang_argmax(scores: dict) -> Column:
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in LANG_MARKERS:  # insertion order = tie-break order
        s = scores[lang]
        cond = s > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    return best_lang


# --------------------------- char-n-gram language ID (Cavnar–Trenkle)

# Deterministic seed corpora the per-language trigram profiles are BUILT
# FROM at import time (Cavnar & Trenkle 1994, "N-Gram-Based Text
# Categorization": rank the most frequent character n-grams, classify by
# out-of-place rank distance). Real deployments train profiles on large
# corpora; these embedded seeds keep the profiles deterministic,
# self-contained and inspectable, while the SCORING pipeline is the
# genuine C-T method. The 5-marker-word heuristic (lang_id above) stays
# the cheap single-pass gate; this is the quality backend.
LANG_SEED_TEXTS: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and the people of the "
        "world said that this is the time for all good men to come to the "
        "aid of their country with the strength of their hands and the "
        "wisdom that they have gathered over the years of their lives"
    ),
    "de": (
        "der schnelle braune fuchs springt ueber den faulen hund und die "
        "menschen der welt sagten dass dies die zeit ist in der alle guten "
        "maenner ihrem land mit der kraft ihrer haende und der weisheit "
        "die sie ueber die jahre ihres lebens gesammelt haben helfen"
    ),
    "fr": (
        "le renard brun rapide saute par dessus le chien paresseux et les "
        "gens du monde ont dit que ce temps est venu pour tous les hommes "
        "de bien de venir en aide a leur pays avec la force de leurs mains "
        "et la sagesse quils ont acquise au cours des annees de leur vie"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso y la gente "
        "del mundo dijo que este es el tiempo para que todos los hombres "
        "buenos vengan en ayuda de su pais con la fuerza de sus manos y la "
        "sabiduria que han reunido durante los anos de sus vidas"
    ),
}

NGRAM_PROFILE_K = 40


def _ct_normalize_py(text: str) -> str:
    """The shared normalization (python == Spark == DuckDB): lower,
    every non-letter run -> single space, trimmed."""
    import re

    return re.sub(r"[^a-z]+", " ", text.lower()).strip()


def build_lang_profiles(k: int = NGRAM_PROFILE_K) -> list[tuple[str, str, int]]:
    """(lang, trigram, rank) rows: top-k space-padded char trigrams of
    each seed corpus, ranked by (count desc, trigram asc) — fully
    deterministic, recomputed identically by the DuckDB oracle's
    inlined VALUES table (generated from this same function)."""
    rows: list[tuple[str, str, int]] = []
    for lang, seed in LANG_SEED_TEXTS.items():
        padded = f" {_ct_normalize_py(seed)} "
        counts: dict[str, int] = {}
        for i in range(len(padded) - 2):
            tri = padded[i : i + 3]
            counts[tri] = counts.get(tri, 0) + 1
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        rows += [(lang, tri, r + 1) for r, (tri, _) in enumerate(ranked)]
    return rows


def lang_id_ngram(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = NGRAM_PROFILE_K,
):
    """Cavnar–Trenkle character-trigram language ID over a corpus:
    returns (id, lang_pred) with 'und' for zero-evidence docs.

    Method (the published one, not the marker shortcut): the document's
    top-k trigrams by frequency form its profile; for each language,
    distance = sum over the doc profile of |doc_rank - lang_rank|, with
    a k penalty for trigrams absent from the language profile; argmin
    wins (ties -> language order, zero trigrams -> 'und').

    100 TB shape: ONE explode to (id, trigram) skinny rows; one
    map-side-combined groupBy(id, trigram); one row_number window per
    doc (same shuffle key); the 4x``k``-row profile table is a literal
    broadcast; final per-(id, lang) aggregate + argmin window ride the
    same id-keyed partitioning. No self-joins, no Python."""
    from pyspark.sql import Window

    spark = docs.sparkSession
    c = F.col(text_col)
    norm = F.trim(F.regexp_replace(F.lower(c), "[^a-z]+", " "))
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    # the padded text is staged as its OWN column before the lambda
    # references it (lambda CSE hazard: an outer expression nested in a
    # transform body re-evaluates per element — the O(n^2) bug class
    # fixed in winnowing_fingerprints)
    tris = docs.filter(norm != "").select(
        F.col(id_col), padded.alias("_p")
    ).select(
        F.col(id_col),
        F.explode(
            F.expr("transform(sequence(1, length(_p) - 2), i -> substring(_p, i, 3))")
        ).alias("tri"),
    )
    doc_prof = (
        tris.groupBy(id_col, "tri")
        .agg(F.count("*").alias("_n"))
        .withColumn(
            "doc_rank",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.desc("_n"), F.col("tri"))
            ),
        )
        .filter(F.col("doc_rank") <= k)
        .drop("_n")
    )
    prof = spark.createDataFrame(
        build_lang_profiles(k), "lang string, tri string, lang_rank int"
    )
    langs = spark.createDataFrame(
        [(lang, i) for i, lang in enumerate(LANG_SEED_TEXTS)], "lang string, lang_ord int"
    )
    dists = (
        doc_prof.crossJoin(F.broadcast(langs))
        .join(F.broadcast(prof), ["lang", "tri"], "left")
        .groupBy(id_col, "lang", "lang_ord")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("doc_rank") - F.col("lang_rank")), F.lit(k)
                )
            ).alias("dist")
        )
    )
    best = (
        dists.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("dist", "lang_ord")
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col), F.col("lang").alias("lang_pred"))
    )
    return (
        docs.select(id_col)
        .join(best, id_col, "left")
        .select(F.col(id_col), F.coalesce("lang_pred", F.lit("und")).alias("lang_pred"))
    )


def quality_score(col: Column | str) -> Column:
    """[0,1] heuristic quality: length band + punctuation ratio band +
    stopword presence (the classic pre-training quality gates, each a
    deterministic integer sub-score / 3)."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    # sub-score 1: length in a sane band
    s1 = F.when((n_chars >= 20) & (n_chars <= 20000), 1).otherwise(0)
    # sub-score 2: punctuation below 20% of characters
    s2 = F.when(n_punct * 5 <= n_chars, 1).otherwise(0)
    # sub-score 3: average token length in [3, 12]
    avg_tok = n_chars / F.when(n_tokens == 0, F.lit(1)).otherwise(n_tokens)
    s3 = F.when((avg_tok >= 3.0) & (avg_tok <= 12.0), 1).otherwise(0)
    return ((s1 + s2 + s3) / F.lit(3.0)).alias("quality")


def stopword_ratio(col: Column | str) -> Column:
    """Stopword-token ratio in [0,1] — the classic fluency heuristic
    (C4/Gopher-style: natural prose carries a healthy fraction of
    function words; keyword-stuffed or boilerplate text does not).
    Tokens are the lowercased \\W+ split; the stopword list is the
    reference's own (SharePointClient.cs:61-64), multiplicity counted.
    Empty documents score 0. Pure JVM builtins."""
    c = F.col(col) if isinstance(col, str) else col
    return stopword_ratio_from_tokens(
        F.filter(F.split(F.lower(F.trim(c)), r"\W+"), lambda x: x != F.lit(""))
    )


def stopword_ratio_from_tokens(words: Column) -> Column:
    """Stopword ratio over a pre-tokenized (empty-free) word array — the
    staged-column variant (see lang_id_from_tokens on lambda CSE)."""
    from sharepointcrawler_spark.sources.odata import STOPWORDS_REFERENCE

    stops = F.size(F.filter(words, lambda x: x.isin(*STOPWORDS_REFERENCE)))
    return stops / F.greatest(F.size(words), F.lit(1)).cast("double")


def portable_hash64(col: Column | str) -> Column:
    """Engine-portable 64-bit-ish hash: first 15 hex chars of md5 as a
    long (DuckDB: ('0x' || substr(md5(x),1,15))::UBIGINT). Used wherever
    the DuckDB oracle must reproduce hashes exactly; xxhash64 stays the
    engine-internal key (it is faster but not portable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash64(col: Column | str, portable: bool = True) -> Column:
    """The dedup-key hash with a production fast path: ``portable=True``
    (default) is the md5-derived int64 every DuckDB oracle recomputes;
    ``portable=False`` is Spark's native ``xxhash64`` — same 64-bit key
    semantics, no Python, substantially cheaper per byte, but not
    reproducible outside Spark. Dedup RESULTS are hash-choice-invariant
    (tested in test_corpus_ops): only the opaque key values differ."""
    if portable:
        return portable_hash64(col)
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c)


def doc_fingerprint(col: Column | str) -> Column:
    """Whole-document fingerprint over normalized text (exact-dedup key)."""
    return F.md5(normalize_text(col))


def winnowing_fingerprints(
    docs, k: int = 3, w: int = 4, text_col: str = "text", id_col: str = "doc_id"
):
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    k-word-gram rolling hashes, minimum per sliding window of w grams,
    distinct minima = the fingerprint set. Guarantees any shared run of
    >= k+w-1 words between two documents shares a fingerprint.

    100% JVM builtins (split -> gram array -> portable hash transform ->
    windowed array_min -> array_distinct -> explode): no shuffle at all
    until the caller aggregates, and byte-equal to a DuckDB list-ops
    oracle. Returns (id, fp) rows.

    Each stage is materialized as its OWN projection column before the
    next lambda references it: an outer expression nested textually
    inside a transform() lambda is re-evaluated per element (codegen CSE
    does not reach lambda bodies), which turns the pipeline O(n^2) in
    md5 calls per document — measured 27 s vs ~1 s at sf0.01. The
    multi-reference projections also block CollapseProject from
    re-inlining them."""
    from pyspark.sql import functions as F

    words = F.split(normalize_text(text_col), " ")
    staged = docs.select(F.col(id_col), words.alias("_w"))
    gram_hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("_w") - F.lit(k - 1), F.lit(1))),
        lambda i: F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice("_w", i, k))), 1, 15), 16, 10
        ).cast("long"),
    )
    staged = staged.select(F.col(id_col), gram_hashes.alias("_gh"))
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("_gh") - F.lit(w - 1), F.lit(1))),
        lambda j: F.array_min(F.slice("_gh", j, w)),
    )
    return staged.select(
        F.col(id_col), F.explode(F.array_distinct(mins)).alias("fp")
    )
