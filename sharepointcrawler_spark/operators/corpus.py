"""Corpus-scale deduplication operators (training-data pipeline layer).

Five dedup families over a ``documents(doc_id, text, ...)`` table, each
designed for the 100 TB shape:

* exact            — hash-groupBy on a normalized fingerprint. One
                     shuffle on the md5 key; partial agg map-side.
* minhash LSH      — shingle -> portable 64-bit hash -> k minhash
                     lanes -> bands -> bucket join. Only docs sharing a
                     band bucket ever meet: no O(n^2) pair stage.
* simhash          — 60-bit sign-aggregated token hashes, all JVM
                     builtins (explode + portable hash + 60 bit-sum
                     aggregates); near-dup = small hamming distance on
                     a single long, pigeonhole chunk blocking.
* n-gram jaccard   — shingle inverted index join; exact similarity on
                     LSH candidates (or small corpora).
* span-level       — Lee et al. 2022 duplicated-window stats, exhaustive
                     (stride=1, the oracle) or strided (the 100 TB mode).
* embedding cosine — see operators/similarity.py.

Plus the steps a curation pipeline runs around them: near-dup
CLUSTERING (connected components over the pair graph, min-label
propagation with per-iteration checkpoints) and the composed C4-style
corpus curation filter (language/quality/token gates + keep-first).

Hashes are the engine-portable md5-derived int64 (functions/
textanalysis.portable_hash64) so every step has a byte-equal DuckDB
oracle; at pure-production scale xxhash64 is a drop-in (faster, no
oracle parity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sharepointcrawler_spark.functions.textanalysis import (
    doc_fingerprint,
    hash64,
    normalize_text,
    portable_hash64,
)

# minhash parameters — shared constants so oracle SQL can inline them
MINHASH_P = 1_000_000_007
MINHASH_K = 16
MINHASH_BANDS = 4  # 4 rows per band
SHINGLE_N = 3


def minhash_params() -> list[tuple[int, int, int]]:
    """(i, a_i, b_i) — deterministic affine hash params, small enough
    that a*h+b stays inside int64 (h < p ~ 2^30, a < p)."""
    return [
        (i, (2 * i + 1) * 2654435761 % MINHASH_P, (i * 40503 + 17) % MINHASH_P)
        for i in range(MINHASH_K)
    ]


# ----------------------------------------------------------- exact dedup


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct normalized text: keeper = min id, plus the
    duplicate count. Single hash-shuffle on the fingerprint."""
    return (
        docs.withColumn("fingerprint", doc_fingerprint(text_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dupes"),
        )
    )


def dedup_keep_first(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The filtered corpus: drop all but the min-id row per fingerprint."""
    keep = exact_dedup(docs, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return docs.join(keep, id_col, "left_semi")


# -------------------------------------------------------- corpus curation


def curate_corpus(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = 0.6,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_stop_ratio: float | None = None,
    max_stop_ratio: float | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The composed C4-style curation pass a training-data pipeline runs
    before dedup/tokenization: language gate + heuristic quality floor +
    token-count bounds + optional stopword-ratio fluency band +
    exact-duplicate keep-first, in ONE pass.

    Plan shape: the three text heuristics and the fingerprint are pure
    JVM column expressions fused into the same scan projection (one
    whole-stage codegen span); text is DROPPED before the only shuffle —
    a row_number window over the md5 fingerprint carrying just
    (id, scores, fp) skinny rows for the already-filtered survivors
    (cheapest-first gate ordering: at 100 TB the language/quality gates
    drop the bulk of the corpus before any shuffle bytes move). One
    scan, one skinny shuffle, no join. Returns kept rows with scores."""
    from pyspark.sql import Window

    from sharepointcrawler_spark.functions.textanalysis import (
        lang_id_from_tokens,
        quality_score,
        stopword_ratio_from_tokens,
        token_count,
    )

    # stage the \W+ word split ONCE as its own column: lang-ID's four
    # score filters and the stopword filter all consume it, and lambda-
    # containing subtrees are not shared by codegen CSE (measured 3.9s
    # -> 2.4s at sf0.01). Empty tokens never match a marker/stopword, so
    # the empty-free array is equivalent for both consumers.
    staged = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\W+"),
            lambda x: x != F.lit(""),
        ).alias("_toks"),
    )
    gate = (
        (F.col("lang_pred") == lang)
        & (F.col("quality") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
    )
    if min_stop_ratio is not None:
        gate = gate & (F.col("stop_ratio") >= min_stop_ratio)
    if max_stop_ratio is not None:
        gate = gate & (F.col("stop_ratio") <= max_stop_ratio)
    # The gate is applied as ONE nondeterministic, non-splittable
    # predicate: ``gate != (monotonically_increasing_id() < 0)`` is
    # value-identical to ``gate`` (the id is never negative) but
    # PushPredicateThroughNonJoin cannot push a nondeterministic
    # condition through the projection — and because it is a single
    # binary predicate there are no deterministic conjuncts to split
    # off and push either. (``rand() < -1`` does NOT work: Spark 4
    # constant-folds statically-decidable rand comparisons and the
    # remaining deterministic gate gets pushed again.) Without this pin
    # the optimizer substitutes the column definitions into the
    # predicate and pushes it to the SCAN: the staged ``_toks`` split
    # re-evaluated ~25x per row (lambda subtrees are invisible to
    # codegen CSE), single-task below the first exchange — measured as
    # the dominant cost of the whole pass.
    scored = staged.select(
        F.col(id_col),
        lang_id_from_tokens(F.col("_toks")).alias("lang_pred"),
        quality_score(text_col).alias("quality"),
        token_count(text_col).cast("long").alias("n_tokens"),
        stopword_ratio_from_tokens(F.col("_toks")).alias("stop_ratio"),
        doc_fingerprint(text_col).alias("_fp"),
    ).filter(gate != (F.monotonically_increasing_id() < F.lit(0).cast("long")))
    w = Window.partitionBy("_fp").orderBy(id_col)
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_fp")
    )


# ------------------------------------------------------------- shingles


def word_shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = SHINGLE_N) -> DataFrame:
    """(id, shingle) rows: n-word shingles over normalized text.
    Documents shorter than n words yield their full text as the single
    shingle (so no document silently disappears from dedup).

    The word array is materialized as its own projection column first:
    nesting the split-normalize expression inside the transform() lambda
    re-evaluates it PER SHINGLE POSITION (codegen CSE does not reach
    lambda bodies) — O(words x text_length) per doc instead of O(text)."""
    words = F.split(normalize_text(text_col), " ")
    staged = docs.select(F.col(id_col), words.alias("_w"))
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("_w") - F.lit(n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice("_w", i, n)),
    )
    return staged.select(
        F.col(id_col), F.explode(F.array_distinct(shingles)).alias("shingle")
    )


def decontaminate(
    docs: DataFrame,
    eval_set: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str = "text",
    eval_id_col: str = "eval_id",
) -> DataFrame:
    """Benchmark decontamination: flag — never drop — training documents
    sharing any word n-gram with a held-out evaluation set (the 13-gram
    collision method of GPT-3 appendix C / The Pile; flagging preserves
    the curation pipeline's audit trail and lets thresholds be tuned
    downstream).

    Plan shape: both sides shingle with the SAME :func:`word_shingles`
    operator (distinct n-grams per doc); the eval side distills to its
    DISTINCT shingles — eval suites are small and fixed, so this side
    broadcasts — and one broadcast LEFT join + one groupBy(id) computes
    per-doc totals and collision counts together (no second aggregation
    pass). Output: every input doc with (n_shingles, n_collisions,
    contaminated). At 100 TB the corpus shingle explosion is the only
    big term and it never shuffles for the join; if an eval set ever
    outgrows broadcast, bucket both sides by a shingle hash instead."""
    corpus_sh = word_shingles(docs, text_col=text_col, id_col=id_col, n=n)
    eval_sh = (
        word_shingles(eval_set, text_col=eval_text_col, id_col=eval_id_col, n=n)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    agg = (
        corpus_sh.join(F.broadcast(eval_sh), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("_hit").alias("n_collisions"),
        )
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_collisions", F.lit(0)).cast("long").alias("n_collisions"),
            (F.coalesce("n_collisions", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def dedup_paragraph_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_occurrences: int = 1,
) -> DataFrame:
    """Cross-document PARAGRAPH dedup (the CCNet pre-processing step,
    Wenzek et al. 2020; C4 does the analogous span drop): boilerplate —
    navigation, cookie banners, license blocks — repeats across
    documents far more often than real prose, so every line whose
    corpus-wide occurrence count exceeds ``max_occurrences`` is dropped
    from EVERY document (including the first copy, CCNet semantics),
    and each document's text is reassembled from its surviving lines in
    order.

    Plan: one posexplode over trimmed non-empty lines, one global
    groupBy(line) count (map-side partial agg; the long tail of unique
    lines dominates and combines to one row each), a broadcast-or-
    shuffle join back, and one groupBy(doc) rebuild via a sorted
    collect_list (deterministic: sorted by line position, the same
    string_agg ORDER BY the oracle uses). Output: (id, clean_text,
    n_kept, n_dropped) — flag-and-rebuild, no document ever disappears.
    At 100 TB the line-count table is the only global state; bucketing
    both sides by a line hash removes even that shuffle."""
    from sharepointcrawler_spark.functions.textanalysis import trimmed_lines

    lines = docs.select(
        F.col(id_col), trimmed_lines(text_col).alias("_l")
    ).select(id_col, F.posexplode("_l").alias("pos", "line"))
    counts = lines.groupBy("line").agg(F.count("*").alias("_n"))
    kept_flag = (F.col("_n") <= max_occurrences).alias("_keep")
    tagged = lines.join(counts, "line").select(id_col, "pos", "line", kept_flag)
    rebuilt = tagged.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_keep"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
        F.sum(F.when(F.col("_keep"), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("_keep"), 0).otherwise(1)).alias("n_dropped"),
    )
    return (
        docs.select(F.col(id_col))
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
        )
    )


# ----------------------------------------------------------- minhash LSH


def minhash_signatures_wide(
    shingled: DataFrame, id_col: str = "doc_id", portable: bool = True
) -> DataFrame:
    """(id, m0..m{k-1}) — the k minhash lanes as COLUMNS of one row.

    One groupBy(id) with k min-aggregates over the single portable
    shingle hash: no |shingles| x k row blowup, no param-table join,
    map-side partial agg shrinks each partition to one row per doc
    before the shuffle. The affine params are inlined literals (the
    exact formula the DuckDB oracle recomputes independently)."""
    hashed = shingled.withColumn(
        "h", F.pmod(hash64("shingle", portable), F.lit(MINHASH_P))
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"m{i}")
        for (i, a, b) in minhash_params()
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def minhash_signatures(shingled: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, i, minhash) long format — a stack of the wide signatures
    (kept for inspection/tests; the dedup plan uses the wide form)."""
    wide = minhash_signatures_wide(shingled, id_col)
    pairs = ", ".join(f"{i}, m{i}" for i in range(MINHASH_K))
    return wide.select(
        F.col(id_col), F.expr(f"stack({MINHASH_K}, {pairs})").alias("s")
    ).select(
        id_col, F.col("s.col0").alias("i"), F.col("s.col1").alias("minhash")
    )


def lsh_bucket_pairs(
    signatures_wide: DataFrame, id_col: str = "doc_id", portable: bool = True
) -> DataFrame:
    """Candidate pairs: docs agreeing on ALL lanes of any band.

    band key = md5 of the comma-joined lane values of the band, lanes
    ascending (byte-equal to the oracle's ``string_agg(... ORDER BY i)``).
    Banding is a pure PROJECTION over the wide signature row (no second
    aggregation), exploded to (band, band_key) and self-joined — the key
    is high-entropy md5, so the shuffle is uniform; a pathological
    mega-bucket (all-identical docs) is the data's fault, and AQE
    skew-split handles it.
    """
    rows_per_band = MINHASH_K // MINHASH_BANDS

    def band_key(b):
        joined = F.concat_ws(",", *[
            F.col(f"m{b * rows_per_band + j}").cast("string")
            for j in range(rows_per_band)
        ])
        # fast path: xxhash64 band key (same equi-join semantics, no md5)
        return F.md5(joined) if portable else F.xxhash64(joined).cast("string")

    banded = signatures_wide.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), band_key(b).alias("band_key"))
                for b in range(MINHASH_BANDS)
            ])
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.band_key")
    left = banded.select(F.col(id_col).alias("id_a"), "band", "band_key")
    right = banded.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        left.join(right, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# Broadcast gate for candidate-derived tables in jaccard_pairs: the LSH
# candidate set is DATA-DEPENDENT (a boilerplate-heavy corpus yields
# billions of band-collision pairs), so it must never be force-broadcast
# unconditionally — the 8 GB broadcast hard cap / driver OOM is the
# single scale-killer in the dedup path. 500k (id, id) pairs is ~8 MB
# serialized: far inside every broadcast limit.
BROADCAST_CANDIDATE_LIMIT = 500_000


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
    n: int = SHINGLE_N,
    shingled: DataFrame | None = None,
    broadcast_candidate_limit: int | None = BROADCAST_CANDIDATE_LIMIT,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (inverted-index join).

    Without ``candidates`` every shingle-sharing pair is scored (small
    corpora / oracle path); with LSH candidates only those pairs are
    scored (the scale path: minhash_lsh_dedup below).

    Broadcast policy: the candidate tables are only hinted broadcast
    when a count probe says they are actually small
    (``<= broadcast_candidate_limit`` pairs). The probe is free in
    amortized terms — ``candidates`` is persisted and consumed by three
    joins anyway. Passing ``broadcast_candidate_limit=None`` or ``<= 0``
    disables the hint entirely AND skips the count probe (an eager
    driver action whose result could not change the plan); above the
    limit no hint is emitted and AQE picks the join strategy. The
    pre-shuffle semi-join pruning is kept in every mode.
    """
    sh = shingled if shingled is not None else word_shingles(docs, text_col, id_col, n).persist()
    # the shingle expansion feeds three consumers (both join sides +
    # sizes): the caller persists it once (minhash_lsh_dedup) or we do.
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    if candidates is not None:
        # prune BOTH sides to docs that appear in any candidate pair
        # BEFORE the inverted-index shuffle — the whole point of LSH is
        # that this set is usually tiny relative to the corpus. Whether
        # it is ACTUALLY tiny is a property of the data, so the
        # broadcast hint is gated on a count probe of the persisted
        # candidate set, never assumed.
        candidates = candidates.persist()
        gate_on = broadcast_candidate_limit is not None and broadcast_candidate_limit > 0
        small = gate_on and candidates.count() <= broadcast_candidate_limit
        hint = F.broadcast if small else (lambda df: df)
        a = a.join(
            hint(candidates.select(F.col("id_a")).distinct()), "id_a", "left_semi"
        )
        b = b.join(
            hint(candidates.select(F.col("id_b")).distinct()), "id_b", "left_semi"
        )
    shared = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    if candidates is not None:
        shared = shared.join(hint(candidates), ["id_a", "id_b"], "left_semi")
        # the size table prunes to candidate docs; its join hint follows
        # the same probe-gated policy (candidate docs <= 2 x candidate
        # pairs). Without candidates (oracle/small-corpus path) sizes is
        # O(docs) — no hint, AQE decides.
        cand_docs = hint(
            candidates.select(F.col("id_a").alias(id_col))
            .union(candidates.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        sizes = sizes.join(cand_docs, id_col, "left_semi")
        sz_a = hint(sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")))
        sz_b = hint(sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")))
    else:
        sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
        sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_candidate_limit: int | None = BROADCAST_CANDIDATE_LIMIT,
    portable: bool = True,
) -> DataFrame:
    """The scale path end-to-end: shingle -> minhash -> LSH buckets ->
    exact-jaccard verification of candidates only. ``portable=False``
    swaps every md5-derived key for native xxhash64 (the production
    fast path; identical RESULTS, tested, no DuckDB parity)."""
    sh = word_shingles(docs, text_col, id_col).persist()
    sigs = minhash_signatures_wide(sh, id_col, portable)
    cands = lsh_bucket_pairs(sigs, id_col, portable)
    return jaccard_pairs(
        docs, threshold, text_col, id_col, candidates=cands, shingled=sh,
        broadcast_candidate_limit=broadcast_candidate_limit,
    )


# ---------------------------------------------------------------- simhash

# 60-bit simhash: portable_hash64 yields 60 bits (15 hex chars of md5),
# which keeps every step JVM-side AND byte-equal to a DuckDB oracle.
SIMHASH_BITS = 60


def simhash_signature(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    portable: bool = True,
) -> DataFrame:
    """(id, sim) — 60-bit simhash, 100% JVM builtins (no Python).

    explode whitespace tokens -> portable md5-int64 token hash -> one
    groupBy with 60 ±1 bit-sum aggregates (map-side partial agg) ->
    sign bits assembled into a single long. Token multiplicity weights
    the sums (classic simhash). Docs with no tokens are absent from the
    output (they have no signature — and no near-dup semantics).

    Replaces the former per-token python md5 loop: the hot path of a
    100 TB dedup must stay inside whole-stage codegen.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    hashed = toks.withColumn("h", hash64("tok", portable))
    sums = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"v{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    sim = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        sim = sim + F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sums.select(F.col(id_col), sim.alias("sim"))


def _simhash_chunks(max_hamming: int) -> tuple[int, int]:
    """(n_chunks, chunk_bits): smallest divisor of 60 > max_hamming so the
    pigeonhole blocking is exhaustive (a pair within hamming distance d
    must agree exactly on at least one of d+1 disjoint chunks)."""
    for n in (2, 3, 4, 5, 6, 10, 12, 15, 20, 30, 60):
        if n > max_hamming:
            return n, SIMHASH_BITS // n
    raise ValueError(f"max_hamming={max_hamming} too large for {SIMHASH_BITS}-bit simhash")


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text",
    id_col: str = "doc_id", portable: bool = True,
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance — exhaustive under
    pigeonhole blocking, never an O(n^2) pair stage.

    Scale path: block by the (max_hamming+1 or more) disjoint bit chunks
    of the simhash; a pair within the hamming budget must agree on at
    least one chunk, so the self-join key is a chunk value, not a cross
    join. The chunk keys are near-uniform (md5-derived bits), so the
    shuffle has no inherent skew; AQE skew-split is the backstop for a
    pathological all-identical corpus.
    """
    n_chunks, chunk_bits = _simhash_chunks(max_hamming)
    mask = (1 << chunk_bits) - 1
    sh = simhash_signature(docs, text_col, id_col, portable)
    chunks = sh.select(
        id_col,
        "sim",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk_idx"),
                    F.shiftright("sim", chunk_bits * c).bitwiseAND(F.lit(mask)).alias("chunk"),
                )
                for c in range(n_chunks)
            ])
        ).alias("ck"),
    ).select(id_col, "sim", "ck.chunk_idx", "ck.chunk")
    a = chunks.select(
        F.col(id_col).alias("id_a"), F.col("sim").alias("sim_a"), "chunk_idx", "chunk"
    )
    b = chunks.select(
        F.col(id_col).alias("id_b"), F.col("sim").alias("sim_b"), "chunk_idx", "chunk"
    )
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------- near-dup component merge


def _free_local_checkpoint(df: DataFrame) -> None:
    """Release the executor storage behind a ``localCheckpoint(eager=True)``
    DataFrame. ``DataFrame.unpersist()`` only touches Dataset cache blocks;
    a local checkpoint's blocks belong to the internal RDD wrapped by the
    plan's LogicalRDD node, reachable via py4j. Best-effort: a plan shape
    we don't recognize just leaves the blocks to the ContextCleaner."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def near_dup_components(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components over the near-dup pair graph: every document
    gets ``cluster_id`` = the minimum doc id reachable through near-dup
    pairs (its own id when it has none). The step a dedup pipeline needs
    BETWEEN pair detection and filtering — near-dup relations are not
    transitive-closed, so keeping `min(id_a, id_b)` per pair both
    over-deletes and under-deletes on chains.

    Plan: min-label propagation. Each iteration is one join of the
    symmetrized edge list against the current labels + a min-aggregate
    per node (both shuffles on the 64-bit id key, map-side partial agg),
    iterated from the driver until a fixpoint — iterations are bounded
    by the component diameter, which for near-dup clusters (cliques +
    short chains) is tiny. This is the standard Spark CC shape (GraphX
    uses the same loop; the alternating large-star/small-star variant is
    the upgrade path for adversarial long-chain graphs). The loop is
    driver CONTROL only — all data work stays partition-parallel.

    Convergence is decided from a ``_changed`` flag computed IN the
    label projection itself (the new label is strictly smaller than the
    old one), so each iteration runs exactly one label join + one
    aggregate over the checkpointed result — no separate old-vs-new
    diff join (round 4: that second join was ~a third of the
    per-iteration cost at toy scale and a full extra shuffle at any
    scale).

    Lineage: each iteration's labels are EAGERLY checkpointed, not just
    persisted. Labels are referenced twice per step (neighbor join +
    convergence diff), so with persist alone the logical plan doubles
    per iteration — a lost cache block late in the run would trigger an
    exponential recompute tree. Checkpointing severs the lineage at
    every step (the executed plan of iteration k reads exactly two
    materialized tables, never the k-1 chain), and the superseded
    iteration's blocks are explicitly freed once the convergence diff
    has consumed them, so executor storage holds at most two label RDDs
    at any moment (plus edges, freed on return).

    Durability: ``localCheckpoint`` dies with a lost executor — fine in
    local mode, not at cluster scale. Pass ``checkpoint_dir`` to run the
    SAME loop over per-iteration parquet label tables with an atomic
    JSON state manifest (the SnapshotStore commit pattern the crawl wave
    loop uses, plans/snapshot.py): every iteration is published by an
    atomic rename AFTER its table lands, so a killed job re-enters at
    the last completed iteration with no recomputation and an identical
    fixpoint (tested in tests/test_round4_hardening.py kill/resume)."""
    if checkpoint_dir is not None:
        return _near_dup_components_durable(
            docs, pairs, id_col, max_iters, checkpoint_dir
        )
    ids = docs.select(F.col(id_col)).distinct()
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # The loop runs over EDGE-TOUCHED nodes only: a node with no pair
    # can never change its label, so the (usually much larger) singleton
    # set is unioned back after the fixpoint with cluster_id = own id —
    # identical output, and every per-round shuffle carries the touched
    # set instead of the whole corpus (dup-touched docs are a fraction
    # of the corpus at any dedup rate worth running). The symmetrized
    # edge list's dst side covers every touched node, and seeding each
    # with min(self, min neighbor) IS hop 1 of the propagation — one
    # groupBy instead of the first full round, so a diameter-D graph
    # converges in D rounds (D-1 hops + the zero-change confirm)
    # instead of D+1.
    labels = (
        edges.groupBy(F.col("dst").alias(id_col))
        .agg(F.min("src").alias("_nbr0"))
        .select(
            F.col(id_col),
            F.least(F.col(id_col), F.col("_nbr0")).alias("cluster_id"),
        )
        # one-time guard, not per-round: a pair endpoint absent from
        # docs must not surface in the output (the identity-seeded loop
        # dropped such rows via its left join over ids)
        .join(ids, id_col, "left_semi")
        .localCheckpoint(eager=False)
    )
    try:
        for _ in range(max_iters):
            nbr_min = (
                edges.join(
                    labels.select(F.col(id_col).alias("src"), "cluster_id"), "src"
                )
                .groupBy(F.col("dst").alias(id_col))
                .agg(F.min("cluster_id").alias("_nbr_min"))
            )
            new_labels = (
                labels.join(nbr_min, id_col, "left")
                .select(
                    F.col(id_col),
                    F.least(
                        F.col("cluster_id"), F.coalesce("_nbr_min", F.col("cluster_id"))
                    ).alias("cluster_id"),
                    (F.coalesce("_nbr_min", F.col("cluster_id")) < F.col("cluster_id"))
                    .cast("int")
                    .alias("_changed"),
                )
                # LAZY checkpoint: the convergence aggregate below is
                # the iteration's one action and materializes it — one
                # job per iteration instead of checkpoint-then-agg two
                .localCheckpoint(eager=False)
            )
            changed = new_labels.agg(F.sum("_changed")).collect()[0][0]
            # the join was the old labels' last consumer — free its blocks
            _free_local_checkpoint(labels)
            labels = new_labels
            if not changed:  # 0, or NULL when the pair graph is empty
                break
        else:
            raise RuntimeError(
                f"near_dup_components did not converge in {max_iters} iterations"
            )
    finally:
        _free_local_checkpoint(edges)
    singletons = ids.join(labels.select(id_col), id_col, "left_anti").select(
        F.col(id_col), F.col(id_col).alias("cluster_id")
    )
    return labels.drop("_changed").unionByName(singletons)


def _cc_state_path(checkpoint_dir: str) -> str:
    import os

    return os.path.join(checkpoint_dir, "_cc_state.json")


def _cc_write_state(checkpoint_dir: str, state: dict) -> None:
    """Atomic publish: tmp + rename, same commit semantics as
    SnapshotStore manifests — the state file IS the iteration commit."""
    import json
    import os
    import tempfile

    fd, tmp = tempfile.mkstemp(dir=checkpoint_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _cc_state_path(checkpoint_dir))


def _near_dup_components_durable(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    max_iters: int,
    checkpoint_dir: str,
) -> DataFrame:
    """Cluster-durable label propagation: per-iteration parquet label
    tables + an atomically renamed state manifest. The parquet boundary
    severs lineage exactly like localCheckpoint but survives executor
    (and whole-job) loss: resume re-reads ``labels-<k>`` for the last
    COMMITTED k and continues; a crash between the table write and the
    state rename just rewrites that iteration (overwrite mode — writes
    are idempotent, the propagation step is deterministic). Superseded
    label tables two iterations back are deleted to bound storage."""
    import json
    import os
    import shutil

    os.makedirs(checkpoint_dir, exist_ok=True)
    spark = docs.sparkSession

    def ldir(i: int) -> str:
        return os.path.join(checkpoint_dir, f"labels-{i:04d}")

    edges_path = os.path.join(checkpoint_dir, "edges")
    sp = _cc_state_path(checkpoint_dir)
    if os.path.exists(sp):
        with open(sp) as f:
            state = json.load(f)
        start = state["iter"]
        if state.get("converged"):
            return spark.read.parquet(ldir(start)).drop("_changed")
    else:
        (
            pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
            .unionAll(
                pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
            )
            .distinct()
            .write.mode("overwrite")
            .parquet(edges_path)
        )
        docs.select(F.col(id_col)).distinct().select(
            F.col(id_col), F.col(id_col).alias("cluster_id")
        ).write.mode("overwrite").parquet(ldir(0))
        start = 0
        _cc_write_state(checkpoint_dir, {"iter": 0, "converged": False})
    edges = spark.read.parquet(edges_path)
    for i in range(start + 1, start + 1 + max_iters):
        labels = spark.read.parquet(ldir(i - 1))
        nbr_min = (
            edges.join(labels.select(F.col(id_col).alias("src"), "cluster_id"), "src")
            .groupBy(F.col("dst").alias(id_col))
            .agg(F.min("cluster_id").alias("_nbr_min"))
        )
        (
            labels.join(nbr_min, id_col, "left")
            .select(
                F.col(id_col),
                F.least(
                    F.col("cluster_id"), F.coalesce("_nbr_min", F.col("cluster_id"))
                ).alias("cluster_id"),
                # convergence flag computed in the projection (see the
                # in-memory loop): the committed table IS the diff
                (F.coalesce("_nbr_min", F.col("cluster_id")) < F.col("cluster_id"))
                .cast("int")
                .alias("_changed"),
            )
            .write.mode("overwrite")
            .parquet(ldir(i))
        )
        changed = (
            spark.read.parquet(ldir(i)).agg(F.sum("_changed")).collect()[0][0]
        )
        converged = changed == 0
        _cc_write_state(checkpoint_dir, {"iter": i, "converged": converged})
        if i >= 2:
            shutil.rmtree(ldir(i - 2), ignore_errors=True)
        if converged:
            return spark.read.parquet(ldir(i)).drop("_changed")
    raise RuntimeError(
        f"near_dup_components did not converge in {max_iters} iterations"
    )


def _symmetrize_pairs(pairs: DataFrame) -> DataFrame:
    return (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionAll(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _star(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star phase (Kiveris et al. 2014): connect
    each node's strictly-larger (large) / ``<=`` (small) neighbors to
    ``m = min(N(u) ∪ {u})``. One symmetrize + one min-agg + one join,
    all shuffled on the id key with map-side partial agg."""
    nbr = (
        edges.unionAll(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
    )
    mins = nbr.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    joined = nbr.join(mins, "u")
    if large:
        out = joined.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
    else:
        out = joined.filter(F.col("v") <= F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).unionAll(mins.select(F.col("u"), F.col("m").alias("v")))
    return out.filter(F.col("u") != F.col("v")).distinct()


def _edge_checksum(edges: DataFrame) -> tuple:
    """Order-insensitive edge-set checksum: count + TWO independent
    64-bit pair-hash sums (decimal(38) — a plain long sum overflows
    under ANSI arithmetic). A premature-stop collision needs both sums
    to collide simultaneously (~2^-128)."""

    def hsum(*cols) -> Column:
        return F.coalesce(
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        )

    row = edges.agg(
        F.count("*").alias("n"),
        hsum("u", "v").alias("h1"),
        hsum("u", "v", F.lit(1)).alias("h2"),
    ).collect()[0]
    return row["n"], str(row["h1"]), str(row["h2"])


def _star_labels(edges: DataFrame, docs: DataFrame, id_col: str) -> DataFrame:
    """Fixpoint star edges -> per-doc cluster labels: every non-center
    node u carries (u, center); isolated docs label themselves."""
    roots = (
        edges.unionAll(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("cluster_id"))
        .select(F.col("u").alias(id_col), "cluster_id")
    )
    return (
        docs.select(F.col(id_col))
        .distinct()
        .join(roots, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
    )


def near_dup_components_twophase(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    rounds (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — the documented upgrade path over min-label propagation
    for ADVERSARIAL graphs: propagation needs O(diameter) rounds (a
    10^6-node chain = 10^6 joins), two-phase converges in O(log n)
    rounds on any graph.

    Per round, each phase is one symmetrize + one min-aggregate + one
    join — all shuffles on the id key with map-side partial agg, same
    cost shape as a propagation step. large-star(u) connects every
    strictly-larger neighbor to ``m = min(N(u) ∪ {u})``; small-star(u)
    connects every ``<=``-neighbor and u itself to m. At the fixpoint
    the edges form stars whose centers are the component minima.
    Convergence is detected by an order-insensitive edge-set checksum:
    count plus TWO independent 64-bit pair-hash sums (different hash
    seeds). The failure mode of a checksum equality is PREMATURE STOP —
    two *different* consecutive edge sets colliding would end the loop
    at a non-fixpoint and return wrong clusters — so the check is
    doubled: a false stop needs both sums to collide simultaneously
    (~2^-128 for the 64-bit pair). An exact set-diff per round would
    cost an extra full shuffle of both edge sets; the double hash keeps
    convergence detection at one tiny aggregate. Each round's edge set
    is eagerly checkpointed and the superseded one freed, exactly like
    the propagation loop.

    Durability: the adversarial-graph path runs the MOST rounds, so it
    is the most exposed to executor loss mid-run. Pass
    ``checkpoint_dir`` to run the same loop over per-round parquet edge
    tables with the atomic state-manifest commit the propagation loop
    uses: a killed job re-enters at the last committed round (the
    stored checksum makes the convergence compare resumable too) and
    reaches an identical fixpoint with no recomputation."""
    if checkpoint_dir is not None:
        return _near_dup_components_twophase_durable(
            docs, pairs, id_col, max_iters, checkpoint_dir
        )
    # LAZY checkpoints: the checksum collect right after each one is the
    # round's single action and materializes it — one job per round
    # instead of checkpoint-then-checksum two
    edges = _symmetrize_pairs(pairs).localCheckpoint(eager=False)
    prev_sum = _edge_checksum(edges)
    try:
        for _ in range(max_iters):
            new_edges = _star(_star(edges, large=True), large=False).localCheckpoint(
                eager=False
            )
            new_sum = _edge_checksum(new_edges)
            _free_local_checkpoint(edges)
            edges = new_edges
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
        else:
            raise RuntimeError(
                f"near_dup_components_twophase did not converge in {max_iters} rounds"
            )
    except Exception:
        _free_local_checkpoint(edges)
        raise
    # the label table is MATERIALIZED (eager checkpoint) before the
    # final edge set is freed — the returned frame must not depend on
    # freed blocks
    labels = _star_labels(edges, docs, id_col).localCheckpoint(eager=True)
    _free_local_checkpoint(edges)
    return labels


def _near_dup_components_twophase_durable(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    max_iters: int,
    checkpoint_dir: str,
) -> DataFrame:
    """Cluster-durable two-phase CC: per-round parquet edge tables + the
    atomically renamed state manifest (`_cc_write_state`, same commit
    semantics as `_near_dup_components_durable`). The state carries the
    last committed round's checksum, so a resumed job's first
    convergence compare is against exactly the edge set it compares in
    an uninterrupted run. A crash between a table write and the state
    rename rewrites that round idempotently (overwrite mode, the star
    rounds are deterministic). Edge tables two rounds back are deleted
    to bound storage; the fixpoint table is kept until the caller's
    labels are computed (off parquet, so no checkpoint needed)."""
    import json
    import os
    import shutil

    os.makedirs(checkpoint_dir, exist_ok=True)
    spark = docs.sparkSession

    def edir(i: int) -> str:
        return os.path.join(checkpoint_dir, f"edges-{i:04d}")

    sp = _cc_state_path(checkpoint_dir)
    if os.path.exists(sp):
        with open(sp) as f:
            state = json.load(f)
        start = state["round"]
        prev_sum = (state["n"], state["h1"], state["h2"])
        if state.get("converged"):
            return _star_labels(spark.read.parquet(edir(start)), docs, id_col)
    else:
        _symmetrize_pairs(pairs).write.mode("overwrite").parquet(edir(0))
        start = 0
        prev_sum = _edge_checksum(spark.read.parquet(edir(0)))
        n, h1, h2 = prev_sum
        _cc_write_state(
            checkpoint_dir,
            {"round": 0, "converged": False, "n": n, "h1": h1, "h2": h2},
        )
    for i in range(start + 1, start + 1 + max_iters):
        edges = spark.read.parquet(edir(i - 1))
        _star(_star(edges, large=True), large=False).write.mode("overwrite").parquet(
            edir(i)
        )
        new_sum = _edge_checksum(spark.read.parquet(edir(i)))
        converged = new_sum == prev_sum
        n, h1, h2 = new_sum
        _cc_write_state(
            checkpoint_dir,
            {"round": i, "converged": converged, "n": n, "h1": h1, "h2": h2},
        )
        if i >= 2:
            shutil.rmtree(edir(i - 2), ignore_errors=True)
        if converged:
            return _star_labels(spark.read.parquet(edir(i)), docs, id_col)
        prev_sum = new_sum
    raise RuntimeError(
        f"near_dup_components_twophase did not converge in {max_iters} rounds"
    )


def dedup_keep_cluster_representatives(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The filtered corpus: one representative (min id) per near-dup
    component — a semi-join of docs against the cluster keepers."""
    comps = near_dup_components(docs, pairs, id_col)
    keepers = comps.filter(F.col(id_col) == F.col("cluster_id")).select(id_col)
    return docs.join(keepers, id_col, "left_semi")


# ------------------------------------------------- substring-span dedup

def duplicated_window_stats(
    docs: DataFrame,
    window_chars: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
    stride: int = 1,
    portable: bool = True,
) -> DataFrame:
    """Exact substring-duplication detection (span-level dedup a la
    'Deduplicating Training Data Makes Language Models Better', Lee et
    al. 2022): every ``window_chars``-char window of normalized text is
    hashed; a window whose hash occurs more than once in the CORPUS is
    duplicated. Returns per-doc (n_windows, n_dup_windows).

    Plan: windows are a JVM array transform over a position sequence
    (one md5 per position — no Python), exploded ONCE to skinny (id, h)
    rows; corpus-wide occurrence counts come from a ``count(*) over
    (partition by h)`` window (one exchange on h, no self-join — the
    former groupBy(h)+join shape re-ran the explode and shuffled the
    full exploded volume twice); a final groupBy(id) aggregates the dup
    flags. Two shuffles total on high-entropy keys, one Generate, no
    pair stage. Docs shorter than the window contribute one whole-text
    window, so nothing silently disappears.

    ``stride`` is the 100 TB knob: stride=1 is the exhaustive Lee et al.
    definition — one exploded row PER CHARACTER POSITION, ~8-16x the
    corpus text bytes shuffled twice, petabytes at 100 TB. stride=s
    samples every s-th start position, cutting the exploded volume (and
    both shuffles) by s while still flagging any duplicated run of
    ``window_chars + s - 1`` chars or longer in at least one window
    (aligned duplicates — whole-doc or whole-paragraph boilerplate, the
    dominant case — are detected at full fidelity because their windows
    sample identically). The exhaustive stride-1 path stays the oracle.
    """
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    norm = normalize_text(text_col)
    n_win = F.greatest(F.length(norm) - F.lit(window_chars - 1), F.lit(1))
    docs_n = docs.select(F.col(id_col), norm.alias("_t"), n_win.alias("_n"))
    hash_expr = (
        f"conv(substr(md5(substring(_t, i, {window_chars})), 1, 15), 16, 10)"
        if portable
        else f"xxhash64(substring(_t, i, {window_chars}))"
    )
    wins = docs_n.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(1, _n, {stride}), i -> {hash_expr})"
            ).cast("array<long>")
        ).alias("h"),
    )
    from pyspark.sql import Window

    flagged = wins.withColumn(
        "_cnt", F.count("*").over(Window.partitionBy("h"))
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_windows"),
        F.sum(F.when(F.col("_cnt") > 1, 1).otherwise(0)).cast("long").alias("n_dup_windows"),
    )
