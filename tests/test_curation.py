"""End-to-end webtext curation chain (plans/curation.py): stage
flags, keep verdict, report consistency, PII rewriting, dedup
keep-first, optional decontamination / DSIR / packing wiring."""

from __future__ import annotations

import pyspark.sql.functions as F

from sharepointcrawler_spark.plans.curation import curate_webtext

GOOD = (
    "this is a perfectly ordinary english sentence with many common words.\n"
    "the second line also ends with proper punctuation and enough words.\n"
    "a third retained line keeps the c4 gate satisfied for this page."
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stage_flags_and_keep(spark):
    rows = [
        (1, GOOD),
        (2, GOOD + "\nlorem ipsum dolor sit amet right here."),  # c4 page flag
        (3, "le chat le chien le cheval et le la les un une des du au.\n" * 3),  # lang
        (4, "short line.\ntiny bit.\nwee words here now yes."),  # c4 5-word rule
        (5, GOOD),  # duplicate of 1 -> flag_dup
    ]
    res = curate_webtext(_docs(spark, rows))
    d = {r["doc_id"]: r for r in res.docs.collect()}
    assert d[1]["keep"] is True
    assert d[2]["flag_c4"] and not d[2]["keep"]
    assert not d[3]["keep"]  # lang or quality gate catches it
    assert d[4]["flag_c4"]   # every line under 5 words -> <3 kept lines
    assert d[5]["flag_dup"] and not d[5]["keep"]
    rep = res.report.first()
    assert rep["n_in"] == 5 and rep["n_kept"] == 1
    assert rep["flag_dup"] == 1


def test_pii_redacted_in_curated_text(spark):
    rows = [(1, GOOD + "\ncontact someone at user@example.com for more info.")]
    res = curate_webtext(_docs(spark, rows))
    r = res.docs.first()
    assert "user@example.com" not in r["curated_text"]
    assert r["keep"] is True  # PII redacts, never drops


def test_eval_decontamination_flag(spark):
    leak = " ".join(f"w{i}" for i in range(20)) + " ends with punctuation."
    rows = [(1, GOOD), (2, GOOD + "\n" + leak)]
    eval_set = spark.createDataFrame(
        [(100, leak)], "eval_id long, text string"
    )
    res = curate_webtext(_docs(spark, rows), eval_set=eval_set)
    d = {r["doc_id"]: r for r in res.docs.collect()}
    assert not d[1]["flag_eval"] and d[1]["keep"]
    assert d[2]["flag_eval"] and not d[2]["keep"]


def test_dsir_and_packing_wiring(spark):
    rows = [(i, GOOD) if i % 2 == 0 else
            (i, "buy cheap pills now click here for the winner prize today.\n" * 3)
            for i in range(10)]
    target = _docs(spark, [(100, GOOD)])
    res = curate_webtext(_docs(spark, rows), target_docs=target, seq_len=16)
    d = {r["doc_id"]: r for r in res.docs.collect()}
    assert "weight_bits" in res.docs.columns
    even_w = {d[i]["avg_millibits"] for i in range(0, 10, 2)}
    odd_w = {d[i]["avg_millibits"] for i in range(1, 10, 2) if d[i]["avg_millibits"] is not None}
    if odd_w:
        assert min(even_w) > max(odd_w)
    packed = res.packed.collect()
    kept_ids = {r["doc_id"] for r in res.docs.collect() if r["keep"]}
    assert {r["doc_id"] for r in packed} <= kept_ids
    # spans tile every kept doc's tokens exactly
    tok = {r["doc_id"]: r["n_tokens"] for r in res.docs.collect() if r["keep"]}
    covered = {}
    for r in packed:
        covered[r["doc_id"]] = covered.get(r["doc_id"], 0) + (
            r["doc_tok_end"] - r["doc_tok_start"]
        )
    assert covered == {i: tok[i] for i in kept_ids}
