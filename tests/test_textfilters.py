"""Corpus-curation filter operators (textfilters.py): unit invariants on a
hand-built corpus + plan checks that every filter stays JVM-side (no
Python eval nodes anywhere — these run over the full corpus at 100 TB)."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from see_spark.operators.textfilters import (
    gopher_repetition,
    line_dedup,
    pii_redact,
    stratified_sample,
    top_bigrams,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # 16 tokens = exactly 2 pseudo-lines, line2 == line1 (dup lines)
        (1, "a b c d e f g h a b c d e f g h", "en"),
        # repeated bigram "x y" dominates
        (2, "x y x y x y x y z", "en"),
        # plain doc with an email and an ip
        (3, "write to bob@corp.example.net from 192.168.1.7 today", "de"),
        # 1-token doc (bigram edge case)
        (4, "solo", "fr"),
        (5, "p q r s t u v w p2 q2 r2 s2 t2 u2 v2 w2 tail", "zh"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_pii_redact_counts_and_hash(corpus):
    out = {r["doc_id"]: r for r in pii_redact(corpus).collect()}
    assert out[3]["n_emails"] == 1 and out[3]["n_ipv4"] == 1
    assert out[1]["n_emails"] == 0 and out[1]["n_ipv4"] == 0
    expected = "write to <EMAIL> from <IP> today"
    assert out[3]["redacted_md5"] == hashlib.md5(expected.encode()).hexdigest()
    # untouched docs hash to their original text
    orig = "solo"
    assert out[4]["redacted_md5"] == hashlib.md5(orig.encode()).hexdigest()


def test_gopher_repetition_signals(corpus):
    out = {r["doc_id"]: r for r in gopher_repetition(corpus).collect()}
    # doc 1: 2 identical 8-token lines -> dup_line_frac = 0.5
    assert out[1]["n_lines"] == 2 and out[1]["dup_line_frac"] == 0.5
    # doc 2: "x y" occurs 4 times in 9 tokens -> 8/9 coverage, flagged
    assert out[2]["top_bigram_frac"] == pytest.approx(8 / 9)
    assert out[2]["flagged"] == 1
    # doc 4: single token -> no bigrams, frac 0, one line, unflagged
    assert out[4]["top_bigram_frac"] == 0.0 and out[4]["flagged"] == 0
    # doc 5: 17 tokens -> 3 lines (8+8+1), all distinct
    assert out[5]["n_lines"] == 3 and out[5]["dup_line_frac"] == 0.0


def test_line_dedup_drops_cross_doc_lines(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h u1 u2 u3 u4 u5 u6 u7 u8"),
            (2, "a b c d e f g h v1 v2 v3 v4 v5 v6 v7 v8"),  # line1 shared
            (3, "w1 w2 w3 w4 w5 w6 w7 w8"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, max_docs=1).collect()}
    assert out[1]["n_lines"] == 2 and out[1]["kept_lines"] == 1
    assert out[2]["kept_lines"] == 1
    assert out[3]["kept_lines"] == 1
    assert out[1]["kept_md5"] == hashlib.md5(
        b"u1 u2 u3 u4 u5 u6 u7 u8"
    ).hexdigest()
    # a fully-deduped doc survives with md5('')
    both = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h")], ["doc_id", "text"]
    )
    gone = {r["doc_id"]: r for r in line_dedup(both, max_docs=1).collect()}
    assert gone[1]["kept_lines"] == 0
    assert gone[1]["kept_md5"] == hashlib.md5(b"").hexdigest()


def test_top_bigrams_pinned_tiebreak(corpus):
    rows = top_bigrams(corpus, k=3).collect()
    assert rows[0]["bigram"] == "x y" and rows[0]["cnt"] == 4
    # ties broken by bigram ascending
    counts = [r["cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_stratified_sample_deterministic(corpus):
    a = sorted(r["doc_id"] for r in stratified_sample(corpus).collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(corpus.repartition(7)).collect()
    )
    assert a == b  # partitioning-independent membership
    kept = stratified_sample(corpus).collect()
    assert all(0 <= r["bucket"] < 1000 for r in kept)


def test_filters_stay_jvm_side(corpus):
    """No Python eval node in any filter plan — these scan the full corpus."""
    for df in (
        pii_redact(corpus),
        gopher_repetition(corpus),
        line_dedup(corpus),
        top_bigrams(corpus),
        stratified_sample(corpus),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, plan[:2000]


def test_top_bigrams_is_take_ordered(corpus):
    plan = top_bigrams(corpus, k=20)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_readability_hand_values_and_edges(spark):
    from see_spark.operators.textstats import readability

    docs = spark.createDataFrame(
        [
            # 6 words, 2 sentences, syllable groups counted as vowel runs
            (1, "the cat sat down. it purred loudly!"),
            (2, ""),              # empty doc -> clamped floors, no crash
            (3, "xz qrs"),        # zero vowels/y -> zero syllables
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in readability(docs).collect()}
    r1 = rows[1]
    assert r1["n_words"] == 7 and r1["n_sentences"] == 2
    # vowel groups: e,a,a,ow(o+w? no: 'ou' in down? 'down'->'o'; purred:
    # u,e; loudly: 'ou','y'; it: i; the: e; cat: a; sat: a -> count them
    # exactly as the regex does:
    import re
    want_syl = len(re.findall(r"[aeiouy]+", docs.collect()[0]["text"].lower()))
    assert r1["n_syllables"] == want_syl
    assert r1["fk_grade_milli"] == (
        390 * 7 // 2 + 11800 * want_syl // 7 - 15590
    )
    assert rows[2]["n_words"] == 1 and rows[2]["n_sentences"] == 1
    assert rows[3]["n_syllables"] == 0
    assert rows[3]["fk_grade_milli"] == 390 * 2 // 1 + 0 - 15590
