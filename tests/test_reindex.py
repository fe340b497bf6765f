"""Incremental re-indexing (indexer.py:word_stats_reindex_delta): signed
df deltas on content change, the invariant that initial increment + all
reindex deltas == the df of the final corpus state, and edge cases
(vanished doc, unchanged doc, brand-new words)."""

from __future__ import annotations

from pyspark.sql import functions as F

from see_spark.operators.indexer import (
    word_stats_increment,
    word_stats_reindex_delta,
)


def _postings(spark, rows):
    """rows: (doc_id, 'w1 w2 ...') -> one row per (doc_id, word)."""
    flat = [(d, w) for d, text in rows for w in set(text.split())]
    return spark.createDataFrame(flat, "doc_id long, word string")


def test_signed_deltas(spark):
    old = _postings(spark, [(1, "apple banana"), (2, "banana cherry")])
    new = _postings(spark, [(1, "apple dates"), (2, "banana cherry")])
    got = {
        r.word: r.df
        for r in word_stats_reindex_delta(old, new).collect()
    }
    # banana lost doc 1 (-1), dates appeared in doc 1 (+1); apple/cherry
    # unchanged -> absent from the delta
    assert got == {"banana": -1, "dates": 1}


def test_doc_vanishes_and_appears(spark):
    old = _postings(spark, [(1, "solo words here")])
    new = _postings(spark, [])  # changed doc now has no text rows
    got = {r.word: r.df for r in word_stats_reindex_delta(old, new).collect()}
    assert got == {"solo": -1, "words": -1, "here": -1}
    # symmetric: indexing a doc that had no postings
    got2 = {r.word: r.df for r in word_stats_reindex_delta(new, old).collect()}
    assert got2 == {"solo": 1, "words": 1, "here": 1}


def test_unchanged_doc_emits_nothing(spark):
    p = _postings(spark, [(1, "same words"), (2, "other words")])
    assert word_stats_reindex_delta(p, p).count() == 0


def test_increment_plus_deltas_equals_final_df(spark):
    """The word_stats ledger invariant: initial increments + reindex
    deltas sum to the true df of the final corpus state."""
    round1 = [(1, "the cat sat"), (2, "the dog ran"), (3, "a cat ran")]
    # round 2: docs 1 and 3 change
    round2_changed = [(1, "the cat purred loudly"), (3, "a bird ran")]
    final = [(1, "the cat purred loudly"), (2, "the dog ran"), (3, "a bird ran")]

    inc = word_stats_increment(
        _postings(spark, round1).withColumn("term_count", F.lit(1))
    )
    delta = word_stats_reindex_delta(
        _postings(spark, [r for r in round1 if r[0] in (1, 3)]),
        _postings(spark, round2_changed),
    )
    ledger = (
        inc.union(delta)
        .groupBy("word")
        .agg(F.sum("df").cast("long").alias("df"))
        .filter(F.col("df") != 0)
    )
    truth = (
        _postings(spark, final)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("df"))
    )
    got = {r.word: r.df for r in ledger.collect()}
    want = {r.word: r.df for r in truth.collect()}
    assert got == want


def test_doc_keywords_distinguishing_terms_and_word_stats_path(spark):
    """The shared stopword-ish term (in every doc -> negative idf) must
    rank below each doc's unique terms; the materialized word_stats path
    must agree with the postings-derived path."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from see_spark.operators.indexer import doc_keywords, document_frequencies

    docs = spark.createDataFrame(
        [(1, "common apple apple"), (2, "common banana cherry"),
         (3, "common cherry cherry")],
        "doc_id long, text string",
    )
    postings = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        )
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("term_count"))
        .withColumn(
            "doc_len",
            F.sum("term_count").over(Window.partitionBy("doc_id")),
        )
        .withColumn("tf", F.col("term_count") / F.col("doc_len"))
    )
    top = doc_keywords(postings, page_count=3, k=1)
    got = {r["doc_id"]: r["word"] for r in top.collect()}
    # 'common' has df=3 -> idf = ln(3/4) < 0; unique terms win everywhere
    assert got == {1: "apple", 2: "banana", 3: "cherry"}
    ws = document_frequencies(postings)
    via_stats = doc_keywords(postings, 3, k=1, word_stats=ws)
    assert sorted(map(tuple, via_stats.collect())) == sorted(
        map(tuple, top.collect())
    )
