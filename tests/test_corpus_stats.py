"""Materialized corpus-length stats (indexer.corpus_stats_increment /
title_stats_increment, search.corpus_avg_len): the BM25-family scorers'
per-corpus scalars (avgdl, per-field average lengths) must come from the
append-only delta table run_round maintains — a query must NEVER
aggregate the postings table for them (at 100 TB that is a corpus scan
per query on the read path).

The construction-time guard uses a postings relation backed by a UDF
that raises on execution: if search_bm25/search_bm25f touch postings
while resolving stats, the call itself blows up; with corpus_stats they
must construct cleanly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from see_spark.operators.indexer import (
    corpus_stats_increment,
    title_stats_increment,
)
from see_spark.operators.search import (
    corpus_avg_len,
    search_bm25,
    search_bm25f,
)


def _postings(spark, rows):
    return spark.createDataFrame(
        rows, "word string, doc_id string, term_count long, doc_len long, tf double"
    )


POSTINGS_ROWS = [
    ("alpha", "d1", 2, 4, 0.5),
    ("beta", "d1", 2, 4, 0.5),
    ("alpha", "d2", 1, 6, 1 / 6),
    ("gamma", "d2", 5, 6, 5 / 6),
    ("beta", "d3", 2, 2, 1.0),
]


def test_increment_counts_docs_once_and_sums_lengths(spark):
    inc = corpus_stats_increment(_postings(spark, POSTINGS_ROWS)).collect()
    assert len(inc) == 1
    row = inc[0]
    assert row["field"] == "body"
    assert row["n_docs"] == 3
    assert row["sum_len"] == 4 + 6 + 2


def test_empty_increment_is_zero_row(spark):
    inc = corpus_stats_increment(_postings(spark, [])).collect()
    assert len(inc) == 1
    assert inc[0]["n_docs"] == 0 and inc[0]["sum_len"] == 0


def test_summed_deltas_equal_global_average(spark):
    """Two per-round deltas summed by corpus_avg_len == the postings-wide
    distinct-doc average the old read path computed."""
    r1 = _postings(spark, POSTINGS_ROWS[:2])   # d1 only
    r2 = _postings(spark, POSTINGS_ROWS[2:])   # d2, d3
    stats = corpus_stats_increment(r1).unionByName(corpus_stats_increment(r2))
    want = (
        _postings(spark, POSTINGS_ROWS)
        .select("doc_id", "doc_len").distinct()
        .agg(F.avg("doc_len")).collect()[0][0]
    )
    assert corpus_avg_len(stats, "body") == pytest.approx(want)
    assert corpus_avg_len(stats, "title") is None


def test_title_stats_match_title_postings_distinct_avg(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "Hello World Pages"),
            ("d2", "ok"),          # single token (>= 2-byte length guard)
            ("d3", None),          # no title -> excluded
            ("d4", "... x"),       # tokenizes empty (guard drops "x")
        ],
        "doc_id string, title string",
    )
    inc = title_stats_increment(docs).collect()[0]
    assert inc["field"] == "title"
    assert inc["n_docs"] == 2
    assert inc["sum_len"] == 3 + 1


def _exploding_postings(spark):
    """A postings relation that raises if any job executes it."""

    @F.udf(T.LongType())
    def _boom(x):
        raise RuntimeError("postings relation executed at query-construction time")

    # the sentinel rides doc_len — the column the per-query stats
    # fallback aggregates (Catalyst prunes unread columns, so a sentinel
    # on an unread column would never fire)
    return spark.range(3).select(
        F.lit("alpha").alias("word"),
        F.col("id").cast("string").alias("doc_id"),
        F.lit(1).cast("long").alias("term_count"),
        _boom("id").alias("doc_len"),
        F.lit(0.1).alias("tf"),
    )


def _stats_df(spark):
    return spark.createDataFrame(
        [("body", 10, 120), ("title", 10, 30)],
        "field string, n_docs long, sum_len long",
    )


def test_bm25_with_corpus_stats_never_executes_postings(spark):
    """Plan-guard: constructing the BM25 query with corpus_stats must not
    run any job over postings (the lazy result plan is never executed
    here). The companion check proves the guard mechanism detects a scan."""
    docs = spark.createDataFrame([("1", "t")], "doc_id string, title string")
    boom = _exploding_postings(spark)
    # must construct cleanly: stats resolved from the delta table only
    search_bm25(
        spark, "alpha beta", boom, docs, 10, corpus_stats=_stats_df(spark)
    )
    # companion: WITHOUT corpus_stats the fallback aggregates postings at
    # construction time and the sentinel fires
    with pytest.raises(Exception, match="postings relation executed"):
        search_bm25(spark, "alpha beta", boom, docs, 10)


def test_bm25f_with_corpus_stats_never_executes_postings(spark):
    docs = spark.createDataFrame([("1", "t")], "doc_id string, title string")
    boom = _exploding_postings(spark)
    title = boom.withColumnRenamed("doc_len", "title_len")
    search_bm25f(
        spark, "alpha", boom, title, docs, 10, corpus_stats=_stats_df(spark)
    )
    with pytest.raises(Exception, match="postings relation executed"):
        search_bm25f(spark, "alpha", boom, title, docs, 10)


def test_bm25_scores_identical_with_and_without_stats(spark):
    """The materialized path is a pure plumbing change: identical scores
    to the fallback postings aggregate."""
    postings = _postings(spark, POSTINGS_ROWS)
    docs = spark.createDataFrame(
        [("d1", "one"), ("d2", "two"), ("d3", "three")],
        "doc_id string, title string",
    )
    stats = corpus_stats_increment(postings)
    got = search_bm25(
        spark, "alpha beta", postings, docs, 3, corpus_stats=stats
    ).collect()
    want = search_bm25(spark, "alpha beta", postings, docs, 3).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got  # non-degenerate: d1 matches both words


def test_run_round_commits_corpus_stats(crawl_result):
    """run_round maintains the table: summed deltas equal the committed
    postings' distinct-doc average, and the title field is present."""
    catalog, _metrics, _oracle = crawl_result
    stats = catalog.read("corpus_stats")
    assert catalog.current_snapshot("corpus_stats") is not None
    postings = catalog.read("postings")
    want = (
        postings.select("doc_id", "doc_len").distinct()
        .agg(F.avg("doc_len")).collect()[0][0]
    )
    assert corpus_avg_len(stats, "body") == pytest.approx(want)
    title_avg = corpus_avg_len(stats, "title")
    assert title_avg is not None and title_avg > 0


def test_serving_bm25_rank_over_catalog(spark, crawl_result):
    """serving.search_results(rank='bm25') serves results through the
    materialized corpus_stats table."""
    from see_spark.serving import search_results

    catalog, _metrics, _oracle = crawl_result
    rows = search_results(
        spark, catalog, "composer", k=10, with_score=True, rank="bm25"
    )
    assert rows, "bm25 serving path returned no results for a corpus word"
    assert all(set(r) == {"url", "title", "score"} for r in rows)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
