"""Positional index: build positions, phrase/proximity semantics, snippets."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "big table hash join in a big table hash"),
        (2, "table of hash maps"),          # not adjacent
        (3, "hash table hash table hash"),  # phrase reversed + overlapping
        (4, "x table hash"),                # 1-byte token dropped -> positions shift
        (5, "nothing relevant here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_positions_are_post_filter_indices(spark, docs):
    from see_spark.operators.positional import positional_postings

    rows = positional_postings(docs.filter("doc_id = 4")).collect()
    # "x" (1 byte) is dropped; surviving tokens renumber from 0
    assert {(r.word, r.pos) for r in rows} == {("table", 0), ("hash", 1)}


def test_phrase_search_adjacency_and_multiplicity(spark, docs):
    from see_spark.operators.positional import phrase_search

    got = {
        r.doc_id: (r.n_occurrences, r.first_pos)
        for r in phrase_search(docs, ["table", "hash"]).collect()
    }
    # doc1: positions (1,2) and (6,7); doc2 not adjacent; doc3 has
    # "table hash" at (1,2) and (3,4); doc4 at (0,1) after the drop
    assert got == {1: (2, 1), 3: (2, 1), 4: (1, 0)}


def test_phrase_three_words(spark, docs):
    from see_spark.operators.positional import phrase_search

    got = {r.doc_id for r in
           phrase_search(docs, ["table", "hash", "join"]).collect()}
    assert got == {1}


def test_proximity_window_and_min_dist(spark, docs):
    from see_spark.operators.positional import proximity_search

    got = {
        r.doc_id: (r.n_pairs, r.min_dist)
        for r in proximity_search(docs, "table", "join", window=2).collect()
    }
    # doc1: table@{1,6}, join@{3}: |1-3|=2 ok, |6-3|=3 out -> 1 pair
    assert got == {1: (1, 2)}


def test_snippets_window_clamps_at_edges(spark, docs):
    from see_spark.operators.positional import phrase_snippets

    got = {r.doc_id: r.snippet
           for r in phrase_snippets(docs, ["table", "hash"], context=2).collect()}
    # doc4 first_pos=0: window clamps to start
    assert got[4] == "table hash"
    # doc1 first_pos=1: 2 left-context tokens available only 1
    assert got[1] == "big table hash join in"


def test_plan_has_no_python_and_prunes_columns(spark, docs):
    from see_spark.operators.positional import phrase_search

    plan = phrase_search(docs, ["table", "hash"])._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
