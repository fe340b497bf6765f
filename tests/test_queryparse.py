"""Query-language entry (core/queryparse.py + search.search_query):
grammar unit cases on the pure kernel, and pinned composition semantics —
each modifier must behave exactly like its standalone operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from see_spark.core.queryparse import parse_query
from see_spark.operators.search import search, search_query


def test_parse_query_grammar():
    p = parse_query('alan turing "imitation game" title:wiki -enigma bombe~')
    assert p["terms"] == ["alan", "turing"]
    assert p["phrases"] == [["imitation", "game"]]
    assert p["title"] == ["wiki"]
    assert p["exclude"] == ["enigma"]
    assert p["fuzzy"] == ["bombe"]


def test_parse_query_edge_cases():
    assert parse_query("") == {
        "terms": [], "phrases": [], "title": [], "exclude": [], "fuzzy": [],
    }
    # tokenizer runs inside every modifier: case folds, separators split
    assert parse_query("TITLE:FooBar")["title"] == ["foobar"]
    # phrases are cut first, so -"..." leaves a bare '-' which is dropped
    # (tokens below the kernel's 2-byte guard vanish inside phrases too)
    assert parse_query('-"xy zz"')["phrases"] == [["xy", "zz"]]
    assert parse_query('-"xy zz"')["exclude"] == []
    assert parse_query('"x"')["phrases"] == []  # sub-guard token dropped
    # unterminated quote: tail stays plain
    assert parse_query('"abc def')["terms"] == ["abc", "def"]
    # bare modifiers with empty payloads are dropped
    p = parse_query("- ~ title: \"\"")
    assert p == {"terms": [], "phrases": [], "title": [], "exclude": [],
                 "fuzzy": []}


@pytest.fixture(scope="module")
def qcorpus(spark):
    texts = {
        1: "alan turing broke the enigma machine imitation game",
        2: "alan turing proposed the imitation game standard",
        3: "alan turing computability paper",
        4: "game imitation reversed here alan turing enigma",
    }
    text_docs = spark.createDataFrame(
        list(texts.items()), "doc_id string, text string"
    )
    from see_spark.functions.udfs import tokenize_expr

    toks = text_docs.select(
        "doc_id", F.explode(tokenize_expr(F.col("text"))).alias("word")
    )
    counts = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tc"))
    from pyspark.sql import Window

    postings = counts.withColumn(
        "tf", F.col("tc") / F.sum("tc").over(Window.partitionBy("doc_id"))
    ).select("doc_id", "word", "tf")
    docs = spark.createDataFrame(
        [(str(i), f"title{i}") for i in texts], "doc_id string, title string"
    )
    title_toks = spark.createDataFrame(
        [("1", "turing"), ("2", "wiki"), ("2", "turing")],
        "doc_id string, word string",
    )
    tcounts = title_toks.groupBy("doc_id", "word").agg(F.count("*").alias("tc"))
    title_postings = tcounts.withColumn(
        "tf", F.col("tc") / F.sum("tc").over(Window.partitionBy("doc_id"))
    ).select("doc_id", "word", "tf")
    return dict(
        text_docs=text_docs, postings=postings, docs=docs,
        title_postings=title_postings, n=len(texts),
    )


def test_plain_terms_equal_standalone_search(spark, qcorpus):
    a = search_query(
        spark, "alan turing", qcorpus["postings"], qcorpus["docs"],
        qcorpus["n"],
    ).collect()
    b = search(
        spark, "alan turing", qcorpus["postings"], qcorpus["docs"],
        qcorpus["n"],
    ).collect()
    assert [(r["url"], round(r["score"], 6)) for r in b] == [
        (r["url"], r["score"]) for r in a
    ]


def test_exclusion_gate(spark, qcorpus):
    base = search_query(
        spark, "alan turing", qcorpus["postings"], qcorpus["docs"],
        qcorpus["n"],
    ).collect()
    assert {r["url"] for r in base} == {"1", "2", "3", "4"}
    out = search_query(
        spark, "alan turing -enigma", qcorpus["postings"], qcorpus["docs"],
        qcorpus["n"],
    ).collect()
    assert {r["url"] for r in out} == {"2", "3"}  # 1 and 4 contain enigma


def test_phrase_gate_requires_adjacency(spark, qcorpus):
    out = search_query(
        spark, 'alan "imitation game"', qcorpus["postings"], qcorpus["docs"],
        qcorpus["n"], text_docs=qcorpus["text_docs"],
    ).collect()
    # docs 1,2 have the phrase in order; doc 4 has both words NOT adjacent
    assert {r["url"] for r in out} == {"1", "2"}


def test_phrase_only_query_scores_zero_and_gates(spark, qcorpus):
    out = search_query(
        spark, '"imitation game"', qcorpus["postings"], qcorpus["docs"],
        qcorpus["n"], text_docs=qcorpus["text_docs"],
    ).collect()
    assert {r["url"] for r in out} == {"1", "2"}
    assert all(r["score"] == 0.0 for r in out)


def test_title_boost_reorders(spark, qcorpus):
    plain = search_query(
        spark, "alan", qcorpus["postings"], qcorpus["docs"], qcorpus["n"],
    ).collect()
    boosted = search_query(
        spark, "alan title:wiki", qcorpus["postings"], qcorpus["docs"],
        qcorpus["n"], title_postings=qcorpus["title_postings"],
    ).collect()
    by_url_plain = {r["url"]: r["score"] for r in plain}
    by_url = {r["url"]: r["score"] for r in boosted}
    assert set(by_url) == set(by_url_plain)  # title: never gates
    assert by_url["2"] > by_url_plain["2"]  # doc 2's title has wiki
    for u in ("1", "3", "4"):
        assert by_url[u] == by_url_plain[u]


def test_fuzzy_component_matches_misspelling(spark, qcorpus):
    out = search_query(
        spark, "computabilty~", qcorpus["postings"], qcorpus["docs"],
        qcorpus["n"],
    ).collect()
    assert [r["url"] for r in out] == ["3"]
    assert out[0]["score"] > 0


def test_empty_query_is_empty(spark, qcorpus):
    assert (
        search_query(
            spark, "  ", qcorpus["postings"], qcorpus["docs"], qcorpus["n"]
        ).count()
        == 0
    )
