"""Spell suggestion (lexicon.py:suggest_corrections): pick rule
(dist asc, df desc, word asc), exact-hit self-suggestion, no-candidate
nulls, and max_dist budget."""

from __future__ import annotations

from see_spark.operators.lexicon import suggest_corrections

VOCAB = [
    ("table", 50),
    ("cable", 80),   # same distance from 'table' as 'table' but higher df
    ("fable", 10),
    ("query", 30),
    ("quart", 5),
]


def _run(spark, terms, max_dist=2):
    vocab = spark.createDataFrame(VOCAB, "word string, df long")
    return {
        r.term: (r.suggestion, r.dist, r.df)
        for r in suggest_corrections(spark, terms, vocab, max_dist).collect()
    }


def test_exact_hit_self_suggests(spark):
    got = _run(spark, ["table"])
    assert got["table"] == ("table", 0, 50)


def test_df_breaks_distance_ties(spark):
    # 'aable' is dist 1 from table, cable AND fable; cable has highest df
    got = _run(spark, ["aable"])
    assert got["aable"] == ("cable", 1, 80)


def test_distance_beats_df(spark):
    # 'querry' is dist 1 from query (df 30); nothing closer
    got = _run(spark, ["querry"])
    assert got["querry"] == ("query", 1, 30)


def test_no_candidate_emits_nulls(spark):
    got = _run(spark, ["zzzzzzzz"])
    assert got["zzzzzzzz"] == (None, None, None)


def test_max_dist_budget(spark):
    # 'tble' is dist 1 from table; with max_dist=0 only exact hits count
    assert _run(spark, ["tble"], max_dist=1)["tble"][0] == "table"
    assert _run(spark, ["tble"], max_dist=0)["tble"] == (None, None, None)


def test_word_breaks_full_ties(spark):
    vocab = [("aa", 5), ("ab", 5)]
    import pyspark

    df = None
    spark_vocab = spark.createDataFrame(vocab, "word string, df long")
    got = {
        r.term: r.suggestion
        for r in suggest_corrections(spark, ["ac"], spark_vocab, 1).collect()
    }
    assert got["ac"] == "aa"  # dist 1 / df 5 tie -> lexicographic word


def test_related_terms_pmi_and_min_df(spark):
    """PMI ranks the perfectly-correlated partner first; min_df drops the
    hapax partner whose PMI would otherwise be inflated."""
    import math

    from pyspark.sql import functions as F

    from see_spark.operators.lexicon import related_terms

    texts = {
        1: "cat dog mouse",
        2: "cat dog bird",
        3: "cat dog unique1",
        4: "fish bird mouse",
    }
    postings = spark.createDataFrame(
        [(i, w) for i, t in texts.items() for w in t.split()],
        "doc_id long, word string",
    )
    out = related_terms(postings, ["cat"], page_count=4, min_df=2, k=10)
    rows = {r["word"]: r for r in out.collect()}
    # dog co-occurs in all 3 cat-docs: pmi = ln(4*3/(3*3))
    assert rows["dog"]["expansion_rank"] == 1
    assert rows["dog"]["pmi"] == round(math.log(4 * 3 / (3 * 3)), 6)
    assert rows["dog"]["df_pair"] == 3
    # unique1 (df=1) is dropped by min_df even though pmi would be high
    assert "unique1" not in rows
    # bird: df_pair=1, df=2 -> ln(4*1/(3*2))
    assert rows["bird"]["pmi"] == round(math.log(4 / 6), 6)
    # seeds never suggest themselves
    assert "cat" not in rows
