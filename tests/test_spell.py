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
