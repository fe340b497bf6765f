"""C4-style heuristic cleaning on a hand-built corpus, and LTR feature
assembly vs hand-computed values."""

from __future__ import annotations

import hashlib

from see_spark.operators.search import ltr_features
from see_spark.operators.textfilters import c4_filters

GOOD = "the quick brown fox jumps over the dog."  # 8 words, terminal .
SHORT = "too short here."  # terminal but only 3 words
NOPUNCT = "this line has five words with no terminal punctuation"
JS = "please enable JavaScript to continue using this site."


def test_c4_line_rules(spark):
    text = "\n".join([GOOD, SHORT, NOPUNCT, JS, GOOD.upper()])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = c4_filters(df).collect()[0]
    # GOOD and GOOD.upper() survive; SHORT (words), NOPUNCT (punct),
    # JS ('javascript', case-insensitive) drop
    assert r["n_lines"] == 5
    assert r["kept_lines"] == 2
    assert r["kept_words"] == 16
    assert r["keep"] is False  # kept_lines < 3
    expect = hashlib.md5(
        ("\n".join([GOOD, GOOD.upper()])).encode()
    ).hexdigest()
    assert r["kept_md5"] == expect


def test_c4_page_rules(spark):
    three = "\n".join([GOOD, GOOD, GOOD])
    rows = c4_filters(
        spark.createDataFrame(
            [
                (1, three),
                (2, three + "\nconfig = { a: 1 }"),
                (3, three + "\nLorem Ipsum dolor sit amet."),
                (4, "\n".join([GOOD, GOOD])),
            ],
            "doc_id long, text string",
        )
    ).collect()
    by = {r["doc_id"]: r for r in rows}
    assert by[1]["keep"] is True
    assert by[2]["keep"] is False and by[2]["has_brace"] is True
    assert by[3]["keep"] is False and by[3]["has_lorem"] is True
    assert by[4]["keep"] is False  # only 2 kept lines


def test_c4_trim_and_quote_terminal(spark):
    text = '  she said "stop right there now"  \n' + GOOD
    r = c4_filters(
        spark.createDataFrame([(1, text)], "doc_id long, text string")
    ).collect()[0]
    # the quoted line is trimmed and ends in '"' -> kept (6 words)
    assert r["kept_lines"] == 2
    assert r["kept_words"] == 14


def test_ltr_features_hand_values(spark):
    postings = spark.createDataFrame(
        [
            # doc 1: 'table' x2, 'join' x1, len 10
            (1, "table", 2, 10),
            (1, "join", 1, 10),
            (1, "other", 7, 10),
            # doc 2: 'query' x3, len 3
            (2, "query", 3, 3),
            # doc 3: no query words
            (3, "other", 5, 5),
        ],
        "doc_id long, word string, term_count long, doc_len long",
    )
    edges = spark.createDataFrame(
        [(9, 1), (8, 1), (1, 2)], "src long, dst long"
    )
    rows = {
        r["doc_id"]: r
        for r in ltr_features(postings, edges, ["table", "join", "query"]).collect()
    }
    assert set(rows) == {1, 2}  # doc 3 matches nothing
    r1 = rows[1]
    assert (r1["n_match"], r1["tf_sum"], r1["doc_len"]) == (2, 3, 10)
    assert r1["tf_norm_milli"] == 300
    assert (r1["in_deg"], r1["out_deg"]) == (2, 1)
    r2 = rows[2]
    assert (r2["n_match"], r2["tf_sum"], r2["doc_len"]) == (1, 3, 3)
    assert r2["tf_norm_milli"] == 1000
    assert (r2["in_deg"], r2["out_deg"]) == (1, 0)


def test_c4_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = c4_filters(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
