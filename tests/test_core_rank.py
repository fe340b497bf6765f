"""TF-IDF goldens, 1:1 from apps/db/test/see_rank_tfidf_test.erl:11-43."""

import math

import pytest

from see_spark.core.rank import idf, rank, tf, top_k


def test_one_page_many_words():
    page_words = ["word1", "word2", "word3", "word2", "word2", "word3"]
    dfs = {"word1": 1, "word2": 1, "word3": 1}
    n = 1
    IDF = math.log(1 / 2)  # negative IDF is reference behavior
    assert rank(["word1"], page_words, n, dfs) == pytest.approx((1 / 6) * IDF)
    assert rank(["word2"], page_words, n, dfs) == pytest.approx((3 / 6) * IDF)
    assert rank(["word3"], page_words, n, dfs) == pytest.approx((2 / 6) * IDF)
    assert rank(["word1", "word2"], page_words, n, dfs) == pytest.approx((4 / 6) * IDF)
    assert rank(["word2", "word3"], page_words, n, dfs) == pytest.approx((5 / 6) * IDF)
    assert rank(["word1", "word2", "word3"], page_words, n, dfs) == pytest.approx(
        (6 / 6) * IDF
    )


def test_many_pages_one_word():
    dfs = {"word1": 2, "word2": 1}
    n = 4
    assert rank(["word1"], ["word1"], n, dfs) == pytest.approx(math.log(4 / 3))
    assert rank(["word2"], ["word2"], n, dfs) == pytest.approx(math.log(4 / 2))


def test_duplicate_query_words_score_multiply():
    # rank/3 is a list comprehension over query tokens WITH duplicates
    page_words = ["w"]
    dfs = {"w": 1}
    n = 4
    single = rank(["w"], page_words, n, dfs)
    assert rank(["w", "w", "w"], page_words, n, dfs) == pytest.approx(3 * single)


def test_tf_idf_scalars():
    assert tf("a", ["a", "b", "a"]) == pytest.approx(2 / 3)
    assert tf("z", ["a", "b"]) == 0.0
    assert idf(10, 4) == pytest.approx(math.log(2))


def test_top_k_descending_url_tiebreak():
    rows = [("u2", "t", 1.0), ("u1", "t", 1.0), ("u3", "t", 2.0)]
    assert top_k(rows, 2) == [("u3", "t", 2.0), ("u1", "t", 1.0)]
