"""Retrieval metrics (operators/evaluation.py) vs hand-computed values."""

from __future__ import annotations

import math

from see_spark.operators.evaluation import retrieval_metrics


def test_metrics_match_hand_computation(spark):
    # one query, k=3: ranked a,b,c; judged: a rel=2 (rank1), c rel=1
    # (rank3), d rel=3 (never retrieved)
    results = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3), (1, "z", 4)],
        "query_id long, url string, rank long",
    )
    qrels = spark.createDataFrame(
        [(1, "a", 2), (1, "c", 1), (1, "d", 3)],
        "query_id long, url string, rel long",
    )
    row = retrieval_metrics(results, qrels, k=3).collect()[0]
    assert row["n_results"] == 3
    assert row["n_relevant"] == 3
    assert row["precision_at_k"] == round(2 / 3, 6)
    assert row["recall_at_k"] == round(2 / 3, 6)
    assert row["mrr"] == 1.0  # first relevant at rank 1
    dcg = (2**2 - 1) / math.log2(2) + 0.0 + (2**1 - 1) / math.log2(4)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) + (
        2**1 - 1
    ) / math.log2(4)
    assert row["ndcg"] == round(dcg / idcg, 6)


def test_query_without_relevant_docs_is_excluded(spark):
    results = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "query_id long, url string, rank long"
    )
    qrels = spark.createDataFrame(
        [(1, "a", 1)], "query_id long, url string, rel long"
    )
    rows = retrieval_metrics(results, qrels, k=10).collect()
    assert [r["query_id"] for r in rows] == [1]
    r = rows[0]
    assert (r["precision_at_k"], r["recall_at_k"], r["mrr"], r["ndcg"]) == (
        0.1, 1.0, 1.0, 1.0,
    )


def test_no_relevant_in_topk_gives_zero_mrr_and_ndcg(spark):
    results = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2)], "query_id long, url string, rank long"
    )
    qrels = spark.createDataFrame(
        [(1, "a", 2)], "query_id long, url string, rel long"
    )
    r = retrieval_metrics(results, qrels, k=2).collect()[0]
    assert (r["precision_at_k"], r["recall_at_k"], r["mrr"], r["ndcg"]) == (
        0.0, 0.0, 0.0, 0.0,
    )
