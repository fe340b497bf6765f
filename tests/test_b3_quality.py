"""B-cubed clustering metric vs hand-computed values on the canonical
glue/shatter scenarios, plus partitioning invariance."""

from __future__ import annotations

import pytest

from see_spark.operators.evaluation import b3_cluster_quality


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, cluster string, truth string")


def test_perfect_clustering_scores_one(spark):
    rows = [(1, "a", "x"), (2, "a", "x"), (3, "b", "y"), (4, "b", "y")]
    r = b3_cluster_quality(_df(spark, rows)).collect()[0]
    assert (r["b3_precision"], r["b3_recall"], r["b3_f1"]) == (1.0, 1.0, 1.0)
    assert r["n_items"] == 4


def test_glued_clusters_lose_precision_keep_recall(spark):
    # everything in ONE predicted cluster; truth has two groups of 2
    rows = [(1, "a", "x"), (2, "a", "x"), (3, "a", "y"), (4, "a", "y")]
    r = b3_cluster_quality(_df(spark, rows)).collect()[0]
    # P: each item's cluster (size 4) shares 2 with its truth -> 2/4
    assert r["b3_precision"] == pytest.approx(0.5, abs=1e-9)
    assert r["b3_recall"] == pytest.approx(1.0, abs=1e-9)
    assert r["b3_f1"] == pytest.approx(2 * 0.5 / 1.5, abs=1e-9)


def test_shattered_clusters_lose_recall_keep_precision(spark):
    # truth = one group of 4; prediction splits into singletons
    rows = [(i, f"c{i}", "x") for i in range(4)]
    r = b3_cluster_quality(_df(spark, rows)).collect()[0]
    assert r["b3_precision"] == pytest.approx(1.0, abs=1e-9)
    assert r["b3_recall"] == pytest.approx(0.25, abs=1e-9)


def test_mixed_case_matches_hand_computation(spark):
    # cluster a = {1,2,3} with truths {x,x,y}; cluster b = {4} truth y
    rows = [(1, "a", "x"), (2, "a", "x"), (3, "a", "y"), (4, "b", "y")]
    r = b3_cluster_quality(_df(spark, rows)).collect()[0]
    # P = (4/3 + 1/3 + 1)/4 ; R = (2/2 + 2/2 + 1/2 + 1/2)/4
    assert r["b3_precision"] == pytest.approx((4 / 3 + 1 / 3 + 1) / 4, abs=1e-9)
    assert r["b3_recall"] == pytest.approx(0.75, abs=1e-9)


def test_partitioning_invariant(spark):
    rows = [(i, f"c{i % 5}", f"t{i % 3}") for i in range(60)]
    a = b3_cluster_quality(_df(spark, rows)).collect()[0]
    b = b3_cluster_quality(_df(spark, rows).repartition(11)).collect()[0]
    assert tuple(a) == tuple(b)
