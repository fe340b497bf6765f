"""weighted_sample + rank_agreement unit tests."""

import math

from pyspark.sql import functions as F


def test_rank_agreement_perfect_and_reversed(spark):
    from see_spark.operators.evaluation import rank_agreement

    a = spark.createDataFrame(
        [(i, 100 - i) for i in range(1, 6)], "doc_id long, s long"
    )
    same = rank_agreement(a, a, score_a="s", score_b="s").collect()[0]
    assert same["spearman_milli"] == 1000 and same["kendall_milli"] == 1000
    assert same["sum_d2"] == 0 and same["discordant"] == 0

    b = spark.createDataFrame(
        [(i, i) for i in range(1, 6)], "doc_id long, s long"
    )
    rev = rank_agreement(a, b, score_a="s", score_b="s").collect()[0]
    assert rev["spearman_milli"] == -1000 and rev["kendall_milli"] == -1000
    assert rev["concordant"] == 0 and rev["discordant"] == 10


def test_rank_agreement_matches_scipy_free_reference(spark):
    """Hand-computed Spearman/Kendall for a known permutation."""
    from see_spark.operators.evaluation import rank_agreement

    # ranks a: 1..4 over ids 1..4; ranks b: permutation (2,1,4,3)
    a = spark.createDataFrame(
        [(1, 40), (2, 30), (3, 20), (4, 10)], "doc_id long, s long"
    )
    b = spark.createDataFrame(
        [(1, 30), (2, 40), (3, 10), (4, 20)], "doc_id long, s long"
    )
    r = rank_agreement(a, b, score_a="s", score_b="s").collect()[0]
    # d = (1,1,1,1) -> sum_d2 = 4; rho = 1 - 24/60 = 0.6
    assert r["sum_d2"] == 4 and r["spearman_milli"] == 600
    # pairs: 6 total, discordant = {(1,2),(3,4)} -> tau = (4-2)/6 = 0.333
    assert r["concordant"] == 4 and r["discordant"] == 2
    assert r["kendall_milli"] == 333


def test_weighted_sample_is_weight_proportional_and_exact_k(spark):
    from see_spark.operators.textfilters import weighted_sample

    rows = [(i, 1000 if i < 20 else 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = weighted_sample(df, k=30, weight_col="w")
    got = out.collect()
    assert len(got) == 30
    heavy = sum(1 for r in got if r["id"] < 20)
    # 20 heavy rows carry 20000/20380 of the mass; nearly all must appear
    assert heavy >= 15, heavy
    # deterministic across invocations
    again = weighted_sample(df, k=30, weight_col="w").collect()
    assert sorted(r["id"] for r in got) == sorted(r["id"] for r in again)
    # different seed redraws the light tail
    other = weighted_sample(df, k=30, weight_col="w", seed="ws2").collect()
    assert sorted(r["id"] for r in other) != sorted(r["id"] for r in got)


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from see_spark.operators.textfilters import weighted_sample

    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 7), (4, 7)], "doc_id long, w long"
    )
    got = {r["id"] for r in weighted_sample(df, k=10, weight_col="w").collect()}
    assert got == {3, 4}
