"""Gains/lift table: a perfect scorer captures all positives in the top
bins (lift = 1/base-rate there, capture hits 1000), a random-ish scorer
stays near lift 1000; cumulative capture is monotone."""

from __future__ import annotations

from see_spark.operators.evaluation import gains_table


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score long, y long")


def test_perfect_scorer(spark):
    # 100 rows, 20 positives, scores rank positives first
    rows = [(i, 1000 - i, 1 if i < 20 else 0) for i in range(100)]
    got = {r["bin"]: r for r in gains_table(_df(spark, rows)).collect()}
    # bins 0-1 hold all positives
    assert got[0]["n_pos"] == 10 and got[1]["n_pos"] == 10
    assert got[1]["capture_milli"] == 1000
    assert got[0]["lift_milli"] == 5000  # 100% rate vs 20% base = 5x
    assert all(got[b]["n_pos"] == 0 for b in range(2, 10))
    # cumulative capture monotone
    caps = [got[b]["capture_milli"] for b in range(10)]
    assert caps == sorted(caps)


def test_uniform_scorer_lift_near_one(spark):
    # positives spread evenly across score order
    rows = [(i, 1000 - i, 1 if i % 5 == 0 else 0) for i in range(100)]
    got = {r["bin"]: r for r in gains_table(_df(spark, rows)).collect()}
    for b in range(10):
        assert got[b]["lift_milli"] == 1000  # exactly base rate per bin
    assert got[9]["capture_milli"] == 1000
