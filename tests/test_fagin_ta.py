"""Fagin TA depth: correlated lists stop shallow, anti-correlated scan
deep, the stopping bound is SOUND (top-k is fully contained in the
scanned prefix of the two lists), and full-scan fallback."""

from __future__ import annotations

from see_spark.operators.search import fagin_ta_depth


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, s1 long, s2 long")


def test_correlated_stops_early(spark):
    rows = [(i, i, i) for i in range(200)]
    r = fagin_ta_depth(_df(spark, rows), k=5).collect()[0]
    # strict-τ convention: τ_4 == kth exactly, so one band deeper (6)
    # than ≥-convention TA — guarantees tied top-k members are seen.
    assert r["depth_needed"] == 6
    assert r["scan_saved_milli"] >= 970


def test_anticorrelated_scans_deep(spark):
    rows = [(i, i, 200 - i) for i in range(200)]
    r = fagin_ta_depth(_df(spark, rows), k=5).collect()[0]
    assert r["depth_needed"] > 90


def test_stopping_bound_is_sound(spark):
    import random

    rng = random.Random(11)
    rows = [(i, rng.randrange(1000), rng.randrange(1000)) for i in range(300)]
    r = fagin_ta_depth(_df(spark, rows), k=10).collect()[0]
    d = r["depth_needed"]
    # soundness: every true top-10 object appears within the first d
    # rows of AT LEAST one of the two sorted lists
    by1 = sorted(rows, key=lambda x: (-x[1], x[0]))[:d]
    by2 = sorted(rows, key=lambda x: (-x[2], x[0]))[:d]
    seen = {x[0] for x in by1} | {x[0] for x in by2}
    top10 = {
        x[0]
        for x in sorted(rows, key=lambda x: (-(x[1] + x[2]), x[0]))[:10]
    }
    assert top10 <= seen
    # and tau at depth certifies: kth_total >= tau
    assert r["kth_total"] >= r["tau_at_depth"]


def test_tiny_input_full_scan(spark):
    rows = [(1, 5, 5), (2, 3, 3)]
    r = fagin_ta_depth(_df(spark, rows), k=2).collect()[0]
    assert r["depth_needed"] <= 2
