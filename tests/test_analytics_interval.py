"""Funnel strict-order semantics, cohort retention triangle, and the
bucketized interval join vs a brute-force range join — including
bucket-boundary-straddling intervals and the no-duplicates guarantee."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from see_spark.operators.analytics import cohort_retention, event_funnel
from see_spark.operators.asof import interval_point_join


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


def test_funnel_strict_order_and_horizon(spark):
    h = 24 * 3600 * 1_000_000
    rows = [
        # u1: A then B then C in order -> converts all
        (1, "A", _ts(1)), (1, "B", _ts(1, 5)), (1, "C", _ts(1, 10)),
        # u2: B BEFORE A -> never converts step 2
        (2, "B", _ts(1)), (2, "A", _ts(1, 5)),
        # u3: A then B but C outside 24h horizon from A
        (3, "A", _ts(1)), (3, "B", _ts(1, 1)), (3, "C", _ts(3)),
        # u4: A only
        (4, "A", _ts(1)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r["name"]: r["n_users"] for r in event_funnel(df, ["A", "B", "C"], h).collect()}
    assert got == {"A": 4, "B": 2, "C": 1}


def test_funnel_same_timestamp_not_counted(spark):
    # B at exactly A's time is NOT strictly after -> no conversion
    rows = [(1, "A", _ts(1)), (1, "B", _ts(1))]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r["name"]: r["n_users"] for r in event_funnel(df, ["A", "B"], 10**12).collect()}
    assert got == {"A": 1, "B": 0}


def test_cohort_retention_triangle(spark):
    day = 24 * 3600 * 1_000_000
    rows = [
        # cohort day-1: u1 active days 1,2,3; u2 active day 1 only
        (1, _ts(1)), (1, _ts(2)), (1, _ts(3)),
        (2, _ts(1)),
        # cohort day-2: u3 active days 2 and 4
        (3, _ts(2)), (3, _ts(4)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort_period"], r["k"]): (r["n_active"], r["n_cohort"], r["retained_milli"])
        for r in cohort_retention(df, period_us=day, max_periods=5).collect()
    }
    cohorts = sorted({c for c, _ in got})
    c1, c2 = cohorts[0], cohorts[1]
    assert got[(c1, 0)] == (2, 2, 1000)
    assert got[(c1, 1)] == (1, 2, 500)
    assert got[(c1, 2)] == (1, 2, 500)
    assert got[(c2, 0)] == (1, 1, 1000)
    assert got[(c2, 2)] == (1, 1, 1000)
    assert (c2, 1) not in got  # u3 inactive day 3


def test_interval_join_matches_bruteforce(spark):
    # intervals straddle bucket boundaries (bucket=100); points at exact
    # endpoints are included (closed interval)
    iv = spark.createDataFrame(
        [(1, 50, 250), (2, 90, 110), (3, 300, 300), (4, 0, 99)],
        "interval_id long, start_us long, end_us long",
    )
    pts = spark.createDataFrame(
        [(i, v) for i, v in enumerate([0, 50, 99, 100, 110, 111, 250, 251, 300])],
        "point_id long, ts_us long",
    )
    got = {
        (r["interval_id"], r["point_id"])
        for r in interval_point_join(iv, pts, bucket_us=100).collect()
    }
    want = set()
    for (i, s, e) in [(1, 50, 250), (2, 90, 110), (3, 300, 300), (4, 0, 99)]:
        for p, v in enumerate([0, 50, 99, 100, 110, 111, 250, 251, 300]):
            if s <= v <= e:
                want.add((i, p))
    assert got == want


def test_interval_join_no_duplicates(spark):
    # an interval spanning many buckets must still match each point once
    iv = spark.createDataFrame([(1, 0, 1000)], "interval_id long, start_us long, end_us long")
    pts = spark.createDataFrame([(1, 500)], "point_id long, ts_us long")
    rows = interval_point_join(iv, pts, bucket_us=10).collect()
    assert len(rows) == 1


def test_interval_join_plan_has_no_nested_loop(spark):
    iv = spark.createDataFrame([(1, 0, 1000)], "interval_id long, start_us long, end_us long")
    pts = spark.createDataFrame([(1, 500)], "point_id long, ts_us long")
    plan = interval_point_join(iv, pts)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
