"""Recrawl scheduling: change detection, exponential backoff, due feed."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def history(spark):
    rows = [
        # u1: changes every fetch -> streak 0, revisit at min interval
        ("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "c"),
        # u2: never changes after first fetch -> streak 3
        ("u2", 1, "x"), ("u2", 2, "x"), ("u2", 3, "x"), ("u2", 4, "x"),
        # u3: changed mid-way then static twice -> streak 2
        ("u3", 1, "p"), ("u3", 2, "q"), ("u3", 3, "q"), ("u3", 4, "q"),
        # u4: single fetch -> streak 0
        ("u4", 7, "z"),
    ]
    return spark.createDataFrame(rows, "url string, round long, content_hash string")


def test_schedule_semantics(spark, history):
    from see_spark.operators.recrawl import recrawl_schedule

    got = {
        r.url: (r.n_fetches, r.n_changes, r.unchanged_streak, r.interval,
                r.next_due_round)
        for r in recrawl_schedule(history, min_interval=1, max_interval=8).collect()
    }
    assert got["u1"] == (3, 3, 0, 1, 4)
    assert got["u2"] == (4, 1, 3, 8, 12)   # 2^3=8 == cap
    assert got["u3"] == (4, 2, 2, 4, 8)
    assert got["u4"] == (1, 1, 0, 1, 8)


def test_interval_caps_at_max(spark):
    from see_spark.operators.recrawl import recrawl_schedule

    rows = [("u", i, "same" if i > 1 else "first") for i in range(1, 42)]
    df = spark.createDataFrame(rows, "url string, round long, content_hash string")
    r = recrawl_schedule(df, min_interval=2, max_interval=64).collect()[0]
    # fetch 1 ("first") and fetch 2 ("same") are both changes; 3..41 static
    assert r.unchanged_streak == 39
    assert r.interval == 64  # clamped shift, no overflow
    assert r.next_due_round == 41 + 64


def test_due_urls_feed(spark, history):
    from see_spark.operators.recrawl import due_urls

    due_at_8 = {r.url for r in
                due_urls(history, now_round=8, max_interval=8).collect()}
    # u1 due at 4, u3 due at 8, u4 due at 8; u2 due at 12
    assert due_at_8 == {"u1", "u3", "u4"}


def test_single_shuffle_plan(spark, history):
    from see_spark.operators.recrawl import recrawl_schedule

    plan = (
        recrawl_schedule(history)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
    # the groupBy must reuse the window's url hash-partitioning: exactly
    # one exchange below the aggregate
    assert plan.count("Exchange hashpartitioning") == 1


def test_partitioning_invariance(spark, history):
    from see_spark.operators.recrawl import recrawl_schedule

    a = sorted(map(tuple, recrawl_schedule(history).collect()))
    b = sorted(map(tuple, recrawl_schedule(history.repartition(13)).collect()))
    assert a == b
