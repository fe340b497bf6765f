"""Table stats (nulls, NDV, min/max incl. null-heavy columns, single
scan) and decayed counters (halving per half-life, zero floor, exact
additivity and partitioning invariance)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from see_spark.operators.tablestats import decayed_counts, table_stats


def test_table_stats_values(spark):
    rows = [
        (1, "a", None),
        (2, "b", 5),
        (3, "a", 7),
        (4, None, 7),
    ]
    df = spark.createDataFrame(rows, "id long, s string, v long")
    got = {r["column"]: r for r in table_stats(df, ["id", "s", "v"]).collect()}
    assert got["id"]["n_rows"] == 4
    assert (got["id"]["n_null"], got["id"]["ndv"]) == (0, 4)
    assert (got["id"]["min_val"], got["id"]["max_val"]) == ("1", "4")
    assert (got["s"]["n_null"], got["s"]["ndv"]) == (1, 2)
    assert (got["v"]["n_null"], got["v"]["ndv"]) == (1, 2)
    assert (got["v"]["min_val"], got["v"]["max_val"]) == ("5", "7")


def test_table_stats_single_scan(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    plan = (
        table_stats(df, ["id", "s"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # one logical scan of the input relation (expand handles the
    # multi-distinct), not one scan per column
    assert plan.count("LocalRelation") <= 1


def _t(day):
    return dt.datetime(2024, 1, day)


def test_decayed_counts_halving(spark):
    day = 24 * 3_600_000_000
    # key A: events now, 1 and 2 half-lives old; key B: ancient
    rows = [
        ("A", _t(10)), ("A", _t(9)), ("A", _t(8)),
        ("B", _t(1)),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {
        r["key"]: (r["n_events"], r["decayed_fp"])
        for r in decayed_counts(df, halflife_us=day).collect()
    }
    full = 1 << 20
    assert got["A"] == (3, full + full // 2 + full // 4)
    assert got["B"] == (1, full >> 9)


def test_decayed_zero_floor_and_invariance(spark):
    day = 24 * 3_600_000_000
    rows = [("A", _t(30))] + [("A", _t(1))] * 5  # 29 half-lives old -> 0
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = decayed_counts(df, halflife_us=day).collect()[0]
    assert got["decayed_fp"] == 1 << 20  # only the fresh event counts
    b = decayed_counts(df.repartition(7), halflife_us=day).collect()[0]
    assert tuple(got) == tuple(b)
