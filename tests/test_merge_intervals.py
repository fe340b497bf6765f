"""Interval coalescing: overlap/touch/gap semantics, nesting, per-key
isolation, and partitioning invariance."""

from __future__ import annotations

from see_spark.operators.history import merge_intervals


def _iv(spark, rows):
    return spark.createDataFrame(
        rows, "key long, start_us long, end_us long, tb long"
    )


def test_overlap_touch_gap(spark):
    rows = [
        (1, 0, 10, 0),    # merges with next (overlap)
        (1, 5, 20, 1),
        (1, 20, 30, 2),   # touches -> merges
        (1, 31, 40, 3),   # gap of 1 -> new island
        (2, 0, 5, 4),     # other key untouched
    ]
    got = sorted(
        (r["key"], r["start"], r["end"], r["n_merged"])
        for r in merge_intervals(_iv(spark, rows), tiebreak_col="tb").collect()
    )
    assert got == [(1, 0, 30, 3), (1, 31, 40, 1), (2, 0, 5, 1)]


def test_nested_intervals(spark):
    rows = [(1, 0, 100, 0), (1, 10, 20, 1), (1, 30, 40, 2), (1, 101, 110, 3)]
    got = sorted(
        (r["start"], r["end"], r["n_merged"])
        for r in merge_intervals(_iv(spark, rows), tiebreak_col="tb").collect()
    )
    # contained intervals merge into the umbrella; [101,110] touches 100?
    # closed semantics: start 101 > end 100 -> separate island
    assert got == [(0, 100, 3), (101, 110, 1)]


def test_partitioning_invariant(spark):
    rows = [
        (k, s * 10, s * 10 + 15, k * 100 + s)
        for k in range(5)
        for s in range(20)
    ]
    df = _iv(spark, rows)
    a = sorted(map(tuple, merge_intervals(df, tiebreak_col="tb").collect()))
    b = sorted(
        map(
            tuple,
            merge_intervals(df.repartition(9), tiebreak_col="tb").collect(),
        )
    )
    assert a == b
