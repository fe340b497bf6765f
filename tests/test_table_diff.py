"""Semantic table diff: all four statuses with exact counts, identical
tables diff to all-unchanged, and multi-column keys."""

from __future__ import annotations

from see_spark.operators.merkle import table_diff


def test_all_statuses_counted(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "id long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d"), (5, "e")], "id long, v string"
    )
    got = {
        r["status"]: r["n_keys"]
        for r in table_diff(old, new, ["id"], ["v"]).collect()
    }
    assert got == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}


def test_identical_tables_all_unchanged(spark):
    df = spark.createDataFrame([(i, f"v{i}") for i in range(20)], "id long, v string")
    got = {
        r["status"]: r["n_keys"]
        for r in table_diff(df, df, ["id"], ["v"]).collect()
    }
    assert got == {"unchanged": 20}


def test_composite_key(spark):
    old = spark.createDataFrame(
        [(1, "x", "p"), (1, "y", "q")], "a long, b string, v string"
    )
    new = spark.createDataFrame(
        [(1, "x", "p"), (1, "y", "Q"), (2, "x", "r")],
        "a long, b string, v string",
    )
    got = {
        r["status"]: r["n_keys"]
        for r in table_diff(old, new, ["a", "b"], ["v"]).collect()
    }
    assert got == {"unchanged": 1, "changed": 1, "added": 1}
