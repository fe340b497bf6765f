"""Selectivity audit: uniform column gives q-error ~1, planted skew
inflates it predictably, zero-match predicates guarded."""

from __future__ import annotations

from pyspark.sql import functions as F

from see_spark.operators.tablestats import selectivity_audit


def test_uniform_vs_skewed_q_error(spark):
    # uniform: 1000 rows over 10 values -> est 100, act 100, q=1000
    # skewed: value 1 holds 910 rows of 1000 -> est ~100, act 910
    rows = [(i, i % 10, 1 if i < 910 else i) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, uni long, skew long")
    got = {
        r["predicate"]: r
        for r in selectivity_audit(
            df, [("u", "uni", 3), ("s", "skew", 1)]
        ).collect()
    }
    u = got["u"]
    assert (u["est_rows"], u["actual_rows"], u["q_error_milli"]) == (100, 100, 1000)
    s = got["s"]
    assert s["actual_rows"] == 910
    assert s["q_error_milli"] >= 5000  # uniformity is off by >= 5x


def test_zero_match_guarded(spark):
    df = spark.createDataFrame([(i, i) for i in range(50)], "id long, v long")
    r = selectivity_audit(df, [("miss", "v", 999)]).collect()[0]
    assert r["actual_rows"] == 0
    assert r["q_error_milli"] == 1000 * r["est_rows"]  # div-by-zero guard
