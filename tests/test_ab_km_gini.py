"""A/B z-test vs hand arithmetic (incl. the degenerate all-convert
guard), Kaplan-Meier vs a lifelines-free reference (censoring handled),
and Gini: 0 for equal counts, → (n−1)/n for total concentration."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from see_spark.operators.analytics import (
    ab_test,
    gini_concentration,
    kaplan_meier,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def _t(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_ab_counts_and_z(spark):
    rows = []
    # variant A (even users): 2 of 3 convert; B (odd): 1 of 3
    for u in (0, 2, 4, 1, 3, 5):
        rows.append((u, "signup", _t(1)))
    for u in (0, 2, 1):
        rows.append((u, "purchase", _t(1, 5)))
    got = ab_test(_ev(spark, rows), horizon_us=24 * 3600 * 1_000_000).collect()[0]
    assert (got["n_a"], got["c_a"], got["n_b"], got["c_b"]) == (3, 2, 3, 1)
    pa, pb, pp = 2 / 3, 1 / 3, 3 / 6
    z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / 3 + 1 / 3))
    assert got["z_stat"] == pytest.approx(z, abs=1e-9)


def test_ab_degenerate_full_conversion(spark):
    rows = [(u, "signup", _t(1)) for u in range(4)] + [
        (u, "purchase", _t(1, 2)) for u in range(4)
    ]
    got = ab_test(_ev(spark, rows), horizon_us=24 * 3600 * 1_000_000).collect()[0]
    assert got["z_stat"] == 0.0


def _km_ref(durs):
    """durs: list of (duration, event). Returns {t: (d, n_risk, S)}."""
    out = {}
    s = 1.0
    times = sorted({t for t, e in durs if e})
    for t in times:
        n_risk = sum(1 for u, _ in durs if u >= t)
        d = sum(1 for u, e in durs if u == t and e)
        s *= 1.0 - d / n_risk
        out[t] = (d, n_risk, round(s, 9))
    return out


def test_kaplan_meier_with_censoring(spark):
    day_us = 24 * 3600 * 1_000_000
    # u0 converts day2 (dur 1d), u1 day3 (2d), u2 never (censored),
    # u3 converts day5 (4d); horizon = day5
    rows = [
        (0, "signup", _t(1)), (0, "purchase", _t(2)),
        (1, "signup", _t(1)), (1, "purchase", _t(3)),
        (2, "signup", _t(1)),
        (3, "signup", _t(1)), (3, "purchase", _t(5)),
    ]
    got = {
        r["t_us"]: (r["d"], r["n_risk"], r["survival"])
        for r in kaplan_meier(_ev(spark, rows)).collect()
    }
    durs = [(1 * day_us, 1), (2 * day_us, 1), (4 * day_us, 0), (4 * day_us, 1)]
    want = _km_ref(durs)
    assert got.keys() == want.keys()
    for t in want:
        assert got[t][:2] == want[t][:2]
        assert got[t][2] == pytest.approx(want[t][2], abs=1e-9)
    # the censored user keeps survival above zero at the last event time
    assert got[4 * day_us][2] > 0 or want[4 * day_us][1] == 1


def test_gini_bounds(spark):
    eq = spark.createDataFrame([(f"h{i}", 7) for i in range(10)], "h string, n long")
    assert gini_concentration(eq, "n").collect()[0]["gini_micro"] == 0
    conc = spark.createDataFrame(
        [("h0", 10_000)] + [(f"h{i}", 1) for i in range(1, 10)], "h string, n long"
    )
    g = gini_concentration(conc, "n").collect()[0]["gini_micro"]
    assert g > 850_000  # near (n-1)/n = 0.9


def test_gini_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [(f"h{i}", (i * 31) % 100 + 1) for i in range(50)], "h string, n long"
    )
    a = tuple(gini_concentration(df, "n").collect()[0])
    b = tuple(gini_concentration(df.repartition(7), "n").collect()[0])
    assert a == b
