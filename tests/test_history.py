"""SCD2 version ledger vs hand-built intervals, watermark-lateness
audit vs a sequential replay, and the seq.with_prefix_max scan
(inclusive + exclusive) vs itertools — all partitioning-invariant."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from see_spark.functions.seq import with_prefix_max
from see_spark.operators.history import late_events, scd2_versions


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_scd2_collapses_runs_and_closes_intervals(spark):
    rows = [
        # key 1: A A B A  -> versions A[0,2) B[2,3) A[3,None)
        (1, _t(0), "A", 10),
        (1, _t(1), "A", 11),
        (1, _t(2), "B", 12),
        (1, _t(3), "A", 13),
        # key 2: single observation -> one open version
        (2, _t(5), "X", 14),
    ]
    df = spark.createDataFrame(rows, ["key", "ts", "value", "tb"])
    got = {
        (r["key"], r["valid_from"]): (
            r["value"],
            r["valid_to"],
            r["is_current"],
            r["n_obs"],
        )
        for r in scd2_versions(df, tiebreak_col="tb").collect()
    }
    assert got[(1, _t(0))] == ("A", _t(2), False, 2)
    assert got[(1, _t(2))] == ("B", _t(3), False, 1)
    assert got[(1, _t(3))] == ("A", None, True, 1)
    assert got[(2, _t(5))] == ("X", None, True, 1)
    assert len(got) == 4


def test_scd2_tiebreak_orders_equal_timestamps(spark):
    # same ts, tiebreak decides which observation comes first
    rows = [(1, _t(0), "B", 2), (1, _t(0), "A", 1)]
    df = spark.createDataFrame(rows, ["key", "ts", "value", "tb"])
    got = sorted(
        (r["value"], r["is_current"])
        for r in scd2_versions(df, tiebreak_col="tb").collect()
    )
    assert got == [("A", False), ("B", True)]


def _late_ref(rows, delay_us, window_us):
    """Sequential replay: (arrival, ts_us) -> {window: (n, late, kept)}."""
    out = {}
    seen = None
    for _, ts in sorted(rows):
        late = seen is not None and ts < seen - delay_us
        w = ts - (((ts % window_us) + window_us) % window_us)
        n, l, k = out.get(w, (0, 0, 0))
        out[w] = (n + 1, l + (1 if late else 0), k + (0 if late else 1))
        if seen is None or ts > seen:
            seen = ts
    return out


def test_late_events_matches_sequential_replay(spark):
    base = int(dt.datetime(2024, 1, 1).timestamp()) * 1_000_000
    # arrival order: on-time, on-time, 45s-late (dropped at 30s delay),
    # 10s-late (kept), watermark-advancer, then very-late
    seq = [0, 60, 15, 50, 120, 20]
    rows = [(i, base + s * 1_000_000) for i, s in enumerate(seq)]
    df = spark.createDataFrame(
        [(i, dt.datetime.fromtimestamp(ts / 1e6)) for i, ts in rows],
        ["event_id", "ts"],
    )
    got = {
        r["window_start_us"]: (r["n_events"], r["n_late"], r["n_kept"])
        for r in late_events(
            df, delay_us=30_000_000, window_us=60_000_000
        ).collect()
    }
    want = _late_ref(rows, 30_000_000, 60_000_000)
    assert got == want
    # sanity on the scenario itself: 15s and 20s events are late
    # (watermark 60-30=30 then 120-30=90), 50s is kept
    assert sum(l for _, l, _ in got.values()) == 2


def test_prefix_max_inclusive_and_exclusive(spark):
    vals = [5, 3, 9, 9, 1, 12, 2]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["ord", "v"]
    )
    inc = {
        r["ord"]: r["pm"]
        for r in with_prefix_max(
            df, "v", ["ord"], out_col="pm", num_partitions=3
        ).collect()
    }
    exc = {
        r["ord"]: r["pm"]
        for r in with_prefix_max(
            df, "v", ["ord"], out_col="pm", num_partitions=3, inclusive=False
        ).collect()
    }
    run = []
    m = None
    for v in vals:
        run.append((m, v if m is None or v > m else m))
        m = run[-1][1]
    assert inc == {i: iv for i, (_, iv) in enumerate(run)}
    assert exc == {i: ev for i, (ev, _) in enumerate(run)}


def test_prefix_max_partitioning_invariant(spark):
    vals = [(i, (i * 37) % 101) for i in range(200)]
    df = spark.createDataFrame(vals, ["ord", "v"])
    a = sorted(
        map(
            tuple,
            with_prefix_max(df, "v", ["ord"], num_partitions=2).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            with_prefix_max(
                df.repartition(13), "v", ["ord"], num_partitions=7
            ).collect(),
        )
    )
    assert a == b
