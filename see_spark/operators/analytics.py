"""Behavioral event analytics: ordered funnels and cohort retention.

The classic product-analytics pair every event warehouse serves
(Amplitude/Mixpanel-class queries), expressed as exact relational
aggregates over the events stream — engine capability beyond crawl
parity, same family as the windowing/sessionization operators in
``streaming/windows.py`` but answering ORDERED-sequence questions a
plain window cannot: a funnel step only counts if it happens AFTER the
previous step for that user.

Scale shapes:
- ``event_funnel``: one hash shuffle on user per step (steps are a
  short pipeline of conditional min-aggregates + key joins — never a
  self-join of events with events on an inequality alone; each join is
  user-equi + timestamp filter).
- ``cohort_retention``: two combinable aggregates (per-user cohort =
  min activity period; per (cohort, period) distinct actives) + one
  broadcast-sized join of per-user cohorts back onto activity — the
  (cohort, period) matrix is weeks × weeks, tiny at any corpus scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_funnel(
    events: DataFrame,
    steps: Sequence[str],
    horizon_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strict-order funnel: a user converts step k iff they performed
    ``steps[k]`` STRICTLY AFTER their step-(k−1) conversion time, with
    the whole sequence completing within ``horizon_us`` of step 1.
    Conversion times are the EARLIEST valid ones (the standard greedy
    funnel semantics: earliest A, then earliest B after it, ...).

    Returns one row per step: (step, name, n_users, conv_milli) where
    conv_milli = 1000·n_users div n_users(step 1) — exact integers.
    """
    ev = events.select(
        F.col(user_col).cast("long").alias("u"),
        F.col(type_col).alias("t"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
    )
    ev = ev.localCheckpoint(eager=False)
    state = (
        ev.where(F.col("t") == steps[0])
        .groupBy("u")
        .agg(F.min("us").alias("t1"))
        .withColumn("prev", F.col("t1"))
    )
    counts = [("1", steps[0], state)]
    for i, name in enumerate(steps[1:], start=2):
        nxt = (
            ev.where(F.col("t") == name)
            .join(state.select("u", "t1", "prev"), "u")
            .where(
                (F.col("us") > F.col("prev"))
                & (F.col("us") <= F.col("t1") + F.lit(int(horizon_us)))
            )
            .groupBy("u")
            .agg(F.min("us").alias("__nt"), F.first("t1").alias("t1"))
            .withColumn("prev", F.col("__nt"))
            .select("u", "t1", "prev")
        )
        state = nxt
        counts.append((str(i), name, nxt))
    # scalar counts to the driver (O(steps) one-row aggregates), result
    # assembled as literal selects — never createDataFrame(list), which
    # costs defaultParallelism Python round-trip tasks (seq.py comment)
    spark = events.sparkSession
    base = counts[0][2].count()
    out = None
    for step, name, df in counts:
        n = df.count()
        row = spark.range(1).select(
            F.lit(int(step)).cast("long").alias("step"),
            F.lit(name).alias("name"),
            F.lit(int(n)).cast("long").alias("n_users"),
            F.lit((n * 1000) // base if base else 0)
            .cast("long")
            .alias("conv_milli"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def cohort_retention(
    events: DataFrame,
    period_us: int = 7 * 24 * 3_600_000_000,
    max_periods: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: cohort(u) = the period (epoch-time
    bucket of length ``period_us``) of u's FIRST event; retention cell
    (cohort, k) = how many of that cohort were active in period
    cohort+k, for k = 0..``max_periods``. The standard growth-accounting
    triangle, exact BIGINT.

    Returns (cohort_period, k, n_active, n_cohort, retained_milli).
    """
    p = int(period_us)
    # integer div, not floor(double /): at epoch-microsecond magnitudes
    # a double quotient can round across a period boundary
    ev = events.select(
        F.col(user_col).cast("long").alias("u"),
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {p}"
        )
        .cast("long")
        .alias("per"),
    ).distinct()
    ev = ev.localCheckpoint(eager=False)
    first = ev.groupBy("u").agg(F.min("per").alias("cohort"))
    sizes = first.groupBy("cohort").agg(
        F.count("*").cast("long").alias("n_cohort")
    )
    active = (
        ev.join(first, "u")
        .select("cohort", (F.col("per") - F.col("cohort")).alias("k"), "u")
        .where(F.col("k") <= F.lit(int(max_periods)))
        .groupBy("cohort", "k")
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    return (
        active.join(sizes, "cohort")
        .select(
            F.col("cohort").alias("cohort_period"),
            F.col("k").cast("long").alias("k"),
            "n_active",
            "n_cohort",
            F.expr("n_active * 1000 div n_cohort")
            .cast("long")
            .alias("retained_milli"),
        )
    )
