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

from pyspark.sql import DataFrame, Window
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


def ab_test(
    events: DataFrame,
    assign_expr: str = "user_id % 2 = 0",
    start_type: str = "signup",
    goal_type: str = "purchase",
    horizon_us: int = 7 * 24 * 3_600_000_000,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    round_dp: int = 9,
) -> DataFrame:
    """Two-proportion A/B conversion test: variant = ``assign_expr``
    (deterministic assignment), conversion = a ``goal_type`` event
    strictly after the user's first ``start_type`` within
    ``horizon_us``. Returns ONE row: per-variant n/conversions/exact
    milli rates plus the pooled two-proportion z statistic (the
    standard launch-gate number), rounded — counts are exact BIGINT,
    z is the only float.
    """
    ev = events.select(
        F.col(user_col).cast("long").alias("u"),
        F.col(type_col).alias("t"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.expr(assign_expr).alias("va"),
    )
    ev = ev.localCheckpoint(eager=False)
    starts = (
        ev.where(F.col("t") == start_type)
        .groupBy("u")
        .agg(F.min("us").alias("t0"), F.first("va").alias("va"))
    )
    conv = (
        ev.where(F.col("t") == goal_type)
        .join(starts.select("u", "t0"), "u")
        .where(
            (F.col("us") > F.col("t0"))
            & (F.col("us") <= F.col("t0") + F.lit(int(horizon_us)))
        )
        .select("u")
        .distinct()
        .withColumn("__c", F.lit(1))
    )
    per = (
        starts.join(conv, "u", "left")
        .groupBy("va")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.coalesce("__c", F.lit(0))).cast("long").alias("c"),
        )
    )
    one = per.agg(
        F.max(F.when(F.col("va"), F.col("n"))).cast("long").alias("n_a"),
        F.max(F.when(F.col("va"), F.col("c"))).cast("long").alias("c_a"),
        F.max(F.when(~F.col("va"), F.col("n"))).cast("long").alias("n_b"),
        F.max(F.when(~F.col("va"), F.col("c"))).cast("long").alias("c_b"),
    )
    pa = F.col("c_a") / F.col("n_a")
    pb = F.col("c_b") / F.col("n_b")
    pp = (F.col("c_a") + F.col("c_b")) / (F.col("n_a") + F.col("n_b"))
    # degenerate pools (0% or 100% conversion) have zero pooled variance
    # — z undefined; report 0.0 (same guard in the oracle)
    z = F.when(
        (pp <= F.lit(0.0)) | (pp >= F.lit(1.0)), F.lit(0.0)
    ).otherwise(
        (pa - pb)
        / F.sqrt(
            pp * (F.lit(1.0) - pp)
            * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
        )
    )
    return one.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.expr("c_a * 1000 div n_a").cast("long").alias("rate_a_milli"),
        F.expr("c_b * 1000 div n_b").cast("long").alias("rate_b_milli"),
        F.round(z, round_dp).alias("z_stat"),
    )


def kaplan_meier(
    events: DataFrame,
    start_type: str = "signup",
    goal_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    round_dp: int = 9,
) -> DataFrame:
    """Kaplan-Meier survival curve (1958) for time-to-``goal_type``
    after first ``start_type``: users who never convert are
    right-CENSORED at the corpus horizon (max event time) — the
    estimator that handles exactly the case a naive average conversion
    time gets wrong. S(t) = Π_{t_i ≤ t} (1 − d_i / n_i) over event
    times, with n_i = users still at risk at t_i.

    One row per event time: (t_us, d, n_risk, survival). Counts are
    exact; the survival product is a window PRODUCT aggregate over the
    pinned time order (deterministic multiply order in both engines),
    rounded to ``round_dp``. Risk sets come from suffix counts (total −
    exclusive prefix), one bounded window over the distinct-time
    relation — the per-time table is users-sized at most, eval-scale.
    """
    ev = events.select(
        F.col(user_col).cast("long").alias("u"),
        F.col(type_col).alias("t"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
    )
    ev = ev.localCheckpoint(eager=False)
    horizon = int(
        ev.agg(F.coalesce(F.max("us"), F.lit(0))).collect()[0][0]
    )
    starts = ev.where(F.col("t") == start_type).groupBy("u").agg(
        F.min("us").alias("t0")
    )
    goals = (
        ev.where(F.col("t") == goal_type)
        .join(starts, "u")
        .where(F.col("us") > F.col("t0"))
        .groupBy("u")
        .agg(F.min("us").alias("tg"))
    )
    durs = (
        starts.join(goals, "u", "left")
        .select(
            "u",
            F.coalesce(
                F.col("tg") - F.col("t0"), F.lit(horizon) - F.col("t0")
            ).alias("dur"),
            F.col("tg").isNotNull().cast("long").alias("event"),
        )
    )
    per_t = durs.groupBy(F.col("dur").alias("t_us")).agg(
        F.count("*").cast("long").alias("m"),
        F.sum("event").cast("long").alias("d"),
    )
    n_total = durs.count()
    w = Window.orderBy("t_us").rowsBetween(Window.unboundedPreceding, -1)
    at_risk = per_t.withColumn(
        "n_risk",
        (F.lit(int(n_total)) - F.coalesce(F.sum("m").over(w), F.lit(0)))
        .cast("long"),
    )
    curve = at_risk.where(F.col("d") > 0).withColumn(
        "survival",
        F.round(
            F.product(
                F.lit(1.0) - F.col("d") / F.col("n_risk")
            ).over(Window.orderBy("t_us").rowsBetween(Window.unboundedPreceding, 0)),
            round_dp,
        ),
    )
    return curve.select("t_us", "d", "n_risk", "survival")


def gini_concentration(
    counts: DataFrame,
    value_col: str = "n",
    round_unit: int = 1_000_000,
) -> DataFrame:
    """Gini coefficient of a count distribution (traffic concentration
    — "what share of the crawl is a handful of hosts") in EXACT integer
    micro-units via the rank formula over ascending values:

      G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n

    Ranks come from one distributed dense rank (tie-break by value then
    arbitrary-but-pinned original order column must be provided
    upstream in ``counts`` as unique rows); both divisions are integer
    div at ``round_unit`` scale — deterministic in any engine. Returns
    ONE row (n_groups, total, gini_micro).
    """
    from ..functions.seq import with_dense_sequence

    keyed = counts.select(F.col(value_col).cast("long").alias("x"), "*")
    ranked = with_dense_sequence(
        keyed, [value_col] + [c for c in counts.columns if c != value_col],
        out_col="__r",
    ).select(F.col("x"), (F.col("__r") + 1).alias("__i"))
    agg = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("__i") * F.col("x")).cast("long").alias("ix"),
    )
    u = int(round_unit)
    return agg.select(
        F.col("n").alias("n_groups"),
        F.col("s").alias("total"),
        (
            F.expr(f"(2 * ix * {u}) div (n * s)")
            - F.expr(f"((n + 1) * {u}) div n")
        )
        .cast("long")
        .alias("gini_micro"),
    )
