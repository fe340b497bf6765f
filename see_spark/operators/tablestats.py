"""Catalog statistics operators: ANALYZE-style per-column stats and
time-decayed counters.

``table_stats`` is the ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS
primitive every cost-based optimizer feeds on (row counts, NDV, null
counts, min/max) — the numbers behind join reordering and broadcast
decisions. Exact NDV here (the oracle-checkable contract); at 10^10
rows swap countDistinct for the engine's HLL sketch
(``functions/sketches.py``) — same plan shape, bounded memory.

``decayed_counts`` is the classic exponentially-decayed counter
(half-life aging, the frequency signal crawl schedulers and trending
dashboards use) in EXACT fixed point: weight = 2^20 >> age_halflives,
so every row's contribution is an integer and the sum is
order-independent — no float decay drift across engines or
partitionings.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_stats(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """One row per column: (column, n_rows, n_null, ndv, min_val,
    max_val) with min/max rendered as strings for a uniform schema.
    ONE scan: all aggregates in a single pass, unpivoted via stack."""
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in columns:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"__null_{c}"),
            F.countDistinct(F.col(c)).cast("long").alias(f"__ndv_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __ndv_{c}, __min_{c}, __max_{c}" for c in columns
    )
    return one.select(
        F.expr(
            f"stack({len(columns)}, {stack_args})"
            " as (column, n_null, ndv, min_val, max_val)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column", "n_rows", "n_null", "ndv", "min_val", "max_val")


def decayed_counts(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    halflife_us: int = 7 * 24 * 3_600_000_000,
    scale_bits: int = 20,
    now_us: int = None,
) -> DataFrame:
    """Per-key exponentially-decayed count, fixed point: each event
    contributes 2^scale_bits >> (age div halflife) — halved per
    half-life, zero past scale_bits half-lives. Returns
    (key, n_events, decayed_fp) where decayed_fp/2^scale_bits is the
    decayed count. ``now_us`` defaults to the max event time (one
    scalar aggregate). One combinable shuffle."""
    if now_us is None:
        now_us = int(
            events.agg(
                F.coalesce(
                    F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))),
                    F.lit(0),
                )
            ).collect()[0][0]
        )
    h = int(halflife_us)
    sb = int(scale_bits)
    # Clamp age to >= 0: events after now_us (caller passed an earlier
    # reference point) count at full weight instead of feeding a negative
    # shift count into shiftright (JVM mod-64 → arbitrary weights).
    age = (
        f"greatest({now_us} - unix_micros(cast({ts_col} as timestamp)), 0L)"
    )
    w = F.expr(
        f"IF(({age}) div {h}"
        f" >= {sb}, 0L, shiftright(cast({1 << sb} as bigint),"
        f" cast(({age})"
        f" div {h} as int)))"
    )
    return (
        events.select(F.col(key_col).alias("key"), w.alias("__w"))
        .groupBy("key")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("__w").cast("long").alias("decayed_fp"),
        )
    )


def selectivity_audit(
    df: DataFrame, predicates: list
) -> DataFrame:
    """Cost-based-optimizer reality check: for each equality predicate
    (label, col, value), compare the textbook uniform-NDV cardinality
    estimate — est = n_rows div ndv(col), the formula every CBO applies
    when only ANALYZE stats exist — against the ACTUAL matching rows,
    reporting the q-error (max(est,act)/min(est,act), the standard
    estimation-quality metric, Moerkotte et al. 2009). On skewed
    columns the q-error shows exactly how far uniformity lies — the
    number that justifies histograms (range_router_audit) over plain
    NDV stats.

    One scan computes all NDVs + all actual counts together (conditional
    aggregates); output one row per predicate, all exact BIGINT:
    (predicate, n_rows, ndv, est_rows, actual_rows, q_error_milli).
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for label, col, _ in predicates:
        aggs.append(F.countDistinct(F.col(col)).cast("long").alias(f"__ndv_{label}"))
    for label, col, value in predicates:
        aggs.append(
            F.sum((F.col(col) == F.lit(value)).cast("long"))
            .cast("long")
            .alias(f"__act_{label}")
        )
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{label}', __ndv_{label}, __act_{label}" for label, _, _ in predicates
    )
    base = one.select(
        F.expr(
            f"stack({len(predicates)}, {stack_args})"
            " as (predicate, ndv, actual_rows)"
        ),
        F.col("__n").alias("n_rows"),
    )
    return base.select(
        "predicate",
        "n_rows",
        "ndv",
        F.expr("n_rows div ndv").cast("long").alias("est_rows"),
        F.coalesce("actual_rows", F.lit(0)).cast("long").alias("actual_rows"),
        F.expr(
            "1000 * greatest(n_rows div ndv, coalesce(actual_rows, 0))"
            " div greatest(least(n_rows div ndv, coalesce(actual_rows, 0)), 1)"
        )
        .cast("long")
        .alias("q_error_milli"),
    )
