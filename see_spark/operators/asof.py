"""As-of join: each left row picks the latest right row at-or-before it.

The reference has no join operators at all (SURVEY §2.2 — its only
join-like constructs are posting-set intersection and the id->page
projection), so this is engine capability beyond parity: the standard
event-alignment operator a training-data pipeline needs (align events to
the most recent model snapshot, price, sensor reading, ...).

Spark lacks a native as-of join; the classic scalable rewrite used here is
union-tag + window (no range-explode, no crossJoin):

  1. tag left rows side=1, right rows side=0, union by name;
  2. one shuffle: window partitioned by the key, ordered by
     (ts, side, right_seq) — at equal timestamps the right row sorts
     BEFORE the left row, giving backward/inclusive semantics
     (right.ts <= left.ts), matching ANSI/DuckDB ``ASOF JOIN ... >=``;
  3. last(value, ignorenulls) over unbounded-preceding carries the most
     recent right values forward; keep side=1 rows.

Scale shape: exactly ONE shuffle by key for any |L|+|R|, no skew-prone
inequality join; both inputs stream through the same sort. A sorted
bucketed layout on the key makes the shuffle free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = (),
    right_prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join (backward, inclusive): for every left row, the right
    row with the greatest ``right_ts`` <= ``left_ts`` within the same key
    group; right value columns appear as ``{prefix}{col}``, null when no
    right row precedes. If several right rows share (key, ts), the last in
    ``right``'s deterministic order wins — pre-aggregate ``right`` to one
    row per (key, ts) for a fully pinned contract.
    """
    on = list(on)
    value_cols = list(value_cols)
    lcols = left.columns

    tagged_left = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols if c not in on and c != left_ts],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    tagged_right = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in on and c != left_ts
        ],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(right_ts).alias("__r_ts"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{right_prefix}{c}")
            for c in value_cols
        ],
        F.last("__r_ts", ignorenulls=True).over(w).alias(f"{right_prefix}{right_ts}"),
    )
    return carried.filter(F.col("__side") == 1).select(
        *on,
        F.col("__ts").alias(left_ts),
        *[c for c in lcols if c not in on and c != left_ts],
        *[f"{right_prefix}{c}" for c in value_cols],
        f"{right_prefix}{right_ts}",
    )


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str = "start_us",
    end_col: str = "end_us",
    point_col: str = "ts_us",
    bucket_us: int = 3_600_000_000,
    interval_cols: Sequence[str] = ("interval_id",),
    point_cols: Sequence[str] = ("point_id",),
) -> DataFrame:
    """Interval-overlap (range) join, bucketized: match every point p to
    every interval [s, e] with s ≤ p ≤ e — WITHOUT the inequality-join
    plan Spark would otherwise choose (BroadcastNestedLoop/cartesian,
    the classic range-join scale-killer).

    The standard rewrite: quantize time into ``bucket_us`` buckets; an
    interval registers in every bucket it touches (floor(s/B)..floor(e/B)
    — fan-out = len/B + 1, bounded when interval length is bounded), a
    point registers in exactly one; the match becomes an EQUI-join on
    the bucket followed by the exact s ≤ p ≤ e filter. No duplicates by
    construction: a point lives in one bucket only, so each (interval,
    point) pair meets at most once — no distinct needed.

    Semantics are half-open-free (closed [s, e]); pick ``bucket_us``
    near the typical interval length — too small inflates interval
    fan-out, too large inflates the per-bucket join frontier (this is
    exactly Spark 3's storage-partitioned range-join bucketing knob,
    expressed manually and portably).

    Returns interval_cols + point_cols + (start, end, point ts).
    """
    b = int(bucket_us)
    iv = intervals.select(
        *interval_cols,
        F.col(start_col).cast("long").alias("__s"),
        F.col(end_col).cast("long").alias("__e"),
    ).withColumn(
        "__bkt",
        # integer div (not floor of a double quotient — boundary-exact)
        F.explode(
            F.sequence(
                F.expr(f"__s div {b}").cast("long"),
                F.expr(f"__e div {b}").cast("long"),
            )
        ),
    )
    pt = points.select(
        *point_cols, F.col(point_col).cast("long").alias("__p")
    ).withColumn("__bkt", F.expr(f"__p div {b}").cast("long"))
    return (
        iv.join(pt, "__bkt")
        .where((F.col("__p") >= F.col("__s")) & (F.col("__p") <= F.col("__e")))
        .select(
            *interval_cols,
            *point_cols,
            F.col("__s").alias(start_col),
            F.col("__e").alias(end_col),
            F.col("__p").alias(point_col),
        )
    )
