"""Temporal history operators: SCD Type-2 version ledgers and the
watermark-lateness audit.

Crawl-side motivation: the reference overwrites a page's stored state on
every visit (`see_db_srv.erl` queue/visited transitions keep only the
latest), so "what did this URL look like last month" is unanswerable.
A web-scale corpus needs the warehouse answer — a slowly-changing-
dimension type-2 ledger of page versions (validity intervals opened only
when content actually changes), which is also the standard lakehouse
dimension-maintenance op (Kimball SCD2). And its streaming sibling: the
batch twin of Structured Streaming's watermark semantics, auditing how
many events WOULD be dropped as late at a given delay — the knob a
pipeline owner tunes before turning on `withWatermark`.

Scale shapes:
- ``scd2_versions``: ONE hash shuffle on the entity key; both windows
  (change detection + interval close) share the same partitioning, so
  Catalyst plans a single Exchange. No driver-side state.
- ``late_events``: the watermark is a GLOBAL exclusive prefix-max over
  arrival order — computed with ``seq.with_prefix_max`` (range partition
  + partition-local running max + O(partitions) driver fold), never a
  global single-partition window. The final per-window rollup is one
  map-side-combinable aggregate.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_versions(
    changes: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    """Collapse a change stream into SCD Type-2 validity intervals.

    Input: one row per observation (key, ts, value [, tiebreak]).
    Output: one row per VERSION — consecutive observations of the same
    value collapse into one interval; a new version opens only when the
    observed value differs from the previous observation's:

      (key, value, valid_from, valid_to, is_current, n_obs)

    with ``valid_to`` = the next version's ``valid_from`` (NULL for the
    open/current version) and ``n_obs`` = observations collapsed into the
    version. Intervals are half-open [valid_from, valid_to).

    Determinism: the order (ts, tiebreak) must be tie-free per key;
    pass a unique tiebreak when ts alone can repeat.
    """
    order: List = [F.col(ts_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(key_col).orderBy(*order)
    # version id = running count of value changes (first row = change)
    opened = changes.withColumn(
        "__chg",
        F.when(
            F.lag(value_col).over(w).isNull()
            | (F.lag(value_col).over(w) != F.col(value_col)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__ver",
        F.sum("__chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    versions = opened.groupBy(F.col(key_col).alias("key"), F.col("__ver")).agg(
        F.first(value_col).alias("value"),  # constant within a version
        F.min(ts_col).alias("valid_from"),
        F.count("*").cast("long").alias("n_obs"),
    )
    wv = Window.partitionBy("key").orderBy("__ver")
    return versions.select(
        "key",
        "value",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
        "n_obs",
    )


def late_events(
    events: DataFrame,
    arrival_col: str = "event_id",
    ts_col: str = "ts",
    delay_us: int = 0,
    window_us: int = 60_000_000,
) -> DataFrame:
    """Batch twin of Structured Streaming watermark drops: replay events
    in ARRIVAL order, maintain watermark = max(event time seen so far) −
    ``delay_us``, and flag each event late iff its event time is below
    the watermark accumulated BEFORE it arrived (Spark's semantics: a
    row older than the current watermark is dropped; the row that
    advances the watermark is itself never dropped by that advance).

    Event times are compared in exact BIGINT epoch-microseconds. Returns
    the per-tumbling-window audit a pipeline owner reads to pick a delay:

      (window_start_us, n_events, n_late, n_kept)

    keyed by the EVENT-TIME tumbling window of length ``window_us``.
    """
    from ..functions.seq import with_prefix_max

    base = events.select(
        F.col(arrival_col).cast("long").alias("__arr"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__ts_us"),
    )
    scanned = with_prefix_max(
        base, "__ts_us", ["__arr"], out_col="__seen_max", inclusive=False
    )
    flagged = scanned.select(
        "__ts_us",
        (
            F.col("__seen_max").isNotNull()
            & (F.col("__ts_us") < F.col("__seen_max") - F.lit(int(delay_us)))
        ).alias("__late"),
    )
    win = int(window_us)
    return (
        flagged.groupBy(
            ((F.col("__ts_us") - (((F.col("__ts_us") % win) + win) % win)))
            .cast("long")
            .alias("window_start_us")
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("__late").cast("long")).cast("long").alias("n_late"),
            F.sum((~F.col("__late")).cast("long")).cast("long").alias("n_kept"),
        )
    )


def merge_intervals(
    intervals: DataFrame,
    key_col: str = "key",
    start_col: str = "start_us",
    end_col: str = "end_us",
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    """Coalesce overlapping/touching intervals per key — the classic
    gaps-and-islands rewrite (an island opens where start > max of all
    PRIOR ends): politeness windows, outage windows, per-user activity
    spans all reduce to this. Closed-interval semantics: [1,5] and
    [5,9] merge (touching counts as overlap).

    ONE hash shuffle on the key; the running prior-end maximum and the
    island counter are two frames of the same per-key window (ordered
    by (start, end [, tiebreak]) — pass a tiebreak when (start, end)
    can repeat).

    Returns (key, island, start, end, n_merged).
    """
    order = [F.col(start_col), F.col(end_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = intervals.withColumn(
        "__new",
        F.when(
            F.col(start_col) > F.max(F.col(end_col)).over(w_prev), F.lit(1)
        )
        .when(F.max(F.col(end_col)).over(w_prev).isNull(), F.lit(1))
        .otherwise(F.lit(0)),
    ).withColumn("__isl", F.sum("__new").over(w_run))
    return (
        marked.groupBy(F.col(key_col).alias("key"), F.col("__isl"))
        .agg(
            F.min(start_col).cast("long").alias("start"),
            F.max(end_col).cast("long").alias("end"),
            F.count("*").cast("long").alias("n_merged"),
        )
        .select(
            "key",
            (F.col("__isl")).cast("long").alias("island"),
            "start",
            "end",
            "n_merged",
        )
    )
