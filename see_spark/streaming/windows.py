"""Event-stream operators: tumbling windows + sessionization.

The reference has NO streaming surface (SURVEY §2.2 — its crawl loop is a
poll loop), so these are engine capabilities beyond parity: the standard
event-time operations a training-data pipeline needs over an events table.

Both are expressed as plain DataFrame transformations so the SAME code runs
(a) batch over parquet and (b) incrementally under Structured Streaming —
``stream_tumbling_counts`` wires variant (b) with readStream +
Trigger.AvailableNow, and tests assert batch == streamed results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Per (window, event_type) count + value sum; event-time tumbling."""
    return (
        events.groupBy(
            F.window("ts", width).alias("win"), F.col("event_type")
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def hopping_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Per (window, event_type) count + value sum over HOPPING (sliding)
    event-time windows: each event lands in width/slide overlapping
    windows. Built on F.window's slideDuration — Catalyst expands the hop
    set inline (no join, no UDF)."""
    return (
        events.groupBy(
            F.window("ts", width, slide).alias("win"), F.col("event_type")
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap from
    the previous event exceeds ``gap_minutes``. Classic lag+cumsum; one
    shuffle by user_id (both windows share the partitioning)."""
    by_user = Window.partitionBy("user_id").orderBy("ts")
    # microsecond precision: second-truncation would flip boundaries for
    # gaps within 1s of the threshold
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(by_user)
    with_start = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sessions = (
        F.sum(with_start).over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        )
    )
    tagged = (
        events.withColumn("session_no", sessions)
    )
    return tagged.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
    )


def stream_tumbling_counts(
    spark: SparkSession, events_dir: str, schema, width: str = "1 hour",
    checkpoint_dir: str | None = None,
):
    """Structured-Streaming variant: same transformation over readStream,
    drained with availableNow into a memory sink; returns the result DF.
    Watermark bounds state for late data (no-op on a static drain, load-
    bearing on a live stream)."""
    stream = (
        spark.readStream.schema(schema).parquet(events_dir)
        .withWatermark("ts", "2 hours")
    )
    agg = tumbling_counts(stream, width)
    query = (
        agg.writeStream.format("memory")
        .queryName("see_stream_tumbling")
        .outputMode("complete")
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        query = query.option("checkpointLocation", checkpoint_dir)
    q = query.start()
    q.awaitTermination()
    return spark.table("see_stream_tumbling")
