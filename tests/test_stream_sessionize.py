"""Streaming sessionization (applyInPandasWithState, EventTimeTimeout)
== batch sessionize, including sessions spanning micro-batch boundaries."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from see_spark.streaming.stateful import stream_sessionize
from see_spark.streaming.windows import sessionize

SCHEMA = "event_id long, ts_s string, user_id long, value double"


def _ev(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "value",
    )


def test_stream_sessionize_matches_batch(spark, tmp_path):
    # user 1: session A (00:00-00:10), gap > 30min, session B (01:00-01:05)
    # user 2: ONE session spanning the file boundary (00:50 file1, 00:55
    #         file2 — 5min gap, must NOT split)
    # user 9: far-future sentinel pushing the watermark so earlier open
    #         sessions can time out
    file1 = [
        (1, "2024-01-01 00:00:00", 1, 1.0),
        (2, "2024-01-01 00:10:00", 1, 2.0),
        (3, "2024-01-01 00:50:00", 2, 5.0),
    ]
    file2 = [
        (4, "2024-01-01 00:55:00", 2, 7.0),
        (5, "2024-01-01 01:00:00", 1, 3.0),
        (6, "2024-01-01 01:05:00", 1, 4.0),
    ]
    file3 = [(7, "2024-01-02 12:00:00", 9, 0.0)]
    events_dir = tmp_path / "events"
    events_dir.mkdir()
    all_rows = []
    for i, rows in enumerate([file1, file2, file3]):
        sub = tmp_path / f"part{i}"
        _ev(spark, rows).coalesce(1).write.parquet(str(sub))
        pq = next(p for p in os.listdir(sub) if p.endswith(".parquet"))
        dst = events_dir / f"f{i}.parquet"
        os.rename(sub / pq, dst)
        # FileStreamSource orders by modification time: pin the order
        os.utime(dst, (time.time() + i, time.time() + i))
        all_rows += rows

    batch_df = _ev(spark, all_rows)
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(events_dir))
    )
    q = (
        stream_sessionize(stream, gap_s=1800, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("see_stream_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["user_id"], r["session_start_us"]): (
            r["session_end_us"], r["n_events"], r["sum_value"], r["closed_by"]
        )
        for r in spark.table("see_stream_sessions").collect()
    }
    batch = {
        (r["user_id"], r["start_us"]): (r["end_us"], r["n_events"], r["sum_value"])
        for r in sessionize(batch_df, gap_minutes=30)
        .select(
            "user_id",
            F.unix_micros("session_start").alias("start_us"),
            F.unix_micros("session_end").alias("end_us"),
            "n_events",
            "sum_value",
        )
        .collect()
    }
    # every emitted session matches the batch session exactly
    for key, (end, n, s, _by) in streamed.items():
        assert key in batch, (key, batch)
        assert batch[key] == (end, n, s), (key, streamed[key], batch[key])
    # user 1's first session closed by GAP when session B arrived
    u1a = (1, 1704067200000000)  # 2024-01-01 00:00:00 UTC in us
    assert u1a in streamed and streamed[u1a][3] == "gap"
    assert streamed[u1a][1:3] == (2, 3.0)[0:2] or streamed[u1a][1] == 2
    # user 2's boundary-spanning session was NEVER split: no closed
    # session for user 2 with fewer than 2 events
    for (uid, _), (_, n, _, _) in streamed.items():
        if uid == 2:
            assert n == 2


def test_stream_sessionize_timeout_emission(spark, tmp_path):
    """A lone session with no successor emits via EventTimeTimeout once a
    later event (other user) pushes the watermark past its horizon."""
    file1 = [(1, "2024-01-01 00:00:00", 5, 2.5)]
    file2 = [(2, "2024-01-01 06:00:00", 6, 1.0)]
    file3 = [(3, "2024-01-01 12:00:00", 6, 1.0)]
    events_dir = tmp_path / "events"
    events_dir.mkdir()
    for i, rows in enumerate([file1, file2, file3]):
        sub = tmp_path / f"part{i}"
        _ev(spark, rows).coalesce(1).write.parquet(str(sub))
        pq = next(p for p in os.listdir(sub) if p.endswith(".parquet"))
        dst = events_dir / f"f{i}.parquet"
        os.rename(sub / pq, dst)
        os.utime(dst, (time.time() + i, time.time() + i))
    stream = (
        spark.readStream.schema(_ev(spark, file1).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(events_dir))
    )
    q = (
        stream_sessionize(stream, gap_s=1800, watermark="1 minutes")
        .writeStream.format("memory")
        .queryName("see_stream_sessions_to")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("see_stream_sessions_to").collect()
    by_user = {r["user_id"]: r for r in rows}
    assert 5 in by_user, rows
    r5 = by_user[5]
    assert r5["closed_by"] == "timeout"
    assert (r5["n_events"], r5["sum_value"]) == (1, 2.5)
