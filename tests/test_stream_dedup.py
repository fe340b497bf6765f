"""Streaming exact dedup (dropDuplicatesWithinWatermark): stream==batch key
set, one row per key, and incremental drains never re-emit a key."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from see_spark.streaming.dedup import stream_exact_dedup

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("payload", T.LongType()),
    ]
)


def _rows(spark, specs):
    return spark.createDataFrame(
        [(u, f"2026-01-01 10:{m:02d}:00", p) for u, m, p in specs],
        ["url", "ts_s", "payload"],
    ).select("url", F.col("ts_s").cast("timestamp").alias("ts"), "payload")


def test_stream_dedup_matches_batch_distinct(spark, tmp_path):
    data = str(tmp_path / "in")
    _rows(
        spark,
        [("a", 0, 1), ("b", 1, 2), ("a", 2, 3), ("c", 3, 4), ("b", 4, 5), ("a", 5, 6)],
    ).coalesce(1).write.parquet(data)

    out = stream_exact_dedup(
        spark, data, SCHEMA, ["url"],
        checkpoint_dir=str(tmp_path / "ckpt"), query_name="sd_batch_eq",
    )
    got = sorted(r["url"] for r in out.collect())
    want = sorted(
        r["url"] for r in spark.read.parquet(data).select("url").distinct().collect()
    )
    assert got == want  # one row per key, keys == batch distinct


def test_stream_dedup_incremental_never_reemits(spark, tmp_path):
    data = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(data)
    _rows(spark, [("a", 0, 1), ("b", 1, 2)]).coalesce(1).write.mode(
        "append"
    ).parquet(data)
    first = stream_exact_dedup(
        spark, data, SCHEMA, ["url"], checkpoint_dir=ckpt, output_dir=out
    )
    assert sorted(r["url"] for r in first.collect()) == ["a", "b"]

    # second drain: overlapping keys plus one new — cumulative output stays
    # one row per key (a/b were emitted in drain 1 and are never re-emitted)
    _rows(spark, [("a", 6, 9), ("c", 7, 8), ("b", 8, 7)]).coalesce(1).write.mode(
        "append"
    ).parquet(data)
    second = stream_exact_dedup(
        spark, data, SCHEMA, ["url"], checkpoint_dir=ckpt, output_dir=out
    )
    assert sorted(r["url"] for r in second.collect()) == ["a", "b", "c"]
    # the repeats carried NEW payloads — their rows must be drain-1's
    payloads = {r["url"]: r["payload"] for r in second.collect()}
    assert payloads["a"] == 1 and payloads["b"] == 2


def test_stream_dedup_composite_key(spark, tmp_path):
    data = str(tmp_path / "in")
    _rows(
        spark,
        [("a", 0, 1), ("a", 1, 1), ("a", 2, 2)],
    ).coalesce(1).write.parquet(data)
    out = stream_exact_dedup(
        spark, data, SCHEMA, ["url", "payload"],
        checkpoint_dir=str(tmp_path / "ckpt"), query_name="sd_comp",
    )
    got = sorted((r["url"], r["payload"]) for r in out.collect())
    assert got == [("a", 1), ("a", 2)]
