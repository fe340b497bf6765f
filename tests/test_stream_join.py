"""Stream-stream interval join (click attribution) == the same join on
static frames, across micro-batch boundaries."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from see_spark.streaming.joins import click_attribution

IMP_SCHEMA = "imp_id long, ts_s string, user_id long"
CLK_SCHEMA = "click_id long, ts_s string, user_id long"


def _df(spark, rows, schema):
    cols = [f.split(" ")[0] for f in schema.split(", ") if not f.startswith("ts_s")]
    return spark.createDataFrame(rows, schema).select(
        *cols, F.col("ts_s").cast("timestamp").alias("ts")
    )


def _write_files(spark, tmp_path, name, file_rows, schema):
    d = tmp_path / name
    d.mkdir()
    for i, rows in enumerate(file_rows):
        sub = tmp_path / f"{name}_part{i}"
        _df(spark, rows, schema).coalesce(1).write.parquet(str(sub))
        pq = next(p for p in os.listdir(sub) if p.endswith(".parquet"))
        dst = d / f"f{i}.parquet"
        os.rename(sub / pq, dst)
        os.utime(dst, (time.time() + i, time.time() + i))
    return d


def test_click_attribution_stream_matches_batch(spark, tmp_path):
    imp_files = [
        [(1, "2024-01-01 00:00:00", 7), (2, "2024-01-01 00:01:00", 8)],
        [(3, "2024-01-01 00:30:00", 7)],
    ]
    clk_files = [
        # click 5min after imp 1 (attributes); user 8 click 11min after
        # imp 2 (outside the 10min window)
        [(10, "2024-01-01 00:05:00", 7), (11, "2024-01-01 00:12:00", 8)],
        # click in a LATER micro-batch attributing to imp 3 from an
        # earlier batch (state carry), plus one with no impression
        [(12, "2024-01-01 00:35:00", 7), (13, "2024-01-01 00:36:00", 9)],
    ]
    imp_dir = _write_files(spark, tmp_path, "imps", imp_files, IMP_SCHEMA)
    clk_dir = _write_files(spark, tmp_path, "clks", clk_files, CLK_SCHEMA)

    imp_batch = _df(spark, [r for f in imp_files for r in f], IMP_SCHEMA)
    clk_batch = _df(spark, [r for f in clk_files for r in f], CLK_SCHEMA)
    expected = sorted(
        map(tuple, click_attribution(imp_batch, clk_batch).collect())
    )
    # sanity on the hand case: imp7->click10, imp3->click12 only
    assert [(r[1], r[2]) for r in expected] == [(1, 10), (3, 12)]

    imp_stream = (
        spark.readStream.schema(imp_batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(imp_dir))
    )
    clk_stream = (
        spark.readStream.schema(clk_batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(clk_dir))
    )
    q = (
        click_attribution(imp_stream, clk_stream)
        .writeStream.format("memory")
        .queryName("see_attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(map(tuple, spark.table("see_attrib").collect()))
    assert streamed == expected


def test_anchor_diversity(spark):
    from see_spark.operators.linkgraph import anchor_diversity

    rows = (
        [("spammed", "buy cheap widgets")] * 9
        + [("spammed", "other words")]
        + [("organic", f"desc {i}") for i in range(6)]
        + [("thin", "same text")] * 3
    )
    df = spark.createDataFrame(rows, "href string, anchor string")
    got = {r["href"]: r for r in anchor_diversity(df).collect()}
    s = got["spammed"]
    assert (s["n_anchors"], s["n_distinct"]) == (10, 2)
    assert s["top_anchor"] == "buy cheap widgets"
    assert s["top_share_milli"] == 900 and s["flagged"] is True
    o = got["organic"]
    assert o["n_distinct"] == 6 and o["flagged"] is False
    t = got["thin"]  # fully concentrated but below the evidence floor
    assert t["top_share_milli"] == 1000 and t["flagged"] is False
