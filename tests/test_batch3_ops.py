"""Unit tests for batch-3 operators: as-of join, IVF ANN, hopping windows,
stateful streaming, robots gate, multiset TF-IDF scoring (hand-computed
goldens; cross-engine parity via the DuckDB gate)."""

import pytest
from pyspark.sql import functions as F


def test_asof_join_backward_semantics(spark):
    from see_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100), (1, 15, 150), (2, 9, 900)], "k long, ts long, v long"
    )
    out = {
        (r["k"], r["ts"]): (r["asof_v"], r["asof_ts"])
        for r in asof_join_backward(left, right, on=["k"], value_cols=["v"]).collect()
    }
    assert out[(1, 10)] == (100, 10)     # inclusive: equal ts matches
    assert out[(1, 20)] == (150, 15)     # latest at-or-before
    assert out[(1, 5)] == (None, None)   # nothing precedes
    assert out[(2, 7)] == (None, None)   # right row is AFTER the left row


def test_asof_join_keeps_left_columns(spark):
    from see_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame([(1, 10, "x")], "k long, ts long, tag string")
    right = spark.createDataFrame([(1, 3, 5)], "k long, ts long, v long")
    row = asof_join_backward(left, right, on=["k"], value_cols=["v"]).collect()[0]
    assert row["tag"] == "x" and row["asof_v"] == 5 and row["asof_ts"] == 3


def test_knn_ivf_probes_restrict_candidates(spark):
    from see_spark.operators.similarity import knn_ivf

    # centroid 0 points +x, centroid 1 points +y; corpus splits cleanly
    vecs = spark.createDataFrame(
        [
            (0, [10.0, 0.0]), (1, [0.0, 10.0]),           # centroids
            (2, [9.0, 1.0]), (3, [1.0, 9.0]), (4, [8.0, 0.5]),
        ],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame([(0, [10.0, 0.0])], "query_id long, query_vec array<double>")
    rows = knn_ivf(vecs, q, k=5, n_centroids=2, nprobe=1).collect()
    got = [r["vec_id"] for r in rows]
    # nprobe=1 -> only the +x cluster {0, 2, 4} is searched
    assert set(got) == {0, 2, 4}
    assert rows[0]["vec_id"] == 0 and rows[0]["cosine"] == pytest.approx(1.0)
    # nprobe=2 covers everything -> exact top-5
    all_rows = knn_ivf(vecs, q, k=5, n_centroids=2, nprobe=2).collect()
    assert {r["vec_id"] for r in all_rows} == {0, 1, 2, 3, 4}


def test_hopping_counts_overlap(spark):
    from see_spark.streaming.windows import hopping_counts

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:31:00", "click", 2.0)],
        "event_id long, ts_s string, event_type string, value double",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
    rows = hopping_counts(ev, "1 hour", "15 minutes").collect()
    # width/slide = 4 overlapping windows per event
    assert len(rows) == 4
    # event 00:31 belongs to windows starting 23:45 (prev day), 00:00,
    # 00:15, 00:30 — as minutes-of-day: 1425, 0, 15, 30
    starts = sorted(r["window_start"].minute + 60 * r["window_start"].hour for r in rows)
    assert starts == [0, 15, 30, 1425]


def test_stateful_running_totals_stream(spark, tmp_path):
    """applyInPandasWithState over a real stream == plain batch aggregate."""
    from see_spark.streaming.stateful import running_user_totals

    ev = spark.createDataFrame(
        [(i, f"2024-01-01 00:{i:02d}:00", i % 3, float(i)) for i in range(12)],
        "event_id long, ts_s string, user_id long, value double",
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "value"
    )
    events_dir = str(tmp_path / "events")
    ev.write.parquet(events_dir)

    stream = spark.readStream.schema(
        spark.read.parquet(events_dir).schema
    ).parquet(events_dir)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("see_running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["last_ts_us"])
        for r in spark.table("see_running_totals").collect()
    }
    batch = {
        r["user_id"]: (r["n"], r["s"], r["last_us"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.unix_micros(F.max("ts")).alias("last_us"),
        )
        .collect()
    }
    assert streamed == batch


def test_robots_gate_blocks_only_matching_prefix(spark):
    from see_spark.operators.frontier import robots_block

    frontier = spark.createDataFrame(
        [
            ("http://a.test/private/x", "a.test", "unvisited", None),
            ("http://a.test/public/y", "a.test", "unvisited", None),
            ("http://a.test/private/z", "a.test", "visited", None),  # not unvisited
            ("http://b.test/private/w", "b.test", "unvisited", None),  # no rules
        ],
        "url string, host string, state string, detail string",
    )
    robots = spark.createDataFrame(
        [("a.test", ["/private/"])], "host string, disallow array<string>"
    )
    out = {r["url"]: r["state"] for r in robots_block(frontier, robots).collect()}
    assert out["http://a.test/private/x"] == "robots_blocked"
    assert out["http://a.test/public/y"] == "unvisited"
    assert out["http://a.test/private/z"] == "visited"
    assert out["http://b.test/private/w"] == "unvisited"


def test_multiset_query_scores_repeated_word_twice(spark):
    """Reference rank/3 sums over the query token LIST (duplicates kept,
    see_rank_tfidf.erl:5-6): score('w w') == 2 * score('w')."""
    from see_spark.operators.search import search

    postings = spark.createDataFrame(
        [("ww", "d1", 2, 4, 0.5), ("vv", "d1", 2, 4, 0.5)],
        "word string, doc_id string, term_count long, doc_len long, tf double",
    )
    docs_meta = spark.createDataFrame([("d1", "t1")], "doc_id string, title string")
    one = search(spark, "ww", postings, docs_meta, page_count=10).collect()[0]["score"]
    two = search(spark, "ww ww", postings, docs_meta, page_count=10).collect()[0]["score"]
    assert two == pytest.approx(2 * one)
