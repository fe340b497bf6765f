"""Regression tests for the round-3 ADVICE.md findings: short-string
recall in edit_distance_join, skyline_layers exhaustion, NULL-position
sensitivity in merkle/table_diff hashing, the fagin_ta strict-tie stop
convention, and decayed_counts with a past now_us reference."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from see_spark.operators.merkle import merkle_root, table_diff
from see_spark.operators.search import fagin_ta_depth
from see_spark.operators.simjoin import edit_distance_join
from see_spark.operators.skyline import skyline2d, skyline_layers
from see_spark.operators.tablestats import decayed_counts


def test_edit_join_short_strings_share_zero_qgrams(spark):
    # ('ab','cd') are within distance 2 yet share no 2-gram: the count
    # bound is vacuous for both-short pairs, so the length-blocked
    # short-regime path must surface them.
    docs = spark.createDataFrame(
        [(1, "ab"), (2, "cd")], "doc_id long, text string"
    )
    rows = edit_distance_join(docs, max_dist=2, q=2).collect()
    assert [(r["a"], r["b"], r["dist"]) for r in rows] == [(1, 2, 2)]


def test_edit_join_mixed_lengths_no_dupes_full_recall(spark):
    docs = spark.createDataFrame(
        [(1, "ab"), (2, "cd"), (3, "abcdef"), (4, "abcdxf"),
         (5, "zzzzzzzzzz"), (6, "a"), (7, "")],
        "doc_id long, text string",
    )
    got = sorted(
        (r["a"], r["b"], r["dist"])
        for r in edit_distance_join(docs, max_dist=2, q=2).collect()
    )
    # Brute-force ground truth over the same 24-char prefix field.
    import itertools
    texts = {1: "ab", 2: "cd", 3: "abcdef", 4: "abcdxf",
             5: "zzzzzzzzzz", 6: "a", 7: ""}

    def lev(a, b):
        m = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, m[0] = m[0], i
            for j, cb in enumerate(b, 1):
                prev, m[j] = m[j], min(
                    m[j] + 1, m[j - 1] + 1, prev + (ca != cb)
                )
        return m[len(b)]

    want = sorted(
        (a, b, lev(texts[a], texts[b]))
        for a, b in itertools.combinations(sorted(texts), 2)
        if lev(texts[a], texts[b]) <= 2
    )
    assert got == want
    # exactly once each — the two candidate paths are disjoint
    assert len(got) == len({(a, b) for a, b, _ in got})


def test_skyline_layers_exhausts_before_n_layers(spark):
    df = spark.createDataFrame(
        [(1, 5, 1), (2, 1, 5)], "id long, x long, y long"
    )
    rows = skyline_layers(df, "x", "y", "id", n_layers=3).collect()
    assert sorted((r["id"], r["layer"]) for r in rows) == [(1, 1), (2, 1)]


def test_skyline_empty_inputs(spark):
    df = spark.createDataFrame(
        [(1, 5, 1)], "id long, x long, y long"
    ).limit(0)
    assert skyline2d(df, "x", "y", "id").collect() == []
    out = skyline_layers(df, "x", "y", "id", n_layers=3)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["id", "x", "y", "layer"]


def test_table_diff_null_position_is_a_change(spark):
    schema = "k long, c1 string, c2 string, c3 string"
    old = spark.createDataFrame([(1, "a", None, "b")], schema)
    new = spark.createDataFrame([(1, "a", "b", None)], schema)
    rows = table_diff(old, new, ["k"], ["c1", "c2", "c3"]).collect()
    assert [(r["status"], r["n_keys"]) for r in rows] == [("changed", 1)]


def test_merkle_root_null_position_sensitive(spark):
    schema = "k long, c1 string, c2 string"
    a = spark.createDataFrame([(1, None, "x")], schema)
    b = spark.createDataFrame([(1, "x", None)], schema)
    assert merkle_root(a, ["k"], ["c1", "c2"], fanout=4) != merkle_root(
        b, ["k"], ["c1", "c2"], fanout=4
    )


def test_fagin_ta_strict_tie_depth_covers_tied_topk(spark):
    # k=1; totals: id1=10, id2=10 (tie), id3=2. τ_0 = 10 = kth.
    # Under '<=' the audit would report depth 1, where tied member(s)
    # may be unseen; strict requires τ < 10, reached at depth 2.
    df = spark.createDataFrame(
        [(1, 9, 1), (2, 1, 9), (3, 1, 1)], "id long, s1 long, s2 long"
    )
    row = fagin_ta_depth(df, k=1).collect()[0]
    assert row["kth_total"] == 10
    assert row["depth_needed"] >= 2
    # both tied members are seen within depth_needed in at least one list
    d = row["depth_needed"]
    by_s1 = [r["id"] for r in df.orderBy(
        F.desc("s1"), F.asc("id")).limit(d).collect()]
    by_s2 = [r["id"] for r in df.orderBy(
        F.desc("s2"), F.asc("id")).limit(d).collect()]
    assert {1, 2} <= set(by_s1) | set(by_s2)


def test_decayed_counts_past_now_us_clamps_to_full_weight(spark):
    ev = spark.createDataFrame(
        [("a", "2026-01-02 00:00:00")], "event_type string, ts string"
    ).select("event_type", F.col("ts").cast("timestamp").alias("ts"))
    now_us = int(datetime.datetime(2026, 1, 1).timestamp() * 1e6)
    row = decayed_counts(
        ev, key_col="event_type", now_us=now_us, scale_bits=20
    ).collect()[0]
    assert row["decayed_fp"] == 1 << 20


def test_table_diff_nul_value_vs_null_is_a_change(spark):
    # a real string value equal to the NULL sentinel bytes must NOT
    # collide with NULL: values escape \x00 before the sentinel check
    schema = "k long, c1 string"
    old = spark.createDataFrame([(1, None)], schema)
    new = spark.createDataFrame([(1, "\x00N")], schema)
    rows = table_diff(old, new, ["k"], ["c1"]).collect()
    assert [(r["status"], r["n_keys"]) for r in rows] == [("changed", 1)]
