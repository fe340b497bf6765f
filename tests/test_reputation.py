"""Host-reputation gate (operators/reputation.py): integer quality
formula vs a hand replica, cold-start semantics, the cross-multiply
threshold edge, and broadcast/shuffle-join path equality."""

from __future__ import annotations

from pyspark.sql import functions as F

from see_spark.operators.reputation import (
    doc_quality_milli,
    host_quality_gate,
    host_quality_stats,
)


def _q_py(text: str) -> int:
    toks = text.split(" ")
    n = len(toks)
    rep = n - len(set(toks))
    stop = sum(1 for t in toks if t in {"the", "a", "of", "and", "to", "in", "is"})
    return (1000 * min(n, 200) * (n - rep) * (n + stop)) // (400 * n * n)


def test_doc_quality_matches_python_replica(spark):
    rows = [
        (1, "h1", "the quick brown fox jumps over the lazy dog"),
        (2, "h1", "spam spam spam spam spam"),
        (3, "h2", "a of and to in is the"),  # all stopwords
        (4, "h2", "x"),                      # single token
    ]
    df = spark.createDataFrame(rows, ["doc_id", "host", "text"])
    got = {r["doc_id"]: r["q_milli"] for r in doc_quality_milli(df).collect()}
    for did, _, text in rows:
        assert got[did] == _q_py(text), (did, text)


def _gate(spark, min_docs=2, min_avg=10, broadcast=True):
    # short fixture docs score low absolute q (the min(n,200)/200 length
    # factor), so the fixture threshold sits between lowq's avg 2 and
    # goodq's avg 15
    docs = spark.createDataFrame(
        # lowq host: heavy repetition -> low q; goodq host: distinct prose
        [(i, "lowq", "spam spam spam spam spam spam") for i in range(3)]
        + [
            (10 + i, "goodq", f"distinct prose words number{i} vary daily")
            for i in range(3)
        ]
        + [(20, "thin", "one single observation here")],
        ["doc_id", "host", "text"],
    )
    stats = host_quality_stats(doc_quality_milli(docs))
    frontier = spark.createDataFrame(
        [("u1", "lowq"), ("u2", "goodq"), ("u3", "thin"), ("u4", "never-seen")],
        ["url", "host"],
    )
    return {
        r["host"]: r
        for r in host_quality_gate(
            frontier, stats, min_docs=min_docs, min_avg_milli=min_avg,
            broadcast=broadcast,
        ).collect()
    }


def test_gate_semantics(spark):
    got = _gate(spark)
    assert got["lowq"]["passed"] == 0          # enough evidence, low quality
    assert got["goodq"]["passed"] == 1
    assert got["thin"]["passed"] == 1          # below min_docs: cold start
    assert got["never-seen"]["passed"] == 1    # no evidence at all
    assert got["never-seen"]["n_docs"] == 0
    assert got["never-seen"]["sum_q_milli"] == 0


def test_threshold_edge_is_cross_multiplied(spark):
    """sum == min_avg * n must PASS (strict < fails), with no float
    division anywhere."""
    stats = spark.createDataFrame(
        [("h", 4, 400), ("g", 4, 399)], ["host", "n_docs", "sum_q_milli"]
    ).select(
        "host",
        F.col("n_docs").cast("long"),
        F.col("sum_q_milli").cast("long"),
    )
    frontier = spark.createDataFrame([("u1", "h"), ("u2", "g")], ["url", "host"])
    got = {
        r["host"]: r["passed"]
        for r in host_quality_gate(
            frontier, stats, min_docs=3, min_avg_milli=100
        ).collect()
    }
    assert got == {"h": 1, "g": 0}


def test_broadcast_and_shuffle_paths_agree(spark):
    a = {(h, r["passed"]) for h, r in _gate(spark, broadcast=True).items()}
    b = {(h, r["passed"]) for h, r in _gate(spark, broadcast=False).items()}
    assert a == b
