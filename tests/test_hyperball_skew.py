"""HyperBall neighborhood estimation (accuracy bound, monotonicity,
partitioning determinism) and the shuffle-skew audit vs hand values."""

from __future__ import annotations

from pyspark.sql import functions as F

from see_spark.operators.linkgraph import hyperball, synthetic_edges
from see_spark.operators.sharding import skew_audit


def _ring_edges(spark, n, hops=(1, 2)):
    rows = [(v, (v + h) % n) for v in range(n) for h in hops]
    return spark.createDataFrame(rows, "src long, dst long")


def test_hyperball_accuracy_on_ring(spark):
    # ring with +1/+2 chords: exact r-ball size is closed-form
    n = 200
    nodes = spark.createDataFrame([(v,) for v in range(n)], "node long")
    edges = _ring_edges(spark, n)
    # radius 2 out-ball = {v, v+1, v+2, v+3, v+4} -> exactly 5
    got = hyperball(nodes, edges, n_iter=2, p=8).collect()
    assert len(got) == n
    # p=8 linear-counting regime: a node whose 5 members collide into 4
    # buckets estimates 256*ln(256/252) = 4.03 — so per-node tolerance
    # covers up to two collisions, and the MEAN must be tight
    for r in got:
        assert abs(r["ball_estimate"] - 5.0) / 5.0 < 0.45, r
    mean = sum(r["ball_estimate"] for r in got) / n
    assert abs(mean - 5.0) / 5.0 < 0.05, mean


def test_hyperball_monotone_in_radius(spark):
    n = 64
    nodes = spark.createDataFrame([(v,) for v in range(n)], "node long")
    edges = _ring_edges(spark, n, hops=(1, 3, 7))
    e1 = {r["node"]: r["ball_estimate"] for r in hyperball(nodes, edges, 1).collect()}
    e2 = {r["node"]: r["ball_estimate"] for r in hyperball(nodes, edges, 2).collect()}
    # registers only grow with radius -> estimates never shrink
    assert all(e2[v] >= e1[v] for v in e1)


def test_hyperball_partitioning_determinism(spark):
    docs = spark.createDataFrame([(i,) for i in range(120)], "doc_id long")
    nodes = docs.select(F.col("doc_id").alias("node"))
    edges = synthetic_edges(docs)
    a = sorted(map(tuple, hyperball(nodes, edges, 2).collect()))
    b = sorted(
        map(
            tuple,
            hyperball(nodes.repartition(7), edges.repartition(5), 2).collect(),
        )
    )
    assert a == b


def test_skew_audit_hand_values(spark):
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "host string")
    out = {r["key"]: r for r in skew_audit(df, "host", top_k=10).collect()}
    assert set(out) == {"a", "b", "c"}
    a = out["a"]
    # sorted asc: c(1)r1 b(3)r2 a(6)r3 -> sum r*x = 25
    # gini = (2000*25 - 1000*4*10) div (3*10) = 333
    assert (a["n"], a["share_milli"], a["rank"]) == (6, 600, 1)
    assert a["n_keys"] == 3 and a["total"] == 10
    assert a["gini_milli"] == 333
    # salt: ceil(600 / 50) = 12
    assert a["salt_k"] == 12
    assert out["c"]["rank"] == 3


def test_skew_audit_uniform_is_unskewed(spark):
    rows = [(f"h{i}",) for i in range(20) for _ in range(5)]
    df = spark.createDataFrame(rows, "host string")
    out = skew_audit(df, "host", top_k=5).collect()
    assert len(out) == 5
    r = out[0]
    assert r["share_milli"] == 50  # 5/100
    assert r["gini_milli"] == 0  # perfectly even
    assert r["salt_k"] == 1  # already at target


def test_skew_audit_partitioning_invariance(spark):
    rows = [(f"h{i % 7}",) for i in range(300)]
    df = spark.createDataFrame(rows, "host string")
    a = sorted(map(tuple, skew_audit(df, "host").collect()))
    b = sorted(map(tuple, skew_audit(df.repartition(13), "host").collect()))
    assert a == b
