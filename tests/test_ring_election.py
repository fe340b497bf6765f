"""Consistent-hash fetcher assignment (operators/ring.py), quality
canonical election (dedup.py:elect_canonical), and IQR anomaly flags
(discovery.py:iqr_outlier_flags)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from see_spark.operators.dedup import elect_canonical, exact_dedup
from see_spark.operators.discovery import iqr_outlier_flags
from see_spark.operators.ring import assign_hosts, remap_stats, ring_points

HOSTS = [f"h{i}.test" for i in range(60)]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_assign(hosts, workers, vnodes):
    ring = sorted(
        (_h60(f"ring:{w}:{v}"), w) for w in workers for v in range(vnodes)
    )
    out = {}
    for h in hosts:
        p = _h60(f"chhost:{h}")
        succ = next((w for pt, w in ring if pt >= p), ring[0][1])
        out[h] = succ
    return out


def _assign(spark, workers, vnodes=16):
    hosts = spark.createDataFrame([(h,) for h in HOSTS], ["host"])
    ring = ring_points(spark, workers, vnodes)
    return {
        r["host"]: r["worker"]
        for r in assign_hosts(hosts, ring).collect()
    }


def test_ring_matches_python_replica(spark):
    workers = ["w0", "w1", "w2"]
    assert _assign(spark, workers) == _py_assign(HOSTS, workers, 16)


def test_ring_minimal_remap_on_worker_add(spark):
    a = _assign(spark, ["w0", "w1", "w2"])
    b = _assign(spark, ["w0", "w1", "w2", "w3"])
    moved = {h for h in HOSTS if a[h] != b[h]}
    # THE consistent-hashing property: every moved host moves TO the
    # new worker; nothing shuffles between surviving workers
    assert moved, "fixture should move at least one host"
    assert all(b[h] == "w3" for h in moved)


def test_remap_stats(spark):
    hosts = spark.createDataFrame([(h,) for h in HOSTS], ["host"])
    ra = ring_points(spark, ["w0", "w1", "w2"], 16)
    rb = ring_points(spark, ["w0", "w1", "w2", "w3"], 16)
    before = assign_hosts(hosts, ra)
    after = assign_hosts(hosts, rb)
    row = remap_stats(before, after).collect()[0]
    py_a = _py_assign(HOSTS, ["w0", "w1", "w2"], 16)
    py_b = _py_assign(HOSTS, ["w0", "w1", "w2", "w3"], 16)
    moved = sum(1 for h in HOSTS if py_a[h] != py_b[h])
    assert (row["n_hosts"], row["moved"]) == (len(HOSTS), moved)
    assert row["moved_milli"] == (1000 * moved) // len(HOSTS)


def test_ring_rejects_bad_vnodes(spark):
    with pytest.raises(ValueError):
        ring_points(spark, ["w0"], 0)


def test_elect_canonical_prefers_quality(spark):
    members = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (3, 30), (3, 31)],
        ["cluster_id", "doc_id"],
    )
    scores = spark.createDataFrame(
        [(10, 5), (11, 90), (12, 90), (20, 1), (30, 7), (31, 3)],
        ["doc_id", "q_milli"],
    )
    got = {
        r["doc_id"]: r["is_kept"]
        for r in elect_canonical(members, scores).collect()
    }
    # cluster 1: 11 and 12 tie at 90 -> lowest doc_id wins
    assert got == {10: 0, 11: 1, 12: 0, 20: 1, 30: 1, 31: 0}


def test_elect_canonical_composes_with_exact_dedup(spark):
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "unique text")],
        ["doc_id", "text"],
    )
    groups = exact_dedup(docs).select(
        F.col("text_hash").alias("cluster_id"), "doc_id"
    )
    scores = spark.createDataFrame([(1, 2), (2, 9), (3, 4)], ["doc_id", "q_milli"])
    kept = {
        r["doc_id"]
        for r in elect_canonical(groups, scores).collect()
        if r["is_kept"] == 1
    }
    assert kept == {2, 3}  # quality beats min-id inside the dup group


def test_iqr_outlier_flags(spark):
    # values 1..8 plus a spike: q1=2.5 (hmm n=9) — compute via replica
    vals = [("h%d" % i, v) for i, v in enumerate([10, 12, 11, 13, 12, 11, 10, 400, 12])]
    df = spark.createDataFrame(vals, ["host", "n"])
    rows = {r["host"]: r for r in iqr_outlier_flags(df, "n").collect()}
    import statistics

    xs = sorted(v for _, v in vals)
    # exact interpolated quartiles (numpy 'linear' / SQL percentile)
    def pct(q):
        pos = (len(xs) - 1) * q
        lo = int(pos)
        frac = pos - lo
        return xs[lo] + (xs[min(lo + 1, len(xs) - 1)] - xs[lo]) * frac

    q1, q3 = pct(0.25), pct(0.75)
    hi = q3 + 1.5 * (q3 - q1)
    assert rows["h7"]["is_high"] == 1
    assert all(
        rows[h]["is_high"] == (1 if v > hi else 0) for h, v in vals
    )
    assert all(rows[h]["is_low"] == 0 for h, _ in vals)
    assert rows["h0"]["q1"] == q1 and rows["h0"]["q3"] == q3
