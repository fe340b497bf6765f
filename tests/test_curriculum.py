"""Quality-curriculum training order (packing.py:curriculum_order):
threshold bucketing, round-robin interleave, determinism across
partitionings, and the single-bucket degenerate case."""

from __future__ import annotations

import hashlib

import pytest

from see_spark.operators.packing import curriculum_order


def _h(seed, d):
    return int(hashlib.md5(f"cur:{seed}:{d}".encode()).hexdigest()[:15], 16)


def _rows(spark, scores, **kw):
    df = spark.createDataFrame(list(scores.items()), ["doc_id", "q_milli"])
    return {r["doc_id"]: r for r in curriculum_order(df, **kw).collect()}


def test_buckets_monotone_in_score(spark):
    # 20 docs, scores 0..19, 4 buckets: bucket is non-increasing in score
    scores = {d: d for d in range(20)}
    got = _rows(spark, scores, n_buckets=4)
    for a in range(20):
        for b in range(20):
            if scores[a] > scores[b]:
                assert got[a]["bucket"] <= got[b]["bucket"]
    assert {got[d]["bucket"] for d in scores} == {0, 1, 2, 3}
    # dense positions 0..n-1
    assert sorted(r["pos"] for r in got.values()) == list(range(20))


def test_interleave_cycles_buckets(spark):
    # 4 buckets x 5 docs: positions 0..3 must cover buckets 0,1,2,3 in
    # order (round-robin), positions 4..7 again, etc.
    scores = {d: d for d in range(20)}
    got = _rows(spark, scores, n_buckets=4)
    by_pos = sorted(got.values(), key=lambda r: r["pos"])
    for i, r in enumerate(by_pos):
        assert r["bucket"] == i % 4, (i, r)


def test_within_bucket_order_is_salted_hash(spark):
    scores = {d: 0 for d in range(12)}  # all tie -> single bucket region
    got = _rows(spark, scores, n_buckets=1, seed="sX")
    by_pos = [r["doc_id"] for r in sorted(got.values(), key=lambda r: r["pos"])]
    expect = sorted(range(12), key=lambda d: (_h("sX", d), d))
    assert by_pos == expect


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(
        [(d, (d * 7) % 23) for d in range(50)], ["doc_id", "q_milli"]
    )
    a = sorted(
        (r["doc_id"], r["bucket"], r["pos"])
        for r in curriculum_order(df, n_buckets=5).collect()
    )
    b = sorted(
        (r["doc_id"], r["bucket"], r["pos"])
        for r in curriculum_order(df.repartition(11), n_buckets=5).collect()
    )
    assert a == b


def test_rejects_bad_buckets(spark):
    df = spark.createDataFrame([(1, 1)], ["doc_id", "q_milli"])
    with pytest.raises(ValueError):
        curriculum_order(df, n_buckets=0)
