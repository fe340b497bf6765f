"""Calibration bins vs hand-computed reliability stats (perfect and
miscalibrated classifiers), and signed feature hashing vs a pure-Python
hashing-trick reference (collision cancellation, unbiased dot products)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from see_spark.operators.classifier import featurize_hashing
from see_spark.operators.evaluation import calibration_bins

SCALE = 1 << 20


def test_calibration_perfectly_calibrated_bins(spark):
    # 100 docs with p uniformly placed at bin centers, labels matching
    # the predicted rate exactly in each bin -> gap_fp small, obs==pred
    rows = []
    i = 0
    for b in range(10):
        p = int((b + 0.5) * SCALE / 10)
        npos = b  # of 10 docs in bin b, b are positive -> obs = b/10
        for j in range(10):
            rows.append((i, p, 1 if j < npos else 0))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, p_fp long, y long")
    got = {r["bin"]: r for r in calibration_bins(df).collect()}
    assert set(got) == set(range(10))
    for b in range(10):
        r = got[b]
        assert r["n"] == 10 and r["n_pos"] == b
        assert r["obs_milli"] == b * 100
        # p at bin center: pred_milli = floor(1000*(b+0.5)/10) approx
        assert abs(r["pred_milli"] - (b * 100 + 50)) <= 1
        # gap = |n_pos*scale - 10*p| = |b - (b+.5)|*scale/... small
        assert r["gap_fp"] == abs(b * SCALE - 10 * int((b + 0.5) * SCALE / 10))


def test_calibration_overconfident_classifier_has_gap(spark):
    # classifier says p≈1 for everything, but only half are positive
    rows = [(i, SCALE - 1, i % 2) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, p_fp long, y long")
    got = calibration_bins(df).collect()
    assert len(got) == 1 and got[0]["bin"] == 9
    r = got[0]
    assert r["obs_milli"] == 500 and r["pred_milli"] == 999
    # half the mass is miscalibrated: gap ~ 10*SCALE
    assert r["gap_fp"] == abs(10 * SCALE - 20 * (SCALE - 1))


def _ref_hash(texts, n_buckets=64):
    out = {}
    for i, t in texts:
        for tok in t.split(" "):
            b = int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % n_buckets
            s = (
                1
                if int(hashlib.md5(("s:" + tok).encode()).hexdigest()[0], 16)
                % 2
                == 0
                else -1
            )
            out[(i, b)] = out.get((i, b), 0) + s
    return {k: v for k, v in out.items() if v != 0}


def test_feature_hashing_matches_reference(spark):
    texts = [
        (1, "the cat sat on the mat"),
        (2, "a completely different sentence with words"),
        (3, "the the the"),  # repeated token -> |value| = 3 in one bucket
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_id"], r["bucket"]): r["value"]
        for r in featurize_hashing(df, n_buckets=64).collect()
    }
    assert got == _ref_hash(texts)
    # repeated-token doc: one bucket at ±3
    d3 = [v for (d, _), v in got.items() if d == 3]
    assert sorted(map(abs, d3)) == [3]


def test_feature_hashing_cancellation_dropped(spark):
    # find two tokens with the same bucket but opposite signs, verify
    # their combination yields NO row (exact cancellation -> sparse drop)
    import hashlib as h

    def bucket(t):
        return int(h.md5(t.encode()).hexdigest()[:4], 16) % 64

    def sign(t):
        return 1 if int(h.md5(("s:" + t).encode()).hexdigest()[0], 16) % 2 == 0 else -1

    cand = {}
    pair = None
    for i in range(10000):
        t = f"tok{i}"
        key = bucket(t)
        for u in cand.get(key, []):
            if sign(u) != sign(t):
                pair = (u, t)
                break
        if pair:
            break
        cand.setdefault(key, []).append(t)
    assert pair, "no cancelling pair found in 10k tokens"
    df = spark.createDataFrame(
        [(1, f"{pair[0]} {pair[1]}")], "doc_id long, text string"
    )
    assert featurize_hashing(df, n_buckets=64).count() == 0
