"""Quantized logistic-regression quality classifier
(operators/classifier.py): pure-Python bit-replica, learnability on a
separable corpus, partitioning invariance, and fixed-point sigmoid
edge cases."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from see_spark.operators.classifier import (
    FP,
    score_docs,
    train_and_score,
    train_logreg_quantized,
)


def _bucket_py(tok: str, d: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % d


def _p_fp_py(z: int) -> int:
    s = 1 if z > 0 else -1 if z < 0 else 0
    return FP // 2 + s * ((abs(z) * FP) // (2 * (FP + abs(z))))


def _train_py(docs, d, iters, lr_num, lr_den):
    """(doc_id, text, y) rows -> final weight vector, mirroring the
    int64 arithmetic exactly."""
    feats = []
    for _, text, y in docs:
        x = {_bucket_py(t, d) for t in text.split(" ")}
        x.add(d)
        feats.append((x, y))
    w = [0] * (d + 1)
    n = len(feats)
    for _ in range(iters):
        g = [0] * (d + 1)
        for x, y in feats:
            e = _p_fp_py(sum(w[j] for j in x)) - y * FP
            for j in x:
                g[j] += e
        den = lr_den * n
        for j in range(d + 1):
            gj = g[j]
            step = (lr_num * abs(gj)) // den
            w[j] -= step if gj > 0 else -step if gj < 0 else 0
    return w


CORPUS = [
    (i, ("good clean prose with signal alpha beta" if i % 2 == 0
         else "spam junk noise words gamma delta"), 1 if i % 2 == 0 else 0)
    for i in range(40)
]


def test_weights_match_python_replica(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text", "label"])
    w_spark = train_logreg_quantized(df, n_buckets=16, iters=5, lr_num=1, lr_den=2)
    w_py = _train_py(CORPUS, 16, 5, 1, 2)
    assert w_spark == w_py


def test_learns_separable_corpus(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text", "label"])
    out = train_and_score(df, n_buckets=16, iters=5).collect()
    acc = sum(1 for r in out if r["predicted"] == r["y"]) / len(out)
    assert acc >= 0.95


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text", "label"])
    a = sorted(
        tuple(r) for r in train_and_score(df, n_buckets=16, iters=3).collect()
    )
    b = sorted(
        tuple(r)
        for r in train_and_score(
            df.repartition(7), n_buckets=16, iters=3
        ).collect()
    )
    assert a == b


def test_p_fp_edges(spark):
    """z=0 -> exactly FP/2; saturation stays inside (0, FP); sign
    symmetry p(z) + p(-z) == FP for the rational sigmoid."""
    rows = [(i, z) for i, z in enumerate([0, 1, -1, FP, -FP, 50 * FP, -50 * FP])]
    df = spark.createDataFrame(rows, ["doc_id", "z_int"])
    from see_spark.operators.classifier import P_FP_SQL

    got = {r["z_int"]: r["p"] for r in df.withColumn("p", F.expr(P_FP_SQL)).collect()}
    assert got[0] == FP // 2
    for z, p in got.items():
        assert 0 < p < FP
        assert p == _p_fp_py(z)
        assert got[z] + got[-z] == FP


def test_score_docs_threshold_tie_keeps(spark):
    """p_fp == threshold must predict 1 (>=, matching the oracle)."""
    df = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
    out = score_docs(df, [0] * 17, n_buckets=16).collect()[0]
    assert out["p_fp"] == FP // 2 and out["predicted"] == 1
