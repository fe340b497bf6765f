"""Bellman-Ford vs a pure-Python relaxation (weighted graph with an
indirect-shorter-than-direct path), INF sentinel for unreachable, and
Naive Bayes: separable marker corpus learned, quantized scores match a
Python reference exactly."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from see_spark.operators.classifier import train_and_score_nb
from see_spark.operators.linkgraph import INF_DIST, bellman_ford

# weighted digraph: direct 0->3 costs 10, path 0->1->2->3 costs 3
WEDGES = [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 2)]
N = 6  # node 5 unreachable


def _bf_ref(edges, n, src, rounds):
    dist = {v: (0 if v == src else INF_DIST) for v in range(n)}
    for _ in range(rounds):
        nd = dict(dist)
        for s, d, w in edges:
            if dist[s] < INF_DIST:
                nd[d] = min(nd[d], dist[s] + w)
        dist = nd
    return dist


def test_bellman_ford_matches_reference(spark):
    nodes = spark.createDataFrame([(i,) for i in range(N)], ["node"])
    edges = spark.createDataFrame(WEDGES, ["src", "dst", "w"])
    got = {
        r["node"]: r["dist"]
        for r in bellman_ford(nodes, edges, source=0, n_iter=6).collect()
    }
    want = _bf_ref(WEDGES, N, 0, 6)
    assert got == want
    assert got[3] == 3  # indirect path beats direct edge
    assert got[5] == INF_DIST  # unreachable keeps the sentinel


def test_bellman_ford_partitioning_invariant(spark):
    nodes = spark.createDataFrame([(i,) for i in range(N)], ["node"])
    edges = spark.createDataFrame(WEDGES, ["src", "dst", "w"])
    a = sorted(map(tuple, bellman_ford(nodes, edges, 0, 6).collect()))
    b = sorted(
        map(
            tuple,
            bellman_ford(
                nodes.repartition(5), edges.repartition(3), 0, 6
            ).collect(),
        )
    )
    assert a == b


def _nb_ref(texts, d=64):
    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % d

    cb, tot, ny = {}, {0: 0, 1: 0}, {0: 0, 1: 0}
    for _, text, y in texts:
        ny[y] += 1
        for tok in text.split(" "):
            cb[(y, bucket(tok))] = cb.get((y, bucket(tok)), 0) + 1
            tot[y] += 1
    n = len(texts)

    def q(y, b):
        return round(
            math.log((cb.get((y, b), 0) + 1.0) / (tot[y] + float(d))) * 1e6
        )

    out = {}
    for i, text, y in texts:
        sc = {}
        for cls in (0, 1):
            s = round(math.log(ny[cls] / float(n)) * 1e6)
            counts = {}
            for tok in text.split(" "):
                counts[bucket(tok)] = counts.get(bucket(tok), 0) + 1
            for b, tc in counts.items():
                s += tc * q(cls, b)
            sc[cls] = s
        out[i] = (y, sc[0], sc[1], 1 if sc[1] > sc[0] else 0)
    return out


def test_naive_bayes_matches_reference_and_separates(spark):
    texts = [
        (i, ("alpha beta gamma" if i % 2 else "spam spam eggs") +
            (" marker" if i % 2 == 0 else ""), 1 if i % 2 == 0 else 0)
        for i in range(20)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string, label long")
    got = {
        r["doc_id"]: (r["y"], r["score_0"], r["score_1"], r["predicted"])
        for r in train_and_score_nb(df, n_buckets=64).collect()
    }
    assert got == _nb_ref(texts)
    # the separable corpus is classified perfectly
    assert all(v[0] == v[3] for v in got.values())
