"""Katz centrality vs a pure-Python walk-count reference, and
link-prediction scores vs brute-force neighborhood overlap — plus
cross-partitioning determinism for both (the rounded outputs must be
byte-identical whatever the input partitioning)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from see_spark.operators.linkgraph import katz_centrality, link_prediction

# small digraph: hub 0, chain 1->2->3, cycle 3->0, an isolate-ish 4
EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (3, 0), (4, 0)]
N = 5


def _katz_ref(edges, n, n_iter, beta):
    w = {v: 1 for v in range(n)}
    score = {v: 0.0 for v in range(n)}
    for t in range(1, n_iter + 1):
        nxt = {v: 0 for v in range(n)}
        for s, d in edges:
            nxt[d] += w[s]
        w = nxt
        for v in range(n):
            score[v] = score[v] + beta**t * w[v]
    return w, score


def test_katz_matches_walk_counts(spark):
    nodes = spark.createDataFrame([(i,) for i in range(N)], ["node"])
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {
        r["node"]: (r["walks_last"], r["score"])
        for r in katz_centrality(nodes, edges, n_iter=4, beta=0.05).collect()
    }
    w_ref, s_ref = _katz_ref(EDGES, N, 4, 0.05)
    assert set(got) == set(w_ref)
    for v in range(N):
        assert got[v][0] == w_ref[v]  # exact integer walk counts
        assert got[v][1] == pytest.approx(round(s_ref[v], 9), abs=1e-9)


def test_katz_zero_for_unreachable(spark):
    # node 1 has an in-edge only from 0; if 0 had no in-edges its own
    # walk counts still start at 1 (length-0 walk), so 1 accrues score.
    # A node with NO in-edges must end at walks=0, score=0.
    nodes = spark.createDataFrame([(i,) for i in range(3)], ["node"])
    edges = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    got = {
        r["node"]: (r["walks_last"], r["score"])
        for r in katz_centrality(nodes, edges, n_iter=3, beta=0.1).collect()
    }
    assert got[0] == (0, 0.0)


def test_katz_partitioning_invariant(spark):
    nodes = spark.createDataFrame([(i,) for i in range(N)], ["node"])
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    a = sorted(
        map(tuple, katz_centrality(nodes, edges, n_iter=4).collect())
    )
    b = sorted(
        map(
            tuple,
            katz_centrality(
                nodes.repartition(7), edges.repartition(5), n_iter=4
            ).collect(),
        )
    )
    assert a == b


def _linkpred_ref(edges, min_common=2):
    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    out = {}
    nodes = sorted(nbrs)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            common = nbrs[a] & nbrs[b]
            if len(common) < min_common or (a, b) in und:
                continue
            aa = sum(1.0 / math.log(len(nbrs[w])) for w in common)
            jac = len(common) * 1000 // (len(nbrs[a] | nbrs[b]))
            out[(a, b)] = (len(common), jac, round(aa, 9))
    return out


def test_link_prediction_matches_bruteforce(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {
        (r["a"], r["b"]): (r["common"], r["jaccard_milli"], r["adamic_adar"])
        for r in link_prediction(edges, min_common=2).collect()
    }
    want = _linkpred_ref(EDGES, min_common=2)
    assert got == want


def test_link_prediction_excludes_existing_edges(spark):
    # triangle + pendant: (0,1),(1,2),(0,2) all linked; only pairs with
    # >=min_common shared neighbors AND no edge survive.
    tri = [(0, 1), (1, 2), (0, 2), (0, 3), (1, 3)]
    edges = spark.createDataFrame(tri, ["src", "dst"])
    rows = link_prediction(edges, min_common=2).collect()
    got_pairs = {(r["a"], r["b"]) for r in rows}
    assert (2, 3) in got_pairs  # share {0, 1}, not linked
    assert (0, 1) not in got_pairs  # linked — excluded


def test_link_prediction_partitioning_invariant(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    a = sorted(map(tuple, link_prediction(edges).collect()))
    b = sorted(map(tuple, link_prediction(edges.repartition(9)).collect()))
    assert a == b
