"""Boruvka MST vs a Kruskal reference under the same (w, a, b) edge
total order (which makes the forest unique even with tied weights),
disconnected forests, and partitioning invariance. Pytest-gated (an MST
has no tractable single-query SQL oracle; uniqueness under the pinned
total order is the correctness anchor, like knn_ivfpq's equality gate)."""

from __future__ import annotations

import random

from see_spark.operators.linkgraph import boruvka_mst


def _kruskal(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for w, a, b in sorted((w, a, b) for a, b, w in edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return sorted(out)


def _rand_graph(seed, n, m, wmax=1000):
    rng = random.Random(seed)
    seen, edges = set(), []
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a == b:
            continue
        a, b = min(a, b), max(a, b)
        if (a, b) in seen:
            continue
        seen.add((a, b))
        edges.append((a, b, rng.randrange(1, wmax)))
    return edges


def test_mst_matches_kruskal(spark):
    n, edges = 30, _rand_graph(3, 30, 80)
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    edf = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = sorted(map(tuple, boruvka_mst(nodes, edf).collect()))
    assert got == _kruskal(n, edges)


def test_mst_with_heavy_ties(spark):
    # every weight identical: the (w, a, b) total order still yields a
    # unique forest equal to Kruskal's under the same order
    n = 12
    edges = [(a, b, 7) for a in range(n) for b in range(a + 1, n) if (a + b) % 3]
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    edf = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = sorted(map(tuple, boruvka_mst(nodes, edf).collect()))
    assert got == _kruskal(n, edges)
    assert len(got) == n - 1


def test_mst_disconnected_forest(spark):
    # two components of 4 + an isolated node -> 6 edges total
    edges = [(0, 1, 5), (1, 2, 1), (2, 3, 2), (0, 3, 9),
             (4, 5, 1), (5, 6, 2), (6, 7, 3), (4, 7, 10)]
    nodes = spark.createDataFrame([(i,) for i in range(9)], ["node"])
    edf = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = sorted(map(tuple, boruvka_mst(nodes, edf).collect()))
    assert got == _kruskal(9, edges)
    assert len(got) == 6


def test_mst_partitioning_invariant(spark):
    n, edges = 25, _rand_graph(11, 25, 70)
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    edf = spark.createDataFrame(edges, ["src", "dst", "w"])
    a = sorted(map(tuple, boruvka_mst(nodes, edf).collect()))
    b = sorted(
        map(
            tuple,
            boruvka_mst(nodes.repartition(7), edf.repartition(5)).collect(),
        )
    )
    assert a == b
