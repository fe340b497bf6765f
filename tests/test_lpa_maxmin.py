"""Label-propagation communities vs a pure-Python replica, and max-min
fair (water-filling) budget allocation vs hand-computed values plus its
conservation/fairness invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from see_spark.operators.frontier import maxmin_fair_alloc
from see_spark.operators.linkgraph import label_propagation


def _lpa_ref(nodes, edges, n_iter):
    """Driver-side synchronous LPA, the exact rule the operator runs."""
    und = set()
    for s, d in edges:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    labels = {v: v for v in nodes}
    for _ in range(n_iter):
        counts = {}
        for s, d in und:
            counts.setdefault(s, {})
            lab = labels[d]
            counts[s][lab] = counts[s].get(lab, 0) + 1
        new = {}
        for v in nodes:
            if v in counts:
                best = min(counts[v].items(), key=lambda kv: (-kv[1], kv[0]))
                new[v] = best[0]
            else:
                new[v] = labels[v]
        labels = new
    return labels


def test_lpa_two_triangles(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)],
        "src long, dst long",
    )
    nodes = spark.createDataFrame([(i,) for i in range(6)], "node long")
    got = {
        r["node"]: (r["label"], r["community_size"])
        for r in label_propagation(nodes, edges, n_iter=4).collect()
    }
    # the two triangles resolve to two communities of size 3
    assert got[0][0] == got[1][0] == got[2][0]
    assert got[3][0] == got[4][0] == got[5][0]
    assert got[0][0] != got[3][0]
    assert all(sz == 3 for _, sz in got.values())


def test_lpa_matches_python_replica(spark):
    # deterministic pseudo-random graph: 24 nodes, arithmetic edges
    nodes = list(range(24))
    edges = [(v, (v * 7 + 3) % 24) for v in nodes] + [
        (v, (v * 11 + 5) % 24) for v in nodes
    ]
    edges = [(s, d) for s, d in edges if s != d]
    for n_iter in (1, 3):
        ref = _lpa_ref(nodes, edges, n_iter)
        got = {
            r["node"]: r["label"]
            for r in label_propagation(
                spark.createDataFrame([(v,) for v in nodes], "node long"),
                spark.createDataFrame(edges, "src long, dst long"),
                n_iter=n_iter,
            ).collect()
        }
        assert got == ref, f"n_iter={n_iter}"


def test_lpa_isolated_and_partitioning_invariance(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(4)], "node long")
    base = label_propagation(nodes, edges, n_iter=2).collect()
    assert {r["node"]: r["label"] for r in base}[3] == 3  # isolated keeps own
    re = label_propagation(
        nodes.repartition(7), edges.repartition(5), n_iter=2
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, re))


DEMANDS = [("a", 2), ("b", 5), ("c", 9), ("d", 0)]


def _alloc(spark, demands, budget):
    df = spark.createDataFrame(demands, "host string, demand long")
    return {
        r["host"]: (r["alloc"], r["satisfied"], r["water_level"])
        for r in maxmin_fair_alloc(df, budget).collect()
    }


def test_maxmin_hand_cases(spark):
    # B=10: a full (2), level (10-2)//2 = 4, no spare
    assert _alloc(spark, DEMANDS, 10) == {
        "a": (2, True, 4),
        "b": (4, False, 4),
        "c": (4, False, 4),
        "d": (0, True, None),
    }
    # B=11: spare 1 goes to the first unsatisfied host in host order (b),
    # which completes its demand exactly -> satisfied
    assert _alloc(spark, DEMANDS, 11) == {
        "a": (2, True, 4),
        "b": (5, True, 4),
        "c": (4, False, 4),
        "d": (0, True, None),
    }
    # B >= total demand: everyone full, level = max demand
    assert _alloc(spark, DEMANDS, 100) == {
        "a": (2, True, 9),
        "b": (5, True, 9),
        "c": (9, True, 9),
        "d": (0, True, None),
    }
    # B=0: nothing allocated
    assert _alloc(spark, DEMANDS, 0) == {
        "a": (0, False, 0),
        "b": (0, False, 0),
        "c": (0, False, 0),
        "d": (0, True, None),
    }


@pytest.mark.parametrize("budget", [0, 1, 7, 23, 57, 100, 10_000])
def test_maxmin_invariants(spark, budget):
    demands = [(f"h{i:02d}", (i * 13 + 3) % 37) for i in range(20)]
    df = spark.createDataFrame(demands, "host string, demand long")
    rows = maxmin_fair_alloc(df, budget).collect()
    total_demand = sum(d for _, d in demands)
    # conservation: exactly min(B, total demand) slots are handed out
    assert sum(r["alloc"] for r in rows) == min(budget, total_demand)
    by_host = {r["host"]: r for r in rows}
    for host, demand in demands:
        r = by_host[host]
        assert 0 <= r["alloc"] <= demand
        assert r["satisfied"] == (r["alloc"] == demand)
    # max-min fairness: every unsatisfied host's allocation is within 1
    # of every other's (the water level), and no satisfied host with a
    # LARGER demand exists below an unsatisfied one's allocation
    unsat = [r["alloc"] for r in rows if not r["satisfied"]]
    if unsat:
        assert max(unsat) - min(unsat) <= 1


def test_maxmin_partitioning_invariance(spark):
    demands = [(f"h{i:02d}", (i * 29 + 1) % 53) for i in range(40)]
    df = spark.createDataFrame(demands, "host string, demand long")
    a = sorted(map(tuple, maxmin_fair_alloc(df, 333).collect()))
    b = sorted(
        map(tuple, maxmin_fair_alloc(df.repartition(13), 333).collect())
    )
    assert a == b
