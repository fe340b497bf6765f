"""Hash-driven walks vs a pure-Python replay: step-exact trajectories,
absorbing dead ends, and parallelism invariance (the property that
justifies hashing over RNG state)."""

from __future__ import annotations

import hashlib

from see_spark.operators.linkgraph import pseudo_random_walks

EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (4, 0)]  # 3 is a dead end


def _ref(edges, seeds, n_steps):
    adj = {}
    for s, d in sorted(set(edges)):
        adj.setdefault(s, []).append(d)

    def h(wk, t):
        return int(
            hashlib.md5(f"walk:{wk}:{t}".encode()).hexdigest()[:15], 16
        )

    out = []
    for wk in seeds:
        cur = wk
        out.append((wk, 0, cur))
        for t in range(1, n_steps + 1):
            if cur in adj:
                cur = adj[cur][h(wk, t) % len(adj[cur])]
            out.append((wk, t, cur))
    return sorted(out)


def test_walks_match_reference(spark):
    e = spark.createDataFrame(EDGES, ["src", "dst"])
    seeds = spark.createDataFrame([(0,), (4,), (3,)], ["walker"])
    got = sorted(
        (r["walker"], r["step"], r["node"])
        for r in pseudo_random_walks(e, seeds, n_steps=5).collect()
    )
    assert got == _ref(EDGES, [0, 4, 3], 5)


def test_dead_end_absorbs(spark):
    e = spark.createDataFrame(EDGES, ["src", "dst"])
    seeds = spark.createDataFrame([(3,)], ["walker"])
    got = {
        r["step"]: r["node"]
        for r in pseudo_random_walks(e, seeds, n_steps=4).collect()
    }
    assert all(got[t] == 3 for t in range(5))


def test_parallelism_invariant(spark):
    e = spark.createDataFrame(EDGES, ["src", "dst"])
    seeds = spark.createDataFrame([(0,), (2,), (4,)], ["walker"])
    a = sorted(map(tuple, pseudo_random_walks(e, seeds, 6).collect()))
    b = sorted(
        map(
            tuple,
            pseudo_random_walks(
                e.repartition(7), seeds.repartition(3), 6
            ).collect(),
        )
    )
    assert a == b
