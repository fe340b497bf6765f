"""Multi-source BFS vs per-source Python BFS, and the landmark
estimate: upper bound always (stretch >= 1000), exact when a landmark
lies on a shortest path, INF propagation for unreachable pairs."""

from __future__ import annotations

from collections import deque

from see_spark.operators.linkgraph import (
    INF_DIST,
    landmark_distance_audit,
    multi_source_bfs,
)

EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 4), (6, 7)]
N = 8  # 6-7 is a separate component


def _bfs(adj, s, n):
    dist = {v: INF_DIST for v in range(n)}
    dist[s] = 0
    q = deque([s])
    while q:
        u = q.popleft()
        for w in adj.get(u, []):
            if dist[w] == INF_DIST:
                dist[w] = dist[u] + 1
                q.append(w)
    return dist


def _adj(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    return adj


def test_multi_source_matches_python_bfs(spark):
    nodes = spark.createDataFrame([(i,) for i in range(N)], ["node"])
    e = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {}
    for r in multi_source_bfs(nodes, e, [0, 3, 6], n_iter=8).collect():
        got[(r["lm"], r["node"])] = r["dist"]
    adj = _adj(EDGES)
    for s in (0, 3, 6):
        ref = _bfs(adj, s, N)
        for v in range(N):
            assert got[(s, v)] == ref[v], (s, v)


def test_landmark_estimate_bounds(spark):
    nodes = spark.createDataFrame([(i,) for i in range(N)], ["node"])
    e = spark.createDataFrame(EDGES, ["src", "dst"])
    rows = landmark_distance_audit(
        nodes, e, landmarks=[5], pairs=[(1, 4), (2, 4), (1, 7)], n_iter=8
    ).collect()
    got = {(r["u"], r["v"]): r for r in rows}
    # exact d(1,4): 1-0-5-4 = 3; est via lm 5: d(1,5)+d(5,4) = 2+1 = 3
    assert got[(1, 4)]["exact"] == 3 and got[(1, 4)]["est"] == 3
    assert got[(1, 4)]["stretch_milli"] == 1000
    # exact d(2,4) = 2 (2-3-4); est via 5: d(2,5)+d(5,4) = 3+1 = 4
    assert got[(2, 4)]["exact"] == 2 and got[(2, 4)]["est"] == 4
    assert got[(2, 4)]["stretch_milli"] == 2000
    # disconnected pair: both exact and est are INF
    assert got[(1, 7)]["exact"] == INF_DIST
    assert got[(1, 7)]["est"] == INF_DIST
    # upper-bound invariant
    for r in rows:
        assert r["est"] >= r["exact"]
