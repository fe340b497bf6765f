"""Topic-sensitive PageRank vs a pure-Python reference: per-topic mass
conservation, seed bias (topic vectors differ and favor their seed
neighborhoods), and partitioning invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from see_spark.operators.linkgraph import topic_pagerank

EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3), (0, 4)]
N = 5
# topic 0 seeds {0, 1}; topic 1 seeds {3, 4}
SEEDS = {0: {0, 1}, 1: {3, 4}}


def _ref(edges, n, seeds, n_iter=4, d=0.85):
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    ranks = {}
    for t, sset in seeds.items():
        r = {
            v: (1.0 / len(sset) if v in sset else 0.0) for v in range(n)
        }
        for _ in range(n_iter):
            dang = sum(r[v] for v in range(n) if out_deg.get(v, 0) == 0)
            contrib = {v: 0.0 for v in range(n)}
            for s, dst in edges:
                contrib[dst] += r[s] / out_deg[s]
            r = {
                v: d
                * (
                    contrib[v]
                    + (dang / len(sset) if v in sset else 0.0)
                )
                + ((1 - d) / len(sset) if v in sset else 0.0)
                for v in range(n)
            }
        ranks[t] = r
    return ranks


def _nt(spark):
    rows = []
    for t, sset in SEEDS.items():
        for v in range(N):
            rows.append((v, t, 1 if v in sset else 0))
    return spark.createDataFrame(rows, "node long, topic long, is_seed long")


def test_tspr_matches_reference(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {
        (r["node"], r["topic"]): r["rank"]
        for r in topic_pagerank(_nt(spark), edges, n_iter=4).collect()
    }
    want = _ref(EDGES, N, SEEDS)
    for t in SEEDS:
        for v in range(N):
            assert got[(v, t)] == pytest.approx(
                round(want[t][v], 9), abs=1e-9
            ), (v, t)


def test_tspr_mass_conserved_per_topic(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    sums = (
        topic_pagerank(_nt(spark), edges, n_iter=3)
        .groupBy("topic")
        .agg(F.sum("rank").alias("s"))
        .collect()
    )
    for r in sums:
        assert r["s"] == pytest.approx(1.0, abs=1e-6)


def test_tspr_topics_are_biased_and_distinct(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {
        (r["node"], r["topic"]): r["rank"]
        for r in topic_pagerank(_nt(spark), edges, n_iter=4).collect()
    }
    # node 1 (topic-0 seed neighborhood) ranks higher under topic 0;
    # node 3 higher under topic 1
    assert got[(1, 0)] > got[(1, 1)]
    assert got[(3, 1)] > got[(3, 0)]


def test_tspr_partitioning_invariant(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    a = sorted(map(tuple, topic_pagerank(_nt(spark), edges).collect()))
    b = sorted(
        map(
            tuple,
            topic_pagerank(
                _nt(spark).repartition(7), edges.repartition(5)
            ).collect(),
        )
    )
    assert a == b
