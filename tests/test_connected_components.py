"""Connected components (large-star/small-star) vs a pure-Python
union-find ground truth, plus dedup_clusters end-to-end sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from see_spark.operators.dedup import connected_components, dedup_clusters


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _cc_spark(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = connected_components(df).collect()
    return {r["node"]: r["component"] for r in out}


GRAPHS = {
    # chain: worst case for label propagation, the shape star-contraction
    # is built for
    "chain": [(i, i + 1) for i in range(20)],
    # clique + separate pair + self-loop
    "clique_pair": [(a, b) for a in range(5) for b in range(a + 1, 5)]
    + [(10, 11), (12, 12)],
    # two components joined by one bridge, ids descending
    "bridge": [(9, 8), (8, 7), (3, 2), (2, 1), (7, 3)],
    # duplicate edges, both orientations
    "dupes": [(1, 2), (2, 1), (1, 2), (5, 6)],
    # star already
    "star": [(0, i) for i in range(1, 8)],
    # deterministic pseudo-random graph
    "pseudo": [((i * 7919) % 37, (i * 104729) % 37) for i in range(60)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_components_match_union_find(spark, name):
    edges = GRAPHS[name]
    got = _cc_spark(spark, edges)
    want = _union_find([(a, b) for a, b in edges if a != b])
    assert got == want


def test_components_exclude_pure_self_loop_nodes(spark):
    got = _cc_spark(spark, [(1, 1), (2, 3)])
    assert got == {2: 2, 3: 2}


def test_dedup_clusters_groups_injected_dups(spark):
    rows = [(i, f"alpha beta gamma delta epsilon zeta {i % 4}") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_clusters(docs, threshold=0.99).collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert len(by_doc) == 8
    # identical texts (i % 4 equal) must share a cluster rooted at min id
    for i in range(8):
        assert by_doc[i]["cluster_id"] == i % 4
        assert by_doc[i]["cluster_size"] == 2
        assert by_doc[i]["is_canonical"] == (1 if i < 4 else 0)
    # exactly one canonical per cluster
    canon = [r for r in out if r["is_canonical"] == 1]
    assert sorted(r["cluster_id"] for r in canon) == [0, 1, 2, 3]
