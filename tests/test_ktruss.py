"""k-truss: clique survives with correct support, tendrils and bridges
peel away, cascade peeling (edge removal drops another edge below
threshold), fixpoint within default rounds, partitioning invariance."""

from __future__ import annotations

from see_spark.operators.linkgraph import ktruss


def _e(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_clique_survives_chain_peels(spark):
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chain = [(4, 5), (5, 6), (6, 7)]
    got = sorted(map(tuple, ktruss(_e(spark, k5 + chain), k=4).collect()))
    assert [(a, b) for a, b, _ in got] == k5
    assert all(s == 3 for _, _, s in got)  # K5: every edge in 3 triangles


def test_cascade_peeling(spark):
    # two triangles sharing edge (0,1), plus a triangle hanging off via
    # (2,3): 4-truss (support>=2) keeps only edges in >=2 triangles —
    # after the hanging triangle peels, nothing else qualifies except
    # the shared-edge pair structure
    edges = [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3), (3, 4), (2, 4)]
    got = sorted(map(tuple, ktruss(_e(spark, edges), k=4).collect()))
    # only (0,1) sits in 2 triangles initially; once others drop below
    # threshold everything cascades away
    assert got == []


def test_two_shared_triangle_diamond_survives_k4(spark):
    # K4: every edge in 2 triangles -> survives k=4 exactly
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = sorted(map(tuple, ktruss(_e(spark, k4), k=4).collect()))
    assert [(a, b) for a, b, _ in got] == k4
    assert all(s == 2 for _, _, s in got)


def test_partitioning_invariant(spark):
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    extra = [(4, 9), (9, 8), (8, 4), (0, 7)]
    df = _e(spark, k5 + extra)
    a = sorted(map(tuple, ktruss(df, k=3).collect()))
    b = sorted(map(tuple, ktruss(df.repartition(7), k=3).collect()))
    assert a == b
