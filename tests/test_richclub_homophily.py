"""Rich club: hub clique vs star periphery; homophily: perfectly
assortative and perfectly mixed attribute layouts bracket the
expectation."""

from __future__ import annotations

from see_spark.operators.linkgraph import homophily_audit, rich_club


def test_rich_club_detects_hub_clique(spark):
    # hubs 0-3 form a clique AND each carries a star of leaves -> at
    # k=3 only hubs qualify and their density is 1.0
    hub_clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    stars = [(h, 10 + 5 * h + i) for h in range(4) for i in range(3)]
    e = spark.createDataFrame(hub_clique + stars, ["src", "dst"])
    got = {r["k"]: r for r in rich_club(e, k_levels=[0, 3]).collect()}
    assert got[3]["n_nodes"] == 4
    assert got[3]["n_edges"] == 6
    assert got[3]["phi_milli"] == 1000
    # at k=0 everyone qualifies: the sparse full graph scores far lower
    assert got[0]["n_nodes"] == 16
    assert got[0]["phi_milli"] < 200


def test_homophily_bounds(spark):
    # perfectly assortative: edges only within attribute groups
    intra = [(0, 1), (1, 2), (10, 11), (11, 12)]
    attrs = spark.createDataFrame(
        [(i, "x") for i in range(3)] + [(i, "y") for i in (10, 11, 12)],
        "node long, attr string",
    )
    e1 = spark.createDataFrame(intra, ["src", "dst"])
    r1 = homophily_audit(e1, attrs).collect()[0]
    assert r1["same_milli"] == 1000
    assert r1["expected_milli"] < 1000
    # perfectly disassortative: only cross-group edges
    inter = [(0, 10), (1, 11), (2, 12)]
    e2 = spark.createDataFrame(inter, ["src", "dst"])
    r2 = homophily_audit(e2, attrs).collect()[0]
    assert r2["same_milli"] == 0
    assert r2["expected_milli"] > 0


def test_homophily_exact_values(spark):
    # 3 edges: 2 same-x, 1 cross -> same_milli = 666
    edges = [(0, 1), (1, 2), (2, 10)]
    attrs = spark.createDataFrame(
        [(0, "x"), (1, "x"), (2, "x"), (10, "y")], "node long, attr string"
    )
    r = homophily_audit(
        spark.createDataFrame(edges, ["src", "dst"]), attrs
    ).collect()[0]
    assert (r["n_edges"], r["same"], r["same_milli"]) == (3, 2, 666)
    # endpoint freq: x appears 5 times, y once, t=6 -> exp = (25+1)*1000//36
    assert r["expected_milli"] == 26 * 1000 // 36
