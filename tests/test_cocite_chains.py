"""Co-citation / bibliographic coupling vs hand counts (incl. the hub
cap), host-graph condensation, and next-query chain mining."""

from __future__ import annotations

from pyspark.sql import functions as F

from see_spark.operators.lexicon import query_chains
from see_spark.operators.linkgraph import (
    cocitation_pairs,
    coupling_pairs,
    host_condense,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def test_cocitation_hand_counts(spark):
    # s10 -> {1,2,3}; s11 -> {1,2}; s12 -> {1}
    e = _edges(
        spark,
        [(10, 1), (10, 2), (10, 3), (11, 1), (11, 2), (12, 1)],
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["cocite"]
        for r in cocitation_pairs(e).collect()
    }
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}


def test_cocitation_hub_cap(spark):
    # a directory page linking 5 targets is dropped at cap 4: only the
    # small source's pairs survive
    rows = [(99, t) for t in range(5)] + [(1, 0), (1, 2)]
    got = cocitation_pairs(_edges(spark, rows), max_out_deg=4).collect()
    assert {(r["doc_a"], r["doc_b"]): r["cocite"] for r in got} == {(0, 2): 1}


def test_coupling_hand_counts(spark):
    # 1 -> {7,8}; 2 -> {7,8}; 3 -> {7}
    e = _edges(spark, [(1, 7), (1, 8), (2, 7), (2, 8), (3, 7)])
    got = {
        (r["doc_a"], r["doc_b"]): r["coupling"]
        for r in coupling_pairs(e).collect()
    }
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
    # in-degree cap drops the 3-cited target
    capped = {
        (r["doc_a"], r["doc_b"]): r["coupling"]
        for r in coupling_pairs(e, max_in_deg=2).collect()
    }
    assert capped == {(1, 2): 1}  # only dst 8 survives


def test_host_condense(spark):
    # hosts = parity; pages 0,2 even-host; 1,3 odd-host
    e = _edges(spark, [(0, 1), (2, 1), (2, 3), (0, 2), (0, 1)])
    host = lambda c: (F.col(c) % 2).cast("string")
    rows = {
        (r["src_host"], r["dst_host"]): r
        for r in host_condense(e, host("src"), host("dst")).collect()
    }
    even_odd = rows[("0", "1")]
    assert even_odd["n_links"] == 4  # 0->1 x2, 2->1, 2->3
    assert even_odd["n_src_pages"] == 2 and even_odd["n_dst_pages"] == 2
    assert even_odd["self_loop"] is False
    even_even = rows[("0", "0")]
    assert even_even["n_links"] == 1 and even_even["self_loop"] is True


def test_query_chains(spark):
    rows = [
        # user 1, one session: a -> b -> b -> c (b->b self-pair dropped)
        (1, 100, "a"),
        (1, 200, "b"),
        (1, 300, "b"),
        (1, 400, "c"),
        # session break (gap > 1800): c -/-> d
        (1, 3000, "d"),
        # user 2 reinforces a -> b
        (2, 50, "a"),
        (2, 60, "b"),
        # and contributes a -> z once, to exercise rank order
        (3, 10, "a"),
        (3, 20, "z"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, query string")
    got = {
        (r["query"], r["next_query"]): (r["n_obs"], r["rank"])
        for r in query_chains(df).collect()
    }
    assert got[("a", "b")] == (2, 1)
    assert got[("a", "z")] == (1, 2)
    assert got[("b", "c")] == (1, 1)
    assert ("c", "d") not in got  # session gap
    assert ("b", "b") not in got  # self-reformulation dropped


def test_query_chains_topn_cut(spark):
    rows = []
    # query 'q' followed by 5 distinct next-queries, counts 5..1
    t = 0
    for i, cnt in enumerate([5, 4, 3, 2, 1]):
        for u in range(cnt):
            rows += [(100 + u * 10 + i, t, "q"), (100 + u * 10 + i, t + 1, f"n{i}")]
        t += 10
    df = spark.createDataFrame(rows, "user_id long, ts long, query string")
    got = query_chains(df, top_n=3).where(F.col("query") == "q").collect()
    assert sorted((r["rank"], r["next_query"]) for r in got) == [
        (1, "n0"),
        (2, "n1"),
        (3, "n2"),
    ]


def test_nepotism_audit(spark):
    from see_spark.operators.pld import nepotism_audit

    # one org with two subdomains exchanging links + one external link;
    # an independent org receiving real endorsement
    he = spark.createDataFrame(
        [
            ("a.corp.com", "b.corp.com", 6),   # nepotistic
            ("a.corp.com", "a.corp.com", 9),   # intra (navigation)
            ("a.corp.com", "other.org", 2),    # external
            ("b.corp.com", "a.corp.com", 4),   # nepotistic
            ("other.org", "a.corp.com", 1),    # external from other pld
        ],
        "src_host string, dst_host string, n_links long",
    )
    got = {r["pld"]: r for r in nepotism_audit(he).collect()}
    corp = got["corp.com"]
    assert corp["n_hosts"] == 2
    assert (corp["intra_links"], corp["nepotistic_links"]) == (9, 10)
    assert corp["external_links"] == 2
    assert corp["nepotism_milli"] == (1000 * 10) // 12
    assert corp["flagged"] is True
    other = got["other.org"]
    assert other["nepotistic_links"] == 0 and other["flagged"] is False
