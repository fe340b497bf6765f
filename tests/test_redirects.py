"""Redirect-chain resolution (operators/redirects.py): hand graphs —
long chain (forcing real pointer doubling), 3-cycle, self-loop, chain
feeding into a cycle — plus frontier-row extraction and partitioning
invariance."""

from __future__ import annotations

from see_spark.operators.redirects import redirect_edges, resolve_redirect_chains

# a -> b -> c -> ... 10-hop chain to T (terminal); x -> y -> z -> x cycle;
# s -> s self-loop; q -> y (chain INTO the cycle: q is a cycle member too,
# by the "still points at a source after doubling" rule? No: q reaches the
# cycle and never terminates -> classified cycle=1 by design)
CHAIN = [f"c{i}" for i in range(10)] + ["T"]
EDGES = (
    [(CHAIN[i], CHAIN[i + 1]) for i in range(10)]
    + [("x", "y"), ("y", "z"), ("z", "x")]
    + [("s", "s")]
    + [("q", "y")]
)


def _resolve(spark, max_doublings=6, parts=3):
    df = spark.createDataFrame(EDGES, ["url", "target"]).repartition(parts)
    return {
        r.url: (r.final_url, r.chain_len, r.is_cycle)
        for r in resolve_redirect_chains(df, max_doublings=max_doublings).collect()
    }


def test_long_chain_resolves_with_exact_hops(spark):
    got = _resolve(spark)
    for i in range(10):
        assert got[f"c{i}"] == ("T", 10 - i, 0), f"c{i}"


def test_cycles_flagged(spark):
    got = _resolve(spark)
    for u in ("x", "y", "z", "s"):
        assert got[u] == (None, 0, 1), u
    # a chain that FEEDS a cycle never terminates either
    assert got["q"] == (None, 0, 1)


def test_doubling_budget(spark):
    # 2^2 = 4 < 10 hops: the long chain's head exceeds the budget and
    # classifies as unresolved/cycle; the tail (within 4 hops of T) resolves
    got = _resolve(spark, max_doublings=2)
    assert got["c9"] == ("T", 1, 0)
    assert got["c6"] == ("T", 4, 0)
    assert got["c0"][2] == 1  # over budget -> quarantined


def test_partitioning_invariance(spark):
    assert _resolve(spark, parts=1) == _resolve(spark, parts=7)


def test_redirect_edges_from_frontier(spark):
    rows = [
        ("http://a.test/old", "redirect", "http://a.test/new"),
        ("http://a.test/new", "visited", None),
        ("http://a.test/gone", "error", "http_404"),
    ]
    f = spark.createDataFrame(rows, "url string, state string, detail string")
    edges = redirect_edges(f).collect()
    assert [(e.url, e.target) for e in edges] == [
        ("http://a.test/old", "http://a.test/new")
    ]
    out = resolve_redirect_chains(redirect_edges(f)).collect()
    assert (out[0].url, out[0].final_url, out[0].chain_len, out[0].is_cycle) == (
        "http://a.test/old", "http://a.test/new", 1, 0,
    )
