"""OPIC cash-distribution laws and ReDDE shard-selection invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from see_spark.operators.linkgraph import opic
from see_spark.operators.sharding import redde_shard_ranks


def _star(spark):
    """1,2,3 -> 0; 0 dangling."""
    nodes = spark.createDataFrame([(i,) for i in range(4)], ["node"])
    edges = spark.createDataFrame([(1, 0), (2, 0), (3, 0)], ["src", "dst"])
    return nodes, edges


def test_opic_star_hand_computed(spark):
    nodes, edges = _star(spark)
    # grain=1000. Iter 1: hist=1000 each; pot=1000 (node0 dangling);
    # node0 <- 3*1000; vshare=250 -> cash0=3250, cash1..3=250.
    one = {r.node: r for r in opic(nodes, edges, n_iter=1, grain=1000).collect()}
    assert all(one[i].hist_micro == 1000 for i in range(4))
    assert one[0].cash_micro == 3250
    assert all(one[i].cash_micro == 250 for i in (1, 2, 3))
    # Iter 2: hist0=4250, hist1..3=1250; pot=3250; node0 <- 250*3=750;
    # vshare=812 -> cash0=1562, others=812.
    two = {r.node: r for r in opic(nodes, edges, n_iter=2, grain=1000).collect()}
    assert two[0].hist_micro == 4250
    assert all(two[i].hist_micro == 1250 for i in (1, 2, 3))
    assert two[0].cash_micro == 1562
    assert all(two[i].cash_micro == 812 for i in (1, 2, 3))


def test_opic_cash_never_created_and_leaks_bounded(spark):
    nodes, edges = _star(spark)
    n, grain, iters = 4, 1_000_000, 5
    rows = opic(nodes, edges, n_iter=iters, grain=grain).collect()
    total_cash = sum(r.cash_micro for r in rows)
    # only the pot's div-n remainder (< n micro) leaks per iteration
    assert total_cash <= n * grain
    assert total_cash >= n * grain - n * iters
    # history = sum of the cash each node held at rounds 0..iters-1
    assert sum(r.hist_micro for r in rows) <= iters * n * grain


def test_opic_importance_concentrates_on_sink(spark):
    nodes, edges = _star(spark)
    rows = {r.node: r for r in opic(nodes, edges, n_iter=4).collect()}
    assert rows[0].hist_micro > rows[1].hist_micro
    assert rows[1].hist_micro == rows[2].hist_micro == rows[3].hist_micro


def _docs(spark):
    rows = [
        (i, "table join query data" if i % 3 == 0 else "lorem ipsum words here")
        for i in range(64)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_redde_invariants(spark):
    out = redde_shard_ranks(
        _docs(spark), ["table", "join", "query"], n_shards=4,
        sample_mod=3, top_n=10,
    ).collect()
    assert len(out) == 4
    assert sum(r.shard_docs for r in out) == 64
    assert sorted(r.rank for r in out) == [1, 2, 3, 4]
    for r in out:
        assert 0 <= r.sample_hits <= r.sample_docs <= r.shard_docs
        if r.sample_docs > 0:
            want = (1000 * r.sample_hits * r.shard_docs) // r.sample_docs
            assert r.est_rel_milli == want
        else:
            assert r.est_rel_milli == 0
    # ranking is by estimate desc, shard asc
    by_rank = sorted(out, key=lambda r: r.rank)
    ests = [r.est_rel_milli for r in by_rank]
    assert ests == sorted(ests, reverse=True)


def test_redde_deterministic(spark):
    a = sorted(map(tuple, redde_shard_ranks(
        _docs(spark), ["table", "query"], n_shards=4, sample_mod=3,
    ).collect()))
    b = sorted(map(tuple, redde_shard_ranks(
        _docs(spark), ["table", "query"], n_shards=4, sample_mod=3,
    ).collect()))
    assert a == b


def test_redde_query_multiset_deduped(spark):
    # repeated query words must not double-count scores
    a = sorted(map(tuple, redde_shard_ranks(
        _docs(spark), ["table", "table", "join"], n_shards=4, sample_mod=3,
    ).collect()))
    b = sorted(map(tuple, redde_shard_ranks(
        _docs(spark), ["table", "join"], n_shards=4, sample_mod=3,
    ).collect()))
    assert a == b
