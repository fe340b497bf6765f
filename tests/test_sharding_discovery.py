"""Shard planner (operators/sharding.py), discovery analytics
(operators/discovery.py), and the deterministic epoch shuffle
(operators/packing.py:epoch_shuffle)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from see_spark.operators.discovery import discovery_curve, unseen_mass
from see_spark.operators.packing import epoch_shuffle
from see_spark.operators.sharding import plan_shards, shard_stats


def test_plan_shards_lpt_stripe(spark):
    # sizes 8,7,6,5,4,3,2,1 on 2 shards: rank%2 stripes alternate, so
    # shard0 = {8,6,4,2}=20, shard1 = {7,5,3,1}=16
    docs = spark.createDataFrame(
        [(i, 9 - i) for i in range(1, 9)], ["doc_id", "size"]
    )
    plan = plan_shards(docs, 2)
    by_shard: dict = {}
    for r in plan.collect():
        by_shard.setdefault(r["shard"], []).append(r["size"])
    assert sorted(by_shard[0], reverse=True) == [8, 6, 4, 2]
    assert sorted(by_shard[1], reverse=True) == [7, 5, 3, 1]
    stats = {r["shard"]: r for r in shard_stats(plan, 2).collect()}
    assert stats[0]["total_size"] == 20 and stats[1]["total_size"] == 16
    # load_milli: 1000*20*2//36 = 1111; 1000*16*2//36 = 888
    assert stats[0]["load_milli"] == 1111 and stats[1]["load_milli"] == 888


def test_plan_shards_adversarial_balance(spark):
    # power-law sizes: striping keeps shard totals within one max-doc
    docs = spark.createDataFrame(
        [(i, 2 ** (i % 12) + i) for i in range(300)], ["doc_id", "size"]
    )
    stats = shard_stats(plan_shards(docs, 8), 8).collect()
    loads = [r["total_size"] for r in stats]
    assert len(loads) == 8
    assert max(loads) - min(loads) <= 2 ** 11 + 300  # one stripe spread


def test_plan_shards_ties_deterministic(spark):
    docs = spark.createDataFrame([(i, 5) for i in range(10)], ["doc_id", "size"])
    a = sorted((r["doc_id"], r["shard"]) for r in plan_shards(docs, 3).collect())
    b = sorted(
        (r["doc_id"], r["shard"])
        for r in plan_shards(docs.repartition(7), 3).collect()
    )
    assert a == b  # id tie-break pins equal-size ordering at any layout


def test_discovery_curve(spark):
    fs = spark.createDataFrame(
        [("h", f"a{i}", 0) for i in range(5)]
        + [("h", f"b{i}", 1) for i in range(3)]
        + [("h", "c0", 3), ("g", "x", 2)],
        ["host", "url", "first_round"],
    )
    got = {(r["host"], r["round"]): (r["n_new"], r["cum_urls"])
           for r in discovery_curve(fs).collect()}
    assert got[("h", 0)] == (5, 5)
    assert got[("h", 1)] == (3, 8)
    assert got[("h", 3)] == (1, 9)
    assert got[("g", 2)] == (1, 1)


def test_unseen_mass_good_turing(spark):
    # saturated: every url sighted 5 times -> f1=0 -> unseen 0 -> exhausted
    rows = [("sat", f"u{i}") for i in range(8) for _ in range(5)]
    # frontier-rich: 10 of 12 urls sighted once -> f1/N = 10/22
    rows += [("rich", f"v{i}") for i in range(10)]
    rows += [("rich", "w0")] * 6 + [("rich", "w1")] * 6
    # thin evidence: high unseen mass but n_obs < min_obs -> NOT exhausted
    rows += [("thin", "t0")]
    df = spark.createDataFrame(rows, ["host", "url"])
    got = {r["host"]: r for r in
           unseen_mass(df, threshold_milli=100, min_obs=20).collect()}
    sat = got["sat"]
    assert (sat["n_obs"], sat["f1"], sat["unseen_milli"], sat["exhausted"]) == (
        40, 0, 0, 1,
    )
    rich = got["rich"]
    assert (rich["n_obs"], rich["n_distinct"], rich["f1"]) == (22, 12, 10)
    assert rich["unseen_milli"] == (1000 * 10) // 22  # 454
    assert rich["exhausted"] == 0
    thin = got["thin"]
    assert (thin["unseen_milli"], thin["exhausted"]) == (1000, 0)


def _py_shuffle_order(ids, seed):
    def key(d):
        h = hashlib.md5(f"shuffle:{seed}:{d}".encode()).hexdigest()[:15]
        return (int(h, 16), d)
    return [d for d in sorted(ids, key=key)]


def test_epoch_shuffle_matches_python_replica(spark):
    ids = list(range(40))
    docs = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = epoch_shuffle(docs, "ep1").collect()
    by_pos = {r["shuffle_pos"]: r["doc_id"] for r in got}
    expect = _py_shuffle_order(ids, "ep1")
    assert [by_pos[i] for i in range(len(ids))] == expect
    assert sorted(by_pos.keys()) == list(range(len(ids)))  # dense 0..n-1


def test_epoch_shuffle_seed_changes_order_not_set(spark):
    docs = spark.createDataFrame([(i,) for i in range(60)], ["doc_id"])
    a = [r["doc_id"] for r in
         epoch_shuffle(docs, "e1").orderBy("shuffle_pos").collect()]
    b = [r["doc_id"] for r in
         epoch_shuffle(docs, "e2").orderBy("shuffle_pos").collect()]
    assert sorted(a) == sorted(b) == list(range(60))
    assert a != b


def test_epoch_shuffle_partitioning_invariant(spark):
    docs = spark.createDataFrame([(i,) for i in range(50)], ["doc_id"])
    a = sorted((r["doc_id"], r["shuffle_pos"])
               for r in epoch_shuffle(docs, "s").collect())
    b = sorted((r["doc_id"], r["shuffle_pos"])
               for r in epoch_shuffle(docs.repartition(9), "s").collect())
    assert a == b


def test_plan_shards_rejects_bad_n(spark):
    docs = spark.createDataFrame([(1, 1)], ["doc_id", "size"])
    with pytest.raises(ValueError):
        plan_shards(docs, 0)


def test_allocate_budget_hamilton(spark):
    from see_spark.operators.frontier import allocate_budget

    w = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 1), ("d", 1)], ["host", "weight"]
    )
    got = {r["host"]: r["budget"]
           for r in allocate_budget(w, 10).collect()}
    # exact shares 5,3,1,1 of 10 -> no remainders
    assert got == {"a": 5, "b": 3, "c": 1, "d": 1}
    got = {r["host"]: r["budget"]
           for r in allocate_budget(w, 7).collect()}
    # shares 3.5, 2.1, 0.7, 0.7: bases 3,2,0,0 leftover 2 ->
    # remainders 5,1,7,7 (x10): c and d tie at .7 -> both get +1 (L=2)
    assert got == {"a": 3, "b": 2, "c": 1, "d": 1}
    assert sum(got.values()) == 7


def test_allocate_budget_sum_invariant_and_ties(spark):
    from see_spark.operators.frontier import allocate_budget

    w = spark.createDataFrame(
        [(f"h{i:02d}", (i * 13) % 7 + 1) for i in range(40)],
        ["host", "weight"],
    )
    for total in (1, 17, 400, 12345):
        rows = allocate_budget(w, total).collect()
        assert sum(r["budget"] for r in rows) == total, total
        # proportionality: budget within 1 of the exact share
        W = sum((i * 13) % 7 + 1 for i in range(40))
        for r in rows:
            exact = total * r["weight"] / W
            assert abs(r["budget"] - exact) < 1 + 1e-9, (total, r)


def test_allocate_budget_partitioning_invariant(spark):
    from see_spark.operators.frontier import allocate_budget

    w = spark.createDataFrame(
        [(f"h{i}", i % 5 + 1) for i in range(30)], ["host", "weight"]
    )
    a = sorted((r["host"], r["budget"]) for r in allocate_budget(w, 100).collect())
    b = sorted(
        (r["host"], r["budget"])
        for r in allocate_budget(w.repartition(7), 100).collect()
    )
    assert a == b


def test_checkout_per_host_budgets(spark):
    from see_spark.operators.frontier import checkout

    rows = []
    for h, n in (("a", 5), ("b", 5), ("c", 5)):
        for i in range(n):
            rows.append((f"http://{h}/{i}", hash(f"{h}{i}"), h, 0, len(rows),
                         "unvisited"))
    f = spark.createDataFrame(
        rows, "url string, url_hash long, host string, depth int, "
              "seq long, state string",
    )
    stats = spark.createDataFrame(
        [("a", 0, 0), ("b", 0, 0), ("c", 0, 0)],
        "host string, last_fetch_round int, fetched_total long",
    )
    budgets = spark.createDataFrame(
        [("a", 3), ("c", 0)], "host string, budget long"
    )  # b absent -> scalar default 1; c budget 0 -> skipped
    batch = checkout(f, stats, round_no=5, host_budget=1,
                     min_gap_rounds=1, host_budgets=budgets)
    got: dict = {}
    for r in batch.collect():
        got.setdefault(r["host"], []).append(r["seq"])
    assert sorted(got["a"]) == [0, 1, 2]   # budget 3, lowest seqs
    assert sorted(got["b"]) == [5]         # default 1
    assert "c" not in got                  # budget 0 -> skipped
    # fetch_order dense over (depth, seq)
    order = [r["seq"] for r in sorted(batch.collect(),
                                      key=lambda r: r["fetch_order"])]
    assert order == [0, 1, 2, 5]


def test_checkout_budgets_none_matches_scalar(spark):
    from see_spark.operators.frontier import checkout

    rows = [(f"http://h/{i}", i * 7, "h", 0, i, "unvisited")
            for i in range(6)]
    f = spark.createDataFrame(
        rows, "url string, url_hash long, host string, depth int, "
              "seq long, state string",
    )
    stats = spark.createDataFrame(
        [("h", 0, 0)], "host string, last_fetch_round int, fetched_total long",
    )
    a = sorted(r["url"] for r in checkout(f, stats, 5, 2).collect())
    empty = spark.createDataFrame([], "host string, budget long")
    b = sorted(
        r["url"]
        for r in checkout(f, stats, 5, 2, host_budgets=empty).collect()
    )
    assert a == b
