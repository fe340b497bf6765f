"""Focused-crawl prioritization (operators/focused.py): shark-search
propagation semantics and the best-first checkout composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from see_spark.operators.focused import focused_checkout, shark_priorities

TOPICS = ["green", "blue"]


def _parents(spark):
    return spark.createDataFrame(
        [("http://a.test/1", 1000), ("http://a.test/2", 400),
         ("http://b.test/1", 0)],
        "url string, score_milli long",
    )


def _links(spark):
    return spark.createDataFrame(
        [
            # child X: relevant parent, no anchor hit -> 500
            ("http://a.test/1", "http://c.test/x", "plain link"),
            # child X again: weak parent but BOTH topic words (dup 'green'
            # counts once) -> 200 + 2*200 = 600 -> MAX wins
            ("http://a.test/2", "http://c.test/x", "green green blue stuff"),
            # child Y: zero parent, one anchor hit -> 200
            ("http://b.test/1", "http://c.test/y", "Blue pages"),
            # link from an UNSCORED parent is ignored (inner join)
            ("http://nowhere.test/", "http://c.test/z", "green"),
        ],
        "src_url string, dst_url string, anchor string",
    )


def test_shark_priority_max_and_anchor_bonus(spark):
    got = {
        r["url"]: (r["priority_milli"], r["n_parents"])
        for r in shark_priorities(
            _parents(spark), _links(spark), TOPICS,
            decay_milli=500, anchor_bonus_milli=200,
        ).collect()
    }
    assert got == {
        "http://c.test/x": (600, 2),  # max(500, 200+400) with distinct hits
        "http://c.test/y": (200, 1),  # case-folded anchor hit on 0-parent
    }


def test_anchor_hits_count_distinct_topic_words(spark):
    links = spark.createDataFrame(
        [("http://a.test/1", "http://c.test/q", "green green green")],
        "src_url string, dst_url string, anchor string",
    )
    row = shark_priorities(
        _parents(spark), links, TOPICS, decay_milli=0, anchor_bonus_milli=7
    ).collect()[0]
    assert row["priority_milli"] == 7  # one DISTINCT hit, not three


def test_focused_checkout_orders_best_first_within_budget(spark):
    frontier = spark.createDataFrame(
        [
            ("http://h1.test/a", "h1.test", 1, 1, "unvisited"),
            ("http://h1.test/b", "h1.test", 1, 2, "unvisited"),
            ("http://h1.test/c", "h1.test", 1, 3, "unvisited"),
            ("http://h2.test/a", "h2.test", 0, 4, "unvisited"),
            ("http://h2.test/b", "h2.test", 0, 5, "visited"),
        ],
        "url string, host string, depth long, seq long, state string",
    )
    pri = spark.createDataFrame(
        [("http://h1.test/c", 900, 1), ("http://h1.test/b", 100, 1)],
        "url string, priority_milli long, n_parents long",
    )
    batch = [
        (r["url"], r["fetch_order"])
        for r in focused_checkout(frontier, pri, host_budget=2)
        .orderBy("fetch_order").collect()
    ]
    # best-first: c (900) beats b (100) beats a (0, dropped by budget 2);
    # h2's only unvisited row rides along at priority 0
    assert batch == [
        ("http://h1.test/c", 0),
        ("http://h1.test/b", 1),
        ("http://h2.test/a", 2),
    ]
    # no Python on the row path
    plan = (
        focused_checkout(frontier, pri, host_budget=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_shark_priorities_deterministic_across_parallelism(spark):
    parents = _parents(spark)
    links = _links(spark)
    a = shark_priorities(parents.repartition(1), links.repartition(1), TOPICS)
    b = shark_priorities(parents.repartition(8), links.repartition(8), TOPICS)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
