"""URL blocklist filtering (operators/urlfilter.py): weighted soft score,
strict domain arm, literal-vs-join equality, and the zero-shuffle plan
guarantee of the UT1-scale join path."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from see_spark.operators.urlfilter import domain_block_join, url_blocklist_score

WORDS = [("casino", 700), ("pills", 400), ("webcam", 900)]
DOMAINS = ["bad.test", "host3.test"]


def _frontier(spark):
    rows = [
        ("http://ok.test/a",),                      # clean
        ("http://ok.test/CASINO-hall",),            # case-folded soft hit, 700 < 800
        ("http://ok.test/casino?x=cheap-pills",),   # 700+400 sums past threshold
        ("http://bad.test/clean",),                 # strict exact host
        ("http://cdn.bad.test/clean",),             # strict subdomain
        ("http://a.b.c.d.e.f.host3.test/deep",),    # deeper than max_labels
        ("http://notbad.test/x",),                  # suffix must NOT match w/o dot
    ]
    return spark.createDataFrame(rows, ["url"])


def test_score_and_decision(spark):
    out = {
        r["url"]: r
        for r in url_blocklist_score(
            _frontier(spark), WORDS, DOMAINS, threshold_milli=800
        ).collect()
    }
    assert out["http://ok.test/a"]["score_milli"] == 0
    assert out["http://ok.test/a"]["dropped"] == 0
    assert out["http://ok.test/CASINO-hall"]["score_milli"] == 700
    assert out["http://ok.test/CASINO-hall"]["dropped"] == 0
    both = out["http://ok.test/casino?x=cheap-pills"]
    assert both["score_milli"] == 1100 and both["n_hits"] == 2
    assert both["dropped"] == 1 and both["domain_blocked"] == 0
    assert out["http://bad.test/clean"]["domain_blocked"] == 1
    assert out["http://cdn.bad.test/clean"]["domain_blocked"] == 1
    assert out["http://cdn.bad.test/clean"]["dropped"] == 1
    assert out["http://a.b.c.d.e.f.host3.test/deep"]["domain_blocked"] == 1
    # 'notbad.test' ends with 'bad.test' but not '.bad.test'
    assert out["http://notbad.test/x"]["domain_blocked"] == 0
    # host extracted from the URL itself
    assert out["http://cdn.bad.test/clean"]["host"] == "cdn.bad.test"


def test_join_path_matches_literal_strict_arm(spark):
    f = _frontier(spark)
    lit = {
        r["url"]: r["domain_blocked"]
        for r in url_blocklist_score(f, WORDS, DOMAINS).collect()
    }
    dim = spark.createDataFrame([(d,) for d in DOMAINS], ["domain"])
    joined = {
        r["url"]: r["domain_blocked"]
        for r in domain_block_join(f, dim, max_labels=8).collect()
    }
    assert lit == joined
    assert sum(joined.values()) == 3


def test_join_path_deep_host_beyond_max_labels_still_blocked(spark):
    """The chain is suffix-first, so truncation at max_labels keeps the
    registrable suffixes a blocklist actually lists."""
    f = spark.createDataFrame(
        [("http://a.b.c.d.e.f.g.h.bad.test/x",)], ["url"]
    )
    dim = spark.createDataFrame([("bad.test",)], ["domain"])
    assert domain_block_join(f, dim, max_labels=4).collect()[0][
        "domain_blocked"
    ] == 1


def test_join_path_is_shuffle_free(spark):
    """10^10-frontier contract: every blocklist join broadcasts; the
    frontier side never hits a shuffle Exchange."""
    f = _frontier(spark)
    dim = spark.createDataFrame([(d,) for d in DOMAINS], ["domain"])
    plan = domain_block_join(f, dim)._jdf.queryExecution().executedPlan().toString()
    shuffles = [
        ln for ln in plan.splitlines()
        if re.search(r"\bExchange\b", ln) and "BroadcastExchange" not in ln
    ]
    # the only permitted shuffles are the dimension-side dedup
    # (hashpartitioning on __blk), which is blocklist-sized, never
    # frontier-sized
    frontier_shuffles = [ln for ln in shuffles if "__blk" not in ln]
    assert frontier_shuffles == [], frontier_shuffles
    assert "BroadcastHashJoin" in plan


def test_duplicate_blocklist_rows_do_not_duplicate_frontier(spark):
    f = _frontier(spark)
    dim = spark.createDataFrame(
        [("bad.test",), ("bad.test",), ("host3.test",)], ["domain"]
    )
    assert domain_block_join(f, dim).count() == f.count()
