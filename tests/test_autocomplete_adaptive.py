"""Autocomplete (lexicon.py:autocomplete) and latency-adaptive
politeness (frontier.py:adaptive_host_delay): ranking/tie/k-cut
semantics, both clamps, percentile interpolation, and the checkout
host_gap contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from see_spark.operators.frontier import adaptive_host_delay
from see_spark.operators.lexicon import autocomplete, vocabulary


def _vocab(spark):
    return spark.createDataFrame(
        [
            ("table", 50), ("tablet", 50), ("tabs", 7), ("tango", 99),
            ("query", 30), ("quest", 30), ("quick", 1),
        ],
        ["word", "df"],
    )


def test_autocomplete_ranking_and_ties(spark):
    rows = autocomplete(spark, ["ta"], _vocab(spark), k=3).collect()
    got = [(r["word"], r["rank"]) for r in sorted(rows, key=lambda r: r["rank"])]
    # df desc, word asc on ties: tango(99), table(50), tablet(50); tabs cut
    assert got == [("tango", 1), ("table", 2), ("tablet", 3)]


def test_autocomplete_multi_prefix_and_empty(spark):
    rows = autocomplete(spark, ["qu", "zz", "tab"], _vocab(spark), k=8).collect()
    by_prefix: dict = {}
    for r in rows:
        by_prefix.setdefault(r["prefix"], []).append((r["rank"], r["word"]))
    assert "zz" not in by_prefix  # no completion -> no rows
    assert sorted(by_prefix["qu"]) == [(1, "query"), (2, "quest"), (3, "quick")]
    # 'tab' matches a strict subset of 'ta'
    assert sorted(by_prefix["tab"]) == [(1, "table"), (2, "tablet"), (3, "tabs")]


def test_autocomplete_from_postings_vocab(spark):
    postings = spark.createDataFrame(
        [("alpha", 1), ("alpha", 2), ("alps", 1), ("beta", 2)],
        ["word", "doc_id"],
    )
    rows = autocomplete(spark, ["al"], vocabulary(postings), k=8).collect()
    got = {(r["word"]): (r["df"], r["rank"]) for r in rows}
    assert got == {"alpha": (2, 1), "alps": (1, 2)}


def _delays(spark, rows, **kw):
    obs = spark.createDataFrame(rows, ["host", "latency_ms"])
    return {r["host"]: r for r in adaptive_host_delay(obs, **kw).collect()}


def test_adaptive_delay_percentile_and_gap(spark):
    # h1: latencies 100,200,300,400 -> p75 = 300 + 0.25*(400-300) = 325
    rows = [("h1", 100), ("h1", 200), ("h1", 300), ("h1", 400)]
    got = _delays(spark, rows, mult=3, min_delay_ms=100, max_delay_ms=10_000)
    r = got["h1"]
    assert r["n_obs"] == 4 and r["p75_ms"] == 325.0
    assert r["delay_ms"] == 975          # floor(3 * 325)
    assert r["gap_rounds"] == 1          # ceil(975/1000)
    got2 = _delays(spark, rows, mult=4, min_delay_ms=100, max_delay_ms=10_000)
    assert got2["h1"]["delay_ms"] == 1300 and got2["h1"]["gap_rounds"] == 2


def test_adaptive_delay_clamps(spark):
    rows = [("fast", 1), ("fast", 2), ("slow", 9000), ("slow", 9500)]
    got = _delays(spark, rows, mult=3, min_delay_ms=100, max_delay_ms=10_000)
    assert got["fast"]["delay_ms"] == 100      # floor(3*1.75)=5 -> min clamp
    assert got["slow"]["delay_ms"] == 10_000   # 3*9375 -> max clamp
    assert got["slow"]["gap_rounds"] == 10


def test_adaptive_delay_feeds_checkout_contract(spark):
    # the output carries (host, gap_rounds) — the exact host_gap schema
    # checkout() and error_backoff_gap share
    got = adaptive_host_delay(
        spark.createDataFrame([("h", 500)], ["host", "latency_ms"])
    )
    assert {"host", "gap_rounds"} <= set(got.columns)
    assert got.select("host", "gap_rounds").collect()[0]["gap_rounds"] >= 1
