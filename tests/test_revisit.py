"""Conditional revisits (operators/revisit.py + fetcher If-None-Match
support + the 304 router arm): end-to-end revalidation round over the
fixture fetcher — unchanged pages answer 304 with no body, changed pages
refetch, outcomes feed recrawl_schedule's streak math."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from see_spark.core.fetch import KIND_UNCHANGED, route_response
from see_spark.operators.recrawl import recrawl_schedule
from see_spark.operators.revisit import revisit_round
from see_spark.sources.fetcher import FixtureFetcher


def _page(body, status=200, ct="text/html", loc=None):
    return {
        "status": status, "content_type": ct, "body": body, "redirect_to": loc,
    }


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def test_router_304_arm():
    out = route_response(304, "text/html", None, None)
    assert out.kind == KIND_UNCHANGED
    # 304 is unreachable without a validator; other arms unchanged
    assert route_response(200, "text/html", "x", None).kind == "text"
    assert route_response(404, None, None, None).kind == "error"


def test_fixture_fetcher_conditional(spark):
    site = {"http://a.test/": _page("<p>hello</p>")}
    f = FixtureFetcher(spark, site)
    batch = spark.createDataFrame(
        [
            ("http://a.test/", _md5("<p>hello</p>")),   # hit -> 304
            ("http://a.test/", _md5("other")),           # miss -> 200+body
        ],
        ["url", "if_none_match"],
    )
    rows = sorted(f.fetch(batch).collect(), key=lambda r: r.status)
    assert rows[1].status == 304 and rows[1].body is None
    assert rows[0].status == 200 and rows[0].body == "<p>hello</p>"
    # no validator column -> plain fetch, unchanged behavior
    plain = f.fetch(spark.createDataFrame([("http://a.test/",)], ["url"]))
    assert plain.collect()[0].status == 200


def _history(spark, rows):
    return spark.createDataFrame(rows, "url string, round long, content_hash string")


def test_revisit_round_end_to_end(spark):
    old_a, old_b, old_c = "<p>aaa</p>", "<p>bbb</p>", "<p>ccc</p>"
    # round-1 observations: all three fetched
    hist = _history(
        spark,
        [
            ("http://s.test/a", 1, _md5(old_a)),
            ("http://s.test/b", 1, _md5(old_b)),
            ("http://s.test/c", 1, _md5(old_c)),
            ("http://s.test/late", 1, _md5("x")),
        ],
    )
    # current site at revisit time: a unchanged, b changed, c now 404
    site = {
        "http://s.test/a": _page(old_a),
        "http://s.test/b": _page("<p>BBB v2</p>"),
        "http://s.test/c": _page(None, status=404),
        # 'late' not due yet (streak 0 -> due at round 2; we revisit at 2,
        # so it IS due -- keep it unchanged to exercise a second 304)
        "http://s.test/late": _page("x", ct="text/plain"),
    }
    out = {
        r.url: r
        for r in revisit_round(FixtureFetcher(spark, site), hist, now_round=2).collect()
    }
    assert out["http://s.test/a"].outcome == "unchanged_304"
    assert out["http://s.test/a"].saved_fetch == 1
    assert out["http://s.test/a"].new_hash == _md5(old_a)
    assert out["http://s.test/b"].outcome == "changed"
    assert out["http://s.test/b"].new_hash == _md5("<p>BBB v2</p>")
    assert out["http://s.test/c"].outcome == "error"
    assert out["http://s.test/late"].outcome == "unchanged_304"

    # append non-error observations and check streak composition: the
    # unchanged url backs off (streak 1, interval 2), the changed url
    # stays hot (streak 0, interval 1)
    new_rows = [
        (r.url, 2, r.new_hash) for r in out.values() if r.outcome != "error"
    ]
    hist2 = hist.union(_history(spark, new_rows))
    plan = {r.url: r for r in recrawl_schedule(hist2).collect()}
    assert plan["http://s.test/a"].unchanged_streak == 1
    assert plan["http://s.test/a"].interval == 2
    assert plan["http://s.test/b"].unchanged_streak == 0
    assert plan["http://s.test/b"].interval == 1
    # the errored url kept its old schedule (1 observation)
    assert plan["http://s.test/c"].n_fetches == 1


def test_not_due_urls_not_fetched(spark):
    # url with a long unchanged streak is NOT due at now_round -> no fetch
    hist = _history(
        spark,
        [
            ("http://s.test/static", 1, _md5("s")),
            ("http://s.test/static", 2, _md5("s")),
            ("http://s.test/static", 3, _md5("s")),  # streak 2, interval 4
        ],
    )
    site = {"http://s.test/static": _page("s", ct="text/plain")}
    out = revisit_round(FixtureFetcher(spark, site), hist, now_round=5).collect()
    assert out == []  # due at round 7
    out = revisit_round(FixtureFetcher(spark, site), hist, now_round=7).collect()
    assert len(out) == 1 and out[0].outcome == "unchanged_304"
