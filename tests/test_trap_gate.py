"""Crawler-trap gate (frontier.py:trap_stats): hand-built URL shapes,
threshold edges, plan quality (no shuffle), and column passthrough."""

from __future__ import annotations

from see_spark.operators.frontier import trap_stats


def _run(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return {r.url: r for r in trap_stats(df, **kw).collect()}


def test_shapes(spark):
    out = _run(
        spark,
        [
            "http://a.test/",                      # root: depth 0, clean
            "http://a.test/x/y/z",                 # clean
            "http://a.test/a/b/a/b/a/b",           # repeat trap (a x3)
            "http://a.test/" + "/".join("d%d" % i for i in range(9)),  # depth 9
            "http://a.test/" + "x" * 600,          # length trap
            "https://b.test/a/a",                  # repeat 2 < 3: clean
        ],
    )
    r = out["http://a.test/"]
    assert (r.depth_segs, r.max_repeat, r.is_trap) == (0, 0, 0)
    r = out["http://a.test/x/y/z"]
    assert (r.depth_segs, r.max_repeat, r.is_trap) == (3, 1, 0)
    r = out["http://a.test/a/b/a/b/a/b"]
    assert (r.depth_segs, r.max_repeat, r.is_trap) == (6, 3, 1)
    assert out["http://a.test/d0/d1/d2/d3/d4/d5/d6/d7/d8"].is_trap == 1
    assert out["http://a.test/" + "x" * 600].is_trap == 1
    assert out["https://b.test/a/a"].is_trap == 0


def test_threshold_overrides(spark):
    urls = ["http://a.test/a/b/a/b"]
    assert _run(spark, urls, max_seg_repeat=2)[urls[0]].is_trap == 1
    assert _run(spark, urls, max_seg_repeat=3)[urls[0]].is_trap == 0
    assert _run(spark, urls, max_depth=3)[urls[0]].is_trap == 1


def test_passthrough_and_no_shuffle(spark):
    df = spark.createDataFrame(
        [("http://a.test/x", "h1", 7)], ["url", "host", "seq"]
    )
    out = trap_stats(df)
    assert {"url", "host", "seq"}.issubset(set(out.columns))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow map over the frontier
