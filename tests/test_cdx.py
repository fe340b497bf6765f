"""SURT/CDX capture index (operators/cdx.py): key semantics, index
ordering, lookup correctness, and the plan properties the prefix scan
relies on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from see_spark.operators.cdx import build_cdx, cdx_latest, cdx_prefix, surt_expr


def _surt_one(spark, url: str) -> str:
    return (
        spark.range(1).select(surt_expr(F.lit(url))).collect()[0][0]
    )


@pytest.mark.parametrize(
    "url,expected",
    [
        # host reversal + scheme drop + path lowercased
        ("http://sub.Example.COM/Path/A", "com,example,sub)/path/a"),
        # ONE leading www. stripped; an inner www label survives
        ("https://www.example.com/", "com,example)/"),
        ("http://www.www.example.com/", "com,example,www)/"),
        # default ports stripped, non-default kept
        ("http://example.com:80/x", "com,example)/x"),
        ("https://example.com:443/x", "com,example)/x"),
        ("http://example.com:8080/x", "com,example:8080)/x"),
        # empty path -> "/"
        ("http://example.com", "com,example)/"),
        # query params sorted bytewise; bare "?" dropped
        ("http://e.com/p?b=2&a=1&a=0", "com,e)/p?a=0&a=1&b=2"),
        ("http://e.com/p?", "com,e)/p"),
        # fragment dropped BEFORE the query parse
        ("http://e.com/p?z=1#frag", "com,e)/p?z=1"),
        ("http://e.com/p#frag", "com,e)/p"),
        # scheme-less input passes through the scheme-strip unharmed
        ("e.com/p", "com,e)/p"),
    ],
)
def test_surt_key_semantics(spark, url, expected):
    assert _surt_one(spark, url) == expected


def test_surt_param_order_aliases_collide(spark):
    a = _surt_one(spark, "http://WWW.Shop.test:80/Item?color=red&size=9")
    b = _surt_one(spark, "https://shop.test/Item?size=9&color=red")
    assert a == b == "test,shop)/item?color=red&size=9"


def _captures(spark):
    rows = [
        ("http://a.test/x", 3, 200, "d3"),
        ("http://a.test/x", 1, 200, "d1"),
        ("http://a.test/x", 2, 404, "d2"),
        ("http://www.a.test/x", 9, 200, "d9"),  # alias of a.test/x
        ("http://b.test/y", 5, 200, "d5"),
        ("http://a.test/z", 1, 200, "dz"),
    ]
    return spark.createDataFrame(rows, "url string, ts long, status int, digest string")


def test_build_cdx_is_sorted_within_partitions(spark):
    cdx = build_cdx(_captures(spark), num_ranges=2)

    def keys(it):
        rows = list(it)
        yield [(r["surt"], r["ts"]) for r in rows] == sorted(
            [(r["surt"], r["ts"]) for r in rows]
        )

    assert all(cdx.rdd.mapPartitions(keys).collect())


def test_cdx_latest_picks_newest_capture_across_aliases(spark):
    cdx = build_cdx(_captures(spark), num_ranges=2)
    latest = {r["surt"]: r for r in cdx_latest(cdx).collect()}
    # the www alias (ts=9) IS the latest capture of test,a)/x
    assert latest["test,a)/x"]["ts"] == 9
    assert latest["test,a)/x"]["digest"] == "d9"
    assert latest["test,b)/y"]["ts"] == 5
    assert latest["test,a)/z"]["ts"] == 1
    assert len(latest) == 3


def test_cdx_prefix_scans_host_subtree_in_capture_order(spark):
    cdx = build_cdx(_captures(spark), num_ranges=2)
    got = [(r["surt"], r["ts"]) for r in cdx_prefix(cdx, "test,a)").collect()]
    assert got == [
        ("test,a)/x", 1),
        ("test,a)/x", 2),
        ("test,a)/x", 3),
        ("test,a)/x", 9),
        ("test,a)/z", 1),
    ]
    assert cdx_prefix(cdx, "test,zz)").count() == 0


def test_prefix_filter_pushes_to_parquet_scan(spark, tmp_path):
    """On the materialized index the StartsWith filter must reach the scan
    (file-level min/max pruning depends on it) and the row path must stay
    JVM-side."""
    out = str(tmp_path / "cdx")
    build_cdx(_captures(spark), num_ranges=2).write.parquet(out)
    plan = (
        cdx_prefix(spark.read.parquet(out), "test,a)")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "StringStartsWith(surt,test,a))" in plan
    assert "EvalPython" not in plan


def test_cdx_from_warc_roundtrip(spark, tmp_path):
    """Crawl-archive composition: fetch rows -> WARC files -> CDX index;
    the wayback lookups answer over the archive."""
    from see_spark.sources.warc import write_warc

    fetched = spark.createDataFrame(
        [
            ("http://a.test/x", 200, "text/html", "<b>one</b>", None),
            ("http://www.a.test/x", 200, "text/html", "<b>alias</b>", None),
            ("http://b.test/y", 404, "text/html", "gone", None),
        ],
        "url string, status int, content_type string, body string,"
        " redirect_to string",
    )
    out = str(tmp_path / "warc")
    write_warc(fetched, out, "2026-01-01T00:00:00Z", n_files=2).collect()

    from see_spark.operators.cdx import cdx_from_warc, cdx_latest, cdx_prefix

    cdx = cdx_from_warc(spark, out, num_ranges=2)
    rows = cdx.collect()
    assert len(rows) == 3
    # same WARC-Date -> same ts for all; aliases share a SURT key
    keys = sorted(r["surt"] for r in rows)
    assert keys == ["test,a)/x", "test,a)/x", "test,b)/y"]
    assert all(r["ts"] == rows[0]["ts"] for r in rows)
    assert {r["status"] for r in rows} == {200, 404}
    assert all(r["digest"] for r in rows)  # uuid extracted from record id
    # lookups over the archive index
    assert cdx_prefix(cdx, "test,b)").count() == 1
    latest = cdx_latest(cdx)
    assert latest.count() == 2  # one row per surt, alias collapsed
