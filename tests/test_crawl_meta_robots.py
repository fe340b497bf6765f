"""Page-level robots directives wired into the crawl loop
(CrawlConfig.meta_robots): full engine-vs-oracle parity, noindex pages
stored but never indexed, nofollow pages/anchors never expand, and the
default-off config keeps the reference's full-link semantics."""

from __future__ import annotations

import tempfile

import pytest

from oracle import crawler as oracle_crawler
from see_spark.operators.crawl import CrawlConfig, run_crawl
from see_spark.sources.catalog import SnapshotCatalog
from see_spark.sources.fetcher import FixtureFetcher
from see_spark.sources.fixtures import page

INDEX = (
    "<html><head><title>home</title></head><body>welcome words"
    '<a href="/plain">plain</a>'
    '<a href="/secret-page" rel="external nofollow">untrusted</a>'
    '<a href="/noindex-page">ghost</a>'
    '<a href="/nofollow-page">cul de sac</a>'
    '<a href="/none-page">blackout</a>'
    "</body></html>"
)
NOINDEX = (
    '<html><head><meta name="robots" content="noindex"></head>'
    "<body>ghostwords invisible treasure"
    '<a href="/from-ghost">still followed</a></body></html>'
)
NOFOLLOW = (
    '<html><head><meta name="ROBOTS" content="NOFOLLOW"></head>'
    "<body>indexme deadend"
    '<a href="/from-culdesac">never followed</a></body></html>'
)
NONE_PAGE = (
    '<html><head><meta name="robots" content="none"></head>'
    "<body>blackoutwords"
    '<a href="/from-blackout">never</a></body></html>'
)


def _site():
    return {
        "http://m.test/": page(INDEX),
        "http://m.test/plain": page("<html><body>plainwords</body></html>"),
        "http://m.test/secret-page": page("<html><body>secret</body></html>"),
        "http://m.test/noindex-page": page(NOINDEX),
        "http://m.test/nofollow-page": page(NOFOLLOW),
        "http://m.test/none-page": page(NONE_PAGE),
        "http://m.test/from-ghost": page("<html><body>ghostchild</body></html>"),
        "http://m.test/from-culdesac": page("<html><body>lost</body></html>"),
        "http://m.test/from-blackout": page("<html><body>lost2</body></html>"),
    }


def _run_engine(spark, meta_robots):
    config = CrawlConfig(
        domain_filter=r"\.test", host_budget=2, max_rounds=20,
        meta_robots=meta_robots,
    )
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="see_meta_"), spark)
    run_crawl(
        spark, catalog, FixtureFetcher(spark, _site()), config,
        seeds=["m.test"],
    )
    return catalog


@pytest.mark.parametrize("meta_robots", [True, False])
def test_crawl_parity_with_and_without_directives(spark, meta_robots):
    catalog = _run_engine(spark, meta_robots)
    rows = catalog.read("frontier").collect()
    oracle = oracle_crawler.crawl(
        _site(), ["m.test"], r"\.test", host_budget=2,
        meta_robots=meta_robots,
    )
    engine_order = [
        r["url"]
        for r in sorted(
            (r for r in rows if r["fetch_order"] is not None),
            key=lambda r: r["fetch_order"],
        )
    ]
    assert engine_order == oracle.visit_order
    assert {r["url"] for r in rows} == oracle.seen_urls
    # postings parity: same (word -> doc set) either way
    postings = catalog.read("postings").collect()
    engine_words = {}
    for r in postings:
        engine_words.setdefault(r["word"], set()).add(r["doc_id"])
    oracle_words = {w: set(d) for w, d in oracle.postings.items()}
    assert engine_words == oracle_words


def test_directives_enforced(spark):
    catalog = _run_engine(spark, meta_robots=True)
    frontier = {r["url"]: r for r in catalog.read("frontier").collect()}
    docs = {r["doc_id"] for r in catalog.read("docs").collect()}
    words = {r["word"] for r in catalog.read("postings").collect()}
    # noindex page: fetched + stored, its outlink followed, NOT indexed
    assert frontier["http://m.test/noindex-page"]["state"] == "visited"
    assert "http://m.test/noindex-page" in docs
    assert "http://m.test/from-ghost" in frontier
    assert "ghostwords" not in words
    assert "ghostchild" in words  # the followed child IS indexed
    # nofollow page: indexed, its outlinks never enqueued
    assert "indexme" in words
    assert "http://m.test/from-culdesac" not in frontier
    # none page: neither indexed nor followed
    assert "blackoutwords" not in words
    assert "http://m.test/from-blackout" not in frontier
    # rel=nofollow anchor target never enqueued
    assert "http://m.test/secret-page" not in frontier


def test_gate_off_keeps_reference_semantics(spark):
    catalog = _run_engine(spark, meta_robots=False)
    frontier = {r["url"] for r in catalog.read("frontier").collect()}
    words = {r["word"] for r in catalog.read("postings").collect()}
    for u in (
        "http://m.test/secret-page",
        "http://m.test/from-ghost",
        "http://m.test/from-culdesac",
        "http://m.test/from-blackout",
    ):
        assert u in frontier
    assert "ghostwords" in words and "blackoutwords" in words
