"""rel=canonical discovery wired into the crawl loop
(CrawlConfig.follow_canonical): full engine-vs-oracle parity, the
canonical_aliases ledger, canonical-only-discoverable pages, ordering
(canonical enqueues after the page's anchors), and the default-off
config ignores the declaration entirely."""

from __future__ import annotations

import tempfile

import pytest

from oracle import crawler as oracle_crawler
from see_spark.operators.crawl import CrawlConfig, run_crawl
from see_spark.sources.catalog import SnapshotCatalog
from see_spark.sources.fetcher import FixtureFetcher
from see_spark.sources.fixtures import page

INDEX = (
    "<html><head><title>home</title>"
    '<link rel="stylesheet" href="/style.css">'
    '<link rel="Canonical" href="/canonical-home">'
    "</head><body>words here"
    '<a href="/a">a</a>'
    '<a href="/b">b</a>'
    "</body></html>"
)
# /dup declares an off-page canonical that nothing links to
DUP = (
    '<html><head><link rel="canonical" href="http://c.test/master"></head>'
    "<body>duplicate view of master</body></html>"
)
# /self declares itself canonical (the common no-op case)
SELF = (
    '<html><head><link rel="canonical" href="http://c.test/self"></head>'
    "<body>selfcanon</body></html>"
)


def _site():
    return {
        "http://c.test/": page(INDEX),
        "http://c.test/canonical-home": page("<html><body>canonhome</body></html>"),
        "http://c.test/a": page(DUP),
        "http://c.test/b": page(SELF),
        "http://c.test/master": page("<html><body>master copy</body></html>"),
        "http://c.test/self": page(SELF),
        "http://c.test/style.css": page("css", content_type="text/plain"),
    }


def _run_engine(spark, follow_canonical):
    config = CrawlConfig(
        domain_filter=r"\.test", host_budget=2, max_rounds=20,
        follow_canonical=follow_canonical,
    )
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="see_canon_"), spark)
    run_crawl(
        spark, catalog, FixtureFetcher(spark, _site()), config,
        seeds=["c.test"],
    )
    return catalog


@pytest.mark.parametrize("follow_canonical", [True, False])
def test_crawl_parity(spark, follow_canonical):
    catalog = _run_engine(spark, follow_canonical)
    rows = catalog.read("frontier").collect()
    oracle = oracle_crawler.crawl(
        _site(), ["c.test"], r"\.test", host_budget=2,
        follow_canonical=follow_canonical,
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
    engine_states = {r["url"]: (r["state"], r["detail"]) for r in rows}
    expected = {u: (e.state, e.detail) for u, e in oracle.frontier.items()}
    assert engine_states == expected


def test_canonical_ledger_and_discovery(spark):
    catalog = _run_engine(spark, follow_canonical=True)
    frontier = {r["url"]: r for r in catalog.read("frontier").collect()}
    ledger = {
        (r["url"], r["canonical"])
        for r in catalog.read("canonical_aliases").collect()
    }
    oracle = oracle_crawler.crawl(
        _site(), ["c.test"], r"\.test", host_budget=2, follow_canonical=True
    )
    assert ledger == {(u, c) for u, c, _ in oracle.canonical_aliases}
    # declared pairs present, incl. the self-canonical no-op
    assert ("http://c.test/", "http://c.test/canonical-home") in ledger
    assert ("http://c.test/a", "http://c.test/master") in ledger
    assert ("http://c.test/b", "http://c.test/self") in ledger
    # canonical-only-discoverable pages got crawled
    assert frontier["http://c.test/canonical-home"]["state"] == "visited"
    assert frontier["http://c.test/master"]["state"] == "visited"
    # ordering: the canonical enqueued AFTER the page's anchors
    seqs = {u: frontier[u]["seq"] for u in frontier}
    assert seqs["http://c.test/a"] < seqs["http://c.test/canonical-home"]
    assert seqs["http://c.test/b"] < seqs["http://c.test/canonical-home"]


def test_gate_off_ignores_canonical(spark):
    catalog = _run_engine(spark, follow_canonical=False)
    seen = {r["url"] for r in catalog.read("frontier").collect()}
    assert "http://c.test/canonical-home" not in seen
    assert "http://c.test/master" not in seen
    assert catalog.read("canonical_aliases").count() == 0
