"""DUST alias gate wired into the crawl loop (CrawlConfig.dust_gate):
engine-vs-oracle parity over a site where same-content evidence for a
session-id param accrues mid-crawl, later sid-variant discoveries
collapse to their alias (saving the fetch), a content-selecting param
earns a counterexample and is never stripped, and default-off keeps
legacy behavior."""

from __future__ import annotations

import tempfile

import pytest

from oracle import crawler as oracle_crawler
from see_spark.operators.crawl import CrawlConfig, run_crawl
from see_spark.sources.catalog import SnapshotCatalog
from see_spark.sources.fetcher import FixtureFetcher
from see_spark.sources.fixtures import page

ALPHA = "<html><body>alpha beta gamma delta</body></html>"


def _site():
    return {
        # round 0: seed. links (all absolute — the reference's relative
        # resolver drops query strings, which would defeat the fixture)
        "http://d.test/": page(
            "<html><body>root"
            '<a href="http://d.test/p?id=1">one</a>'
            '<a href="http://d.test/p?id=1&sid=111">one-sid</a>'
            '<a href="http://d.test/p?id=1&page=1">one-paged</a>'
            '<a href="http://d.test/deep">deep</a>'
            "</body></html>"
        ),
        # round 1 fetches: identical content with and without sid ->
        # evidence (d.test, sid); page=1 differs -> counterexample
        "http://d.test/p?id=1": page(ALPHA),
        "http://d.test/p?id=1&sid=111": page(ALPHA),
        "http://d.test/p?id=1&page=1": page(
            "<html><body>second page content entirely different</body></html>"
        ),
        "http://d.test/deep": page(
            '<html><body>deep<a href="http://d.test/deep2">next</a></body></html>'
        ),
        # round 2 fetch: discoveries AFTER the sid rule is live
        "http://d.test/deep2": page(
            "<html><body>deep2"
            '<a href="http://d.test/p?id=1&sid=999">alias-collapses</a>'
            '<a href="http://d.test/q?id=2&sid=5">new-aliased</a>'
            '<a href="http://d.test/q?id=2">new-direct</a>'
            '<a href="http://d.test/p?id=1&page=2">paged-kept</a>'
            "</body></html>"
        ),
        # round 3 fetches
        "http://d.test/q?id=2": page("<html><body>q two body</body></html>"),
        "http://d.test/p?id=1&page=2": page(
            "<html><body>third page content also different</body></html>"
        ),
    }


def _run_engine(spark, gate):
    config = CrawlConfig(
        domain_filter=r"\.test", host_budget=6, max_rounds=15,
        dust_gate=gate, dust_min_support=1,
    )
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="see_dust_"), spark)
    run_crawl(
        spark, catalog, FixtureFetcher(spark, _site()), config,
        seeds=["d.test"],
    )
    return catalog.read("frontier").collect()


def _run_oracle(gate):
    return oracle_crawler.crawl(
        _site(), ["d.test"], r"\.test", host_budget=6,
        dust_gate=gate, dust_min_support=1,
    )


@pytest.mark.parametrize("gate", [True, False])
def test_crawl_parity_with_and_without_gate(spark, gate):
    rows = _run_engine(spark, gate)
    oracle = _run_oracle(gate)
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


def test_dust_gate_collapses_aliases(spark):
    seen = {r["url"] for r in _run_engine(spark, gate=True)}
    # sid variants discovered after the rule went live never enqueue
    assert "http://d.test/p?id=1&sid=999" not in seen
    assert "http://d.test/q?id=2&sid=5" not in seen
    # their aliases are crawled instead
    assert "http://d.test/q?id=2" in seen
    # page= earned a counterexample in round 1 -> never stripped
    assert "http://d.test/p?id=1&page=2" in seen
    # pre-rule discoveries were never retroactively rewritten
    assert "http://d.test/p?id=1&sid=111" in seen


def test_gate_off_keeps_legacy_behavior(spark):
    seen = {r["url"] for r in _run_engine(spark, gate=False)}
    assert "http://d.test/p?id=1&sid=999" in seen
    assert "http://d.test/q?id=2&sid=5" in seen
