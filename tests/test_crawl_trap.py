"""Trap gate wired into the crawl loop (CrawlConfig.trap_gate): full
engine-vs-oracle parity over a trap-shaped fixture site, trap URLs never
enter the frontier, redirect targets are gated too, and the default-off
config keeps legacy behavior (traps crawled like any URL)."""

from __future__ import annotations

import tempfile

import pytest

from oracle import crawler as oracle_crawler
from see_spark.operators.crawl import CrawlConfig, run_crawl
from see_spark.sources.catalog import SnapshotCatalog
from see_spark.sources.fetcher import FixtureFetcher
from see_spark.sources.fixtures import page

TRAP_REPEAT = "http://t.test/cal/a/b/a/b/a"
TRAP_DEPTH = "http://t.test/d1/d2/d3/d4/d5/d6/d7/d8/d9"
TRAP_LONG = "http://t.test/l" + "x" * 600
TRAP_VIA_REDIRECT = "http://t.test/cal/x/y/x/y/x"

INDEX = (
    "<html><body>start here"
    '<a href="/good/one">good</a>'
    f'<a href="{TRAP_REPEAT}">calendar loop</a>'
    f'<a href="{TRAP_DEPTH}">deep generator</a>'
    f'<a href="{TRAP_LONG}">runaway</a>'
    '<a href="/redir">redirect</a>'
    "</body></html>"
)
GOOD_ONE = (
    "<html><body>fine content words"
    '<a href="/good/two/a/b">deeper but clean</a>'
    "</body></html>"
)


def _site():
    return {
        "http://t.test/": page(INDEX),
        "http://t.test/good/one": page(GOOD_ONE),
        "http://t.test/good/two/a/b": page("<html><body>leaf</body></html>"),
        "http://t.test/redir": page(
            "", status=301, content_type=None, redirect_to=TRAP_VIA_REDIRECT
        ),
        TRAP_REPEAT: page("<html><body>trap page</body></html>"),
        TRAP_DEPTH: page("<html><body>deep page</body></html>"),
        TRAP_LONG: page("<html><body>long page</body></html>"),
        TRAP_VIA_REDIRECT: page("<html><body>redirect trap</body></html>"),
    }


def _run_engine(spark, trap_gate):
    config = CrawlConfig(
        domain_filter=r"\.test", host_budget=2, max_rounds=20,
        trap_gate=trap_gate,
    )
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="see_trap_"), spark)
    run_crawl(
        spark, catalog, FixtureFetcher(spark, _site()), config,
        seeds=["t.test"],
    )
    return catalog.read("frontier").collect()


def _run_oracle(trap_gate):
    return oracle_crawler.crawl(
        _site(), ["t.test"], r"\.test", host_budget=2, trap_gate=trap_gate
    )


@pytest.mark.parametrize("trap_gate", [True, False])
def test_crawl_parity_with_and_without_gate(spark, trap_gate):
    rows = _run_engine(spark, trap_gate)
    oracle = _run_oracle(trap_gate)
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


def test_traps_never_enter_frontier(spark):
    seen = {r["url"] for r in _run_engine(spark, trap_gate=True)}
    for trap in (TRAP_REPEAT, TRAP_DEPTH, TRAP_LONG, TRAP_VIA_REDIRECT):
        assert trap not in seen
    # clean pages still crawled, including the deeper-but-clean leaf
    assert "http://t.test/good/two/a/b" in seen
    # the redirect row itself remains (its TARGET was gated, not it)
    assert "http://t.test/redir" in seen


def test_gate_off_keeps_traps(spark):
    seen = {r["url"] for r in _run_engine(spark, trap_gate=False)}
    assert TRAP_REPEAT in seen and TRAP_DEPTH in seen
