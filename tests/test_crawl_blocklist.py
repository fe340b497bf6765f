"""URL blocklist gate wired into the crawl loop
(CrawlConfig.url_blocklist_*): full engine-vs-oracle parity over a
contaminated fixture site, blocked URLs never enter the frontier,
redirect targets are gated too, and the default-off config keeps
legacy behavior."""

from __future__ import annotations

import tempfile

import pytest

from oracle import crawler as oracle_crawler
from see_spark.operators.crawl import CrawlConfig, run_crawl
from see_spark.sources.catalog import SnapshotCatalog
from see_spark.sources.fetcher import FixtureFetcher
from see_spark.sources.fixtures import page

WORDS = (("casino", 700), ("pills", 400), ("webcam", 900))
DOMAINS = ("ads.test",)

SOFT_ONE = "http://b.test/casino-review"          # 700 < 1000: kept
SOFT_BOTH = "http://b.test/casino-cheap-pills"    # 1100 >= 1000: dropped
HARD_HOST = "http://ads.test/landing"             # strict domain
HARD_SUB = "http://tr.ads.test/pixel"             # subdomain of strict

INDEX = (
    "<html><body>start"
    '<a href="/clean/page">clean</a>'
    f'<a href="{SOFT_ONE}">one word</a>'
    f'<a href="{SOFT_BOTH}">two words</a>'
    f'<a href="{HARD_HOST}">ad</a>'
    f'<a href="{HARD_SUB}">tracker</a>'
    '<a href="/redir">redirect</a>'
    "</body></html>"
)


def _site():
    return {
        "http://b.test/": page(INDEX),
        "http://b.test/clean/page": page("<html><body>fine words</body></html>"),
        SOFT_ONE: page("<html><body>review text</body></html>"),
        SOFT_BOTH: page("<html><body>spam</body></html>"),
        HARD_HOST: page("<html><body>ad</body></html>"),
        HARD_SUB: page("<html><body>pixel</body></html>"),
        "http://b.test/redir": page(
            "", status=301, content_type=None,
            redirect_to="http://b.test/live-webcam-casino",
        ),
        "http://b.test/live-webcam-casino": page(
            "<html><body>blocked target</body></html>"
        ),
    }


def _run_engine(spark, gate):
    config = CrawlConfig(
        domain_filter=r"\.test", host_budget=2, max_rounds=20,
        url_blocklist_words=WORDS if gate else (),
        url_blocklist_domains=DOMAINS if gate else (),
    )
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="see_blk_"), spark)
    run_crawl(
        spark, catalog, FixtureFetcher(spark, _site()), config,
        seeds=["b.test"],
    )
    return catalog.read("frontier").collect()


def _run_oracle(gate):
    return oracle_crawler.crawl(
        _site(), ["b.test"], r"\.test", host_budget=2,
        url_blocklist_words=WORDS if gate else (),
        url_blocklist_domains=DOMAINS if gate else (),
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


def test_blocked_urls_never_enter_frontier(spark):
    seen = {r["url"] for r in _run_engine(spark, gate=True)}
    for blocked in (
        SOFT_BOTH, HARD_HOST, HARD_SUB, "http://b.test/live-webcam-casino",
    ):
        assert blocked not in seen
    # one soft word under the threshold is kept
    assert SOFT_ONE in seen
    assert "http://b.test/clean/page" in seen
    # the redirect row itself remains (its TARGET was gated, not it)
    assert "http://b.test/redir" in seen


def test_gate_off_keeps_blocked(spark):
    seen = {r["url"] for r in _run_engine(spark, gate=False)}
    assert SOFT_BOTH in seen and HARD_HOST in seen
