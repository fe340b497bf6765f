"""Host-reputation gate wired into the crawl loop
(CrawlConfig.reputation_gate): full engine-vs-oracle parity over a site
where one host accumulates low-quality evidence mid-crawl, discoveries
from that host stop entering the frontier once the evidence threshold
is crossed (but never retroactively), and the default-off config keeps
legacy behavior."""

from __future__ import annotations

import tempfile

import pytest

from oracle import crawler as oracle_crawler
from see_spark.operators.crawl import CrawlConfig, run_crawl
from see_spark.sources.catalog import SnapshotCatalog
from see_spark.sources.fetcher import FixtureFetcher
from see_spark.sources.fixtures import page

JUNK = "spam spam spam spam spam spam"  # q_milli = 2, far below 10


def _junk(next_id):
    return page(
        f"<html><body>{JUNK}"
        + (f'<a href="/j{next_id}">next</a>' if next_id else "")
        + "</body></html>"
    )


def _site():
    site = {
        "http://a.test/": page(
            "<html><body>healthy distinct prose words here daily"
            '<a href="http://junk.test/j1">one</a>'
            '<a href="http://junk.test/j2">two</a>'
            '<a href="http://junk.test/j3">three</a>'
            '<a href="/more">more</a>'
            "</body></html>"
        ),
        "http://a.test/more": page(
            "<html><body>varied vocabulary continues pleasantly</body></html>"
        ),
    }
    # junk chain: j_k links to j_{k+3}; evidence n>=3 accrues by the end
    # of round 2, so discoveries from round 3 on are gated
    for k in range(1, 8):
        site[f"http://junk.test/j{k}"] = _junk(k + 3 if k + 3 <= 10 else None)
    for k in range(8, 11):
        site[f"http://junk.test/j{k}"] = _junk(None)
    return site


def _run_engine(spark, gate):
    config = CrawlConfig(
        domain_filter=r"\.test", host_budget=2, max_rounds=25,
        reputation_gate=gate,
    )
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="see_rep_"), spark)
    run_crawl(
        spark, catalog, FixtureFetcher(spark, _site()), config,
        seeds=["a.test"],
    )
    return catalog.read("frontier").collect()


def _run_oracle(gate):
    return oracle_crawler.crawl(
        _site(), ["a.test"], r"\.test", host_budget=2,
        reputation_gate=gate,
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


def test_low_reputation_host_discoveries_stop(spark):
    seen = {r["url"] for r in _run_engine(spark, gate=True)}
    # queued BEFORE the evidence threshold: still crawled (never
    # retroactive)
    for early in ("j1", "j2", "j3", "j4", "j5", "j6", "j7"):
        assert f"http://junk.test/{early}" in seen, early
    # discovered AFTER junk.test hit n_docs>=3 with avg 2 < 10: gated
    for late in ("j8", "j9", "j10"):
        assert f"http://junk.test/{late}" not in seen, late
    # the healthy host is untouched (cold start: only 2 docs)
    assert "http://a.test/more" in seen


def test_gate_off_keeps_everything(spark):
    seen = {r["url"] for r in _run_engine(spark, gate=False)}
    assert "http://junk.test/j8" in seen
    assert "http://junk.test/j10" in seen
