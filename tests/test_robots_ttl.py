"""Robots TTL refetch (CrawlConfig.robots_ttl_rounds): full crawl parity
vs the oracle over a site whose robots.txt TIGHTENS mid-crawl
(PhasedFixtureFetcher / callable oracle site) — with a TTL the updated
rules block late-discovered URLs; without one the stale allow-all copy
is used forever. Default-off behavior byte-identical."""

from __future__ import annotations

import tempfile

import pytest

from oracle import crawler as oracle_crawler
from see_spark.operators.crawl import CrawlConfig, run_crawl
from see_spark.sources.catalog import SnapshotCatalog
from see_spark.sources.fetcher import PhasedFixtureFetcher
from see_spark.sources.fixtures import page

ROBOTS_OPEN = "User-agent: *\nAllow: /\n"
ROBOTS_TIGHT = "User-agent: *\nDisallow: /late\n"


def _pages():
    return {
        "http://t.test/": page(
            '<html><body><a href="/p1">next</a><a href="/late0">l0</a></body></html>'
        ),
        "http://t.test/p1": page(
            '<html><body><a href="/p2">next</a><a href="/late1">l1</a></body></html>'
        ),
        "http://t.test/p2": page('<html><body><a href="/p3">next</a></body></html>'),
        "http://t.test/p3": page('<html><body><a href="/late2">l2</a></body></html>'),
        "http://t.test/late0": page("<html><body>late zero</body></html>"),
        "http://t.test/late1": page("<html><body>late one</body></html>"),
        "http://t.test/late2": page("<html><body>late two</body></html>"),
    }


def _site(robots_body):
    s = _pages()
    s["http://t.test/robots.txt"] = page(robots_body, content_type="text/plain")
    return s


SITE0 = _site(ROBOTS_OPEN)
SITE1 = _site(ROBOTS_TIGHT)
SWITCH_ROUND = 2


def _run_engine(spark, ttl):
    config = CrawlConfig(
        domain_filter=r"\.test", host_budget=1, max_rounds=20,
        robots_rfc=True, robots_ttl_rounds=ttl,
    )
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="see_ttl_"), spark)
    run_crawl(
        spark, catalog,
        PhasedFixtureFetcher(spark, [(0, SITE0), (SWITCH_ROUND, SITE1)]),
        config, seeds=["t.test"],
    )
    return catalog.read("frontier").collect()


def _run_oracle(ttl):
    return oracle_crawler.crawl(
        lambda r: SITE0 if r < SWITCH_ROUND else SITE1,
        ["t.test"], r"\.test", host_budget=1,
        robots_rfc=True, robots_ttl_rounds=ttl,
    )


@pytest.mark.parametrize("ttl", [2, None])
def test_crawl_parity_with_phased_robots(spark, ttl):
    rows = _run_engine(spark, ttl)
    oracle = _run_oracle(ttl)
    engine_order = [
        r["url"]
        for r in sorted(
            (r for r in rows if r["fetch_order"] is not None),
            key=lambda r: r["fetch_order"],
        )
    ]
    assert engine_order == oracle.visit_order
    assert {r["url"] for r in rows} == oracle.seen_urls
    states = {r["url"]: (r["state"], r["detail"]) for r in rows}
    expected = {u: (e.state, e.detail) for u, e in oracle.frontier.items()}
    assert states == expected


def test_ttl_blocks_late_urls(spark):
    states = {r["url"]: r["state"] for r in _run_engine(spark, ttl=2)}
    # chain pages visited throughout
    for u in ("http://t.test/", "http://t.test/p1", "http://t.test/p2",
              "http://t.test/p3"):
        assert states[u] == "visited", u
    # every /late URL still unvisited at the TTL refetch got blocked
    blocked = [u for u, s in states.items() if s == "robots_blocked"]
    assert blocked and all("/late" in u for u in blocked)


def test_no_ttl_keeps_stale_allow(spark):
    states = {r["url"]: r["state"] for r in _run_engine(spark, ttl=None)}
    # the round-0 allow-all copy is cached forever: everything visited
    assert all(s == "visited" for s in states.values())
    assert "http://t.test/late2" in states


def test_politeness_audit_hand_values(spark):
    """Violations counted only on real sub-delay gaps; single-fetch hosts
    have NULL min gap and are compliant; unknown hosts get required=0."""
    from see_spark.operators.robots import politeness_audit

    log = spark.createDataFrame(
        [
            # a.test: gaps 2, 10 with min_gap 5 -> one violation
            ("a.test", 100), ("a.test", 102), ("a.test", 112),
            # b.test: gaps 5, 5 with min_gap 5 -> compliant (>= is OK)
            ("b.test", 0), ("b.test", 5), ("b.test", 10),
            # c.test: single fetch -> NULL min gap, compliant
            ("c.test", 7),
            # d.test: not in the delay dimension -> required 0, compliant
            ("d.test", 1), ("d.test", 2),
        ],
        "host string, fetch_ts long",
    )
    delays = spark.createDataFrame(
        [("a.test", 5), ("b.test", 5), ("c.test", 9)],
        "host string, min_gap long",
    )
    rows = {r["host"]: r for r in politeness_audit(log, delays).collect()}
    assert rows["a.test"]["n_violations"] == 1
    assert rows["a.test"]["min_gap_observed"] == 2
    assert rows["a.test"]["is_compliant"] is False
    assert rows["b.test"]["n_violations"] == 0
    assert rows["b.test"]["is_compliant"] is True
    assert rows["c.test"]["min_gap_observed"] is None
    assert rows["c.test"]["is_compliant"] is True
    assert rows["d.test"]["min_gap_required"] == 0
    assert rows["d.test"]["is_compliant"] is True
