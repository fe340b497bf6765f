"""Crawl-delay politeness (CrawlConfig.honor_crawl_delay): a robots
Crawl-delay becomes a per-host checkout gap in rounds
(max(min_gap_rounds, ceil(delay / seconds_per_round))), byte-identical to
the oracle crawler under the same rule."""

import tempfile

import pytest


@pytest.fixture(scope="module")
def cd_crawl(spark):
    from oracle import crawler as oracle_crawler
    from see_spark.operators.crawl import CrawlConfig, run_crawl
    from see_spark.sources.catalog import SnapshotCatalog
    from see_spark.sources.fetcher import FixtureFetcher
    from see_spark.sources.fixtures import (
        DOMAIN_FILTER,
        SEED_URLS,
        fixture_site_crawl_delay,
    )

    site = fixture_site_crawl_delay()
    config = CrawlConfig(
        domain_filter=DOMAIN_FILTER, host_budget=2, max_rounds=40,
        robots_rfc=True, honor_crawl_delay=True,
    )
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="see_spark_cd_"), spark)
    history = run_crawl(
        spark, catalog, FixtureFetcher(spark, site), config, seeds=SEED_URLS
    )
    oracle = oracle_crawler.crawl(
        site, SEED_URLS, DOMAIN_FILTER, host_budget=2, robots_rfc=True,
        honor_crawl_delay=True,
    )
    return catalog, history, oracle


def test_crawl_delay_parity_with_oracle(cd_crawl):
    catalog, _, oracle = cd_crawl
    rows = catalog.read("frontier").collect()
    engine_order = [
        r["url"]
        for r in sorted(
            (r for r in rows if r["fetch_order"] is not None),
            key=lambda r: r["fetch_order"],
        )
    ]
    assert engine_order == oracle.visit_order
    engine = {
        r["url"]: (r["state"], r["seq"], r["fetched_in_round"]) for r in rows
    }
    expected = {
        u: (e.state, e.seq, e.fetched_in_round)
        for u, e in oracle.frontier.items()
    }
    assert engine == expected


def test_crawl_delay_spaces_host_rounds(cd_crawl):
    """site-a (Crawl-delay: 3) fetch rounds are >= 3 apart; site-b
    (no delay) fetch rounds can be adjacent — the delay actually bit."""
    catalog, _, _ = cd_crawl
    rows = [
        (r["host"], r["fetched_in_round"])
        for r in catalog.read("frontier").collect()
        if r["fetched_in_round"] is not None
    ]
    rounds_a = sorted({rd for h, rd in rows if h == "site-a.test"})
    rounds_b = sorted({rd for h, rd in rows if h == "site-b.test"})
    assert len(rounds_a) >= 3  # site-a has >4 fetchable pages at budget 2
    assert all(b - a >= 3 for a, b in zip(rounds_a, rounds_a[1:]))
    assert any(b - a == 1 for a, b in zip(rounds_b, rounds_b[1:])) or len(
        rounds_b
    ) <= 1


def test_crawl_delay_off_is_unchanged(spark, cd_crawl):
    """Same site with honor_crawl_delay=False matches the plain RFC
    oracle — the delay wiring is inert unless enabled."""
    from oracle import crawler as oracle_crawler
    from see_spark.operators.crawl import CrawlConfig, run_crawl
    from see_spark.sources.catalog import SnapshotCatalog
    from see_spark.sources.fetcher import FixtureFetcher
    from see_spark.sources.fixtures import (
        DOMAIN_FILTER,
        SEED_URLS,
        fixture_site_crawl_delay,
    )

    site = fixture_site_crawl_delay()
    config = CrawlConfig(
        domain_filter=DOMAIN_FILTER, host_budget=2, max_rounds=30,
        robots_rfc=True,
    )
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="see_spark_cdoff_"), spark)
    run_crawl(
        spark, catalog, FixtureFetcher(spark, site), config, seeds=SEED_URLS
    )
    oracle = oracle_crawler.crawl(
        site, SEED_URLS, DOMAIN_FILTER, host_budget=2, robots_rfc=True
    )
    engine = {
        r["url"]: (r["state"], r["seq"], r["fetched_in_round"])
        for r in catalog.read("frontier").collect()
    }
    assert engine == {
        u: (e.state, e.seq, e.fetched_in_round)
        for u, e in oracle.frontier.items()
    }
    # and the delayed run really took MORE rounds for site-a
    cd_catalog, _, _ = cd_crawl
    delayed_rounds = {
        r["fetched_in_round"]
        for r in cd_catalog.read("frontier").collect()
        if r["fetched_in_round"] is not None and r["host"] == "site-a.test"
    }
    plain_rounds = {
        r["fetched_in_round"]
        for r in catalog.read("frontier").collect()
        if r["fetched_in_round"] is not None and r["host"] == "site-a.test"
    }
    assert max(delayed_rounds) > max(plain_rounds)
