"""RFC 9309 robots mode end-to-end: the engine fetches + parses each
host's robots.txt through the SAME fetcher, gates with full allow/disallow
precedence, and stays byte-identical to the oracle crawler running the
same kernel lazily."""

import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def rfc_crawl(spark):
    from oracle import crawler as oracle_crawler
    from see_spark.operators.crawl import CrawlConfig, run_crawl
    from see_spark.sources.catalog import SnapshotCatalog
    from see_spark.sources.fetcher import FixtureFetcher
    from see_spark.sources.fixtures import (
        DOMAIN_FILTER,
        SEED_URLS,
        fixture_site_rfc,
    )

    site = fixture_site_rfc()
    config = CrawlConfig(
        domain_filter=DOMAIN_FILTER, host_budget=2, max_rounds=30,
        robots_rfc=True,
    )
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="see_spark_rfc_"), spark)
    history = run_crawl(
        spark, catalog, FixtureFetcher(spark, site), config, seeds=SEED_URLS
    )
    oracle = oracle_crawler.crawl(
        site, SEED_URLS, DOMAIN_FILTER, host_budget=2, robots_rfc=True
    )
    return catalog, history, oracle


def test_rfc_visit_order_matches_oracle(rfc_crawl):
    catalog, _, oracle = rfc_crawl
    rows = catalog.read("frontier").collect()
    engine_order = [
        r["url"]
        for r in sorted(
            (r for r in rows if r["fetch_order"] is not None),
            key=lambda r: r["fetch_order"],
        )
    ]
    assert engine_order == oracle.visit_order


def test_rfc_seen_set_and_states_match_oracle(rfc_crawl):
    catalog, _, oracle = rfc_crawl
    engine = {
        r["url"]: (r["state"], r["detail"])
        for r in catalog.read("frontier").collect()
    }
    expected = {u: (e.state, e.detail) for u, e in oracle.frontier.items()}
    assert engine == expected


def test_rfc_precedence_outcomes(rfc_crawl):
    """The interesting RFC cases actually fired: anchored wildcard blocks
    the png; the longer Allow overrides the /search Disallow; the decoy
    other-agent group is ignored; site-b prefix rule still blocks."""
    catalog, _, _ = rfc_crawl
    states = {r["url"]: r["state"] for r in catalog.read("frontier").collect()}
    assert states["http://site-a.test/img/logo.png"] == "robots_blocked"
    assert states["http://site-a.test/search?q=erlang"] == "visited"
    assert states["http://site-b.test/private/secret.txt"] == "robots_blocked"
    assert states["http://site-a.test/"] == "visited"  # decoy group ignored


def test_robots_fetched_once_per_host(rfc_crawl):
    catalog, _, _ = rfc_crawl
    dim = catalog.read("robots_rfc").collect()
    hosts = [r["host"] for r in dim]
    assert sorted(hosts) == sorted(set(hosts))  # no refetch, ever
    assert set(hosts) >= {"site-a.test", "site-b.test"}
    by_host = {r["host"]: r for r in dim}
    assert by_host["site-a.test"].sitemaps == ["http://site-a.test/sitemap.xml"]


def test_robots_urls_stay_out_of_frontier(rfc_crawl):
    catalog, _, oracle = rfc_crawl
    urls = {r["url"] for r in catalog.read("frontier").collect()}
    assert not any(u.endswith("/robots.txt") for u in urls)
    assert not any(u.endswith("/robots.txt") for u in oracle.visit_order)


def test_rfc_mode_deterministic_across_reruns(spark, rfc_crawl):
    from see_spark.operators.crawl import CrawlConfig, run_crawl
    from see_spark.sources.catalog import SnapshotCatalog
    from see_spark.sources.fetcher import FixtureFetcher
    from see_spark.sources.fixtures import (
        DOMAIN_FILTER,
        SEED_URLS,
        fixture_site_rfc,
    )

    config = CrawlConfig(
        domain_filter=DOMAIN_FILTER, host_budget=2, max_rounds=30,
        robots_rfc=True,
    )
    catalog2 = SnapshotCatalog(tempfile.mkdtemp(prefix="see_spark_rfc2_"), spark)
    run_crawl(
        spark, catalog2, FixtureFetcher(spark, fixture_site_rfc()), config,
        seeds=SEED_URLS,
    )
    catalog1, _, _ = rfc_crawl
    key = lambda r: (r["url"], r["state"], r["seq"], r["fetch_order"])  # noqa: E731
    assert sorted(map(key, catalog2.read("frontier").collect())) == sorted(
        map(key, catalog1.read("frontier").collect())
    )
