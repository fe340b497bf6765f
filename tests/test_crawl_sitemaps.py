"""Sitemap seeding end-to-end (CrawlConfig.use_sitemaps): the engine
fetches sitemaps declared by each new host's robots.txt through the SAME
fetcher, follows <sitemapindex> nesting breadth-first, enqueues extracted
page URLs after the round's link discoveries — and stays byte-identical
to the oracle crawler running the same rules."""

import tempfile

import pytest


@pytest.fixture(scope="module")
def sm_crawl(spark):
    from oracle import crawler as oracle_crawler
    from see_spark.operators.crawl import CrawlConfig, run_crawl
    from see_spark.sources.catalog import SnapshotCatalog
    from see_spark.sources.fetcher import FixtureFetcher
    from see_spark.sources.fixtures import (
        DOMAIN_FILTER,
        SEED_URLS,
        fixture_site_sitemaps,
    )

    site = fixture_site_sitemaps()
    config = CrawlConfig(
        domain_filter=DOMAIN_FILTER, host_budget=2, max_rounds=30,
        robots_rfc=True, use_sitemaps=True,
    )
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="see_spark_sm_"), spark)
    history = run_crawl(
        spark, catalog, FixtureFetcher(spark, site), config, seeds=SEED_URLS
    )
    oracle = oracle_crawler.crawl(
        site, SEED_URLS, DOMAIN_FILTER, host_budget=2, robots_rfc=True,
        use_sitemaps=True,
    )
    return catalog, history, oracle


def test_sitemap_visit_order_matches_oracle(sm_crawl):
    catalog, _, oracle = sm_crawl
    rows = catalog.read("frontier").collect()
    engine_order = [
        r["url"]
        for r in sorted(
            (r for r in rows if r["fetch_order"] is not None),
            key=lambda r: r["fetch_order"],
        )
    ]
    assert engine_order == oracle.visit_order


def test_sitemap_seen_set_states_and_seq_match_oracle(sm_crawl):
    catalog, _, oracle = sm_crawl
    engine = {
        r["url"]: (r["state"], r["detail"], r["seq"], r["depth"])
        for r in catalog.read("frontier").collect()
    }
    expected = {
        u: (e.state, e.detail, e.seq, e.depth)
        for u, e in oracle.frontier.items()
    }
    assert engine == expected


def test_sitemap_only_pages_reached_and_filters_hold(sm_crawl):
    catalog, _, _ = sm_crawl
    states = {r["url"]: r["state"] for r in catalog.read("frontier").collect()}
    # reachable only through sitemaps — and its own links crawl onward
    assert states["http://site-a.test/sitemap-only/hidden.html"] == "visited"
    assert states["http://site-a.test/from-hidden.html"] == "visited"
    # entity-escaped loc decoded
    assert states["http://site-a.test/q?a=1&b=2"] == "visited"
    # robots still gates sitemap-discovered URLs
    assert states["http://site-a.test/img/extra.png"] == "robots_blocked"
    # new host entered via a sitemap loc; its own sitemap then fired
    assert states["http://site-c.test/start.html"] == "visited"
    assert states["http://site-c.test/deep.html"] == "visited"
    assert states["http://site-c.test/private/x.html"] == "robots_blocked"
    # domain filter still applies to sitemap locs
    assert "http://external.example/nope" not in states


def test_sitemap_fetch_ledger_once_ever(sm_crawl):
    catalog, _, _ = sm_crawl
    ledger = catalog.read("sitemaps_fetched").collect()
    urls = [r["url"] for r in ledger]
    assert sorted(urls) == sorted(set(urls))  # no refetch, ever
    by_url = {r["url"]: r for r in ledger}
    assert set(by_url) == {
        "http://site-a.test/sitemap.xml",
        "http://site-a.test/sm-pages.xml",
        "http://site-a.test/sm-broken.xml",
        "http://site-c.test/sitemap.xml",
    }
    assert by_url["http://site-a.test/sitemap.xml"]["n_nested"] == 2
    assert by_url["http://site-a.test/sm-pages.xml"]["n_urls"] == 6
    assert by_url["http://site-a.test/sm-broken.xml"]["n_urls"] == 0


def test_sitemap_urls_stay_out_of_frontier(sm_crawl):
    catalog, _, oracle = sm_crawl
    urls = {r["url"] for r in catalog.read("frontier").collect()}
    assert not any(u.endswith(".xml") for u in urls)
    assert not any(u.endswith(".xml") for u in oracle.visit_order)


def test_blocked_host_sitemap_continues_crawl(spark):
    """Zero-checkout round: every seed URL robots-blocked, but the robots'
    sitemap names another host — the crawl must enqueue it and continue
    (run_round's early-return branch + run_crawl's discovered check)."""
    from oracle import crawler as oracle_crawler
    from see_spark.operators.crawl import CrawlConfig, run_crawl
    from see_spark.sources.catalog import SnapshotCatalog
    from see_spark.sources.fetcher import FixtureFetcher
    from see_spark.sources.fixtures import (
        DOMAIN_FILTER,
        fixture_site_blocked_with_sitemap,
    )

    site = fixture_site_blocked_with_sitemap()
    seeds = ["site-z.test"]
    config = CrawlConfig(
        domain_filter=DOMAIN_FILTER, host_budget=2, max_rounds=10,
        robots_rfc=True, use_sitemaps=True,
    )
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="see_spark_smz_"), spark)
    history = run_crawl(
        spark, catalog, FixtureFetcher(spark, site), config, seeds=seeds
    )
    oracle = oracle_crawler.crawl(
        site, seeds, DOMAIN_FILTER, host_budget=2, robots_rfc=True,
        use_sitemaps=True,
    )
    engine = {
        r["url"]: (r["state"], r["seq"], r["fetch_order"])
        for r in catalog.read("frontier").collect()
    }
    expected = {
        u: (e.state, e.seq, e.fetch_order) for u, e in oracle.frontier.items()
    }
    assert engine == expected
    assert engine["http://site-z.test/"][0] == "robots_blocked"
    assert engine["http://site-y.test/open.html"][0] == "visited"
    assert history[0].checked_out == 0 and history[0].discovered == 1


def test_sitemaps_off_is_unchanged(spark):
    """The same site crawled WITHOUT use_sitemaps matches the plain RFC
    oracle — sitemap wiring is inert unless enabled."""
    from oracle import crawler as oracle_crawler
    from see_spark.operators.crawl import CrawlConfig, run_crawl
    from see_spark.sources.catalog import SnapshotCatalog
    from see_spark.sources.fetcher import FixtureFetcher
    from see_spark.sources.fixtures import (
        DOMAIN_FILTER,
        SEED_URLS,
        fixture_site_sitemaps,
    )

    site = fixture_site_sitemaps()
    config = CrawlConfig(
        domain_filter=DOMAIN_FILTER, host_budget=2, max_rounds=30,
        robots_rfc=True,
    )
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="see_spark_smoff_"), spark)
    run_crawl(
        spark, catalog, FixtureFetcher(spark, site), config, seeds=SEED_URLS
    )
    oracle = oracle_crawler.crawl(
        site, SEED_URLS, DOMAIN_FILTER, host_budget=2, robots_rfc=True
    )
    engine = {
        r["url"]: (r["state"], r["seq"]) for r in catalog.read("frontier").collect()
    }
    assert engine == {
        u: (e.state, e.seq) for u, e in oracle.frontier.items()
    }
    assert catalog.read("sitemaps_fetched").isEmpty()


def test_feed_seed_urls_rel_rules_and_order(spark):
    """Atom rel=self/hub/enclosure are plumbing, not page links; RSS text
    links keep document order; malformed tails extract what they can."""
    from see_spark.operators.robots import feed_seed_urls

    rss = (
        "<rss><channel><link>http://h.test/</link>"
        "<item><link> http://h.test/a1 </link></item>"
        "<item><link>http://h.test/a2</link></item>"
        "<item><link></link></item>"  # empty -> dropped
        "</channel></rss"  # malformed tail: truncated close
    )
    atom = (
        '<feed><link rel="self" href="http://h.test/feed"/>'
        '<link rel="hub" href="http://hub.test/"/>'
        '<link href="http://h.test/e1"/>'
        "<link rel='alternate' href='http://h.test/e2'/>"
        '<link rel="enclosure" href="http://h.test/x.mp3"/>'
        '<entry><link href="http://h.test/e3"/></entry></feed>'
    )
    feeds = spark.createDataFrame(
        [("http://h.test/feed.rss", rss), ("http://h.test/feed.atom", atom)],
        "url string, body string",
    )
    rows = sorted(
        map(tuple, feed_seed_urls(feeds).collect()),
        key=lambda r: (r[2], r[3]),
    )
    assert rows == [
        ("http://h.test/e1", "http://h.test/feed.atom", "atom", 0),
        ("http://h.test/e2", "http://h.test/feed.atom", "atom", 1),
        ("http://h.test/e3", "http://h.test/feed.atom", "atom", 2),
        ("http://h.test/", "http://h.test/feed.rss", "rss", 0),
        ("http://h.test/a1", "http://h.test/feed.rss", "rss", 1),
        ("http://h.test/a2", "http://h.test/feed.rss", "rss", 2),
    ]
