"""End-to-end crawl parity: Spark engine vs the pure-Python oracle.

Mirrors the reference's common_test integration layer (SURVEY §5.3 /
ct/see/see_SUITE.erl) with the assertions BASELINE.json demands:
(a) crawl ordering byte-equality, (b) URL-seen set equality, (c) per-row
span-sequence equality (kind, text, media_ref, order), plus state/detail
parity and postings equality.
"""

from pyspark.sql import functions as F


def _frontier_rows(catalog):
    return catalog.read("frontier").collect()


def test_crawl_order_matches_oracle(crawl_result):
    catalog, _, oracle = crawl_result
    rows = _frontier_rows(catalog)
    engine_order = [
        r["url"]
        for r in sorted(
            (r for r in rows if r["fetch_order"] is not None),
            key=lambda r: r["fetch_order"],
        )
    ]
    assert engine_order == oracle.visit_order


def test_url_seen_set_matches_oracle(crawl_result):
    catalog, _, oracle = crawl_result
    rows = _frontier_rows(catalog)
    assert {r["url"] for r in rows} == oracle.seen_urls


def test_states_and_details_match_oracle(crawl_result):
    catalog, _, oracle = crawl_result
    engine = {
        r["url"]: (r["state"], r["detail"]) for r in _frontier_rows(catalog)
    }
    expected = {u: (e.state, e.detail) for u, e in oracle.frontier.items()}
    assert engine == expected


def test_depth_and_seq_match_oracle(crawl_result):
    catalog, _, oracle = crawl_result
    engine = {r["url"]: (r["depth"], r["seq"]) for r in _frontier_rows(catalog)}
    expected = {u: (e.depth, e.seq) for u, e in oracle.frontier.items()}
    assert engine == expected


def test_span_sequences_match_oracle(crawl_result):
    """input_hint per-row invariant: (kind, text, media_ref, order)."""
    catalog, _, oracle = crawl_result
    docs = catalog.read("docs").collect()
    engine = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in docs
    }
    expected = {
        url: [tuple(s) for s in d["spans"]] for url, d in oracle.docs.items()
    }
    assert engine == expected


def test_titles_match_oracle(crawl_result):
    catalog, _, oracle = crawl_result
    docs = catalog.read("docs").collect()
    assert {r["doc_id"]: r["title"] for r in docs} == {
        u: d["title"] for u, d in oracle.docs.items()
    }


def test_postings_match_oracle(crawl_result):
    catalog, _, oracle = crawl_result
    rows = catalog.read("postings").collect()
    engine = {(r["word"], r["doc_id"]): (r["term_count"], r["doc_len"]) for r in rows}
    expected = {}
    for word, by_doc in oracle.postings.items():
        for url, cnt in by_doc.items():
            expected[(word, url)] = (cnt, oracle.doc_len[url])
    assert engine == expected


def test_media_pages_recorded_never_indexed(crawl_result):
    catalog, _, oracle = crawl_result
    media = [
        r
        for r in catalog.read("docs").collect()
        if any(s["kind"] == "media" for s in r["spans"])
    ]
    assert {r["doc_id"] for r in media} == {
        "http://site-a.test/img/logo.png"
    }
    indexed = {r["doc_id"] for r in catalog.read("postings").collect()}
    assert "http://site-a.test/img/logo.png" not in indexed


def test_robots_blocked_never_fetched(crawl_result):
    catalog, _, oracle = crawl_result
    blocked = [
        r for r in _frontier_rows(catalog) if r["state"] == "robots_blocked"
    ]
    assert {r["url"] for r in blocked} == {
        "http://site-b.test/private/secret.txt"
    }
    assert all(r["fetched_in_round"] is None for r in blocked)


def test_cross_host_filtered_urls_absent(crawl_result):
    catalog, _, _ = crawl_result
    assert (
        catalog.read("frontier").filter(~F.col("host").rlike(r"\.test")).count() == 0
    )


def test_politeness_budget_respected(crawl_result):
    catalog, _, _ = crawl_result
    per_round_host = (
        catalog.read("frontier")
        .filter(F.col("fetched_in_round").isNotNull())
        .groupBy("fetched_in_round", "host")
        .count()
        .collect()
    )
    assert all(r["count"] <= 2 for r in per_round_host)


def test_sharded_bloom_crawl_matches_flat(spark, crawl_result):
    """The bloom topology (flat broadcast vs sharded cogroup) is a physical
    choice only: forcing the sharded path (non-power-of-two shard count to
    exercise signed pmod routing) must reproduce the byte-identical
    frontier — url-seen set, states, seq, and fetch order."""
    import tempfile

    from see_spark.operators.crawl import CrawlConfig, run_crawl
    from see_spark.sources.catalog import SnapshotCatalog
    from see_spark.sources.fetcher import FixtureFetcher
    from see_spark.sources.fixtures import (
        DOMAIN_FILTER,
        SEED_URLS,
        fixture_robots,
        fixture_site,
    )

    config = CrawlConfig(
        domain_filter=DOMAIN_FILTER, host_budget=2, max_rounds=30,
        use_sharded_bloom=True, bloom_shards=5,
    )
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="see_spark_shard_"), spark)
    run_crawl(
        spark, catalog, FixtureFetcher(spark, fixture_site()), config,
        seeds=SEED_URLS, robots=fixture_robots(),
    )
    flat_catalog, _, _ = crawl_result
    key = lambda r: (r["url"], r["state"], r["seq"], r["fetch_order"])  # noqa: E731
    assert sorted(map(key, catalog.read("frontier").collect())) == sorted(
        map(key, flat_catalog.read("frontier").collect())
    )


def test_lineage_columns_populated(crawl_result):
    catalog, _, _ = crawl_result
    rows = _frontier_rows(catalog)
    assert all(r["discovered_in_round"] is not None for r in rows)
    fetched = [r for r in rows if r["fetch_order"] is not None]
    assert all(r["fetched_in_round"] is not None for r in fetched)
