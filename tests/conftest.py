"""Shared fixtures: one Spark session per test run, one engine+oracle crawl
of the fixture site reused by all parity tests (both are deterministic)."""

from __future__ import annotations

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from see_spark.session import get_spark

    extra = {}
    if os.environ.get("SEE_ICEBERG") == "1":
        # Opt-in real-Iceberg mode: requires iceberg-spark-runtime on the
        # classpath (absent in this sandbox — no jar, no Maven route; see
        # see_spark/sources/iceberg.py). With the jar present, this makes
        # the parametrized storage-contract suite run against real Iceberg.
        extra = {
            "spark.sql.extensions": (
                "org.apache.iceberg.spark.extensions."
                "IcebergSparkSessionExtensions"
            ),
            "spark.sql.catalog.local": "org.apache.iceberg.spark.SparkCatalog",
            "spark.sql.catalog.local.type": "hadoop",
            "spark.sql.catalog.local.warehouse": tempfile.mkdtemp(
                prefix="see_iceberg_wh_"
            ),
        }
    spark = get_spark(
        cores=4, shuffle_partitions=4, app_name="see_spark_tests",
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def crawl_result(spark):
    """(catalog, round_metrics, oracle_result) for the standard fixture crawl."""
    from oracle import crawler as oracle_crawler
    from see_spark.operators.crawl import CrawlConfig, run_crawl
    from see_spark.sources.catalog import SnapshotCatalog
    from see_spark.sources.fetcher import FixtureFetcher
    from see_spark.sources.fixtures import (
        DOMAIN_FILTER,
        SEED_URLS,
        fixture_robots,
        fixture_site,
    )

    site = fixture_site()
    config = CrawlConfig(domain_filter=DOMAIN_FILTER, host_budget=2, max_rounds=30)
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="see_spark_crawl_"), spark)
    history = run_crawl(
        spark, catalog, FixtureFetcher(spark, site), config,
        seeds=SEED_URLS, robots=fixture_robots(),
    )
    oracle_result = oracle_crawler.crawl(
        site, SEED_URLS, DOMAIN_FILTER, host_budget=2, robots=fixture_robots()
    )
    return catalog, history, oracle_result
