"""Checkpoint/resume semantics + the determinism contract of the dense
sequence assignment (SURVEY §7.0 hazard 1, §7.1 step 4)."""

import tempfile

import pytest
from pyspark.sql import functions as F

from see_spark.functions.seq import with_dense_sequence
from see_spark.operators.crawl import CrawlConfig, run_crawl
from see_spark.sources.catalog import SnapshotCatalog
from see_spark.sources.fetcher import FixtureFetcher
from see_spark.sources.fixtures import (
    DOMAIN_FILTER,
    SEED_URLS,
    fixture_robots,
    fixture_site,
)


def _final_state(catalog):
    rows = catalog.read("frontier").collect()
    return sorted(
        (r["url"], r["state"], r["depth"], r["seq"], r["fetch_order"]) for r in rows
    )


def test_resume_mid_frontier_equals_uninterrupted(spark, crawl_result):
    """Kill the crawl after 2 rounds; resume; final tables must equal the
    uninterrupted run's (resumable-mid-frontier, north rule)."""
    site = fixture_site()
    config2 = CrawlConfig(domain_filter=DOMAIN_FILTER, host_budget=2, max_rounds=2)
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="see_resume_"), spark)
    fetcher = FixtureFetcher(spark, site)
    run_crawl(spark, catalog, fetcher, config2, seeds=SEED_URLS, robots=fixture_robots())
    assert catalog.last_committed_round() == 1  # rounds 0,1 ran

    # resume with a fresh catalog handle (new "driver"), run to completion
    catalog2 = SnapshotCatalog(catalog.root, spark)
    config_full = CrawlConfig(domain_filter=DOMAIN_FILTER, host_budget=2, max_rounds=30)
    run_crawl(spark, catalog2, fetcher, config_full)

    reference_catalog, _, _ = crawl_result
    assert _final_state(catalog2) == _final_state(reference_catalog)


def test_torn_commit_rolled_back_on_resume(spark):
    """A table snapshot committed for round N without the round checkpoint
    (crash between table commits) is discarded by resume_point()."""
    site = fixture_site()
    config = CrawlConfig(domain_filter=DOMAIN_FILTER, host_budget=2, max_rounds=2)
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="see_torn_"), spark)
    fetcher = FixtureFetcher(spark, site)
    run_crawl(spark, catalog, fetcher, config, seeds=SEED_URLS, robots=fixture_robots())
    good = catalog.current_snapshot("frontier")

    # simulate a torn round-2 commit: frontier written, checkpoint missing
    torn = catalog.read("frontier").filter(F.col("depth") == 0)
    catalog.commit("frontier", torn, {"round": 2})
    assert catalog.current_snapshot("frontier") != good

    next_round = catalog.resume_point()
    assert next_round == 2
    assert catalog.current_snapshot("frontier") == good


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_dense_sequence_invariant_across_partitioning(spark, parts):
    df = spark.range(0, 500).select(
        (F.col("id") * 7919 % 500).alias("key"), F.col("id").alias("payload")
    ).repartition(5)
    out = with_dense_sequence(df, ["key"], "seq", start=10, num_partitions=parts)
    rows = out.collect()
    mapping = {r["key"]: r["seq"] for r in rows}
    # key k (a permutation of 0..499) must get seq 10 + rank(k)
    assert mapping == {k: 10 + k for k in range(500)}


def test_dense_sequence_empty_df(spark):
    df = spark.range(0).select(F.col("id").alias("key"))
    assert with_dense_sequence(df, ["key"], "seq").count() == 0


def test_dense_sequence_values_fallback_path(spark, monkeypatch):
    """Past _MAP_LITERAL_MAX partitions the offsets go through the SQL
    VALUES LocalRelation + broadcast join instead of the create_map
    literal; both must assign identical ranks."""
    import see_spark.functions.seq as seqmod

    df = spark.range(0, 300).select(
        (F.col("id") * 7919 % 300).alias("key")
    ).repartition(4)
    monkeypatch.setattr(seqmod, "_MAP_LITERAL_MAX", 2)
    out = with_dense_sequence(df, ["key"], "seq", start=0, num_partitions=8)
    assert {r["key"]: r["seq"] for r in out.collect()} == {
        k: k for k in range(300)
    }


def test_dense_sequence_plan_has_no_python_stage(spark):
    """The offsets join/literal must never parallelize a Python list —
    that costs defaultParallelism Python-worker round-trip tasks per
    call (the r3 profile's blocked-`parallelize` stages)."""
    df = spark.range(0, 100).select(F.col("id").alias("key")).repartition(3)
    out = with_dense_sequence(df, ["key"], "seq", num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the checkpointed input is an ExistingRDD scan (fine); the OFFSETS
    # must not be one (that's the parallelized-Python-list shape)
    import re

    assert not re.search(r"Scan ExistingRDD\[[^\]]*__off", plan), plan
