"""The reference's 9 shared storage-contract behaviors
(apps/db/test/see_db_storage_test.hrl:12-67) against the frontier/docs/
postings layer — the same suite that ran against BOTH ETS and Mnesia runs
here against BOTH storage backends: the snapshot-table stand-in always,
and real Iceberg when its runtime is present (skip-marked with the
concrete blocker otherwise — this sandbox has no iceberg jar and no Maven
route; launch pytest with SEE_ICEBERG=1 on a machine that has the jar)."""

import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from see_spark.operators import frontier as frontier_ops
from see_spark.operators import indexer
from see_spark.operators.crawl import CrawlConfig, ingest_seeds
from see_spark.operators.search import search
from see_spark.sources.catalog import SnapshotCatalog
from see_spark.sources.tables import DOCS_SCHEMA

URL = "http://url1/"
URL2 = "http://url2/"


@pytest.fixture(params=["standin", "iceberg"])
def catalog(request, spark):
    if request.param == "standin":
        return SnapshotCatalog(tempfile.mkdtemp(prefix="see_contract_"), spark)
    from see_spark.sources.iceberg import IcebergCatalog, iceberg_available

    reason = iceberg_available(spark)
    if reason:
        pytest.skip(reason)
    if "IcebergSparkSessionExtensions" not in (
        spark.conf.get("spark.sql.extensions", "") or ""
    ):
        pytest.skip(
            "session lacks the Iceberg extension — rerun with SEE_ICEBERG=1"
        )
    return IcebergCatalog(
        tempfile.mkdtemp(prefix="see_iceberg_"), spark,
        db=f"see_{uuid.uuid4().hex[:8]}",  # fresh tables per test
    )


def _checkout(spark, catalog, round_no=0, budget=10):
    f = catalog.read("frontier")
    f = frontier_ops.expire_leases(f, round_no, lease_rounds=2)
    batch = frontier_ops.checkout(f, catalog.read("hoststats"), round_no, budget)
    rows = batch.collect()
    # persist the pending flips like a round would
    merged = f.join(batch.select("url_hash").withColumn("__c", F.lit(1)), "url_hash", "left").select(
        "url", "url_hash", "host", "depth", "seq",
        F.when(F.col("__c").isNotNull(), F.lit("pending")).otherwise(F.col("state")).alias("state"),
        "detail", "discovered_in_round", "fetched_in_round", "fetch_order",
        F.when(F.col("__c").isNotNull(), F.lit(round_no)).otherwise(F.col("checkout_round")).alias("checkout_round"),
    )
    catalog.commit("frontier", merged, {"round": round_no})
    return sorted(r["url"] for r in rows)


def _update_url(spark, catalog, url, title, words, round_no=0):
    """update_url analogue (O3): docs upsert + postings delta re-index."""
    spans = [
        {"kind": "text", "text": w, "media_ref": None, "offset": i}
        for i, w in enumerate(words)
    ]
    new_doc = spark.createDataFrame(
        [(url, title, spans, round_no)], DOCS_SCHEMA
    )
    docs = catalog.read("docs")
    catalog.commit(
        "docs", docs.join(new_doc.select("doc_id"), "doc_id", "left_anti").unionByName(new_doc)
    )
    postings = catalog.read("postings")
    kept = postings.join(new_doc.select("doc_id"), "doc_id", "left_anti")
    catalog.commit("postings", kept.unionByName(indexer.postings_from_docs(new_doc)))
    # frontier: pending -> visited
    f = catalog.read("frontier")
    catalog.commit(
        "frontier",
        f.withColumn(
            "state",
            F.when(F.col("url") == url, F.lit("visited")).otherwise(F.col("state")),
        ),
    )


def _search_word(spark, catalog, word):
    res = search(
        spark, word, catalog.read("postings"), catalog.read("docs"),
        max(catalog.read("frontier").count(), 1),
    )
    return sorted((r["url"], r["title"]) for r in res.collect())


def test_empty_frontier_checkout_nothing(spark, catalog):
    assert catalog.read("frontier").count() == 0
    assert _checkout(spark, catalog) == []


def test_added_url_checked_out_once(spark, catalog):
    ingest_seeds(spark, catalog, [URL], CrawlConfig()).collect()
    assert catalog.read("frontier").count() == 1
    assert _checkout(spark, catalog, 0) == [URL]
    assert _checkout(spark, catalog, 1) == []  # dequeue-once


def test_pending_requeued_after_lease_expiry(spark, catalog):
    ingest_seeds(spark, catalog, [URL], CrawlConfig()).collect()
    assert _checkout(spark, catalog, 0) == [URL]
    assert _checkout(spark, catalog, 1) == []  # lease still held
    assert _checkout(spark, catalog, 2) == [URL]  # lease_rounds=2 expired


def test_update_url_adds_to_index(spark, catalog):
    ingest_seeds(spark, catalog, [URL], CrawlConfig()).collect()
    _checkout(spark, catalog)
    _update_url(spark, catalog, URL, "Page title", ["word1", "word2"])
    assert _search_word(spark, catalog, "word1") == [(URL, "Page title")]
    assert _search_word(spark, catalog, "word2") == [(URL, "Page title")]


def test_get_words_returns_page_words(spark, catalog):
    ingest_seeds(spark, catalog, [URL], CrawlConfig()).collect()
    _checkout(spark, catalog)
    _update_url(spark, catalog, URL, "Page title", ["word1", "word2"])
    rows = catalog.read("postings").filter(F.col("doc_id") == URL).collect()
    assert sorted(r["word"] for r in rows) == ["word1", "word2"]
    assert all(r["doc_len"] == 2 for r in rows)


def test_revisit_updates_index_removes_old_postings(spark, catalog):
    ingest_seeds(spark, catalog, [URL], CrawlConfig()).collect()
    _checkout(spark, catalog)
    _update_url(spark, catalog, URL, "Page title", ["word1"])
    _update_url(spark, catalog, URL, "Page title", ["word2"])
    assert _search_word(spark, catalog, "word1") == []
    assert _search_word(spark, catalog, "word2") == [(URL, "Page title")]


def test_two_urls_same_word_both_indexed(spark, catalog):
    ingest_seeds(spark, catalog, [URL, URL2], CrawlConfig()).collect()
    _checkout(spark, catalog)
    _update_url(spark, catalog, URL, "Page title", ["word1"])
    _update_url(spark, catalog, URL2, "Page title 2", ["word1"])
    assert _search_word(spark, catalog, "word1") == [
        (URL, "Page title"),
        (URL2, "Page title 2"),
    ]


def test_add_url_when_indexed_is_noop(spark, catalog):
    cfg = CrawlConfig()
    ingest_seeds(spark, catalog, [URL], cfg).collect()
    _checkout(spark, catalog)
    _update_url(spark, catalog, URL, "Page title", ["word1"])
    ingest_seeds(spark, catalog, [URL], cfg).collect()  # re-add
    f = catalog.read("frontier").collect()
    assert len(f) == 1 and f[0]["state"] == "visited"
    assert _search_word(spark, catalog, "word1") == [(URL, "Page title")]


def test_no_url_with_word_empty(spark, catalog):
    assert _search_word(spark, catalog, "word1") == []
