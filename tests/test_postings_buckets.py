"""Physically bucketed postings + partition-pruned search reads: the
parquet mirror of the Iceberg DDL's ``bucket(word)`` partitioning
(tables.iceberg_ddl). run_round commits postings partitioned on
word_bucket = pmod(xxhash64(word), N_POSTINGS_BUCKETS); the serving
read path resolves the query words' buckets driver-side
(functions.udfs.word_bucket_values) and opens ONLY those directories
(SnapshotCatalog.read_parts) — the property that makes a 5-word query
read ~5/N of a 100-TB index instead of every file."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from see_spark.functions.udfs import word_bucket_values
from see_spark.sources.catalog import SnapshotCatalog
from see_spark.sources.tables import N_POSTINGS_BUCKETS


def _postings_df(spark, rows):
    df = spark.createDataFrame(
        rows, "word string, doc_id string, term_count long, doc_len long, tf double"
    )
    return df.withColumn(
        "word_bucket",
        F.pmod(F.xxhash64("word"), F.lit(N_POSTINGS_BUCKETS)).cast("int"),
    )


ROWS = [
    ("alpha", "d1", 2, 4, 0.5),
    ("beta", "d1", 2, 4, 0.5),
    ("gamma", "d2", 3, 3, 1.0),
    ("delta", "d3", 1, 5, 0.2),
    ("epsilon", "d3", 4, 5, 0.8),
]


def test_bucket_values_match_index_writer(spark):
    """Driver-side bucket ids equal the column the index writer stamps."""
    df = _postings_df(spark, ROWS)
    by_word = {r["word"]: r["word_bucket"] for r in df.collect()}
    for word, bucket in by_word.items():
        assert word_bucket_values(spark, [word]) == [bucket]
    allb = word_bucket_values(spark, list(by_word))
    assert allb == sorted(set(by_word.values()))
    assert word_bucket_values(spark, []) == []


def test_read_parts_prunes_directories(spark):
    """Only the wanted buckets' files are opened (inputFiles shrinks),
    and the pruned rows are exactly the full read's matching rows."""
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="buckets_"), spark)
    df = _postings_df(spark, ROWS)
    catalog.commit_delta(
        "postings", partition_col="word_bucket", appended=df, meta={"round": 0}
    )
    buckets = word_bucket_values(spark, ["alpha", "gamma"])
    pruned = catalog.read_parts("postings", "word_bucket", buckets)
    full = catalog.read("postings")
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    got = {(r["word"], r["doc_id"]) for r in pruned.collect()}
    want = {
        (r["word"], r["doc_id"])
        for r in full.filter(F.col("word_bucket").isin(buckets)).collect()
    }
    assert got == want
    assert {"alpha", "gamma"} <= {w for w, _ in got}


def test_read_parts_mixed_manifest_stays_exact(spark):
    """Legacy unpartitioned appends ('__rows__') can hold any bucket:
    read_parts must include them AND apply the residual filter."""
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="buckets_mix_"), spark)
    old = _postings_df(spark, ROWS[:2])
    catalog.commit_delta("postings", appended=old, meta={"round": 0})  # flat
    new = _postings_df(spark, ROWS[2:])
    catalog.commit_delta(
        "postings", partition_col="word_bucket", appended=new, meta={"round": 1}
    )
    buckets = word_bucket_values(spark, ["alpha", "delta"])
    got = {r["word"] for r in
           catalog.read_parts("postings", "word_bucket", buckets).collect()}
    # alpha came from the flat legacy dir, delta from a bucketed dir;
    # beta (legacy, other bucket) must be filtered out unless it shares
    # a bucket with a wanted word
    assert "alpha" in got and "delta" in got
    beta_b = word_bucket_values(spark, ["beta"])[0]
    if beta_b not in buckets:
        assert "beta" not in got


def test_run_round_commits_bucketed_postings(crawl_result):
    """The crawl's postings manifest is keyed by bucket ids (not
    '__rows__'), every row's stored bucket matches its word's hash, and
    a pruned single-word read returns exactly that word's postings."""
    catalog, _metrics, _oracle = crawl_result
    parts = catalog.parts("postings")
    keys = set(parts) - {"__all__", "__rows__"}
    assert keys, "postings manifest has no bucketed partitions"
    assert all(k.isdigit() and 0 <= int(k) < N_POSTINGS_BUCKETS for k in keys)
    spark = catalog.spark
    full = catalog.read("postings")
    bad = full.filter(
        F.col("word_bucket")
        != F.pmod(F.xxhash64("word"), F.lit(N_POSTINGS_BUCKETS)).cast("int")
    ).count()
    assert bad == 0
    word = full.select("word").first()["word"]
    buckets = word_bucket_values(spark, [word])
    pruned = catalog.read_parts("postings", "word_bucket", buckets)
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    got = {(r["word"], r["doc_id"]) for r in
           pruned.filter(F.col("word") == word).collect()}
    want = {(r["word"], r["doc_id"]) for r in
            full.filter(F.col("word") == word).collect()}
    assert got == want and got


def test_serving_pruned_equals_full_read(spark, crawl_result):
    """End contract: pruned serving results == results over the full
    postings read, for tfidf and bm25."""
    from see_spark.operators.search import search
    from see_spark.serving import search_results

    catalog, _metrics, _oracle = crawl_result
    for q in ("composer", "Chopin", "banach functional analysis"):
        served = search_results(spark, catalog, q, k=100, with_score=True)
        full = search(
            spark, q, catalog.read("postings"),
            catalog.read("docs"), catalog.read("frontier").count(), k=100,
            word_stats=catalog.read("word_stats"),
        ).collect()
        assert [(r["url"], r["score"]) for r in served] == [
            (r["url"], r["score"]) for r in full
        ]
