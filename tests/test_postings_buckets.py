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


def test_read_parts_compute_col_recovers_preupgrade_files(spark):
    """Parquet files written before word_bucket existed read the column
    as NULL; a bare isin() residual filter would drop every such row.
    With compute_col the filter coalesces through the hash and the
    legacy rows are found."""
    import os

    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="buckets_legacy_"), spark)
    catalog.commit_delta("postings", appended=_postings_df(spark, ROWS),
                         meta={"round": 0})
    # overwrite the appended dir with a FIVE-column layout (pre-upgrade
    # file shape: no word_bucket in the data files)
    rel = catalog.parts("postings")["__rows__"][0]
    path = os.path.join(catalog.root, "postings", rel)
    spark.createDataFrame(
        ROWS,
        "word string, doc_id string, term_count long, doc_len long, tf double",
    ).write.mode("overwrite").parquet(path)
    assert catalog.read("postings").filter(
        F.col("word_bucket").isNull()).count() == len(ROWS)

    buckets = word_bucket_values(spark, ["alpha"])
    compute = F.pmod(F.xxhash64("word"), F.lit(N_POSTINGS_BUCKETS)).cast("int")
    with_compute = catalog.read_parts(
        "postings", "word_bucket", buckets, compute_col=compute
    )
    assert {r["word"] for r in with_compute.collect()} >= {"alpha"}
    # and the recovered set is exactly the rows whose computed bucket matches
    want = {r["word"] for r in
            catalog.read("postings").withColumn("__b", compute)
            .filter(F.col("__b").isin(buckets)).collect()}
    assert {r["word"] for r in with_compute.collect()} == want


def test_serving_bm25_on_catalog_without_corpus_stats_is_unbiased(spark):
    """Review regression: a legacy catalog with no corpus_stats table
    must compute the BM25 avgdl fallback over the FULL postings
    relation, not a bucket-pruned one (which would average only the
    query words' docs). Pinned by score equality with a direct
    full-postings search_bm25."""
    from see_spark.operators.search import search_bm25
    from see_spark.serving import search_results
    from see_spark.sources.tables import (
        STATE_VISITED,
    )

    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="bm25_legacy_"), spark)
    rows = [
        ("alpha", "u1", 2, 10, 0.2), ("beta", "u1", 8, 10, 0.8),
        ("alpha", "u2", 1, 2, 0.5), ("gamma", "u2", 1, 2, 0.5),
        ("delta", "u3", 30, 30, 1.0),
    ]
    catalog.commit_delta(
        "postings", appended=_postings_df(spark, rows), meta={"round": 0}
    )
    docs = spark.createDataFrame(
        [("u1", "one", None, 0), ("u2", "two", None, 0), ("u3", "three", None, 0)],
        "doc_id string, title string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, fetched_in_round int",
    )
    catalog.commit("docs", docs)
    frontier = spark.createDataFrame(
        [(f"u{i}", i, "h", 0, i, STATE_VISITED, None, 0, 0, i, 0)
         for i in (1, 2, 3)],
        "url string, url_hash long, host string, depth int, seq long, "
        "state string, detail string, discovered_in_round int, "
        "fetched_in_round int, fetch_order long, checkout_round int",
    )
    catalog.commit("frontier", frontier)
    assert catalog.current_snapshot("corpus_stats") is None

    served = search_results(
        spark, catalog, "alpha", k=10, with_score=True, rank="bm25"
    )
    want = search_bm25(
        spark, "alpha", catalog.read("postings"),
        docs.select("doc_id", "title"), 3,
    ).collect()
    assert [(r["url"], r["score"]) for r in served] == [
        (r["url"], r["score"]) for r in want
    ]
    assert len(served) == 2  # u1 and u2 both contain alpha


def test_run_round_commits_bucketed_word_stats(crawl_result):
    """word_stats commits bucketed like postings: manifest keyed by
    bucket ids, stored bucket = word hash, summed-df reads identical
    between a pruned single-word read and the full table."""
    catalog, _metrics, _oracle = crawl_result
    parts = catalog.parts("word_stats")
    keys = set(parts) - {"__all__", "__rows__"}
    assert keys and all(
        k.isdigit() and 0 <= int(k) < N_POSTINGS_BUCKETS for k in keys
    )
    spark = catalog.spark
    full = catalog.read("word_stats")
    assert full.filter(
        F.col("word_bucket")
        != F.pmod(F.xxhash64("word"), F.lit(N_POSTINGS_BUCKETS)).cast("int")
    ).count() == 0
    word = full.select("word").first()["word"]
    buckets = word_bucket_values(spark, [word])
    pruned = catalog.read_parts("word_stats", "word_bucket", buckets)
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    df_pruned = (
        pruned.filter(F.col("word") == word)
        .agg(F.sum("df").alias("df")).collect()[0]["df"]
    )
    df_full = (
        full.filter(F.col("word") == word)
        .agg(F.sum("df").alias("df")).collect()[0]["df"]
    )
    assert df_pruned == df_full and df_full is not None
