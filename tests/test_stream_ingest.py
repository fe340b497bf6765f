"""Streaming URL ingestion: stream==batch frontier equality, incremental
pickup of new files, and replay idempotency via the URL-seen filter."""

import tempfile

from pyspark.sql import functions as F


def _run_stream(spark, catalog, input_dir, ckpt, config):
    from see_spark.streaming.ingest import stream_url_ingest

    q = stream_url_ingest(
        spark, catalog, input_dir, config, ckpt, available_now=True
    )
    q.awaitTermination()


def test_stream_ingest_matches_batch_ingest(spark, tmp_path):
    from see_spark.operators.crawl import CrawlConfig, ingest_seeds
    from see_spark.sources.catalog import SnapshotCatalog

    urls = [
        "http://a.test/x",
        "HTTP://A.Test/x",            # canonical dup of the first
        "http://b.test/y?q=1",
        "http://other.com/skip",      # filtered out
        "http://c.test/a/../b",
    ]
    config = CrawlConfig(domain_filter=r"\.test$")

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "urls.txt").write_text("\n".join(urls) + "\n")
    stream_cat = SnapshotCatalog(tempfile.mkdtemp(prefix="si_"), spark)
    _run_stream(spark, stream_cat, str(in_dir), str(tmp_path / "ck"), config)

    batch_cat = SnapshotCatalog(tempfile.mkdtemp(prefix="bi_"), spark)
    ingest_seeds(spark, batch_cat, urls, config).collect()

    streamed = {
        (r["url"], r["state"], r["depth"])
        for r in stream_cat.read("frontier").collect()
    }
    batched = {
        (r["url"], r["state"], r["depth"])
        for r in batch_cat.read("frontier").collect()
    }
    assert streamed == batched
    assert len(streamed) == 3  # dup collapsed, off-domain filtered


def test_stream_ingest_incremental_and_idempotent(spark, tmp_path):
    from see_spark.operators.crawl import CrawlConfig
    from see_spark.sources.catalog import SnapshotCatalog

    config = CrawlConfig(domain_filter=r"\.test$")
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "f1.txt").write_text("http://a.test/1\nhttp://a.test/2\n")
    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="si2_"), spark)
    _run_stream(spark, catalog, str(in_dir), str(tmp_path / "ck"), config)
    assert catalog.read("frontier").count() == 2

    # second drain with a new file: only the new URL lands; the repeated
    # URL and the already-consumed file add nothing
    (in_dir / "f2.txt").write_text("http://a.test/2\nhttp://a.test/3\n")
    _run_stream(spark, catalog, str(in_dir), str(tmp_path / "ck"), config)
    rows = catalog.read("frontier").collect()
    assert {r["url"] for r in rows} == {
        "http://a.test/1", "http://a.test/2", "http://a.test/3",
    }
    # seq stays dense and unique across the two micro-batches
    assert sorted(r["seq"] for r in rows) == [0, 1, 2]

    # replaying the same batch content through the sink directly (the
    # foreachBatch redelivery case) appends nothing
    from see_spark.streaming.ingest import _ingest_batch

    replay = spark.createDataFrame(
        [("http://a.test/2",), ("http://a.test/3",)], "value string"
    )
    assert _ingest_batch(catalog, config, replay) == 0
    assert catalog.read("frontier").count() == 3
