"""Continuous URL ingestion: Structured Streaming -> the crawl frontier.

The reference accepts URLs one at a time over HTTP (`POST /add`,
/root/reference/apps/db/src/see_web.erl:47-59). The Spark-native
equivalent of "URLs keep arriving" is a file-source stream: drop text
files of URLs (one per line) into a directory and every micro-batch is
canonicalized (O15), domain-filtered (O16), URL-seen-deduped (O2) and
appended to the frontier's unvisited partition via the same delta-commit
path the batch seed ingest uses.

Sink shape: ``foreachBatch`` — the snapshot catalog is not a streaming
sink, and the batch path already is exactly the per-batch work. Replay
safety (foreachBatch may redeliver a batch after a crash) comes from the
URL-seen filter itself: everything a replayed batch inserted the first
time is deduped away the second time, so no epoch bookkeeping is needed
(``crawl.append_ok_candidates`` docstring).

Ordering contract: a distributed micro-batch of files has no meaningful
arrival order, so within a batch new URLs are ordered by the pinned
deterministic key xxhash64(raw line) — re-running the same input files
yields byte-identical frontier seq assignment (the same determinism rule
the crawler applies to discovered links).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import frontier as frontier_ops
from ..operators.crawl import CrawlConfig, append_ok_candidates
from ..sources.catalog import SnapshotCatalog


def _ingest_batch(
    catalog: SnapshotCatalog, config: CrawlConfig, batch_df: DataFrame
) -> int:
    raw = batch_df.select(
        F.col("value").alias("raw_url"),
        F.xxhash64("value").alias("link_rank"),
    )
    cand = frontier_ops.canonicalize_and_filter(
        raw, url_col="raw_url", domain_filter=config.domain_filter
    )
    ok = cand.filter(F.col("ingest_status") == "ok").drop("ingest_status")
    return append_ok_candidates(catalog, ok, op="stream_ingest")


def stream_url_ingest(
    spark: SparkSession,
    catalog: SnapshotCatalog,
    input_dir: str,
    config: CrawlConfig,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the ingestion stream; returns the StreamingQuery.

    ``available_now=True`` drains the current files then stops (the batch
    refresh mode); False runs continuously, picking up new files as they
    land. The stream checkpoint tracks WHICH files were consumed; the
    catalog's own snapshots commit the frontier effect of each batch.
    """
    lines = spark.readStream.text(input_dir)

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        _ingest_batch(catalog, config, batch_df)

    writer = (
        lines.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
