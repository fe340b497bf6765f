"""Lazy synthetic frontier generation at arbitrary scale (FIXTURES.md F7).

``spark.range(n)`` + deterministic column generators — no data files, no
driver-side materialization, so the same code synthesizes 10^5 rows for a
smoke run or 10^10 for a cluster bench (the north rule's design point).

Host distribution is zipf-ish (quadratic transform of a uniform hash) to
exercise the skew paths: a few giant hosts plus a long tail, exactly the
shape that makes naive per-host windows fall over and politeness budgets +
salting matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import STATE_UNVISITED


def synth_frontier(
    spark: SparkSession,
    n: int,
    n_hosts: int = 10_000,
    skew: float = 2.0,
    partitions: int | None = None,
) -> DataFrame:
    """Frontier-schema rows, all unvisited, deterministic from row id."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism * 2
    df = spark.range(0, n, 1, partitions)
    u = (F.xxhash64(F.col("id")) % 1_000_003 + 1_000_003) % 1_000_003  # uniform
    frac = u / F.lit(1_000_003.0)
    host_id = F.floor(F.pow(frac, F.lit(skew)) * n_hosts).cast("long")
    host = F.concat(F.lit("h"), host_id.cast("string"), F.lit(".bench"))
    url = F.concat(
        F.lit("http://"), host, F.lit("/p/"), F.col("id").cast("string")
    )
    return df.select(
        url.alias("url"),
        F.xxhash64(url).alias("url_hash"),
        host.alias("host"),
        (F.col("id") % 12).cast("int").alias("depth"),
        F.col("id").alias("seq"),
        F.lit(STATE_UNVISITED).alias("state"),
        F.lit(None).cast("string").alias("detail"),
        F.lit(0).alias("discovered_in_round"),
        F.lit(None).cast("int").alias("fetched_in_round"),
        F.lit(None).cast("long").alias("fetch_order"),
        F.lit(None).cast("int").alias("checkout_round"),
    )


def synth_candidates(
    spark: SparkSession,
    n: int,
    overlap_with_frontier_n: int,
    n_hosts: int = 10_000,
    skew: float = 2.0,
    partitions: int | None = None,
) -> DataFrame:
    """Candidate links where ~half collide with an existing frontier of size
    ``overlap_with_frontier_n`` (ids overlap) — the URL-seen filter's
    realistic 50/50 hit mix."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism * 2
    df = spark.range(0, n, 1, partitions)
    # even rows re-reference existing ids; odd rows are brand new
    ref = F.when(
        F.col("id") % 2 == 0, F.col("id") % overlap_with_frontier_n
    ).otherwise(F.col("id") + overlap_with_frontier_n)
    u = (F.xxhash64(ref) % 1_000_003 + 1_000_003) % 1_000_003
    frac = u / F.lit(1_000_003.0)
    host_id = F.floor(F.pow(frac, F.lit(skew)) * n_hosts).cast("long")
    host = F.concat(F.lit("h"), host_id.cast("string"), F.lit(".bench"))
    url = F.concat(F.lit("http://"), host, F.lit("/p/"), ref.cast("string"))
    return df.select(
        url.alias("url"),
        F.xxhash64(url).alias("url_hash"),
        host.alias("host"),
        F.lit(1).alias("parent_depth"),
        F.col("id").alias("link_rank"),
    )
