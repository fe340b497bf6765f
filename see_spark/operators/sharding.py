"""Index shard planning — distribute a corpus over S serving shards.

The reference is a single-node index (one ETS table per word,
see_db_storage_ets.erl); serving a 10^10-doc index needs document-
partitioned shards, and HOW documents are assigned decides tail latency:
a shard holding the longest documents does proportionally more scoring
work per query, so naive hash assignment leaves O(sqrt) load spread
while size-aware assignment tightens it.

``plan_shards`` implements the parallel form of the LPT (longest
processing time) greedy: rank documents by size desc (id asc tie-break)
with the distributed dense-sequence (functions/seq.py — O(partitions)
driver state, no global window), then stripe rank % S. Adjacent ranks —
the largest docs — land on DIFFERENT shards, and every stripe of S
consecutive docs contributes one doc to each shard, so shard totals
differ by at most (stripe-local spread) regardless of the size
distribution. Deterministic in any engine: the rank order is a pinned
total order.

``shard_stats`` audits the plan: per-shard doc count, total size, and
``load_milli`` = 1000 * shard_size * S div corpus_size (1000 = perfectly
balanced), the number a capacity planner alarms on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.seq import with_dense_sequence


def plan_shards(
    docs: DataFrame,
    n_shards: int,
    size_col: str = "size",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, size, shard): LPT-striped shard assignment (module doc)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(size_col).cast("long").alias("size"),
    ).withColumn("__neg_size", -F.col("size"))
    ranked = with_dense_sequence(
        base, order_cols=["__neg_size", "doc_id"], out_col="__rank", start=0
    )
    return ranked.select(
        "doc_id",
        "size",
        (F.col("__rank") % n_shards).cast("long").alias("shard"),
    )


def shard_stats(assignment: DataFrame, n_shards: int) -> DataFrame:
    """(shard, n_docs, total_size, load_milli) — load audit of a
    ``plan_shards`` output; one map-side-combinable aggregate onto
    S keys plus a scalar corpus total injected as a cross join of a
    1-row aggregate (never a driver collect)."""
    per = assignment.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("size").cast("long").alias("total_size"),
    )
    grand = assignment.agg(F.sum("size").cast("long").alias("__corpus"))
    return per.crossJoin(F.broadcast(grand)).select(
        "shard",
        "n_docs",
        "total_size",
        F.expr(f"(1000 * total_size * {int(n_shards)}) div __corpus")
        .cast("long")
        .alias("load_milli"),
    )
