"""Consistent-hash assignment of hosts to fetcher workers.

A 1000-executor crawl pins each host to ONE fetcher worker so per-host
politeness state (last-visit round, connection reuse, robots cache) has
a single owner. Plain ``hash(host) % n_workers`` reassigns ~every host
when n_workers changes — losing all per-host state on every scale
event. The classic fix (Karger et al. '97) is a consistent-hash ring:
workers own ``vnodes`` pseudo-random points on a hash circle, a host
belongs to the first worker point clockwise from its own hash, and
adding/removing one worker moves only the ~1/n arc it owns.

Everything here is the repo's portable 60-bit md5 hash (dedup.hash60),
so the ring, the assignment, and the remap fraction are reproducible
bit-for-bit by the DuckDB oracle and by any future engine reading the
same tables.

Plan shape: the ring is |workers| x vnodes rows — a broadcast literal.
Assignment is one broadcast nested-loop join (hosts scan x tiny ring)
followed by a min-struct aggregate per host; the wraparound worker is a
1-row broadcast aggregate, never a driver collect.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import hash60


def ring_points(
    spark: SparkSession, workers: Sequence[str], vnodes: int = 64
) -> DataFrame:
    """(worker, point): ``vnodes`` ring points per worker at
    hash60('ring:' || worker || ':' || vnode)."""
    if vnodes < 1:
        raise ValueError("vnodes must be >= 1")
    rows = F.array(
        *[
            F.struct(
                F.lit(str(w)).alias("worker"),
                hash60(F.lit(f"ring:{w}:{v}")).alias("point"),
            )
            for w in workers
            for v in range(int(vnodes))
        ]
    )
    return (
        spark.range(1)
        .select(F.explode(rows).alias("__r"))
        .select("__r.worker", "__r.point")
    )


def assign_hosts(
    hosts: DataFrame,
    ring: DataFrame,
    host_col: str = "host",
) -> DataFrame:
    """(host, worker): each host goes to the worker owning the first
    ring point at or clockwise-after hash60('chhost:' || host); hosts
    past the last point wrap to the ring's first point. Ties on a point
    value (md5 collisions) break worker-ascending, keeping the map a
    pure function of (hosts, ring)."""
    h = hosts.select(F.col(host_col).alias("host")).distinct().withColumn(
        "__hpoint", hash60(F.concat(F.lit("chhost:"), F.col("host")))
    )
    bring = F.broadcast(ring)
    succ = (
        h.join(bring, F.col("point") >= F.col("__hpoint"))
        .groupBy("host")
        .agg(F.min(F.struct("point", "worker")).alias("__s"))
        .select("host", F.col("__s.worker").alias("__succ"))
    )
    wrap = F.broadcast(
        ring.agg(F.min(F.struct("point", "worker")).alias("__w0")).select(
            F.col("__w0.worker").alias("__wrap")
        )
    )
    return (
        h.join(succ, "host", "left")
        .crossJoin(wrap)
        .select(
            "host", F.coalesce("__succ", F.col("__wrap")).alias("worker")
        )
    )


def remap_stats(before: DataFrame, after: DataFrame) -> DataFrame:
    """One row (n_hosts, moved, moved_milli) comparing two assignments
    over the same host set — the number a scale-event runbook checks
    (consistent hashing: moved_milli ~ 1000/n_workers per added
    worker)."""
    j = before.select(
        "host", F.col("worker").alias("__before")
    ).join(after.select("host", F.col("worker").alias("__after")), "host")
    return j.agg(
        F.count("*").cast("long").alias("n_hosts"),
        F.sum(
            F.when(F.col("__before") != F.col("__after"), 1).otherwise(0)
        )
        .cast("long")
        .alias("moved"),
    ).select(
        "n_hosts",
        "moved",
        F.expr("(1000 * moved) div n_hosts").cast("long").alias("moved_milli"),
    )
