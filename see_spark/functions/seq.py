"""Scale-safe dense global sequence numbers (distributed zipWithIndex).

The crawl's determinism contract (SURVEY §7.0 hazard 1) needs a dense,
total-order ``seq`` over newly discovered URLs each round. A naive
``row_number() OVER (ORDER BY ...)`` collapses to ONE partition — a
non-starter at 10^10 rows. This is the classic two-pass alternative, kept
fully JVM-side (no Arrow round-trip of row data through Python):

  1. range-repartition + sort locally on the order key (a normal
     distributed sort — Spark handles it at any scale), stamp each row with
     ``spark_partition_id`` and ``monotonically_increasing_id`` (which is
     ``(pid << 33) + local_row_index`` in row-production order, i.e. sorted
     order here — the projection sits above the sort and nondeterministic
     expressions are never reordered below it);
  2. count rows per physical partition (tiny driver collect: one long per
     partition);
  3. broadcast-join the per-partition offsets and compute
     ``seq = offset[pid] + (mid - (pid << 33))`` — pure Catalyst
     arithmetic, whole-stage codegen, zero Python.

Global order is preserved regardless of partition count because range
partitioning keeps key ranges disjoint and cumulative offsets follow
partition order — so the assigned sequence is invariant across parallelism
levels (asserted by tests), which is exactly what the two-cluster-size
scaling rule requires of crawl ordering. (Range-boundary sampling only
moves partition *edges*; the global rank each row receives is unchanged.)
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Offsets-per-partition count above which the literal create_map is
# swapped for a SQL VALUES LocalRelation + broadcast join (very large
# literal expressions stress codegen; a LocalRelation does not).
_MAP_LITERAL_MAX = 4096


def with_dense_sequence(
    df: DataFrame,
    order_cols: List[str],
    out_col: str = "seq",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign ``out_col`` = start + rank in the total order ``order_cols``.

    ``order_cols`` must be a total order (tie-free) for determinism; the
    crawl pipeline guarantees this by always ending the key with a unique
    column (url_hash / link position).
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ordered = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
    )
    # pin partitioning + mid values for both passes; lazy so the
    # materialization rides the counts job below instead of its own job
    ordered = ordered.localCheckpoint(eager=False)
    counts = {
        r["__pid"]: r["cnt"]
        for r in ordered.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = []
    acc = start
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    if not offsets:
        return ordered.drop("__pid", "__mid").withColumn(
            out_col, F.lit(start).cast("long")
        ).filter(F.lit(False))

    # The offsets are driver-known and tiny (one entry per partition), so
    # inject them as a LITERAL, never via createDataFrame(list): a Python
    # list parallelizes into defaultParallelism slices, and EVERY slice is
    # a Python-worker round-trip — profiled at N_cores tasks x ~0.3-1.4 s
    # of pure blocked time per offsets table, ~450 s of task time per
    # bench round at local[32] for a few dozen rows. A create_map literal
    # compiles into the projection (zero extra stages, zero Python); past
    # the expression-size comfort zone, a SQL VALUES LocalRelation keeps
    # the broadcast join but still never touches a Python worker.
    if len(offsets) <= _MAP_LITERAL_MAX:
        pairs: List = []
        for pid, off in offsets:
            pairs += [F.lit(pid), F.lit(off)]
        off_expr = F.element_at(F.create_map(*pairs), F.col("__pid"))
        return (
            ordered.withColumn(
                out_col,
                (
                    off_expr
                    + F.col("__mid")
                    - F.shiftleft(F.col("__pid").cast("long"), 33)
                ).cast("long"),
            )
            .drop("__pid", "__mid")
        )
    values = ",".join(f"({pid}, {off}L)" for pid, off in offsets)
    offsets_df = df.sparkSession.sql(
        f"SELECT col1 AS __pid, col2 AS __off FROM VALUES {values}"
    )
    return (
        ordered.join(F.broadcast(offsets_df), "__pid")
        .withColumn(
            out_col,
            (
                F.col("__off")
                + F.col("__mid")
                - F.shiftleft(F.col("__pid").cast("long"), 33)
            ).cast("long"),
        )
        .drop("__pid", "__mid", "__off")
    )


def with_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_cols: List[str],
    out_col: str = "prefix",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed inclusive prefix sum (scan) of ``value_col`` in the
    total order ``order_cols`` — the same two-phase shape as
    ``with_dense_sequence``: range-partition on the order key, a
    PARTITION-LOCAL running-sum window (never a global single-partition
    window), then per-partition sum offsets injected as a literal map.
    The driver sees one (partition_id, partial_sum) row per partition,
    never row data. ``order_cols`` must be tie-free for determinism.
    """
    from pyspark.sql import Window

    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ordered = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    ordered = ordered.localCheckpoint(eager=False)
    w = (
        Window.partitionBy("__pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ordered.withColumn("__run", F.sum(F.col(value_col)).over(w))
    sums = {
        r["__pid"]: r["s"]
        for r in ordered.groupBy("__pid")
        .agg(F.coalesce(F.sum(value_col), F.lit(0)).alias("s"))
        .collect()
    }
    offsets = []
    acc = 0
    for pid in sorted(sums):
        offsets.append((pid, acc))
        acc += int(sums[pid])
    if not offsets:
        return local.drop("__pid", "__run").withColumn(
            out_col, F.lit(0).cast("long")
        ).filter(F.lit(False))
    if len(offsets) <= _MAP_LITERAL_MAX:
        pairs: List = []
        for pid, off in offsets:
            pairs += [F.lit(pid), F.lit(off)]
        off_expr = F.element_at(F.create_map(*pairs), F.col("__pid"))
        return local.withColumn(
            out_col, (off_expr + F.col("__run")).cast("long")
        ).drop("__pid", "__run")
    values = ",".join(f"({pid}, {off}L)" for pid, off in offsets)
    offsets_df = df.sparkSession.sql(
        f"SELECT col1 AS __pid, col2 AS __off FROM VALUES {values}"
    )
    return (
        local.join(F.broadcast(offsets_df), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__run")).cast("long"))
        .drop("__pid", "__run", "__off")
    )


def with_prefix_max(
    df: DataFrame,
    value_col: str,
    order_cols: List[str],
    out_col: str = "prefix_max",
    num_partitions: int | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """Distributed prefix MAX scan of ``value_col`` (BIGINT) in the total
    order ``order_cols`` — same two-phase shape as ``with_prefix_sum``:
    range-partition on the order key, a partition-local running-max
    window, then per-partition max offsets folded on the driver (one
    scalar per partition, never row data) and injected as a literal map.

    ``inclusive=False`` gives the EXCLUSIVE scan (max over strictly
    preceding rows) — the streaming-watermark shape, where each row is
    judged against state accumulated before it arrived. Rows with no
    predecessor get NULL. ``order_cols`` must be tie-free.
    """
    from pyspark.sql import Window

    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ordered = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    ordered = ordered.localCheckpoint(eager=False)
    hi = Window.currentRow if inclusive else -1
    w = (
        Window.partitionBy("__pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    local = ordered.withColumn("__run", F.max(F.col(value_col)).over(w))
    maxes = {
        r["__pid"]: r["m"]
        for r in ordered.groupBy("__pid")
        .agg(F.max(value_col).alias("m"))
        .collect()
    }
    offsets = []
    acc = None  # max over all PRIOR partitions (exclusive of this one)
    for pid in sorted(maxes):
        offsets.append((pid, acc))
        m = maxes[pid]
        if m is not None and (acc is None or m > acc):
            acc = m
    pairs: List = []
    for pid, off in offsets:
        pairs += [F.lit(pid), F.lit(off).cast("long")]
    if not pairs:
        return local.drop("__pid", "__run").withColumn(
            out_col, F.lit(None).cast("long")
        ).filter(F.lit(False))
    off_expr = F.element_at(F.create_map(*pairs), F.col("__pid"))
    # greatest() skips NULLs (returns NULL only if ALL args are), which is
    # exactly the scan identity: no-prior-partition -> local run alone, and
    # first-row-exclusive (NULL local run) -> prior-partition max alone.
    return local.withColumn(
        out_col, F.greatest(off_expr, F.col("__run"))
    ).drop("__pid", "__run")
