"""Scale-safe dense global sequence numbers (distributed zipWithIndex).

The crawl's determinism contract (SURVEY §7.0 hazard 1) needs a dense,
total-order ``seq`` over newly discovered URLs each round. A naive
``row_number() OVER (ORDER BY ...)`` collapses to ONE partition — a
non-starter at 10^10 rows. This is the classic two-pass alternative:

  1. range-repartition + sort locally on the order key (a normal
     distributed sort — Spark handles it at any scale);
  2. count rows per physical partition (tiny driver collect: one long per
     partition);
  3. mapInPandas adds ``offset[pid] + local position``.

Global order is preserved regardless of partition count because range
partitioning keeps key ranges disjoint and cumulative offsets follow
partition order — so the assigned sequence is invariant across parallelism
levels (asserted by tests/test_seq.py), which is exactly what the
two-cluster-size scaling rule requires of crawl ordering.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
    )
    ordered = ordered.localCheckpoint(eager=True)  # pin partitioning for both passes
    counts = {
        r["__pid"]: r["cnt"]
        for r in ordered.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(
        [f for f in ordered.schema.fields if f.name != "__pid"]
        + [T.StructField(out_col, T.LongType(), False)]
    )

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for batch in batches:
            if len(batch) == 0:
                continue
            pid = int(batch["__pid"].iloc[0])
            batch = batch.drop(columns=["__pid"])
            batch[out_col] = range(offsets[pid] + local, offsets[pid] + local + len(batch))
            local += len(batch)
            yield batch

    return ordered.mapInPandas(_assign, schema=out_schema)
