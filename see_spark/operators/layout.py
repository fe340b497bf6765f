"""Multi-dimensional file-layout clustering for data skipping: Z-order
(Morton) curves and the min/max pruning audit.

This is the storage-layout half of the 100 TB story. Sorting a table by
ONE column gives perfect min/max skipping on that column and none on any
other; interleaving the bits of two key columns (the Z-order curve —
what Delta/Iceberg `OPTIMIZE ZORDER BY` runs) makes every file a small
rectangle in key space, so range predicates on EITHER dimension prune
most files. The operators here compute the curve, assign rows to
file-sized chunks, build the per-chunk min/max skipping index, and
quantify the benefit against a single-column sort on the same data —
all exact integer arithmetic with a DuckDB oracle.

Scale shape: the expensive step is ONE total-order rank over the z-value
(``seq.with_dense_sequence``: range partition + per-partition offsets,
never a single-partition window) — the same cost as the sort a table
rewrite needs anyway; the skipping index is one map-side-combinable
aggregate over the chunk key, and the audit is arithmetic over
#chunks rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zvalue(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
) -> DataFrame:
    """Append ``zval`` — the Morton interleave of the two key columns,
    each min/max-normalized onto the [0, 2^bits) integer grid first
    (rank-free normalization: (v − min)·(2^bits − 1) div (max − min),
    constant-space and exactly mirrored in SQL; min=max collapses a
    dimension to 0). Bit j of x lands at z bit 2j, y at 2j+1 —
    2·bits ≤ 62 keeps everything in signed BIGINT.

    Pure Catalyst HOF expression; the min/max scalars are one tiny
    aggregate collected to the driver (4 values, never row data).
    """
    if 2 * bits > 62:
        raise ValueError("2*bits must fit signed BIGINT (bits <= 31)")
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(F.col(x_col).cast("long")),
        F.max(F.col(x_col).cast("long")),
        F.min(F.col(y_col).cast("long")),
        F.max(F.col(y_col).cast("long")),
    ).collect()[0]
    top = (1 << bits) - 1

    def _norm(col, lo, hi):
        if hi == lo:
            return F.lit(0).cast("long")
        return F.expr(
            f"(cast({col} as bigint) - {lo}) * {top} div {hi - lo}"
        ).cast("long")

    d = df.withColumn("__nx", _norm(x_col, lo_x, hi_x)).withColumn(
        "__ny", _norm(y_col, lo_y, hi_y)
    )
    return d.withColumn(
        "zval",
        F.expr(
            f"aggregate(sequence(0, {bits - 1}), 0L, (a, j) -> a"
            " + shiftleft(shiftright(__nx, cast(j as int)) & 1,"
            " cast(2*j as int))"
            " + shiftleft(shiftright(__ny, cast(j as int)) & 1,"
            " cast(2*j + 1 as int)))"
        ).cast("long"),
    ).drop("__nx", "__ny")


def chunked_minmax(
    df: DataFrame,
    order_cols: list,
    n_chunks: int,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Assign rows to ``n_chunks`` equal file-sized chunks in the total
    order ``order_cols`` (must be tie-free) and build the per-chunk
    min/max skipping index: (chunk, n_rows, min_x, max_x, min_y, max_y)
    — the footer stats a parquet/Iceberg reader prunes on.

    chunk = global_rank · n_chunks div N: one distributed rank
    (``with_dense_sequence``) + one combinable aggregate.
    """
    from ..functions.seq import with_dense_sequence

    n = df.count()
    ranked = with_dense_sequence(df, order_cols, out_col="__rank")
    chunked = ranked.withColumn(
        "chunk",
        F.expr(f"__rank * {int(n_chunks)} div {max(n, 1)}").cast("long"),
    )
    return chunked.groupBy("chunk").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min(F.col(x_col).cast("long")).alias("min_x"),
        F.max(F.col(x_col).cast("long")).alias("max_x"),
        F.min(F.col(y_col).cast("long")).alias("min_y"),
        F.max(F.col(y_col).cast("long")).alias("max_y"),
    )


def zorder_prune_audit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_cols: list,
    box: tuple,
    n_chunks: int = 32,
    bits: int = 16,
) -> DataFrame:
    """Quantify data skipping for the box predicate ``box`` = (x_lo,
    x_hi, y_lo, y_hi) under two physical layouts of the SAME rows:

      layout='zorder': files cut along the Morton curve of (x, y)
      layout='xsort' : files cut along a plain x sort (the status quo)

    For each layout: chunks whose [min,max] envelopes intersect the box
    must be scanned; the rest are pruned by footer stats alone. Output
    one row per layout — (layout, n_chunks, chunks_scanned, rows_scanned,
    rows_matched, prune_milli) with prune_milli = 1000·pruned div
    n_chunks. rows_matched is layout-independent (sanity anchor);
    rows_scanned is the real I/O the layout buys. All exact BIGINT.

    ``id_cols`` must make (zval, *id_cols) and (x, *id_cols) tie-free.
    """
    x_lo, x_hi, y_lo, y_hi = (int(v) for v in box)
    zd = zvalue(df, x_col, y_col, bits).localCheckpoint(eager=False)

    def _audit(order_cols, name):
        idx = chunked_minmax(zd, order_cols, n_chunks, x_col, y_col)
        matched = zd.where(
            (F.col(x_col) >= x_lo)
            & (F.col(x_col) <= x_hi)
            & (F.col(y_col) >= y_lo)
            & (F.col(y_col) <= y_hi)
        ).count()
        hit = idx.withColumn(
            "__hit",
            (
                (F.col("max_x") >= x_lo)
                & (F.col("min_x") <= x_hi)
                & (F.col("max_y") >= y_lo)
                & (F.col("min_y") <= y_hi)
            ).cast("long"),
        )
        return hit.agg(
            F.lit(name).alias("layout"),
            F.count("*").cast("long").alias("n_chunks"),
            F.sum("__hit").cast("long").alias("chunks_scanned"),
            F.sum(F.col("__hit") * F.col("n_rows"))
            .cast("long")
            .alias("rows_scanned"),
            F.lit(int(matched)).cast("long").alias("rows_matched"),
            F.expr(
                "(count(*) - sum(__hit)) * 1000 div count(*)"
            )
            .cast("long")
            .alias("prune_milli"),
        )

    z = _audit(["zval"] + list(id_cols), "zorder")
    x = _audit([x_col] + list(id_cols), "xsort")
    return z.unionByName(x)
