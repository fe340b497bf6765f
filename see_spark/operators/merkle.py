"""Merkle-tree table integrity: a content-addressed hash tree over a
table's rows in a pinned total order — the storage primitive behind
snapshot verification and cheap replica diff (two 10^10-row copies
compare root-to-leaf in O(log n) chunk reads instead of a full scan;
the same scheme object stores and verified replication use).

Tree shape: rows hash to leaves; leaves group into chunks of
``fanout`` in rank order; each level hashes the ordered concatenation
of its children until one root remains. All deterministic md5 — the
whole tree is engine-exact.

Scale shape: the rank comes from ``seq.with_dense_sequence`` (range
partition + offsets); every level is ONE map-side-combinable aggregate
on ``rank div fanout`` with an in-group ordered fold (array_sort of
collected (pos, hash) structs — group size ≤ fanout, bounded). Level
count = log_fanout(n); each level shrinks the data by fanout×, so the
whole tree costs ~n/(fanout−1) extra rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# NULL must render distinguishably: concat_ws SKIPS null arguments, so
# ('a', NULL, 'b') and ('a', 'b', NULL) would otherwise hash identically
# and a change that only moves a NULL between columns would go unseen by
# both the tree and table_diff. String columns CAN legitimately contain
# NUL bytes (raw crawl text), so the sentinel alone is not collision-free
# — every \x00 in a real value is first escaped to \x00\x01, after which
# the unescaped sentinel \x00N cannot equal any rendered value. Values
# can ALSO contain the \x1f column separator, so after the NUL pass each
# literal \x1f is escaped to \x00\x02 (the escape lead-in \x00 never
# survives unescaped, so the rendered value cannot contain a bare \x1f):
# without this, rows ('a\x1fb','c') and ('a','b\x1fc') would render
# identically and a change that moves a \x1f across a column boundary
# would be invisible to the tree. The escape-then-sentinel rendering is
# injective over the full row, not just per column.
_NULL_SENTINEL = "\x00N"


def _row_render(cols: list):
    """Deterministic NULL-safe unit-separated rendering of ``cols``."""
    return F.concat_ws(
        "\x1f",
        *[
            F.coalesce(
                F.replace(
                    F.replace(
                        F.col(c).cast("string"),
                        F.lit("\x00"),
                        F.lit("\x00\x01"),
                    ),
                    F.lit("\x1f"),
                    F.lit("\x00\x02"),
                ),
                F.lit(_NULL_SENTINEL),
            )
            for c in cols
        ],
    )


def merkle_levels(
    df: DataFrame,
    order_cols: list,
    hash_cols: list,
    fanout: int = 64,
) -> DataFrame:
    """Build the full tree; returns (level, pos, node_hash) rows —
    level 0 = leaves in rank order, the max level has one root row.
    ``order_cols`` must be a tie-free total order."""
    from ..functions.seq import with_dense_sequence

    f = int(fanout)
    leaf_hash = F.md5(_row_render(hash_cols))
    ranked = with_dense_sequence(df, order_cols, out_col="__r")
    level = ranked.select(
        F.lit(0).cast("long").alias("level"),
        F.col("__r").cast("long").alias("pos"),
        leaf_hash.alias("node_hash"),
    ).localCheckpoint(eager=False)
    out = level
    lvl = 0
    n = level.count()
    while n > 1:
        lvl += 1
        level = (
            level.groupBy(F.expr(f"pos div {f}").cast("long").alias("pos"))
            .agg(
                F.md5(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("pos", "node_hash"))
                            ),
                            lambda s: s["node_hash"],
                        ),
                        "",
                    )
                ).alias("node_hash")
            )
            .select(
                F.lit(lvl).cast("long").alias("level"), "pos", "node_hash"
            )
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(level)
        n = (n + f - 1) // f
    return out


def merkle_root(
    df: DataFrame, order_cols: list, hash_cols: list, fanout: int = 64
) -> str:
    """The root hash alone (one driver-side string)."""
    levels = merkle_levels(df, order_cols, hash_cols, fanout)
    top = levels.agg(F.max("level").alias("m")).collect()[0]["m"]
    return levels.where(F.col("level") == top).collect()[0]["node_hash"]


def merkle_diff_paths(
    a_levels: DataFrame, b_levels: DataFrame
) -> DataFrame:
    """Nodes whose hashes differ between two trees of the same shape —
    the O(log n) replica-diff read set: only subtrees under a differing
    node need comparing. Returns (level, pos, hash_a, hash_b)."""
    a = a_levels.select("level", "pos", F.col("node_hash").alias("hash_a"))
    b = b_levels.select("level", "pos", F.col("node_hash").alias("hash_b"))
    return a.join(b, ["level", "pos"], "full_outer").where(
        F.coalesce("hash_a", F.lit("")) != F.coalesce("hash_b", F.lit(""))
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list,
    compare_cols: list,
) -> DataFrame:
    """Semantic snapshot diff — the row-level complement of the Merkle
    integrity tree above: classify every key as added / removed /
    changed / unchanged between two table versions by comparing a
    deterministic hash of ``compare_cols`` (so wide rows diff without
    shipping their payloads through the join). The audit behind "what
    did this crawl round actually change" and incremental-export
    (CDC-style) feeds.

    One full-outer equi-join on the key; hashes are md5 of the
    unit-separated column rendering (the merkle leaf convention).
    Returns (status, n_keys) — one row per status present.
    """
    def h(df):
        return df.select(
            *[F.col(c) for c in key_cols],
            F.md5(_row_render(compare_cols)).alias("__h"),
        )

    a = h(old).withColumnRenamed("__h", "__ha")
    b = h(new).withColumnRenamed("__h", "__hb")
    j = a.join(b, key_cols, "full_outer")
    status = (
        F.when(F.col("__ha").isNull(), F.lit("added"))
        .when(F.col("__hb").isNull(), F.lit("removed"))
        .when(F.col("__ha") != F.col("__hb"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").cast("long").alias("n_keys"))
    )
