"""Skyline / Pareto-frontier query (Börzsönyi, Kossmann & Stocker,
ICDE 2001) — "best documents with no strictly-better alternative":
a row is in the skyline iff no other row is ≥ in every criterion and
> in at least one. The corpus-curation use is multi-criteria document
selection (quality vs freshness vs brevity) where a single weighted
score would hide the trade-off frontier.

Distributed shape (the grid-pruning scheme from the distributed-skyline
literature): quantize points onto a G×G grid; a non-empty cell that has
another non-empty cell strictly above-right of it is WHOLLY dominated
(every point of the higher cell beats every point of the lower in both
dims — strict by the cell-boundary inequality), so its points drop
before any pairwise work. The exact dominance test then runs only on
survivors — the staircase band, O(G·skyline) points, broadcast-sized —
so the one inequality self-join in the plan is bounded by construction,
never corpus-quadratic. The survivor filter is a correctness-neutral
pre-filter: dropped points are provably dominated, and the final test
is exact.

2D here (the common case; higher dims lose grid pruning power
exponentially — documented limit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skyline2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    grid: int = 16,
) -> DataFrame:
    """Skyline under MAXIMIZE-both semantics (negate a column upstream
    to minimize it). Returns the frontier rows (id, x, y), exact."""
    g = int(grid)
    pts = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).localCheckpoint(eager=False)
    lo = pts.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).collect()[0]
    if lo[0] is None:  # empty input: the frontier of nothing is nothing
        return pts
    lox, hix, loy, hiy = (int(v) for v in lo)
    sx = max((hix - lox + 1 + g - 1) // g, 1)
    sy = max((hiy - loy + 1 + g - 1) // g, 1)
    cells = pts.withColumn(
        "cx", F.expr(f"(x - {lox}) div {sx}").cast("long")
    ).withColumn("cy", F.expr(f"(y - {loy}) div {sy}").cast("long"))
    ne = cells.select("cx", "cy").distinct()
    dominated_cells = (
        ne.alias("a")
        .join(
            ne.alias("b"),
            (F.col("b.cx") > F.col("a.cx")) & (F.col("b.cy") > F.col("a.cy")),
        )
        .select(F.col("a.cx").alias("cx"), F.col("a.cy").alias("cy"))
        .distinct()
    )
    survivors = cells.join(
        dominated_cells, ["cx", "cy"], "left_anti"
    ).select("id", "x", "y")
    survivors = survivors.localCheckpoint(eager=False)
    dom = (
        survivors.alias("p")
        .join(
            F.broadcast(survivors.alias("q")),
            (F.col("q.x") >= F.col("p.x"))
            & (F.col("q.y") >= F.col("p.y"))
            & (
                (F.col("q.x") > F.col("p.x"))
                | (F.col("q.y") > F.col("p.y"))
            ),
            "left_semi",
        )
        .select("id")
    )
    return survivors.join(dom, "id", "left_anti").select("id", "x", "y")


def skyline_layers(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    n_layers: int = 3,
    grid: int = 16,
) -> DataFrame:
    """Onion peeling / k-level skylines (Chazelle's onion; the data-depth
    ranking): layer 1 = the Pareto frontier, layer 2 = the frontier of
    what remains, ... — the multi-criteria answer to "give me the best
    PAGE of documents, then the next-best page", where any single
    weighted score would impose an arbitrary trade-off.

    Each layer is one ``skyline2d`` call (grid-pruned, exact) followed
    by an anti-join removal; ``n_layers`` is small by construction
    (it's a paging depth). Rows not in the first ``n_layers`` are not
    returned. Output (id, x, y, layer).
    """
    remaining = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).localCheckpoint(eager=False)
    out = None
    for layer in range(1, int(n_layers) + 1):
        # Peeling can exhaust the input before n_layers (e.g. 2 rows,
        # 3 layers) — stop rather than skyline an empty frame.
        if remaining.limit(1).count() == 0:
            break
        sk = skyline2d(remaining, "x", "y", "id", grid=grid).localCheckpoint(
            eager=False
        )
        tagged = sk.select(
            "id", "x", "y", F.lit(layer).cast("long").alias("layer")
        )
        out = tagged if out is None else out.unionByName(tagged)
        remaining = remaining.join(
            sk.select("id"), "id", "left_anti"
        ).localCheckpoint(eager=False)
    if out is None:  # empty input: zero layers, stable schema
        out = remaining.select(
            "id", "x", "y", F.lit(1).cast("long").alias("layer")
        ).limit(0)
    return out
