"""Redirect-chain resolution: pointer doubling over the redirect graph.

The crawl records each redirect as one hop (state='redirect',
detail=target — see_crawler_worker.erl:78-83 re-queues the target), so
the frontier accumulates a functional graph url -> target. Resolving
every url to its FINAL destination is how duplicate content reached via
redirect chains gets one canonical identity (and how redirect cycles —
a real-web pathology — get quarantined).

Algorithm: **pointer jumping / path doubling** (the classic PRAM
technique; Wyllie 1979). Each iteration replaces every pointer with its
pointer's pointer via ONE self-equi-join of the pointer table, so a
chain of length L resolves in ceil(log2 L) iterations — at 10^10 urls
that is ~34 joins for even absurd million-hop chains, versus L shuffles
for naive step-by-step chasing. Hop counts add during the jump
(hops(u) += hops(p(u))), so chain lengths come out exact. A node whose
pointer is NOT a redirect source has terminated; anything still
pointing at a source after the doubling budget is a cycle member
(budget 2^max_doublings must exceed the longest real chain — default
64 hops, far beyond any legitimate redirect chain; RFC-following
browsers cap at ~20).

Deterministic, engine-exact (pure joins over strings), with a
recursive-CTE SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def redirect_edges(frontier: DataFrame) -> DataFrame:
    """(url, target) hops from the frontier's redirect rows."""
    return frontier.filter(
        (F.col("state") == "redirect") & F.col("detail").isNotNull()
    ).select(F.col("url"), F.col("detail").alias("target"))


def resolve_redirect_chains(
    edges: DataFrame,
    src_col: str = "url",
    dst_col: str = "target",
    max_doublings: int = 6,
) -> DataFrame:
    """Resolve every redirect SOURCE to its final destination.

    Returns (url, final_url, chain_len, is_cycle): final_url/chain_len
    are null/0 for cycle members (no destination exists). Chains longer
    than 2^max_doublings hops classify as cycles — raise the budget for
    pathological inputs (cost is one join per doubling).
    """
    p = edges.select(
        F.col(src_col).alias("u"),
        F.col(dst_col).alias("p"),
        F.lit(1).cast("long").alias("hops"),
    )
    for _ in range(max_doublings):
        jump = p.select(
            F.col("u").alias("__ju"),
            F.col("p").alias("__jp"),
            F.col("hops").alias("__jh"),
        )
        p = (
            p.join(jump, p["p"] == jump["__ju"], "left")
            .select(
                "u",
                F.coalesce(F.col("__jp"), F.col("p")).alias("p"),
                (
                    F.col("hops")
                    + F.coalesce(F.col("__jh"), F.lit(0))
                ).cast("long").alias("hops"),
            )
            .localCheckpoint(eager=False)
        )
    sources = edges.select(F.col(src_col).alias("__s")).distinct()
    out = p.join(sources, p["p"] == sources["__s"], "left")
    return out.select(
        F.col("u").alias("url"),
        F.when(F.col("__s").isNull(), F.col("p")).alias("final_url"),
        F.when(F.col("__s").isNull(), F.col("hops"))
        .otherwise(0)
        .cast("long")
        .alias("chain_len"),
        F.when(F.col("__s").isNull(), 0).otherwise(1).cast("long").alias("is_cycle"),
    )
