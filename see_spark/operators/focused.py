"""Focused (topic-directed) crawl prioritization — engine addition.

The reference crawls breadth-first with no notion of topical relevance
(apps/crawler/src/see_crawler_worker.erl polls whatever the queue returns);
the north rule's "priority queue (depth + host-budget score)" leaves the
priority dimension open. This module adds the classic focused-crawl
priority from the public literature — shark-search (Hersovici et al.,
WWW 1998) as batched by focused-crawling frameworks (Chakrabarti et al.,
Computer Networks 1999): a fetched page's topical relevance propagates to
its outlinks, decayed per hop, plus a bonus when the link's anchor text
itself mentions topic terms. The crawl loop feeds the result straight into
``frontier.checkout_prioritized`` (it is (url, priority)-shaped), so
politeness/budget semantics are unchanged — only the order within a host's
budget window moves from BFS to best-first.

All math is integer milli-units (score in [0, 1000]) so Spark and the
DuckDB oracle agree bit-for-bit; the row path is pure Catalyst.

Scale shape: ONE equi-join of the round's extracted links against the
round's parent scores (both keyed by src url — under the crawl loop these
are the SAME round-delta relation, so the join is map-side after one
co-partition), then ONE combinable max/count aggregate keyed by dst url.
Nothing is frontier-sized except the output, which merges into the
frontier's priority column exactly like the in-degree rollup.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shark_priorities(
    parent_scores: DataFrame,
    links: DataFrame,
    topic_words: Sequence[str],
    decay_milli: int = 500,
    anchor_bonus_milli: int = 200,
) -> DataFrame:
    """Per-discovered-URL best-first priority from parent relevance.

    ``parent_scores``: (url, score_milli) — the fetched page's topical
    relevance in [0, 1000] (a classifier output: operators/classifier.py
    produces exactly this shape).
    ``links``: (src_url, dst_url, anchor) — the round's extracted edges
    with their anchor text.

    Per link:  inherited = decay_milli * score_milli // 1000
               bonus     = anchor_bonus_milli * |distinct topic words
                                                 in the anchor tokens|
    Per dst:   priority_milli = MAX over incoming links (inherited+bonus),
               n_parents      = number of scored incoming links.

    MAX (not sum) is shark-search's choice: one highly relevant parent
    should beat many irrelevant ones, and it keeps the aggregate
    combinable without damping logic. Tokenization is pinned to
    lowercase + single-space split, hit counting to DISTINCT topic words
    (array_intersect), so the oracle can mirror it exactly.
    """
    topics = F.array(*[F.lit(w) for w in topic_words])
    scored = links.join(
        parent_scores.withColumnRenamed("url", "src_url"), "src_url"
    )
    hits = F.size(
        F.array_intersect(F.split(F.lower(F.col("anchor")), " "), topics)
    )
    link_pri = F.expr(
        f"({int(decay_milli)} * score_milli) div 1000"
    ).cast("long") + F.lit(anchor_bonus_milli) * hits.cast("long")
    return (
        scored.select(F.col("dst_url").alias("url"), link_pri.alias("__p"))
        .groupBy("url")
        .agg(
            F.max("__p").alias("priority_milli"),
            F.count("*").cast("long").alias("n_parents"),
        )
    )


def focused_checkout(
    frontier: DataFrame,
    priorities: DataFrame,
    host_budget: int,
) -> DataFrame:
    """Best-first batched checkout: ``checkout_prioritized`` driven by
    shark priorities instead of in-degree — identical politeness window,
    salted two-phase top-k, and cross-parallelism determinism (the total
    order ends in seq)."""
    from .frontier import checkout_prioritized

    if "url_hash" not in frontier.columns:
        # the salted two-phase top-k keys its salt on url_hash; frontier
        # tables carry it persisted, ad-hoc relations get it derived
        frontier = frontier.withColumn("url_hash", F.xxhash64("url"))
    return checkout_prioritized(
        frontier,
        priorities.select("url", F.col("priority_milli").alias("indegree")),
        host_budget=host_budget,
    )
