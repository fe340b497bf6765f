"""Registrable-domain (pay-level domain) extraction — engine addition.

Production crawlers enforce politeness, budgets, and reputation at the
REGISTRABLE domain (the "pay-level domain" of the public-suffix list:
``shop.example.co.uk`` -> ``example.co.uk``), not the raw host — one
organization's subdomain farm must share one budget, or per-host budgets
multiply by however many subdomains it mints (the common crawler-trap /
spam shape; see also the mirror-host and DUST alias machinery in
operators/urlalias.py). The reference keys everything by raw host
(see_crawler_worker.erl polls per-URL); this module adds the PSL grouping
layer the north rule's per-host budget dimension composes with.

The suffix rule is Mozilla's public-suffix algorithm restricted to plain
(non-wildcard, non-exception) rules: the LONGEST suffix-list entry that
matches the host's label tail wins, and the registrable domain is that
suffix plus one preceding label; a host with no matching entry falls back
to the last TWO labels (the PSL "prevailing rule" for unknown TLDs is one
label — the two-label fallback keeps ``example.test`` style fixture hosts
grouped usefully, and is pinned + documented); a host that IS a suffix (or
a single label) is its own group.

Implementation is pure Catalyst over a PINNED suffix tuple compiled into
an ``isin`` chain — right for the curated-subset case (tests, fixtures,
one-country crawls). For the full ~9k-entry PSL, pass the list as a
DataFrame to ``pld_rollup``'s join path instead: candidates = the host's
last 1..3 label tails (three narrow projections), broadcast-joined against
the suffix relation, longest match kept — same semantics, one broadcast
join, no 9k-literal expression.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: curated default for the synthetic fixtures + common real TLDs
DEFAULT_SUFFIXES = (
    "com", "org", "net", "edu", "gov", "io", "dev",
    "co.uk", "ac.uk", "gov.uk", "com.au", "co.jp", "or.jp",
    "test",
)


def pld_expr(host: Column, suffixes: Sequence[str] = DEFAULT_SUFFIXES) -> Column:
    """Registrable domain of a lowercase host column, pure Catalyst."""
    labs = F.split(host, r"\.")
    n = F.size(labs)
    two = [s for s in suffixes if s.count(".") == 1]
    one = [s for s in suffixes if "." not in s]
    tail1 = F.element_at(labs, -1)
    tail2 = F.when(n >= 2, F.concat_ws(".", F.element_at(labs, -2), tail1))
    # longest matching suffix wins; registrable = suffix + one label
    pld2 = F.when(n >= 3, F.concat_ws(".", F.element_at(labs, -3), tail2))
    pld1 = tail2
    return (
        F.when(n <= 1, host)
        .when(tail2.isin(*two) if two else F.lit(False),
              F.coalesce(pld2, tail2))
        .when(tail1.isin(*one) if one else F.lit(False),
              F.coalesce(pld1, host))
        # unknown TLD: pinned two-label fallback
        .otherwise(F.coalesce(tail2, host))
    )


def pld_rollup(
    hosts: DataFrame,
    suffixes: Sequence[str] = DEFAULT_SUFFIXES,
    host_col: str = "host",
    weight_col: str = None,
) -> DataFrame:
    """Group a host dimension by registrable domain: (pld, n_hosts,
    weight) where ``weight`` sums ``weight_col`` when given (else row
    count) — the input the budget apportioner (frontier.allocate_budget)
    takes to hand one organization ONE budget regardless of how many
    subdomains it mints. One combinable aggregate on the host dimension
    (never the frontier)."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        hosts.select(
            pld_expr(F.lower(F.col(host_col)), suffixes).alias("pld"),
            w.alias("__w"),
        )
        .groupBy("pld")
        .agg(
            F.count("*").cast("long").alias("n_hosts"),
            F.sum("__w").cast("long").alias("weight"),
        )
    )


def allocate_budget_by_pld(
    host_weights: DataFrame,
    total_budget: int,
    suffixes: Sequence[str] = DEFAULT_SUFFIXES,
) -> DataFrame:
    """Two-level Hamilton apportionment: the global fetch budget splits
    across REGISTRABLE domains by summed weight (one organization = one
    share, however many subdomains it mints), then each domain's budget
    splits across its hosts — both levels the exact largest-remainder
    integer rule of ``frontier.allocate_budget`` (level 1 IS that
    function, applied to the pld dimension). sum(host budgets) ==
    total_budget exactly, always; a subdomain farm can no longer
    multiply its organization's share.

    Scale shape: level 1 inherits allocate_budget's two scalar
    aggregates + one dense-sequence over the (smaller) pld dimension;
    level 2 adds one pld-keyed window pass over the host dimension
    (rank-within-group; never the frontier). Returns (host, pld, weight,
    budget) — checkout(host_budgets=...) consumes (host, budget)
    directly.
    """
    from pyspark.sql import Window

    from .frontier import allocate_budget

    hp = host_weights.select(
        F.col("host"),
        F.col("weight").cast("long").alias("weight"),
        pld_expr(F.lower(F.col("host")), suffixes).alias("pld"),
    )
    gw = hp.groupBy("pld").agg(F.sum("weight").cast("long").alias("weight"))
    pb = allocate_budget(gw, total_budget, host_col="pld").select(
        F.col("host").alias("pld"),
        F.col("weight").alias("__pw"),
        F.col("budget").alias("__b"),
    )
    j = (
        hp.join(pb, "pld")
        .withColumn("__base", F.expr("(__b * weight) div __pw"))
        .withColumn("__rem", F.expr("(__b * weight) % __pw"))
    )
    grp = Window.partitionBy("pld")
    order = Window.partitionBy("pld").orderBy(
        F.desc("__rem"), F.asc("host")
    )
    return (
        j.withColumn("__lo", F.col("__b") - F.sum("__base").over(grp))
        .withColumn("__rk", F.row_number().over(order) - 1)
        .select(
            "host",
            "pld",
            "weight",
            (
                F.col("__base")
                + F.when(F.col("__rk") < F.col("__lo"), 1).otherwise(0)
            ).cast("long").alias("budget"),
        )
    )


def nepotism_audit(
    host_edges: DataFrame,
    suffixes: Sequence[str] = DEFAULT_SUFFIXES,
    min_links: int = 3,
    flag_milli: int = 500,
) -> DataFrame:
    """Nepotistic-link audit (Davison 2000, "Recognizing nepotistic links
    on the Web"): links between DIFFERENT hosts under the SAME
    registrable domain are one organization talking to itself — they
    inflate host-level link signals (host in-degree, host PageRank,
    TrustRank propagation) without independent endorsement, the classic
    subdomain-farm shape. Input is the condensed host graph
    (operators/linkgraph.host_condense rows: src_host, dst_host,
    n_links); per source PLD this audits where its links point:

      intra_links      — same host (navigation; excluded from the rate)
      nepotistic_links — different host, same PLD
      external_links   — different PLD (the only real endorsement)
      nepotism_milli   — 1000*nepotistic div (nepotistic+external)
      flagged          — rate >= ``flag_milli`` with >= ``min_links``
                         cross-host evidence

    One PLD projection + one combinable aggregate over the HOST-graph
    dimension (already condensed — never page-scale). Returns
    (pld, n_hosts, intra_links, nepotistic_links, external_links,
    nepotism_milli, flagged).
    """
    e = host_edges.select(
        pld_expr(F.lower(F.col("src_host")), suffixes).alias("pld"),
        pld_expr(F.lower(F.col("dst_host")), suffixes).alias("__dst_pld"),
        F.col("src_host"),
        F.col("dst_host"),
        F.col("n_links").cast("long").alias("n_links"),
    )
    agg = e.groupBy("pld").agg(
        F.countDistinct("src_host").cast("long").alias("n_hosts"),
        F.sum(
            F.when(F.col("src_host") == F.col("dst_host"), F.col("n_links"))
            .otherwise(0)
        ).cast("long").alias("intra_links"),
        F.sum(
            F.when(
                (F.col("src_host") != F.col("dst_host"))
                & (F.col("pld") == F.col("__dst_pld")),
                F.col("n_links"),
            ).otherwise(0)
        ).cast("long").alias("nepotistic_links"),
        F.sum(
            F.when(F.col("pld") != F.col("__dst_pld"), F.col("n_links"))
            .otherwise(0)
        ).cast("long").alias("external_links"),
    )
    rate = F.when(
        F.col("nepotistic_links") + F.col("external_links") > 0,
        F.expr(
            "(1000 * nepotistic_links)"
            " div (nepotistic_links + external_links)"
        ),
    ).otherwise(F.lit(0)).cast("long")
    return agg.withColumn("nepotism_milli", rate).withColumn(
        "flagged",
        (F.col("nepotism_milli") >= flag_milli)
        & (F.col("nepotistic_links") >= min_links),
    )
