"""URL-level corpus filtering (the RefinedWeb / UT1-blocklist shape).

Before any byte of a page is fetched, web-scale curation drops URLs by
(1) a strict domain blocklist (exact host or any subdomain of a listed
domain) and (2) a soft score summing weights of banned words that appear
anywhere in the URL (Penedo et al. 2023 §3.1 use exactly this
two-signal shape on top of the UT1 adult list). The reference crawler
has only a domain *allow* regex (see_crawl_queue.erl's domain filter,
mirrored by operators/frontier.py:canonicalize_and_filter); this module
is the engine-addition *block* side that a training-data crawl needs.

Scale design:

- ``url_blocklist_score`` compiles a small curated word list (tens of
  entries — RefinedWeb's curated list is ~60 words) straight into the
  plan as an unrolled CASE sum: pure whole-stage codegen, zero shuffle,
  zero joins. Weights are integer milli-points so the score is exact in
  any engine and never subject to float summation order.
- ``domain_block_join`` is the scale path for the *strict* list, which
  in production is millions of rows (UT1 ships ~4M domains): a
  broadcast LEFT SEMI join of the frontier's reversed-host prefix
  against the list. The 10^10-row frontier never shuffles; only the
  dimension-sized blocklist moves. Subdomain semantics come from each
  host's ancestor-domain chain (a.b.c.test -> [c.test, b.c.test,
  a.b.c.test]) joined position-by-position — bounded by URL label
  depth, so the cost is a few broadcast probes per row, no explode.
- ``blocklist_keep`` is the filter-predicate form the crawl loop wires
  in (CrawlConfig.url_blocklist_*): candidates are dropped BEFORE
  URL-seen insertion, so blocked URLs never occupy frontier rows,
  bloom bits, or fetch budget — the cheapest byte saved in the whole
  pipeline.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Host from an absolute URL: scheme://HOST[/?#...].  Stays inside the
# Java/RE2 common subset so DuckDB's regexp_extract agrees byte-for-byte.
HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"


def _host(url_col, host_col):
    if host_col is not None:
        return F.col(host_col)
    return F.regexp_extract(F.col(url_col), HOST_RE, 1)


def _score_expr(url_col: str, banned_words: Sequence[Tuple[str, int]]):
    url_l = F.lower(F.col(url_col))
    return reduce(
        lambda a, b: a + b,
        [
            F.when(url_l.contains(w.lower()), F.lit(int(g))).otherwise(F.lit(0))
            for w, g in banned_words
        ],
    )


def _blocked_expr(host, banned_domains: Sequence[str]):
    if not banned_domains:
        return F.lit(False)
    return reduce(
        lambda a, b: a | b,
        [(host == d) | host.endswith("." + d) for d in banned_domains],
    )


def url_blocklist_score(
    frontier: DataFrame,
    banned_words: Sequence[Tuple[str, int]],
    banned_domains: Sequence[str] = (),
    threshold_milli: int = 1000,
    url_col: str = "url",
    host_col: str | None = None,
) -> DataFrame:
    """Score every URL against a weighted banned-word list plus a strict
    domain list; keep/drop is ``domain_blocked OR score >= threshold``.

    ``banned_words`` is ``[(word, weight_milli)]`` — weights are integer
    milli-points (RefinedWeb's 0..1 weights x1000) so sums are exact.
    Both lists are compiled into the plan (unrolled CASE terms): the
    whole operator is a narrow codegen map over the frontier — the right
    shape for a curated list of tens of entries. For million-entry
    strict lists use ``domain_block_join``.

    Output (all scalars, gate-safe): url, host, score_milli, n_hits,
    domain_blocked, dropped.
    """
    if not banned_words:
        raise ValueError("banned_words must be non-empty")
    url_l = F.lower(F.col(url_col))
    score = _score_expr(url_col, banned_words)
    hits = reduce(
        lambda a, b: a + b,
        [
            F.when(url_l.contains(w.lower()), F.lit(1)).otherwise(F.lit(0))
            for w, _ in banned_words
        ],
    )
    host = _host(url_col, host_col)
    blocked = _blocked_expr(host, banned_domains)
    out = frontier.select(
        F.col(url_col).alias("url"),
        host.alias("host"),
        score.cast("long").alias("score_milli"),
        hits.cast("long").alias("n_hits"),
        blocked.cast("long").alias("domain_blocked"),
    )
    return out.withColumn(
        "dropped",
        (
            (F.col("domain_blocked") == 1)
            | (F.col("score_milli") >= F.lit(int(threshold_milli)))
        ).cast("long"),
    )


def domain_block_join(
    frontier: DataFrame,
    blocked_domains: DataFrame,
    url_col: str = "url",
    host_col: str | None = None,
    domain_col: str = "domain",
    max_labels: int = 6,
) -> DataFrame:
    """Strict-domain blocking against a TABLE of domains (the UT1-scale
    path: millions of rows, too big to unroll into the plan).

    Shape: ONE broadcast left join per ancestor-chain position (the
    chain is bounded by URL label depth — ``max_labels`` positions,
    default 6 covers real-web hosts). No explode, no re-aggregation, and
    the 10^10-row frontier never shuffles: each join is a broadcast hash
    join keyed on ``element_at(chain, i)``, and the flags OR together in
    the same codegen stage. Hosts deeper than ``max_labels`` labels
    check their ``max_labels`` SHORTEST suffixes (the chain is built
    suffix-first), so a listed registrable domain still blocks
    arbitrarily deep subdomains. Returns the frontier plus ``host`` and
    ``domain_blocked`` 0/1. Equality with the unrolled
    ``url_blocklist_score`` strict arm is pinned by
    tests/test_urlfilter.py."""
    host = _host(url_col, host_col)
    # suffix-first chain: [c.test, b.c.test, a.b.c.test] so truncation at
    # max_labels drops the LONGEST (most specific) suffixes, never the
    # registrable domain the blocklist actually lists
    labels = F.split(host, r"\.")
    n = F.size(labels)
    chain = F.transform(
        F.sequence(F.greatest(n - 2, F.lit(0)), F.lit(0), F.lit(-1)),
        lambda i: F.array_join(F.slice(labels, i + 1, n - i), "."),
    )
    out = frontier.withColumn("__host", host).withColumn("__anc", chain)
    dim = F.broadcast(
        blocked_domains.select(F.col(domain_col).alias("__blk")).distinct()
    )
    flags = []
    for i in range(1, max_labels + 1):
        d = dim.withColumnRenamed("__blk", f"__blk{i}")
        out = out.join(
            d, F.try_element_at(F.col("__anc"), F.lit(i)) == F.col(f"__blk{i}"),
            "left",
        )
        flags.append(F.col(f"__blk{i}").isNotNull())
    blocked = reduce(lambda a, b: a | b, flags)
    return (
        out.withColumn("domain_blocked", blocked.cast("long"))
        .drop("__anc", *[f"__blk{i}" for i in range(1, max_labels + 1)])
        .withColumnRenamed("__host", "host")
    )


def blocklist_keep(
    df: DataFrame,
    banned_words: Sequence[Tuple[str, int]],
    banned_domains: Sequence[str] = (),
    threshold_milli: int = 1000,
    url_col: str = "url",
) -> DataFrame:
    """Predicate form for pipeline wiring (CrawlConfig.url_blocklist):
    keeps only non-dropped rows, preserving every input column. Same
    unrolled-codegen semantics as ``url_blocklist_score`` — drop when
    domain-blocked OR soft score >= threshold."""
    if not banned_words and not banned_domains:
        return df
    score = (
        _score_expr(url_col, banned_words) if banned_words else F.lit(0)
    )
    blocked = _blocked_expr(_host(url_col, None), banned_domains)
    return df.filter(~(blocked | (score >= F.lit(int(threshold_milli)))))
