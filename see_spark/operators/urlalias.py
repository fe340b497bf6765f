"""DUST-style URL alias mining — "Different URLs with Similar Text".

A web-scale crawler wastes fetch budget and poisons dedup statistics
when the same content hides behind many URLs: session-id query
parameters, tracking parameters, and whole mirror hosts. The classic
treatment is Bar-Yossef et al., *Do Not Crawl in the DUST* (WWW'07):
mine rewrite rules from URLs whose fetched content already proved
identical, then apply the rules to FUTURE frontier candidates so the
aliases never get fetched at all. The reference crawler
(/root/reference/apps/crawler/src/see_crawler_url.erl) canonicalizes
syntax only (case, dot-segments, query strings are dropped wholesale on
relative resolution) and has no content-evidence loop; this module adds
it on top of the same canonical-URL space.

Three operators, all pure Catalyst (no Python UDFs):

``mine_param_rules(pages, min_support)``
    pages = (url, fp) where fp is any content fingerprint the pipeline
    already computes (md5 of text, simhash, …). For every URL and every
    query parameter occurrence ``k=v`` in it, build the *residual* URL
    (same host+path, remaining params in original order) and look it up
    in the corpus. Residual exists with the SAME fingerprint → evidence
    that ``(host, k)`` is content-irrelevant; exists with a DIFFERENT
    fingerprint → counterexample. A rule is ``strippable`` iff
    support >= min_support AND counterexamples == 0 — one observed
    conflict kills the rule (the DUST paper's "no negative instance"
    condition), so correctness never rests on a majority vote.

``apply_param_rules(pages, rules)``
    Rewrite each URL by dropping its strippable params (original order
    of the survivors preserved; '?' dropped when nothing survives).
    Anti-join against the (host, param) rule table — the rule side is
    dimension-sized (≤ hosts × param-vocab) and broadcasts.

``mirror_hosts(pages, ...)``
    Hosts serving the same (path+query, fingerprint) signatures are
    mirrors. Equi-join hosts through the signature (never host×host all
    pairs), count shared signatures per host pair, and keep pairs whose
    integer Jaccard resemblance ``1000*shared div (|A|+|B|-shared)``
    clears a threshold. ``max_hosts_per_sig`` caps the per-signature
    fan-out exactly like the shingle-df cap in dedup.py: a signature on
    S hosts contributes S(S-1)/2 pair rows, so boilerplate shared by
    thousands of hosts (empty pages, parked-domain templates) must be
    dropped, not joined.

Scale shape (10^10 URLs): every join here is an equi-join on
(host, path, qs) or on a content signature — both are the natural keys
the frontier/docs tables already carry, and the per-row fan-out is
bounded (#params per URL; capped hosts per signature). Rule mining is a
batch job over the docs table once per crawl epoch; rule APPLICATION is
a broadcast anti-join in the frontier path, costing the same as the
urlfilter.py domain gate.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCHEME_RE = r"^([a-z][a-z0-9+.-]*)://"
HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)"
QS_RE = r"\?([^#]*)"


def split_url(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Add (scheme, host, path, qs) columns parsed from ``url_col``.

    qs is '' for URLs without '?'; the fragment (never fetched) is
    excluded on both sides of every regex.
    """
    u = F.col(url_col)
    return pages.withColumns(
        {
            "scheme": F.regexp_extract(u, SCHEME_RE, 1),
            "host": F.regexp_extract(u, HOST_RE, 1),
            "path": F.regexp_extract(u, PATH_RE, 1),
            "qs": F.when(
                u.contains("?"), F.regexp_extract(u, QS_RE, 1)
            ).otherwise(F.lit("")),
        }
    )


def _param_occurrences(parts: DataFrame) -> DataFrame:
    """One row per (url, param occurrence): pos (0-based), kv, key,
    and the residual query string with that occurrence removed."""
    with_ps = parts.where(F.col("qs") != "").withColumn(
        "ps", F.split("qs", "&")
    )
    kv = with_ps.select(
        "*", F.posexplode("ps").alias("pos", "kv")
    )
    return kv.withColumns(
        {
            "key": F.split("kv", "=").getItem(0),
            "rqs": F.array_join(
                F.filter("ps", lambda x, i: i != F.col("pos")), "&"
            ),
        }
    )


def mine_param_rules(
    pages: DataFrame,
    min_support: int = 2,
    url_col: str = "url",
    fp_col: str = "fp",
) -> DataFrame:
    """(host, param, support, counterexamples, strippable) — see module
    docstring. ``pages`` must be distinct by url (one fingerprint per
    URL); duplicate rows would double-count support."""
    parts = split_url(
        pages.select(F.col(url_col).alias("url"), F.col(fp_col).alias("fp")),
    )
    occ = _param_occurrences(parts).select("host", "path", "fp", "key", "rqs")
    target = parts.select(
        "host",
        F.col("path").alias("t_path"),
        F.col("qs").alias("t_qs"),
        F.col("fp").alias("t_fp"),
    )
    ev = occ.join(
        target,
        (occ["path"] == target["t_path"])
        & (occ["rqs"] == target["t_qs"])
        & (occ["host"] == target["host"]),
    ).select(
        occ["host"],
        "key",
        F.when(F.col("t_fp") == F.col("fp"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("evid"),
        F.when(F.col("t_fp") != F.col("fp"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("cex"),
    )
    return ev.groupBy("host", F.col("key").alias("param")).agg(
        F.sum("evid").cast("long").alias("support"),
        F.sum("cex").cast("long").alias("counterexamples"),
    ).withColumn(
        "strippable",
        F.when(
            (F.col("support") >= F.lit(int(min_support)))
            & (F.col("counterexamples") == 0),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )


def apply_param_rules(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast: bool = True,
) -> DataFrame:
    """(url, alias_url): each URL with its strippable params removed.

    URLs with no query string, or no strippable params, alias to
    themselves. The rule table is broadcast by default (dimension-sized:
    hosts × param vocabulary); pass broadcast=False to sort-merge when a
    rule table outgrows the driver."""
    strip = rules.where(F.col("strippable") == 1).select(
        "host", F.col("param").alias("key")
    )
    if broadcast:
        strip = F.broadcast(strip)
    parts = split_url(pages.select(F.col(url_col).alias("url")))
    occ = _param_occurrences(parts).select(
        "url", "scheme", "host", "path", "pos", "kv", "key"
    )
    kept = occ.join(strip, ["host", "key"], "left_anti")
    rebuilt = kept.groupBy("url").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "kv"))),
                lambda s: s["kv"],
            ),
            "&",
        ).alias("new_qs")
    )
    out = (
        parts.join(rebuilt, "url", "left")
        .withColumn("new_qs", F.coalesce("new_qs", F.lit("")))
        .withColumn(
            "alias_url",
            # unparseable rows (no scheme://host) pass through unchanged —
            # the crawl path canonicalizes/drops those upstream, but this
            # operator must not manufacture '://' aliases for them
            F.when(F.col("host") == "", F.col("url")).otherwise(
                F.concat(
                    F.col("scheme"),
                    F.lit("://"),
                    F.col("host"),
                    F.col("path"),
                    F.when(
                        F.col("new_qs") != "",
                        F.concat(F.lit("?"), F.col("new_qs")),
                    ).otherwise(F.lit("")),
                )
            ),
        )
    )
    return out.select("url", "host", "alias_url")


def mirror_hosts(
    pages: DataFrame,
    min_shared: int = 2,
    min_resemblance_milli: int = 500,
    max_hosts_per_sig: Optional[int] = None,
    url_col: str = "url",
    fp_col: str = "fp",
) -> DataFrame:
    """(host_a, host_b, shared, size_a, size_b, resemblance_milli) for
    host pairs whose (path+qs, fingerprint) signature sets overlap.

    host_a < host_b lexicographically; resemblance is the integer
    Jaccard over distinct signatures. Set ``max_hosts_per_sig`` at web
    scale (module docstring)."""
    parts = split_url(
        pages.select(F.col(url_col).alias("url"), F.col(fp_col).alias("fp")),
    )
    sigs = parts.select(
        "host",
        F.concat(
            F.col("path"),
            F.when(
                F.col("qs") != "", F.concat(F.lit("?"), F.col("qs"))
            ).otherwise(F.lit("")),
        ).alias("sig"),
        "fp",
    ).distinct()
    if max_hosts_per_sig is not None:
        per_sig = sigs.groupBy("sig", "fp").agg(
            F.count("*").alias("n_hosts")
        )
        sigs = sigs.join(
            per_sig.where(F.col("n_hosts") <= int(max_hosts_per_sig)).select(
                "sig", "fp"
            ),
            ["sig", "fp"],
        )
    sizes = sigs.groupBy("host").agg(F.count("*").cast("long").alias("size"))
    a = sigs.select(F.col("host").alias("host_a"), "sig", "fp")
    b = sigs.select(F.col("host").alias("host_b"), "sig", "fp")
    shared = (
        a.join(b, ["sig", "fp"])
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").cast("long").alias("shared"))
    )
    out = (
        shared.join(
            sizes.select(
                F.col("host").alias("host_a"), F.col("size").alias("size_a")
            ),
            "host_a",
        )
        .join(
            sizes.select(
                F.col("host").alias("host_b"), F.col("size").alias("size_b")
            ),
            "host_b",
        )
        .withColumn(
            "resemblance_milli",
            F.expr("(1000 * shared) div (size_a + size_b - shared)"),
        )
    )
    return out.where(
        (F.col("shared") >= int(min_shared))
        & (F.col("resemblance_milli") >= int(min_resemblance_milli))
    ).select(
        "host_a", "host_b", "shared", "size_a", "size_b", "resemblance_milli"
    )


# rel=canonical extraction (the EXPLICIT alias signal; the rules above are
# the inferred one) -----------------------------------------------------

_CANON_A = (
    r'<link[^>]*rel=["\']?canonical["\']?[^>]*href=["\']([^"\']+)["\']'
)
_CANON_B = (
    r'<link[^>]*href=["\']([^"\']+)["\'][^>]*rel=["\']?canonical["\']?'
)
_ORIGIN = r"^(https?://[^/?#]+)"


def rel_canonical_edges(
    raw_docs: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """``<link rel="canonical">`` alias edges from raw HTML — the
    publisher-declared duplicate signal (Google/RFC 6596), complementing
    the DUST rules this module INFERS from content evidence. Engine
    addition: the reference parser collects only <a href> (see_html.erl:
    54-78); rel=canonical is the standard extra tag a dedup pipeline
    consumes.

    Pure Catalyst: two regexes tolerate either attribute order (first
    match wins, the browser rule for duplicated tags); pinned resolution
    semantics — absolute http(s) hrefs kept, root-relative ``/path``
    joined to the page origin, anything else (relative, protocol-
    relative, garbage) -> NULL canonical with ``href_unresolved`` = true
    so coverage is auditable. Zero shuffle: row-local extraction; the
    output feeds the same alias machinery as ``apply_param_rules`` (a
    broadcast-join rewrite) or dup-cluster election.

    Returns (url, canonical_url, is_self, is_cross_host,
    href_unresolved) for pages that DECLARE a canonical; pages without
    the tag emit no row.
    """
    href = F.coalesce(
        F.nullif(F.regexp_extract(F.col(body_col), _CANON_A, 1), F.lit("")),
        F.nullif(F.regexp_extract(F.col(body_col), _CANON_B, 1), F.lit("")),
    )
    origin = F.regexp_extract(F.col(url_col), _ORIGIN, 1)
    resolved = (
        F.when(href.rlike("^https?://"), href)
        .when(
            href.startswith("/") & ~href.startswith("//"),
            F.concat(origin, href),
        )
        .otherwise(F.lit(None))
    )
    host = F.regexp_extract(F.col(url_col), r"^https?://([^/?#]+)", 1)
    chost = F.regexp_extract(resolved, r"^https?://([^/?#]+)", 1)
    return (
        raw_docs.select(
            F.col(url_col).alias("url"),
            href.alias("__href"),
            resolved.alias("canonical_url"),
            host.alias("__h"),
            chost.alias("__ch"),
        )
        .filter(F.col("__href").isNotNull())
        .select(
            "url",
            "canonical_url",
            (F.col("canonical_url") == F.col("url")).alias("is_self"),
            F.when(
                F.col("canonical_url").isNull(), F.lit(None).cast("boolean")
            )
            .otherwise(F.col("__ch") != F.col("__h"))
            .alias("is_cross_host"),
            F.col("canonical_url").isNull().alias("href_unresolved"),
        )
    )
