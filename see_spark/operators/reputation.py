"""Host-reputation gating — the domain-level curation arm.

Web-scale curation decides at TWO granularities: per-URL (the
urlfilter.py blocklist, decided before any fetch) and per-HOST from
evidence the crawl has already gathered (RefinedWeb and FineWeb both
re-weight or drop whole domains once enough of a domain's pages have
been scored). The reference has neither; this module adds the
host-level loop: score crawled documents, aggregate per host, and gate
FUTURE frontier candidates from hosts whose observed quality is low.

Cross-engine exactness: the per-doc score is the integer rational form
of textstats.quality_score's pinned composite —

    q = min(n,200)/200 * (n-rep)/n * (n+stop)/(2n)
    q_milli = (1000 * min(n,200) * (n-rep) * (n+stop)) div (400 * n * n)

(all int64; numerator bounded by 1000*200*n² so n up to ~2e5 tokens per
doc is overflow-safe), and the gate rule avoids division entirely:
a host fails when  n_docs >= min_docs  AND
sum_q_milli < min_avg_milli * n_docs  (integer cross-multiplication).
Hosts with fewer than min_docs observations PASS — the cold-start rule:
reputation only ever acts on evidence, never on absence of it.

Scale shape: per-doc scoring is a narrow codegen map; the host
aggregate is one map-side-combinable shuffle onto ~|hosts| keys; the
gate is a broadcast left join for dimension-sized host tables (up to
~10^7 hosts). At 10^8+ hosts pass ``broadcast=False``: the frontier is
already hash-partitioned by host for checkout (SCALE.md), so the
host-keyed sort-merge join is co-partitioned and adds no extra
frontier shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import STOPWORDS

QUALITY_SCALE = 1000


def doc_quality_milli(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    host_col: str = "host",
) -> DataFrame:
    """(doc_id, host, q_milli): integer-exact per-doc quality."""
    toks = F.split(F.col(text_col), " ")
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(host_col).alias("host"),
        F.size(toks).cast("long").alias("n"),
        (F.size(toks) - F.size(F.array_distinct(toks))).cast("long").alias("rep"),
        F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
        .cast("long")
        .alias("stop"),
    )
    q = F.expr(
        f"({QUALITY_SCALE}L * least(n, 200L) * (n - rep) * (n + stop))"
        " div (400L * n * n)"
    )
    return base.select("doc_id", "host", q.alias("q_milli"))


def host_quality_stats(doc_q: DataFrame) -> DataFrame:
    """(host, n_docs, sum_q_milli): one map-side-combinable shuffle."""
    return doc_q.groupBy("host").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("q_milli").cast("long").alias("sum_q_milli"),
    )


def host_quality_gate(
    frontier: DataFrame,
    host_stats: DataFrame,
    min_docs: int = 3,
    min_avg_milli: int = 150,
    host_col: str = "host",
    broadcast: bool = True,
) -> DataFrame:
    """Append (n_docs, sum_q_milli, passed) to frontier rows. passed=0
    iff the host has >= min_docs scored documents AND its summed quality
    falls below min_avg_milli per doc (integer cross-multiply — no
    float, no division). Unknown / low-evidence hosts pass."""
    stats = host_stats.select(
        F.col("host").alias("__rh"), "n_docs", "sum_q_milli"
    )
    if broadcast:
        stats = F.broadcast(stats)
    out = frontier.join(
        stats, frontier[host_col] == stats["__rh"], "left"
    ).drop("__rh")
    out = out.withColumn("n_docs", F.coalesce(F.col("n_docs"), F.lit(0))).withColumn(
        "sum_q_milli", F.coalesce(F.col("sum_q_milli"), F.lit(0))
    )
    failed = (F.col("n_docs") >= F.lit(int(min_docs))) & (
        F.col("sum_q_milli") < F.lit(int(min_avg_milli)) * F.col("n_docs")
    )
    return out.withColumn("passed", (~failed).cast("long"))


def host_quality_agg(df: DataFrame) -> DataFrame:
    """Aggregated view over the append-only host_quality increment table
    (both sums decomposable — the word_stats/hoststats compaction
    idiom)."""
    return df.groupBy("host").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("sum_q_milli").cast("long").alias("sum_q_milli"),
    )


def cloaking_audit(
    fetches: DataFrame,
    bot_ua: str = "bot",
    user_ua: str = "user",
    min_both: int = 3,
    flag_milli: int = 300,
) -> DataFrame:
    """Cloaking detection by dual-user-agent probing — the standard
    anti-spam audit (Wu & Davison, WWW 2005 "Cloaking and Redirection"):
    fetch a sample of each host's URLs under the crawler UA and a
    browser-like UA and compare content hashes; a host serving different
    bytes to the crawler at scale is cloaking (UA-conditional serving),
    the spam signal robots.txt can't express and link analysis can't
    see. Input is the probe log: (url, host, ua, content_hash), one row
    per (url, ua) fetch.

    Per host over URLs probed under BOTH UAs: n_both, n_diff (hash
    mismatch), cloak_milli = 1000*n_diff div n_both, flagged when
    evidence >= ``min_both`` URLs and the rate >= ``flag_milli``.
    Dynamic content causes sporadic mismatches on legitimate hosts —
    hence rate + evidence floor, not any-mismatch.

    Scale shape: one url-keyed pivot join (the two UA relations meet on
    url) + one combinable host aggregate. Returns
    (host, n_probed, n_both, n_diff, cloak_milli, flagged).
    """
    bot = fetches.where(F.col("ua") == bot_ua).select(
        "url", "host", F.col("content_hash").alias("__bot_h")
    )
    usr = fetches.where(F.col("ua") == user_ua).select(
        "url", F.col("content_hash").alias("__usr_h")
    )
    j = bot.join(usr, "url", "left")
    per_host = j.groupBy("host").agg(
        F.count("*").cast("long").alias("n_probed"),
        F.sum(F.col("__usr_h").isNotNull().cast("long"))
        .cast("long")
        .alias("n_both"),
        F.sum(
            (
                F.col("__usr_h").isNotNull()
                & (F.col("__usr_h") != F.col("__bot_h"))
            ).cast("long")
        )
        .cast("long")
        .alias("n_diff"),
    )
    return per_host.select(
        "host",
        "n_probed",
        "n_both",
        "n_diff",
        F.when(
            F.col("n_both") > 0, F.expr("(1000 * n_diff) div n_both")
        ).otherwise(F.lit(0)).cast("long").alias("cloak_milli"),
        (
            (F.col("n_both") >= min_both)
            & (F.expr("(1000 * n_diff) div n_both") >= flag_milli)
        ).alias("flagged"),
    )
