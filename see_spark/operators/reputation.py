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
