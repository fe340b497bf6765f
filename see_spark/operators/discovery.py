"""Frontier discovery analytics — is a host exhausted?

A web crawler allocating per-host budget (frontier.py checkout) needs to
know when a host has little left to discover: pouring rounds into a host
whose link graph keeps re-surfacing the same URLs wastes politeness-
limited fetch slots. Two classic, cheap signals:

``discovery_curve``
    per (host, round): how many URLs were first seen that round, plus
    the running cumulative — the saturation curve an operator plots.
    One aggregate + one per-host window over round counts (|hosts| x
    |rounds| rows, dimension-sized).

``unseen_mass``
    Good-Turing estimate of the probability mass of UNSEEN URLs from
    sighting multiplicities (Good 1953; the same f1/N estimator
    species-richness and LM smoothing use): if a host's link graph has
    been sighted N times and f1 distinct URLs were sighted exactly once,
    the chance the next sighting is a brand-new URL is ~ f1/N. Integer
    rational output (``unseen_milli`` = 1000*f1 div N) so any engine
    reproduces it bit-for-bit. ``exhausted`` gates on
    unseen_milli < threshold with an evidence floor (n_obs >= min_obs) —
    the cold-start rule reputation.py uses: never act on absence of
    evidence.

Scale shape: both are map-side-combinable aggregates over (host, url)
sightings — the crawl already materializes these as the outlink table —
onto |distinct urls| then |hosts| keys; no joins, no windows over row
data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def discovery_curve(
    first_seen: DataFrame,
    host_col: str = "host",
    round_col: str = "first_round",
) -> DataFrame:
    """(host, round, n_new, cum_urls) from (host, url, first_round)."""
    per = first_seen.groupBy(
        F.col(host_col).alias("host"), F.col(round_col).alias("round")
    ).agg(F.count("*").cast("long").alias("n_new"))
    w = (
        Window.partitionBy("host")
        .orderBy("round")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per.withColumn(
        "cum_urls", F.sum("n_new").over(w).cast("long")
    )


def unseen_mass(
    sightings: DataFrame,
    threshold_milli: int = 50,
    min_obs: int = 20,
    host_col: str = "host",
    url_col: str = "url",
) -> DataFrame:
    """(host, n_obs, n_distinct, f1, unseen_milli, exhausted) — module
    docstring. ``sightings`` rows repeat per URL sighting."""
    per_url = sightings.groupBy(
        F.col(host_col).alias("host"), F.col(url_col).alias("url")
    ).agg(F.count("*").cast("long").alias("n"))
    per_host = per_url.groupBy("host").agg(
        F.sum("n").cast("long").alias("n_obs"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("long")
        .alias("f1"),
    )
    return per_host.select(
        "host",
        "n_obs",
        "n_distinct",
        "f1",
        F.expr("(1000 * f1) div n_obs").cast("long").alias("unseen_milli"),
    ).withColumn(
        "exhausted",
        F.when(
            (F.col("n_obs") >= int(min_obs))
            & (F.col("unseen_milli") < int(threshold_milli)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )


def iqr_outlier_flags(
    df: DataFrame,
    value_col: str,
    key_cols=("host",),
    k_milli: int = 1500,
) -> DataFrame:
    """Tukey-fence anomaly flags over a metric column — the crawl-
    monitoring rule for "this host's discovery/error/latency count is
    wildly off": value is an outlier when it leaves
    [q1 - k*iqr, q3 + k*iqr] (k = k_milli/1000; 1500 = the classic 1.5).

    Exact interpolated quartiles (binary-exact fractions on integer
    metrics — the events_median convention) and an identical fence
    formula in any engine. Output: key cols + (value, q1, q3, is_low,
    is_high). One scalar aggregate broadcast back over the rows — no
    shuffle of row data."""
    v = F.col(value_col).cast("double")
    q = df.agg(
        F.percentile(v, F.lit(0.25)).alias("q1"),
        F.percentile(v, F.lit(0.75)).alias("q3"),
    )
    out = df.crossJoin(F.broadcast(q))
    fence = F.lit(int(k_milli)) * (F.col("q3") - F.col("q1")) / F.lit(1000.0)
    return out.select(
        *[F.col(c) for c in key_cols],
        v.alias("value"),
        "q1",
        "q3",
        (v < F.col("q1") - fence).cast("long").alias("is_low"),
        (v > F.col("q3") + fence).cast("long").alias("is_high"),
    )


def content_novelty(
    docs_with_round: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_col: str = "round",
) -> DataFrame:
    """Crawl yield curve at CONTENT granularity: per crawl round, what
    fraction of the round's distinct word shingles had never been seen
    in any earlier round — the "is the crawl still finding new text"
    signal (URL-level novelty is operators/discovery.unseen_mass; this
    is its content-level sibling, robust to URL churn serving duplicate
    text). A shingle is NOVEL in the round where it first appears
    (min round over all docs containing it).

    Scale shape: distinct (round, shingle-hash) projection -> one
    shingle-keyed combinable min-aggregate -> join back on the same key
    (co-partitioned) -> per-round counts. Raw shingles are hashed to 60
    bits before any shuffle (~16 B keys). Returns per round:
    (round, n_docs, n_shingles, n_novel, novelty_milli).
    """
    from .dedup import hash60, word_shingles

    base = docs_with_round.select(
        F.col(id_col).alias("doc_id"),
        F.col(round_col).cast("long").alias("round"),
        F.col(text_col).alias("text"),
    )
    sh = (
        word_shingles(base, n=n)
        .join(base.select("doc_id", "round"), "doc_id")
        .select("round", hash60(F.col("shingle")).alias("sh_h"))
        .distinct()
    )
    first = sh.groupBy("sh_h").agg(F.min("round").alias("first_round"))
    per_round = (
        sh.join(first, "sh_h")
        .groupBy("round")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(
                (F.col("round") == F.col("first_round")).cast("long")
            ).cast("long").alias("n_novel"),
        )
    )
    docs_per_round = base.groupBy("round").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    return (
        docs_per_round.join(per_round, "round", "left")
        .select(
            "round",
            "n_docs",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.expr("(1000 * n_novel) div n_shingles"),
            ).otherwise(F.lit(0)).cast("long").alias("novelty_milli"),
        )
    )
