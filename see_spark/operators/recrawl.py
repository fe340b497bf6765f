"""Recrawl (freshness) scheduling: change-rate-adaptive revisit intervals.

The reference never revisits a page — `last_visit` is written once and no
code path re-queues a visited URL (apps/db/src/see_db_storage_ets.erl:73-82
only flips unvisited->visited). A production crawler must decide WHEN to
refetch; the standard policy (used by every large crawler, published in
the freshness literature) is exponential backoff on unchanged content:

  - each fetch records (url, round, content_hash);
  - a fetch whose hash differs from the previous fetch is a CHANGE
    (first fetch counts as a change);
  - unchanged_streak = fetches since the last change;
  - next_due = last_round + min(max_interval, min_interval * 2^streak)
    — pages that keep changing are revisited at min_interval, static
    pages back off geometrically to max_interval.

Spark shape: one window (lag over url, ordered by round) + one groupBy —
a single shuffle keyed by url, partition-count independent, no Python.
The interval math is integer-exact, so the DuckDB oracle matches
bit-for-bit. At 10^10 URLs the history table is partitioned by
bucket(url) and the window never crosses partitions (url is the
partition key), so this scales as one co-partitioned pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def recrawl_schedule(
    history: DataFrame,
    min_interval: int = 1,
    max_interval: int = 64,
    now_round: int | None = None,
) -> DataFrame:
    """(url, round, content_hash) fetch history -> per-url revisit plan.

    Returns (url, last_round, n_fetches, n_changes, unchanged_streak,
    interval, next_due_round[, due]). ``due`` only when ``now_round``
    given. A url fetched once has streak 0 (its first fetch IS a change)
    and comes due after min_interval.
    """
    w = Window.partitionBy("url").orderBy("round")
    prev = F.lag("content_hash").over(w)
    changed = (
        prev.isNull() | (F.col("content_hash") != prev)
    ).cast("int")
    marked = history.select(
        "url", "round",
        changed.alias("changed"),
        F.row_number().over(w).alias("rn"),
    )
    # streak = trailing run of unchanged fetches = last row_number minus
    # the row_number of the last change (first fetch is always a change,
    # so the max() below is never null). The groupBy reuses the window's
    # url partitioning — ONE shuffle total.
    agg = marked.groupBy("url").agg(
        F.max("round").alias("last_round"),
        F.count("*").alias("n_fetches"),
        F.sum("changed").alias("n_changes"),
        (
            F.max("rn") - F.max(F.when(F.col("changed") == 1, F.col("rn")))
        ).alias("unchanged_streak"),
    )
    out = agg.withColumn(
        "unchanged_streak", F.col("unchanged_streak").cast("long")
    )
    # integer-exact backoff: shiftleft, not pow (no floating point); the
    # shift is clamped so a long streak can't overflow 64 bits. expr form:
    # the Python shiftleft() wrapper only takes a literal shift.
    interval = F.least(
        F.lit(int(max_interval)).cast("long"),
        F.expr(
            f"shiftleft(CAST({int(min_interval)} AS BIGINT), "
            f"CAST(least(unchanged_streak, 32) AS INT))"
        ),
    )
    out = out.select(
        "url", "last_round", "n_fetches",
        F.col("n_changes").cast("long").alias("n_changes"),
        "unchanged_streak",
        interval.cast("long").alias("interval"),
        (F.col("last_round") + interval).cast("long").alias("next_due_round"),
    )
    if now_round is not None:
        out = out.withColumn(
            "due", F.col("next_due_round") <= F.lit(int(now_round))
        )
    return out


def due_urls(
    history: DataFrame,
    now_round: int,
    min_interval: int = 1,
    max_interval: int = 64,
) -> DataFrame:
    """URLs whose revisit is due at ``now_round`` — the frontier re-seed
    feed: join back into the frontier as unvisited rows (first-enqueue
    dedup applies as usual)."""
    plan = recrawl_schedule(history, min_interval, max_interval, now_round)
    return plan.filter(F.col("due")).select("url", "next_due_round")


def change_rate_estimate(history: DataFrame) -> DataFrame:
    """Poisson change-rate estimation per URL — Cho & Garcia-Molina 2003
    ("Estimating frequency of change"): with n COMPARISONS between
    consecutive fetches (n = fetches - 1), X of which detected a change,
    and mean inter-fetch gap Ibar = span / n rounds, the bias-corrected
    estimator is

        lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) / Ibar

    changes per round. ``half_life`` = ln(2)/lambda_hat is the age at
    which the cached copy is stale with probability 1/2 — the number a
    scheduler actually compares against its revisit interval
    (recrawl_schedule's exponential backoff CONVERGES to a fixed
    interval; this estimator justifies WHICH interval, from history).

    Exactness: the ratio is evaluated as (2*(n-X)+1)/(2*n+1) — an
    integer-over-integer double division, bit-identical across engines —
    and ln is the one libm op (the repo convention), so outputs rounded
    to 6dp are oracle-exact. X = 0 (never changed) yields lambda 0 and
    NULL half_life; single-fetch URLs (n = 0) and zero-span histories
    emit NULL lambda (no evidence — the engine's cold-start rule).

    One window pass keyed by url (change flags) + one combinable
    aggregate; the history table is url-partitioned so nothing crosses
    partitions. Returns (url, n_cmp, n_changes, span, lambda_6,
    half_life_6).
    """
    w = Window.partitionBy("url").orderBy("round")
    prev = F.lag("content_hash").over(w)
    flagged = history.select(
        "url", "round",
        F.when(prev.isNull(), F.lit(None).cast("int"))
        .otherwise((F.col("content_hash") != prev).cast("int"))
        .alias("chg"),
    )
    agg = flagged.groupBy("url").agg(
        F.count("chg").cast("long").alias("n_cmp"),
        F.coalesce(F.sum("chg"), F.lit(0)).cast("long").alias("n_changes"),
        (F.max("round") - F.min("round")).cast("long").alias("span"),
    )
    ratio = (
        (2 * (F.col("n_cmp") - F.col("n_changes")) + 1).cast("double")
        / (2 * F.col("n_cmp") + 1).cast("double")
    )
    lam = -F.log(ratio) * F.col("n_cmp").cast("double") / F.col("span").cast("double")
    valid = (F.col("n_cmp") > 0) & (F.col("span") > 0)
    lam_col = F.when(valid, F.round(lam, 6)).otherwise(
        F.lit(None).cast("double")
    )
    hl = F.when(
        valid & (F.col("n_changes") > 0),
        F.round(F.log(F.lit(2.0)) / lam, 6),
    ).otherwise(F.lit(None).cast("double"))
    return agg.select(
        "url", "n_cmp", "n_changes", "span",
        lam_col.alias("lambda_6"), hl.alias("half_life_6"),
    )
