"""Conditional revisits: HTTP revalidation composed with the recrawl
scheduler.

The reference never refetches a page (see recrawl.py's header note); a
production crawler revisits due pages, and the cheap way is RFC 9110
s13 conditional requests: send the stored validator (here the md5
content hash as an ETag), and an unchanged page answers **304 Not
Modified with no body** — the dominant case for static pages, so the
saved transfer is most of a mature crawl's bandwidth.

Pipeline shape (all engine additions, composing existing operators):

1. ``due_urls`` (operators/recrawl.py) picks what to revisit.
2. The batch fetches WITH an ``if_none_match`` column; every fetcher
   (fixture / requests / synthetic-less) answers 304 on a validator hit.
3. ``revisit_outcomes`` (pure Catalyst, one broadcast-or-hash join of the
   fetch results against the stored per-url state) classifies each
   result and emits the new history row:
     - 304                      -> unchanged_304  (validator hit, 0 bytes)
     - 200 text, hash == stored -> unchanged_body (server ignored the
                                     validator; content still unchanged)
     - 200 text, hash differs   -> changed        (re-index this doc)
     - anything else            -> error          (no history row: the
                                     observation carries no content info)
   History rows feed ``recrawl_schedule`` unchanged — 304s extend the
   unchanged streak exactly like a full-body refetch would, so backoff
   math is shared, integer-exact, and oracle-checked there.

Decision logic is deliberately separate from fetching
(``revisit_decide`` is a pure function of (status, body hash, stored
hash)), so the 10^10-row decision pass is Catalyst codegen with an exact
SQL oracle, and only the I/O stays in the fetcher's Python stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_UNCHANGED_304 = "unchanged_304"
OUT_UNCHANGED_BODY = "unchanged_body"
OUT_CHANGED = "changed"
OUT_ERROR = "error"


def revisit_decide(results: DataFrame) -> DataFrame:
    """Classify conditional-fetch results. Input columns: url, status,
    body (nullable), stored_hash (the validator we sent). Appends
    outcome, new_hash (md5(body) for 200s, else the stored hash), and
    saved_fetch (1 = the 304 fast path avoided a body transfer)."""
    new_hash = F.md5(F.coalesce(F.col("body"), F.lit("")))
    return results.select(
        "*",
        F.when(F.col("status") == 304, OUT_UNCHANGED_304)
        .when(
            (F.col("status") == 200) & (new_hash == F.col("stored_hash")),
            OUT_UNCHANGED_BODY,
        )
        .when(F.col("status") == 200, OUT_CHANGED)
        .otherwise(OUT_ERROR)
        .alias("outcome"),
        F.when(F.col("status") == 200, new_hash)
        .otherwise(F.col("stored_hash"))
        .alias("new_hash"),
        # when/otherwise, not a bare boolean cast: a null status (network
        # failure) must yield 0, not null
        F.when(F.col("status") == 304, 1).otherwise(0).cast("long").alias(
            "saved_fetch"
        ),
    )


def revisit_round(
    fetcher,
    history: DataFrame,
    now_round: int,
    min_interval: int = 1,
    max_interval: int = 64,
) -> DataFrame:
    """One revalidation pass: pick the due urls from ``history``
    ((url, round, content_hash) fetch observations), refetch them with
    the stored hash as If-None-Match, classify, and return the decided
    results — including ``new_hash`` rows ready to append to the history
    ((url, now_round, new_hash) for every non-error outcome).

    The stored validator is each url's LATEST content_hash (max_by round
    — one map-side-combinable aggregate); the due set is recrawl's
    scheduler verbatim, so the whole loop shares its oracle-checked
    backoff."""
    from .recrawl import due_urls

    due = due_urls(history, now_round, min_interval, max_interval)
    latest = history.groupBy("url").agg(
        F.max_by("content_hash", "round").alias("stored_hash")
    )
    batch = due.join(latest, "url").select(
        "url", F.col("stored_hash").alias("if_none_match")
    )
    fetched = fetcher.fetch(batch)
    return revisit_decide(
        fetched.withColumnRenamed("if_none_match", "stored_hash")
    ).select("url", "status", "outcome", "new_hash", "saved_fetch")
