"""Soft-404 detection: 200-status pages that are really error pages.

Web servers routinely answer missing URLs with HTTP 200 + an error page
("sic transit gloria telae", Bar-Yossef et al., WWW 2004) — a crawler
that trusts the status code indexes garbage and, worse, keeps
re-crawling it. The standard detector has two arms:

1. **probe signature**: for each host, fetch a URL that cannot exist
   (a random slug); whatever comes back with 200 is that host's error
   template. Any regular page whose CONTENT SIGNATURE equals the probe's
   is a soft 404. Signature = md5 of the digit-stripped,
   whitespace-collapsed, lowercased body — error templates embed the
   requested path/id, so digits/whitespace must not participate.
2. **phrase heuristic**: a 200 page that is short AND contains an
   error phrase ("not found", "no longer available", "does not
   exist") — the fallback for hosts whose probe was never fetched.

Spark-first shape: normalization + hashing are row-local Catalyst
(regexp_replace/md5 — codegen, no Python); the probe table is one row
per host (dimension-sized), so the signature match is a BROADCAST join
— the 10^10-row document side never shuffles. Both arms emit a
``reason`` so downstream can weight them differently (signature is
near-certain, phrase is a heuristic).

Scale: one broadcast join + row-local expressions; nothing aggregates
over the corpus. The probe table is maintained by the crawl loop (one
extra fetch per host per robots-refresh cycle — negligible politeness
cost) and the flags feed the state router: soft-404s route to the
terminal error state instead of the index.

Oracle: every expression is deterministic string SQL; the DuckDB oracle
replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# conservative error-phrase class (lowercased match)
ERROR_PHRASES = r"(not found|no longer available|does not exist)"


def _norm_sig(col):
    """Digit-stripped, whitespace-collapsed, lowercased md5 signature."""
    x = F.lower(col)
    x = F.regexp_replace(x, "[0-9]+", "")
    x = F.regexp_replace(x, "[ \t\n\r]+", " ")
    return F.md5(F.trim(x))


def host_error_signatures(probes: DataFrame) -> DataFrame:
    """(host, text) probe fetches -> (host, err_sig). One row per host."""
    return probes.select("host", _norm_sig(F.col("text")).alias("err_sig"))


def soft404_flags(
    docs: DataFrame, probes: DataFrame, short_chars: int = 80
) -> DataFrame:
    """Flag soft 404s among 200-status fetches.

    ``docs``: (doc_id, host, status, text); ``probes``: (host, text) —
    the per-host cannot-exist probe bodies. Returns (doc_id, host,
    status, reason, is_soft404) where reason is 'probe_signature',
    'error_phrase', or 'ok'. Non-200 rows are never flagged (they are
    honest errors, routed elsewhere)."""
    sigs = host_error_signatures(probes)
    d = docs.select(
        "doc_id", "host", "status",
        _norm_sig(F.col("text")).alias("__sig"),
        F.lower(F.col("text")).alias("__low"),
        F.length("text").alias("__len"),
    )
    j = d.join(F.broadcast(sigs), "host", "left")
    sig_hit = (F.col("status") == 200) & F.col("err_sig").isNotNull() & (
        F.col("__sig") == F.col("err_sig")
    )
    phrase_hit = (
        (F.col("status") == 200)
        & (F.col("__len") <= short_chars)
        & F.col("__low").rlike(ERROR_PHRASES)
    )
    reason = (
        F.when(sig_hit, F.lit("probe_signature"))
        .when(phrase_hit, F.lit("error_phrase"))
        .otherwise(F.lit("ok"))
    )
    return j.select(
        "doc_id", "host", "status",
        reason.alias("reason"),
        (sig_hit | phrase_hit).alias("is_soft404"),
    )
