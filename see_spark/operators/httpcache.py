"""HTTP cache semantics for the revisit scheduler — RFC 9111 freshness.

The conditional-revisit pipeline (operators/revisit.py) answers "was it
stale?" AFTER a fetch; this module answers "when MAY it be stale?"
BEFORE one, from the headers the crawl already stores. RFC 9111 s4.2
freshness lifetime, in precedence order:

  1. ``no-store`` / ``no-cache`` in Cache-Control  -> ttl 0 (always
     revalidate; for a crawler: eligible for refetch any round);
  2. ``max-age=N`` in Cache-Control               -> ttl N seconds;
  3. ``Expires`` minus ``Date``                   -> ttl = delta
     (clamped at 0 — an Expires in the past means already stale);
  4. heuristic freshness (s4.2.2): 10% of (Date - Last-Modified),
     the classic squid heuristic;
  5. none of the above -> NULL ttl (no evidence; the scheduler falls
     back to its change-rate estimate, recrawl.change_rate_estimate).

All inputs are integer epoch-second columns (the fetch path parses
HTTP-dates once at store time — string parsing of RFC 7231 dates is
locale-free but there is no reason to redo it per audit); Cache-Control
is the raw header string. Everything here is row-local Catalyst
(regexp + integer arithmetic), scan-bound at 10^10 rows, and exactly
reproducible in SQL.

Returns (url, ttl_s, ttl_source) with ttl_source in
('no-store', 'max-age', 'expires', 'heuristic', 'none').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAXAGE_RE = r"(?:^|[,\s])max-age\s*=\s*\"?([0-9]+)"
_NOSTORE_RE = r"(?:^|[,\s])(no-store|no-cache)(?:$|[,\s=])"


def http_ttl(
    responses: DataFrame,
    url_col: str = "url",
    cc_col: str = "cache_control",
    date_col: str = "date_s",
    expires_col: str = "expires_s",
    lastmod_col: str = "last_modified_s",
) -> DataFrame:
    cc = F.lower(F.coalesce(F.col(cc_col), F.lit("")))
    no_store = cc.rlike(_NOSTORE_RE)
    max_age = F.regexp_extract(cc, _MAXAGE_RE, 1)
    has_max_age = max_age != ""
    exp_delta = F.greatest(
        F.col(expires_col) - F.col(date_col), F.lit(0)
    ).cast("long")
    has_expires = (
        F.col(expires_col).isNotNull() & F.col(date_col).isNotNull()
    )
    heur = F.expr(f"greatest({date_col} - {lastmod_col}, 0) div 10").cast("long")
    has_heur = (
        F.col(lastmod_col).isNotNull() & F.col(date_col).isNotNull()
    )
    ttl = (
        F.when(no_store, F.lit(0).cast("long"))
        .when(has_max_age, max_age.cast("long"))
        .when(has_expires, exp_delta)
        .when(has_heur, heur)
        .otherwise(F.lit(None).cast("long"))
    )
    source = (
        F.when(no_store, F.lit("no-store"))
        .when(has_max_age, F.lit("max-age"))
        .when(has_expires, F.lit("expires"))
        .when(has_heur, F.lit("heuristic"))
        .otherwise(F.lit("none"))
    )
    return responses.select(
        F.col(url_col).alias("url"),
        ttl.alias("ttl_s"),
        source.alias("ttl_source"),
    )
