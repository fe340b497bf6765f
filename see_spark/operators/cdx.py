"""SURT-keyed CDX capture index (engine addition; web-archive standard).

The reference stores pages keyed by raw URL and serves exact-URL point
lookups only (see_db_storage_ets.erl:49-56 — an ETS set keyed on the URL
term). A web-scale crawl additionally needs the web-archive access pattern:
*prefix* and *host* queries over every capture of every URL, which is what
the public CDX(J) index format solves (OpenWayback / pywb; see also the
sort-friendly URI reordering transform, "SURT", from Heritrix). This module
re-derives that design Spark-first:

  SURT key    — scheme dropped, host lowercased, a single leading ``www.``
                stripped, default ports (:80/:443) stripped, host labels
                REVERSED and comma-joined, then ``)`` + lowercased path,
                then the query string with parameters SORTED (byte order)
                so parameter-order aliases collide. ``com,example)/a?p=1``
                sorts every capture of a host — and of a whole domain
                subtree — contiguously, which is what makes prefix scans
                range-prunable.
  CDX index   — one row per capture ``(surt, ts, url, status, digest)``,
                range-partitioned BY surt and sorted within partitions, so
                a parquet sink gets non-overlapping per-file min/max surt
                stats and a prefix lookup prunes to the few files covering
                the prefix interval (the distributed equivalent of the
                binary-searched sorted-CDX-file of OpenWayback).
  lookups     — prefix scan (``cdx_prefix``), latest-capture-per-URL
                (``cdx_latest``: one window over surt).

Everything is pure Catalyst — string/array builtins only, no Python in the
row path — and every transform has a 1:1 DuckDB rendering for the oracle.

Scale shape: building the index is ONE range-shuffle on surt (Spark samples
the key space for balanced ranges — hot domains spread over adjacent
partitions but stay contiguous); a prefix lookup on the written index is a
metadata-pruned scan with a pushed ``StartsWith`` filter and NO shuffle;
``cdx_latest`` is one window over the same surt ordering the index already
has, so with the materialized index it degenerates to a per-partition sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def surt_expr(url: Column) -> Column:
    """SURT key of a URL column, pure Catalyst.

    Pinned semantics (subset of Heritrix SURT + pywb canonicalization,
    chosen to be deterministic and engine-portable):

      - scheme (``<alnum+.->://``) dropped;
      - authority lowercased; ONE leading ``www.`` stripped; default
        ports ``:80``/``:443`` stripped (other ports kept);
      - host labels reversed, joined with ``,``;
      - ``)`` separator, then the path lowercased (empty path -> ``/``);
      - query: split on ``&``, parameters sorted bytewise, re-joined;
        empty query (bare ``?``) dropped; fragments dropped.
    """
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment never reaches disk
    auth = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    pathq = F.substring(rest, F.length(auth) + 1, 2_000_000_000)
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    host = F.regexp_replace(auth, r":\d+$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    # pywb convention: port (when non-default) appends AFTER the reversed
    # host, so one host's captures stay contiguous across its ports
    rev = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.when(port.isin("", "80", "443"), F.lit("")).otherwise(
            F.concat(F.lit(":"), port)
        ),
    )
    path = F.lower(F.regexp_extract(pathq, r"^([^?]*)", 1))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"^[^?]*\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        rev,
        F.lit(")"),
        path,
        F.when(sorted_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    ).alias("surt")


#: The DuckDB rendering of surt_expr lives with the ``surt_keys`` oracle in
#: ``__spark_entry__.py`` (CTE chain s1..s4) — the oracle gate compares the
#: two string pipelines row-for-row so they cannot drift silently.


def build_cdx(captures: DataFrame, num_ranges: int = None) -> DataFrame:
    """(url, ts, status, digest) captures -> the sorted CDX relation
    ``(surt, ts, url, status, digest)``.

    One range-shuffle keyed on (surt, ts): ``repartitionByRange`` samples
    the surt space so ranges balance even when one domain dominates, and
    the within-partition sort gives a parquet sink non-overlapping per-file
    min/max stats — the property prefix lookups prune on. ``num_ranges``
    defaults to ``spark.sql.shuffle.partitions``.
    """
    cdx = captures.select(
        surt_expr(F.col("url")),
        F.col("ts").cast("long").alias("ts"),
        "url",
        F.col("status").cast("int").alias("status"),
        "digest",
    )
    if num_ranges:
        cdx = cdx.repartitionByRange(num_ranges, "surt", "ts")
    else:
        cdx = cdx.repartitionByRange("surt", "ts")
    return cdx.sortWithinPartitions("surt", "ts")


def cdx_prefix(cdx: DataFrame, prefix: str) -> DataFrame:
    """All captures under a SURT prefix (a host, a domain subtree, or a
    path subtree), capture order. ``StartsWith`` pushes to the scan; on a
    range-sorted parquet index the file-level min/max surt stats prune the
    scan to the prefix interval — no shuffle, no full read."""
    return cdx.filter(F.col("surt").startswith(prefix)).orderBy(
        "surt", "ts", "digest"
    )


def cdx_latest(cdx: DataFrame) -> DataFrame:
    """Most recent capture per surt key — the wayback 'current version'
    lookup. One window over (surt | ts desc); ties broken by digest so the
    cut is deterministic. Over the materialized index this is the sort
    order the files already have."""
    w = Window.partitionBy("surt").orderBy(
        F.desc("ts"), F.desc("digest"), F.asc("url")
    )
    return (
        cdx.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .drop("__r")
    )


def cdx_from_warc(spark, archive_path: str, num_ranges: int = None) -> DataFrame:
    """Web-archive composition: WARC files (sources/warc.py — the sink
    the crawl's ``archive_dir`` mode writes) -> the sorted CDX capture
    index. This is exactly how public archives index their crawls
    (Common Crawl's cdx-index over its WARC sets): one pass over the
    records, ts from WARC-Date (epoch seconds — WARC dates are ISO-8601
    UTC), digest from the record id (itself a deterministic function of
    (url, date): warc.py:deterministic_record_id).

    Scale: read parallelism = archive file count (sized at write time);
    then the ONE range-shuffle of build_cdx. Everything between is
    row-local.
    """
    from ..sources.warc import read_warc

    recs = read_warc(spark, archive_path)
    captures = recs.select(
        "url",
        F.unix_timestamp(
            F.to_timestamp("warc_date", "yyyy-MM-dd'T'HH:mm:ss'Z'")
        ).alias("ts"),
        F.col("status"),
        F.regexp_extract("record_id", r"<urn:uuid:([0-9a-f-]+)>", 1)
        .alias("digest"),
    )
    return build_cdx(captures, num_ranges=num_ranges)
