"""Table schemas + Iceberg DDL for the crawl engine.

The reference fuses frontier + page store into one ETS/Mnesia table
(apps/db/src/see_db_storage_ets.erl:62-63); we split into normalized tables
(SURVEY §1.1) so each access path is a pruned columnar scan instead of a
full-table rewrite:

- ``frontier``   — crawl state machine (one row per canonical URL, ever)
- ``docs``       — parsed interleaved span documents (input_hint schema)
- ``postings``   — inverted index with precomputed tf (see_rank_tfidf.erl:8-11
                   recomputes tf per query; we precompute at index time)
- ``hoststats``  — per-host politeness bookkeeping (north-rule addition)
- ``robots``     — robots.txt rule cache dimension (north-rule addition)

In production these are Iceberg tables (``iceberg_ddl()``); the sandbox has
no Iceberg runtime jar, so ``SnapshotCatalog`` provides the same
snapshot/commit/time-travel contract over parquet directories.
"""

from __future__ import annotations

from pyspark.sql import types as T

STATE_UNVISITED = "unvisited"
STATE_PENDING = "pending"
STATE_VISITED = "visited"   # text page, indexed
STATE_BINARY = "binary"     # media/binary page, recorded but never indexed
STATE_REDIRECT = "redirect"
STATE_ERROR = "error"
STATE_ROBOTS = "robots_blocked"

SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("detail", T.StringType(), True),
        T.StructField("discovered_in_round", T.IntegerType(), False),
        T.StructField("fetched_in_round", T.IntegerType(), True),
        T.StructField("fetch_order", T.LongType(), True),
        T.StructField("checkout_round", T.IntegerType(), True),
    ]
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),  # canonical URL
        T.StructField("title", T.StringType(), True),
        T.StructField("spans", T.ArrayType(SPAN_TYPE), True),
        T.StructField("fetched_in_round", T.IntegerType(), True),
    ]
)

# Physical word-hash bucket count for the postings table. Mirrors the
# production Iceberg `PARTITIONED BY (bucket(512, word))` in the
# parquet stand-in: postings commit partitioned on word_bucket =
# pmod(xxhash64(word), N), so the search read path opens ONLY the query
# words' bucket directories (SnapshotCatalog.read_parts) — at 100 TB a
# 5-word query reads ~5/N of the index instead of every file. 64 keeps
# dir counts sane at sandbox scale; production uses the DDL's 512.
N_POSTINGS_BUCKETS = 64

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("word", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("term_count", T.LongType(), False),
        T.StructField("doc_len", T.LongType(), False),
        T.StructField("tf", T.DoubleType(), False),
        T.StructField("word_bucket", T.IntegerType(), False),
    ]
)

HOSTSTATS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("last_fetch_round", T.IntegerType(), False),
        T.StructField("fetched_total", T.LongType(), False),
    ]
)

# Materialized document frequencies (the reference's posting-set size,
# see_db_storage_ets.erl:117-123, which IS stored — the set itself). Kept as
# append-only per-round increments: df(word) = sum(df) over the word's rows.
# Reading aggregates AFTER a semi-join to the (broadcast, few-row) query
# words, so a search never aggregates the table — O(query words) rows flow.
# Physically bucketed on the same word hash as postings (the semi-join
# cannot prune FILES, so without the bucket partitioning every query
# still scans the whole vocabulary table; with it the serving read opens
# only the query words' bucket dirs — O(vocab/64) bytes per query).
WORD_STATS_SCHEMA = T.StructType(
    [
        T.StructField("word", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("word_bucket", T.IntegerType(), False),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow", T.ArrayType(T.StringType()), True),
        T.StructField("fetched_in_round", T.IntegerType(), False),
    ]
)

# RFC 9309 robots dimension, built by operators/robots.robots_dimension
# from FETCHED robots.txt bodies (the `robots` table above is the simpler
# externally-supplied prefix cache). Patterns are pre-compiled to Java
# regexes at parse time so the gate is pure Catalyst. Append-only: a host
# is parsed once, in the round its first URL enters the frontier.
ROBOTS_RFC_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField(
            "rules",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("plen", T.IntegerType()),
                        T.StructField("allow", T.BooleanType()),
                        T.StructField("regex", T.StringType()),
                    ]
                )
            ),
            True,
        ),
        T.StructField("disallow", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_delay", T.DoubleType(), True),
        T.StructField("sitemaps", T.ArrayType(T.StringType()), True),
        T.StructField("fetched_in_round", T.IntegerType(), False),
    ]
)

# Sitemap fetch ledger (crawl sitemap mode): append-only, one row per
# sitemap URL ever fetched — the anti-join target that makes sitemap I/O
# O(distinct sitemaps) over a crawl's life, like robots_rfc is for hosts.
# Failed fetches are recorded too (no retry), per the recrawl scheduler's
# job to decide refresh policy separately.
SITEMAPS_FETCHED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("n_urls", T.IntegerType(), True),
        T.StructField("n_nested", T.IntegerType(), True),
        T.StructField("fetched_in_round", T.IntegerType(), False),
    ]
)

# Host-level quality evidence (operators/reputation.py): append-only
# per-round increments; the aggregated view sums (n_docs, sum_q_milli)
# per host — both decomposable, so compaction folds increments without
# changing reads (the hoststats/word_stats idiom).
HOST_QUALITY_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("sum_q_milli", T.LongType(), False),
    ]
)

# Corpus-length scalars for BM25-family ranking (avgdl, per-field
# average lengths): append-only (field, n_docs, sum_len) increments per
# round — the read path sums O(rounds) rows (search.corpus_avg_len), so
# no query ever aggregates the postings table for corpus stats. Same
# decomposable-sum compaction idiom as word_stats/host_quality.
CORPUS_STATS_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("sum_len", T.LongType(), False),
    ]
)

CANONICAL_ALIASES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("canonical", T.StringType(), True),
        T.StructField("declared_in_round", T.IntegerType(), False),
    ]
)

SCHEMAS = {
    "frontier": FRONTIER_SCHEMA,
    "docs": DOCS_SCHEMA,
    "postings": POSTINGS_SCHEMA,
    "word_stats": WORD_STATS_SCHEMA,
    "corpus_stats": CORPUS_STATS_SCHEMA,
    "hoststats": HOSTSTATS_SCHEMA,
    "host_quality": HOST_QUALITY_SCHEMA,
    "robots": ROBOTS_SCHEMA,
    "robots_rfc": ROBOTS_RFC_SCHEMA,
    "sitemaps_fetched": SITEMAPS_FETCHED_SCHEMA,
    "canonical_aliases": CANONICAL_ALIASES_SCHEMA,
}


def iceberg_ddl(catalog: str = "crawl", db: str = "see") -> dict:
    """Production DDL. Partitioning notes for the 10^10-URL design point:
    frontier bucketed by url_hash so the seen-filter anti-join is a
    co-partitioned join without a pre-shuffle; additional identity partition
    on state so checkout scans prune to the unvisited slice."""
    q = f"{catalog}.{db}"
    return {
        "frontier": f"""
            CREATE TABLE {q}.frontier (
              url string, url_hash bigint, host string, depth int, seq bigint,
              state string, detail string, discovered_in_round int,
              fetched_in_round int, fetch_order bigint, checkout_round int)
            USING iceberg
            PARTITIONED BY (state, bucket(1024, url_hash))
            TBLPROPERTIES ('write.distribution-mode'='hash',
                           'write.target-file-size-bytes'='536870912')
        """,
        "docs": f"""
            CREATE TABLE {q}.docs (
              doc_id string, title string,
              spans array<struct<kind:string,text:string,media_ref:string,offset:int>>,
              fetched_in_round int)
            USING iceberg
            PARTITIONED BY (bucket(1024, doc_id))
        """,
        "postings": f"""
            CREATE TABLE {q}.postings (
              word string, doc_id string, term_count bigint, doc_len bigint,
              tf double)
            USING iceberg
            PARTITIONED BY (bucket(512, word))
        """,
        "word_stats": f"""
            CREATE TABLE {q}.word_stats (word string, df bigint)
            USING iceberg
            PARTITIONED BY (bucket(512, word))
        """,
        "corpus_stats": f"CREATE TABLE {q}.corpus_stats (field string, n_docs bigint, sum_len bigint) USING iceberg",
        "hoststats": f"CREATE TABLE {q}.hoststats (host string, last_fetch_round int, fetched_total bigint) USING iceberg",
        "host_quality": f"CREATE TABLE {q}.host_quality (host string, n_docs bigint, sum_q_milli bigint) USING iceberg",
        "robots": f"CREATE TABLE {q}.robots (host string, disallow array<string>, fetched_in_round int) USING iceberg",
    }
