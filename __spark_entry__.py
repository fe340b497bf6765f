"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
training-data pipeline extras, each as a (spark, sf_dir) -> DataFrame
callable with an exact DuckDB oracle in ``oracle_sql()``.

Crawler-core operators are exercised over a deterministic synthetic
frontier derived from the ``orders`` table (both engines derive it with the
same arithmetic, so the oracle is exact); document/text operators run over
``documents``; vector ops over ``embeddings``; event-time ops over
``events``. Floating-point outputs are either derived from
integer-quantized inputs (bit-exact across engines) or rounded to 6
decimals where a transcendental (ln) is involved.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# --- shared synthetic-frontier derivation (Spark side) ---------------------

N_HOSTS = 97

_FRONTIER_SQL = """
    SELECT 'http://host' || (o_custkey % 97) || '.test/order/' || o_orderkey AS url,
           'host' || (o_custkey % 97) || '.test' AS host,
           CAST(o_orderkey % 7 AS BIGINT) AS depth,
           CAST(o_orderkey AS BIGINT) AS seq,
           CASE WHEN o_orderstatus = 'F' THEN 'visited'
                WHEN o_orderstatus = 'O' THEN 'unvisited'
                ELSE 'pending' END AS state
    FROM orders
"""

# the reference tokenizer's separator class (see_text.erl:13) for SQL (RE2);
# '' doubles the single quote inside the SQL literal
_SEP_SQL = "[@!#$%^&*()\\-_=+\\]\\[\\\\{}|;:\"'',.<>/?]"

_TOKENS_SQL = f"""
    SELECT doc_id, lower(tok) AS word
    FROM (
      SELECT doc_id,
             unnest(regexp_split_to_array(
               regexp_replace(text, '{_SEP_SQL}', ' ', 'g'), '[ \t\n\r]')) AS tok
      FROM documents)
    WHERE strlen(tok) >= 2
"""

_POSTINGS_SQL = f"""
    WITH toks AS ({_TOKENS_SQL}),
    counts AS (
      SELECT doc_id, word, COUNT(*) AS term_count
      FROM toks GROUP BY doc_id, word)
    SELECT doc_id, word, term_count,
           SUM(term_count) OVER (PARTITION BY doc_id) AS doc_len
    FROM counts
"""


def _orders_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    host_id = (F.col("o_custkey") % N_HOSTS).cast("string")
    return o.select(
        F.concat(
            F.lit("http://host"), host_id, F.lit(".test/order/"),
            F.col("o_orderkey").cast("string"),
        ).alias("url"),
        F.concat(F.lit("host"), host_id, F.lit(".test")).alias("host"),
        (F.col("o_orderkey") % 7).cast("long").alias("depth"),
        F.col("o_orderkey").cast("long").alias("seq"),
        F.when(F.col("o_orderstatus") == "F", "visited")
        .when(F.col("o_orderstatus") == "O", "unvisited")
        .otherwise("pending")
        .alias("state"),
    )


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _doc_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postings via the engine's tokenizer UDF (O8) — the Spark side the
    SQL oracle re-derives with the same regex pipeline."""
    from see_spark.functions.udfs import tokenize_udf

    docs = _documents(spark, sf_dir)
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(tokenize_udf(F.col("text"))).alias("word"),
    )
    counts = toks.groupBy("doc_id", "word").agg(F.count("*").alias("term_count"))
    return counts.withColumn(
        "doc_len", F.sum("term_count").over(Window.partitionBy("doc_id"))
    )


# --- entry ------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: conjunctive TF-IDF search over the documents corpus at
    sf0.001 — the reference's whole read path (O6,O8-O14,O25) as one plan."""
    return _q_tfidf_search(spark, "/root/testdata/sf0.001")


# --- crawler-core relational operators (O1..O24 over synthetic frontier) ---

def _q_frontier_checkout(spark, sf_dir):
    """O1+O24: per-host politeness checkout window (budget 3, order depth,seq)."""
    f = _orders_frontier(spark, sf_dir).filter(F.col("state") == "unvisited")
    w = Window.partitionBy("host").orderBy("depth", "seq")
    return (
        f.withColumn("host_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("host_rank") <= 3)
        .select("url", "host", "depth", "seq", "host_rank")
    )


def _q_url_seen(spark, sf_dir):
    """O2: URL-seen dedup — candidate links anti-joined against the frontier."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cand = li.select(
        F.concat(
            F.lit("http://host"), (F.col("l_suppkey") % N_HOSTS).cast("string"),
            F.lit(".test/order/"),
            (F.col("l_orderkey") * 4 + F.col("l_linenumber")).cast("string"),
        ).alias("url")
    ).distinct()
    frontier = _orders_frontier(spark, sf_dir).select("url")
    return cand.join(frontier, "url", "left_anti")


def _q_canonicalize(spark, sf_dir):
    """O15: canonicalizer UDF over messy constructed URLs; the oracle knows
    the closed-form canonical result."""
    from see_spark.functions.udfs import canonicalize_udf

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(F.col("o_orderkey") < 2000)
    messy = F.concat(
        F.lit("HTTP://Host"), (F.col("o_custkey") % N_HOSTS).cast("string"),
        F.lit(".TEST:80/a/x"), (F.col("o_orderkey") % 5).cast("string"),
        F.lit("/../b/"), F.col("o_orderkey").cast("string"),
        F.lit("?q=1#frag"),
    )
    return o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        canonicalize_udf(messy).alias("canonical_url"),
    )


def _q_absolute_link(spark, sf_dir):
    """O22: dirname-based relative-link resolution with qs-drop."""
    from see_spark.functions.udfs import absolute_link_udf

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(F.col("o_orderkey") < 2000)
    base = F.concat(
        F.lit("http://host"), (F.col("o_custkey") % N_HOSTS).cast("string"),
        F.lit(".test/dir/page"), (F.col("o_orderkey") % 9).cast("string"),
        F.lit(".html?x=2"),
    )
    link = F.when(
        F.col("o_orderkey") % 2 == 0,
        F.concat(F.lit("sub/"), F.col("o_orderkey").cast("string")),
    ).otherwise(F.concat(F.lit("/abs/"), F.col("o_orderkey").cast("string")))
    return o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        absolute_link_udf(base, link).alias("resolved_url"),
    )


def _q_domain_filter(spark, sf_dir):
    """O16: Catalyst rlike domain filter on the netloc."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    host = F.concat(
        F.lit("host"), (F.col("c_custkey") % 53).cast("string"),
        F.when(F.col("c_custkey") % 3 == 0, F.lit(".example")).otherwise(F.lit(".test")),
    )
    return (
        c.select(F.col("c_custkey").cast("long").alias("c_custkey"), host.alias("host"))
        .filter(F.col("host").rlike(r"\.test$"))
    )


def _q_state_router(spark, sf_dir):
    """O23: fetch-outcome routing matrix (status/MIME -> crawl state)."""
    f = _orders_frontier(spark, sf_dir)
    bucket = F.col("seq") % 100
    status = (
        F.when(bucket < 90, 200).when(bucket < 95, 301).otherwise(500)
    )
    ctype = F.when(bucket < 80, "text/html; charset=utf-8").when(
        bucket < 90, "application/octet-stream"
    ).otherwise(F.lit(None).cast("string"))
    mime = F.split(ctype, ";").getItem(0)
    state = (
        F.when((status == 200) & mime.isin("text/html", "text/plain"), "visited")
        .when(status == 200, "binary")
        .when(status.isin(301, 302), "redirect")
        .otherwise("error")
    )
    return f.groupBy(state.alias("state")).agg(F.count("*").alias("n_urls"))


def _q_lease_expiry(spark, sf_dir):
    """O4: pending rows past the lease flip back to unvisited (round=3, lease=2)."""
    f = _orders_frontier(spark, sf_dir)
    checkout_round = (F.col("seq") % 5).cast("long")
    expired = (F.col("state") == "pending") & (checkout_round <= 3 - 2)
    return f.select(
        "url",
        F.when(expired, "unvisited").otherwise(F.col("state")).alias("state"),
        checkout_round.alias("checkout_round"),
    )


def _q_page_count(spark, sf_dir):
    """O7: total frontier rows (ALL states — feeds IDF)."""
    return _orders_frontier(spark, sf_dir).agg(
        F.count("*").cast("long").alias("page_count")
    )


def _q_politeness_gate(spark, sf_dir):
    """O24 politeness min-gap: hosts fetched too recently are excluded."""
    f = _orders_frontier(spark, sf_dir).filter(F.col("state") == "unvisited")
    host_num = F.regexp_extract("host", r"host(\d+)\.test", 1).cast("long")
    last_fetch = host_num % 4  # synthetic hoststats
    eligible = f.filter(last_fetch <= F.lit(3) - 2)
    return eligible.groupBy("host").agg(F.count("*").alias("n_eligible"))


# --- index + search over documents (O3,O5..O14,O25) -------------------------

def _q_tokenize_postings(spark, sf_dir):
    """O8+O3: tokenizer -> term counts (the inverted-index build)."""
    return _doc_postings(spark, sf_dir).select(
        "doc_id", "word", "term_count", "doc_len"
    )


def _q_postings_tf(spark, sf_dir):
    """O10: precomputed tf = term_count / doc_len (exact int division)."""
    return _doc_postings(spark, sf_dir).select(
        "doc_id", "word",
        (F.col("term_count") / F.col("doc_len")).alias("tf"),
    )


def _q_document_frequency(spark, sf_dir):
    """O11 df: posting-set size per word."""
    return (
        _doc_postings(spark, sf_dir)
        .groupBy("word")
        .agg(F.countDistinct("doc_id").alias("df"))
    )


_SEARCH_WORDS = ["table", "join", "query"]


def _q_tfidf_search(spark, sf_dir):
    """O25 full read path: AND semantics + tf·idf + top-100 with pinned
    tie-break. Score rounded to 6dp (ln is the one non-exact op)."""
    postings = _doc_postings(spark, sf_dir)
    n_docs = _documents(spark, sf_dir).count()
    qdf = F.broadcast(
        spark.createDataFrame([(w,) for w in _SEARCH_WORDS], "word string")
    )
    df_by_word = postings.groupBy("word").agg(
        F.countDistinct("doc_id").alias("df")
    )
    matched = postings.join(qdf, "word").join(df_by_word, "word")
    scored = (
        matched.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(
                (F.col("term_count") / F.col("doc_len"))
                * F.log(F.lit(float(n_docs)) / (F.lit(1.0) + F.col("df")))
            ).alias("score"),
        )
        .filter(F.col("n_words") == len(_SEARCH_WORDS))
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(100)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _q_search_projection(spark, sf_dir):
    """O14: ranked ids -> document metadata projection."""
    top = _q_tfidf_search(spark, sf_dir)
    docs = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "source", "lang"
    )
    return top.join(docs, "doc_id").select("doc_id", "source", "lang", "score")


def _q_point_lookup(spark, sf_dir):
    """O5: per-doc word-list lookup for a fixed id set (join, not a loop)."""
    ids = F.broadcast(spark.createDataFrame([(1,), (2,), (3,)], "doc_id bigint"))
    return _doc_postings(spark, sf_dir).join(ids, "doc_id").select(
        "doc_id", "word", "term_count"
    )


QUERIES_BATCH1 = {
    "frontier_checkout_window": _q_frontier_checkout,
    "url_seen_anti_join": _q_url_seen,
    "url_canonicalize": _q_canonicalize,
    "absolute_link_resolve": _q_absolute_link,
    "domain_filter": _q_domain_filter,
    "crawl_state_router": _q_state_router,
    "lease_expiry": _q_lease_expiry,
    "page_count": _q_page_count,
    "politeness_gate": _q_politeness_gate,
    "tokenize_postings": _q_tokenize_postings,
    "postings_tf": _q_postings_tf,
    "document_frequency": _q_document_frequency,
    "tfidf_search": _q_tfidf_search,
    "search_projection": _q_search_projection,
    "point_lookup": _q_point_lookup,
}

ORACLES_BATCH1 = {
    "frontier_checkout_window": f"""
        WITH frontier AS ({_FRONTIER_SQL})
        SELECT url, host, depth, seq,
               CAST(row_number() OVER (PARTITION BY host ORDER BY depth, seq)
                    AS BIGINT) AS host_rank
        FROM frontier WHERE state = 'unvisited'
        QUALIFY host_rank <= 3
    """,
    "url_seen_anti_join": f"""
        WITH frontier AS ({_FRONTIER_SQL}),
        cand AS (
          SELECT DISTINCT 'http://host' || (l_suppkey % 97) || '.test/order/'
                 || (l_orderkey * 4 + l_linenumber) AS url
          FROM lineitem)
        SELECT url FROM cand
        WHERE NOT EXISTS (SELECT 1 FROM frontier f WHERE f.url = cand.url)
    """,
    "url_canonicalize": """
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               'http://host' || (o_custkey % 97) || '.test/a/b/' || o_orderkey
                 || '?q=1' AS canonical_url
        FROM orders WHERE o_orderkey < 2000
    """,
    "absolute_link_resolve": """
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CASE WHEN o_orderkey % 2 = 0
                    THEN 'http://host' || (o_custkey % 97) || '.test/dir/sub/' || o_orderkey
                    ELSE 'http://host' || (o_custkey % 97) || '.test/abs/' || o_orderkey
               END AS resolved_url
        FROM orders WHERE o_orderkey < 2000
    """,
    "domain_filter": """
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
               'host' || (c_custkey % 53) ||
               CASE WHEN c_custkey % 3 = 0 THEN '.example' ELSE '.test' END AS host
        FROM customer
        WHERE c_custkey % 3 <> 0
    """,
    "crawl_state_router": f"""
        WITH frontier AS ({_FRONTIER_SQL}),
        routed AS (
          SELECT CASE
            WHEN seq % 100 < 80 THEN 'visited'
            WHEN seq % 100 < 90 THEN 'binary'
            WHEN seq % 100 < 95 THEN 'redirect'
            ELSE 'error' END AS state
          FROM frontier)
        SELECT state, COUNT(*) AS n_urls FROM routed GROUP BY state
    """,
    "lease_expiry": f"""
        WITH frontier AS ({_FRONTIER_SQL})
        SELECT url,
               CASE WHEN state = 'pending' AND (seq % 5) <= 1
                    THEN 'unvisited' ELSE state END AS state,
               CAST(seq % 5 AS BIGINT) AS checkout_round
        FROM frontier
    """,
    "page_count": f"""
        WITH frontier AS ({_FRONTIER_SQL})
        SELECT COUNT(*) AS page_count FROM frontier
    """,
    "politeness_gate": f"""
        WITH frontier AS ({_FRONTIER_SQL})
        SELECT host, COUNT(*) AS n_eligible
        FROM frontier
        WHERE state = 'unvisited'
          AND CAST(regexp_extract(host, 'host(\\d+)\\.test', 1) AS BIGINT) % 4 <= 1
        GROUP BY host
    """,
    "tokenize_postings": f"""
        WITH postings AS ({_POSTINGS_SQL})
        SELECT doc_id, word, term_count, doc_len FROM postings
    """,
    "postings_tf": f"""
        WITH postings AS ({_POSTINGS_SQL})
        SELECT doc_id, word, term_count / doc_len AS tf FROM postings
    """,
    "document_frequency": f"""
        WITH postings AS ({_POSTINGS_SQL})
        SELECT word, COUNT(DISTINCT doc_id) AS df FROM postings GROUP BY word
    """,
    "tfidf_search": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        q AS (SELECT unnest(['table','join','query']) AS word),
        dfs AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM postings GROUP BY word),
        matched AS (
          SELECT p.doc_id, p.term_count, p.doc_len, dfs.df
          FROM postings p JOIN q USING (word) JOIN dfs USING (word)),
        scored AS (
          SELECT doc_id,
                 COUNT(*) AS n_words,
                 SUM((term_count / doc_len)
                     * ln((SELECT n_docs FROM n) / (1.0 + df))) AS score
          FROM matched GROUP BY doc_id)
        SELECT doc_id, ROUND(score, 6) AS score
        FROM scored WHERE n_words = 3
        ORDER BY score DESC, doc_id ASC LIMIT 100
    """,
    "search_projection": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        q AS (SELECT unnest(['table','join','query']) AS word),
        dfs AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM postings GROUP BY word),
        matched AS (
          SELECT p.doc_id, p.term_count, p.doc_len, dfs.df
          FROM postings p JOIN q USING (word) JOIN dfs USING (word)),
        scored AS (
          SELECT doc_id, COUNT(*) AS n_words,
                 SUM((term_count / doc_len)
                     * ln((SELECT n_docs FROM n) / (1.0 + df))) AS score
          FROM matched GROUP BY doc_id),
        top AS (
          SELECT doc_id, ROUND(score, 6) AS score
          FROM scored WHERE n_words = 3
          ORDER BY score DESC, doc_id ASC LIMIT 100)
        SELECT t.doc_id, d.source, d.lang, t.score
        FROM top t JOIN documents d USING (doc_id)
    """,
    "point_lookup": f"""
        WITH postings AS ({_POSTINGS_SQL})
        SELECT doc_id, word, term_count FROM postings WHERE doc_id IN (1, 2, 3)
    """,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES_BATCH1)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES_BATCH1)
