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
           CAST(SUM(term_count) OVER (PARTITION BY doc_id) AS BIGINT) AS doc_len
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
    """Postings via the engine's tokenizer (O8) — the Catalyst fast path
    (pinned equivalent to the extract_words kernel); the SQL oracle
    re-derives the same regex pipeline."""
    from see_spark.functions.udfs import tokenize_expr

    docs = _documents(spark, sf_dir)
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(tokenize_expr(F.col("text"))).alias("word"),
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


def _q_url_seen_cuckoo(spark, sf_dir):
    """O2 via the cuckoo pre-filter (north rule names both structures):
    identical output to ``url_seen_anti_join`` — the sharded cuckoo only
    short-circuits definite misses; suspects flow through the same exact
    anti-join. Oracle: the plain SQL anti-join."""
    from see_spark.functions import cuckoo as ck

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cand = li.select(
        F.concat(
            F.lit("http://host"), (F.col("l_suppkey") % N_HOSTS).cast("string"),
            F.lit(".test/order/"),
            (F.col("l_orderkey") * 4 + F.col("l_linenumber")).cast("string"),
        ).alias("url")
    ).distinct().withColumn("url_hash", F.xxhash64("url"))
    frontier = _orders_frontier(spark, sf_dir).select("url").withColumn(
        "url_hash", F.xxhash64("url")
    )
    shards = ck.build_cuckoo_shards(frontier, n_shards=7, buckets_per_shard=1 << 13)
    out = ck.seen_filter_sharded_cuckoo(
        cand, frontier, shards, n_shards=7, buckets_per_shard=1 << 13
    )
    return out.select("url")


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
    # df computed FROM the query-matched postings (same values as a global
    # df for those words) so the tokenize UDF runs once, not twice
    qmatched = postings.join(qdf, "word").localCheckpoint(eager=False)
    df_by_word = F.broadcast(
        qmatched.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    )
    matched = qmatched.join(df_by_word, "word")
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


# --- training-data pipeline operators (documents / embeddings / events) -----

def _dup_corpus(spark, sf_dir):
    """documents ∪ re-keyed copies of every 10th doc — injects exact dups so
    dedup operators have real groups to find."""
    d = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    dups = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return d.unionByName(dups)


_DUP_CORPUS_SQL = """
    SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
    UNION ALL
    SELECT CAST(doc_id + 100000 AS BIGINT) AS doc_id, text
    FROM documents WHERE doc_id % 10 = 0
"""


def _q_dedup_exact(spark, sf_dir):
    from see_spark.operators.dedup import exact_dedup

    return exact_dedup(_dup_corpus(spark, sf_dir)).select(
        "doc_id", "text_hash",
        F.col("group_size").cast("long").alias("group_size"),
        F.col("is_canonical").cast("long").alias("is_canonical"),
    )


def _q_dedup_ngram_jaccard(spark, sf_dir):
    from see_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _documents(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ),
        n=3, threshold=0.1,
    ).select("doc_a", "doc_b", F.round("jaccard", 9).alias("jaccard"))


def _q_minhash_signatures(spark, sf_dir):
    from see_spark.operators.dedup import minhash_signatures

    return minhash_signatures(
        _documents(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ),
        num_hashes=16, n=3,
    ).select("doc_id", F.col("seed_id").cast("long").alias("seed_id"), "minhash")


def _q_minhash_lsh(spark, sf_dir):
    from see_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _documents(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ),
        num_hashes=16, bands=4, n=3, threshold=0.1,
    ).select("doc_a", "doc_b", F.round("jaccard", 9).alias("jaccard"))


def _q_dedup_clusters(spark, sf_dir):
    from see_spark.operators.dedup import dedup_clusters

    return dedup_clusters(
        _dup_corpus(spark, sf_dir), num_hashes=16, bands=4, n=3, threshold=0.5
    )


def _q_simhash(spark, sf_dir):
    from see_spark.operators.dedup import simhash

    return simhash(
        _documents(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ),
        num_bits=48,
    )


def _qvecs(spark, sf_dir):
    """Embeddings quantized to integer milli-units: every arithmetic step
    downstream (int dot products, sqrt, one division) is then bit-exact in
    ANY engine and ANY summation order — the float-determinism strategy for
    all oracle-checked vector ops."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return e.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 1000, 0).cast("long"),
        ).alias("embedding"),
        F.col("label").cast("long").alias("label"),
    )


_QVEC_SQL = """
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           list_transform(embedding,
                          x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v,
           CAST(label AS BIGINT) AS label
    FROM embeddings
"""


def _q_embedding_near_dup(spark, sf_dir):
    from see_spark.operators.dedup import embedding_near_dup_pairs

    return embedding_near_dup_pairs(
        _qvecs(spark, sf_dir), threshold=0.45
    ).select("vec_a", "vec_b", "cosine")


def _q_simhash_pairs(spark, sf_dir):
    from see_spark.operators.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(
        _dup_corpus(spark, sf_dir), max_hamming=3, num_bits=48, bands=4
    )


def _q_embedding_near_dup_lsh(spark, sf_dir):
    from see_spark.operators.dedup import embedding_near_dup_lsh

    return embedding_near_dup_lsh(
        _qvecs(spark, sf_dir), threshold=0.45, n_planes=6, dim=64
    ).select("vec_a", "vec_b", "cosine")


def _q_knn_bruteforce(spark, sf_dir):
    from see_spark.operators.similarity import knn_bruteforce

    vecs = _qvecs(spark, sf_dir)
    queries_df = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return knn_bruteforce(vecs, queries_df, k=10).select(
        "query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank")
    )


def _q_knn_lsh(spark, sf_dir):
    from see_spark.operators.similarity import knn_lsh_bucketed

    vecs = _qvecs(spark, sf_dir)
    queries_df = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return knn_lsh_bucketed(vecs, queries_df, k=10, n_planes=6, dim=64).select(
        "query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank")
    )


def _q_lang_id(spark, sf_dir):
    from see_spark.operators.textstats import language_id

    return language_id(
        _documents(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        )
    )


def _q_quality_score(spark, sf_dir):
    from see_spark.operators.textstats import quality_score

    return quality_score(
        _documents(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        )
    )


def _q_token_counts(spark, sf_dir):
    from see_spark.operators.textstats import token_counts

    return token_counts(
        _documents(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        )
    )


def _q_fingerprint(spark, sf_dir):
    from see_spark.operators.textstats import fingerprint

    return fingerprint(
        _documents(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ),
        n=5,
    )


def _q_media_inventory(spark, sf_dir):
    from see_spark.operators.multimodal import media_from_documents

    return media_from_documents(_documents(spark, sf_dir)).select(
        "media_id", "kind", "n_bytes"
    )


def _q_media_frame_sample(spark, sf_dir):
    from see_spark.operators.multimodal import frame_sample, media_from_documents

    media = media_from_documents(_documents(spark, sf_dir))
    return frame_sample(media, every_n_bytes=50, stride=3).select(
        "media_id", F.col("frame_no").cast("long").alias("frame_no")
    )


def _events(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # quantize the double value to exact milli-units so group sums are
    # integer-exact in any engine / any aggregation order; parquet naive
    # timestamps arrive as TIMESTAMP_NTZ — cast to session-TZ (UTC) so
    # unix_micros applies and matches DuckDB's naive epoch_us
    return ev.withColumn(
        "value", F.round(F.col("value") * 1000, 0).cast("long")
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _q_events_tumbling(spark, sf_dir):
    from see_spark.streaming.windows import tumbling_counts

    out = tumbling_counts(_events(spark, sf_dir), "1 hour")
    return out.select(
        F.unix_micros("window_start").alias("window_start_us"),
        "event_type",
        "n_events",
        F.col("sum_value").cast("long").alias("sum_value_milli"),
    )


def _q_events_sessionize(spark, sf_dir):
    from see_spark.streaming.windows import sessionize

    out = sessionize(_events(spark, sf_dir), gap_minutes=30)
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("session_no").cast("long").alias("session_no"),
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
        F.col("sum_value").cast("long").alias("sum_value_milli"),
    )


# --- relational breadth (TPC-H-style; quantized money for exact sums) -------

def _q_tpch_pricing_summary(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    qty_c = F.round(F.col("l_quantity") * 100, 0).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_price_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_c).alias("sum_qty_c"),
            F.sum(price_c).alias("sum_price_c"),
            F.sum(disc_price_c).alias("sum_disc_price_c"),
            F.count("*").alias("count_order"),
        )
    )


def _q_tpch_top_orders(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    revenue_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
              o.o_custkey == F.col("c_custkey"))
        .groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(F.sum(revenue_c).alias("revenue_c"))
        .orderBy(F.desc("revenue_c"), F.asc("orderkey"))
        .limit(10)
    )


def _q_region_order_counts(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    dim = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "r_name")
    )
    return (
        o.join(dim, o.o_custkey == dim.c_custkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_orders"))
    )


# --- batch 3: joins/windows/set-ops breadth + remaining engine surface ------

def _q_robots_gate(spark, sf_dir):
    """North-rule robots cache gate: unvisited URLs on hosts whose robots
    rules disallow the /order/ prefix flip to robots_blocked."""
    from see_spark.operators.frontier import robots_block

    f = _orders_frontier(spark, sf_dir).withColumn(
        "detail", F.lit(None).cast("string")
    )
    hosts = spark.range(N_HOSTS).select(
        F.concat(F.lit("host"), F.col("id").cast("string"), F.lit(".test")).alias("host")
    )
    robots = hosts.filter(
        F.regexp_extract("host", r"host(\d+)\.test", 1).cast("long") % 5 == 0
    ).select("host", F.array(F.lit("/order/")).alias("disallow"))
    return robots_block(f, robots).select("url", "state", "detail")


def _q_tfidf_search_multiset(spark, sf_dir):
    """O12 query-token multiplicity: a repeated query word scores twice
    (see_rank_tfidf.erl:5-6 iterates the token LIST, not a set). Query =
    ['table','join','table'] -> AND over 2 distinct words, 'table' weighted
    x2 in the score."""
    postings = _doc_postings(spark, sf_dir)
    n_docs = _documents(spark, sf_dir).count()
    qdf = F.broadcast(
        spark.createDataFrame(
            [("table", 2), ("join", 1)], "word string, qcount long"
        )
    )
    qmatched = postings.join(qdf, "word").localCheckpoint(eager=False)
    df_by_word = F.broadcast(
        qmatched.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    )
    matched = qmatched.join(df_by_word, "word")
    scored = (
        matched.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(
                F.col("qcount")
                * (F.col("term_count") / F.col("doc_len"))
                * F.log(F.lit(float(n_docs)) / (F.lit(1.0) + F.col("df")))
            ).alias("score"),
        )
        .filter(F.col("n_words") == 2)
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(100)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _q_asof_join(spark, sf_dir):
    """As-of join: every event aligned to the user's most recent marker
    event (event_id % 5 == 0) at-or-before it."""
    from see_spark.operators.asof import asof_join_backward

    ev = _events(spark, sf_dir).select(
        F.col("user_id").cast("long").alias("user_id"),
        "ts",
        F.col("event_id").cast("long").alias("event_id"),
    )
    # unique per (user_id, ts): max marker id wins -> fully pinned contract
    markers = (
        _events(spark, sf_dir)
        .filter(F.col("event_id") % 5 == 0)
        .groupBy(F.col("user_id").cast("long").alias("user_id"), "ts")
        .agg(F.max(F.col("event_id").cast("long")).alias("marker_id"))
    )
    out = asof_join_backward(
        ev, markers, on=["user_id"], value_cols=["marker_id"]
    )
    return out.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "asof_marker_id",
        F.unix_micros("asof_ts").alias("asof_ts_us"),
    )


def _q_events_hopping(spark, sf_dir):
    from see_spark.streaming.windows import hopping_counts

    out = hopping_counts(_events(spark, sf_dir), "1 hour", "15 minutes")
    return out.select(
        F.unix_micros("window_start").alias("window_start_us"),
        "event_type",
        "n_events",
        F.col("sum_value").cast("long").alias("sum_value_milli"),
    )


def _q_running_user_totals(spark, sf_dir):
    """Stateful running per-user totals — the batch expression of the
    applyInPandasWithState streaming operator (tests assert stream==batch);
    value sum is integer-milli so it is engine-exact."""
    ev = _events(spark, sf_dir)
    return ev.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.count("*").alias("n_events"),
        F.sum("value").cast("long").alias("sum_value_milli"),
        F.max(F.unix_micros("ts")).alias("last_ts_us"),
    )


def _q_rollup_revenue(spark, sf_dir):
    """Grouping-sets surface: ROLLUP(region, nation) order counts + revenue."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    dim = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "r_name", "n_name")
    )
    price_c = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        o.join(dim, o.o_custkey == dim.c_custkey)
        .select("r_name", "n_name", price_c.alias("price_c"))
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_orders"), F.sum("price_c").alias("revenue_c"))
    )


def _q_top_parts_per_supplier(spark, sf_dir):
    """Window top-N per group: top-3 parts by revenue per supplier."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    revenue_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    per_part = li.groupBy(
        F.col("l_suppkey").cast("long").alias("suppkey"),
        F.col("l_partkey").cast("long").alias("partkey"),
    ).agg(F.sum(revenue_c).alias("revenue_c"))
    w = Window.partitionBy("suppkey").orderBy(F.desc("revenue_c"), F.asc("partkey"))
    return (
        per_part.withColumn("part_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("part_rank") <= 3)
    )


def _q_nations_except(spark, sf_dir):
    """Set op EXCEPT: nations with customers but no suppliers."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_nationkey").cast("long").alias("nationkey")
    )
    return c.subtract(s)


def _q_nations_intersect(spark, sf_dir):
    """Set op INTERSECT: nations with both customers and suppliers."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_nationkey").cast("long").alias("nationkey")
    )
    return c.intersect(s)


def _q_knn_ivf(spark, sf_dir):
    from see_spark.operators.similarity import knn_ivf

    vecs = _qvecs(spark, sf_dir)
    queries_df = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return knn_ivf(vecs, queries_df, k=10, n_centroids=8, nprobe=2).select(
        "query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank")
    )


def _q_media_features(spark, sf_dir):
    """Multimodal feature extraction (mapInPandas over binary payloads,
    deterministic fake decode): byte mean + 16-bin byte%16 histogram.

    The histogram is serialized to a CSV string: the driver's pandas
    canonicalizer cannot hash list-valued columns, so gated queries must
    return scalar columns only (asserted in tests/test_driver_contract.py).
    """
    from see_spark.operators.multimodal import extract_features, media_from_documents

    media = media_from_documents(_documents(spark, sf_dir))
    return extract_features(media, fake=True).select(
        "media_id",
        "kind",
        "n_bytes",
        "byte_mean",
        F.array_join(
            F.transform("byte_histogram", lambda x: x.cast("string")), ","
        ).alias("byte_histogram_csv"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _q_events_pivot(spark, sf_dir):
    """Pivot: per-day event-type count matrix (wide schema)."""
    ev = _events(spark, sf_dir).withColumn(
        "day_us", F.unix_micros(F.date_trunc("day", F.col("ts")))
    )
    out = ev.groupBy("day_us").pivot("event_type", _EVENT_TYPES).agg(
        F.count(F.lit(1))
    )
    return out.select(
        "day_us",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    )


def _q_events_cube(spark, sf_dir):
    """CUBE grouping sets over (event_type, user bucket)."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        (F.col("user_id") % 4).cast("long").alias("user_bucket"),
        F.col("value"),
    )
    return ev.cube("event_type", "user_bucket").agg(
        F.count("*").alias("n_events"),
        F.sum("value").cast("long").alias("sum_value_milli"),
    )


def _q_events_median(spark, sf_dir):
    """Exact interpolated percentiles per event type (integer-milli values
    so the (a+b)/2 interpolation is engine-exact)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("median_milli"),
        F.percentile("value", F.lit(0.25)).alias("p25_milli"),
        F.percentile("value", F.lit(0.75)).alias("p75_milli"),
    )


def _q_postings_idf(spark, sf_dir):
    """O11 as a standalone surface: idf = ln(N / (1 + df)), natural log,
    1+df smoothing, N = all docs — negative for words in every doc
    (see_rank_tfidf.erl:13-15; negative case asserted in
    see_rank_tfidf_test.erl:18-25)."""
    postings = _doc_postings(spark, sf_dir)
    n_docs = _documents(spark, sf_dir).count()
    df = postings.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    return df.select(
        "word",
        "df",
        F.round(
            F.log(F.lit(float(n_docs)) / (F.lit(1.0) + F.col("df"))), 6
        ).alias("idf"),
    )


def _q_parse_spans(spark, sf_dir):
    """O18-O21: tolerant HTML parse -> interleaved span sequence, exercised
    over HTML synthesized from the documents corpus. The span shape is
    closed-form for this construction (title emits both a title span and a
    text span — title children ARE data nodes, see_html.erl:39-52), so the
    oracle enumerates it exactly."""
    from see_spark.functions.udfs import parse_html_udf

    docs = _documents(spark, sf_dir).filter(F.col("doc_id") < 300)
    html = F.concat(
        F.lit("<html><title>doc "), F.col("doc_id").cast("string"),
        F.lit("</title><body>"), F.col("text"),
        F.lit(' <a href="http://x.test/'), F.col("doc_id").cast("string"),
        F.lit('">anchor</a></body></html>'),
    )
    parsed = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        parse_html_udf(html).alias("p"),
    )
    return parsed.select(
        "doc_id", F.explode("p.spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.offset").cast("long").alias("offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )


def _q_dataset_split(spark, sf_dir):
    """Deterministic train/val/test split — the scalable form of dataset
    sampling: a pure hash of the key, no RNG state, stable under
    re-partitioning and re-runs. Mix = splitmix-ish multiply-shift in
    63-bit space (engine-portable integer arithmetic)."""
    d = _documents(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"))
    mixed = F.pmod(
        (F.col("doc_id") + 1) * F.lit(2654435761) + F.lit(40503),
        F.lit(2147483647),
    )
    bucket = F.pmod(mixed, F.lit(100))
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return d.select("doc_id", bucket.alias("bucket"), split.alias("split"))


def _q_span_tokens(spark, sf_dir):
    """Interleaved-spans surface (the input_hint table shape): documents
    re-expressed as (text, media, text) span arrays, then token stats
    derived from the text spans only — all JVM-side array ops
    (tokens_from_spans is the same kernel the crawl indexer uses)."""
    from see_spark.functions.udfs import tokens_from_spans

    d = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    first = F.array_join(F.slice(words, 1, (n / 2).cast("int")), " ")
    second = F.array_join(
        F.slice(words, (n / 2).cast("int") + 1, n), " "
    )
    spans = F.array(
        F.struct(
            F.lit("text").alias("kind"), first.alias("text"),
            F.lit(None).cast("string").alias("media_ref"), F.lit(0).alias("offset"),
        ),
        F.struct(
            F.lit("media").alias("kind"), F.lit(None).cast("string").alias("text"),
            F.concat(F.lit("media://"), F.col("doc_id").cast("string")).alias("media_ref"),
            F.lit(1).alias("offset"),
        ),
        F.struct(
            F.lit("text").alias("kind"), second.alias("text"),
            F.lit(None).cast("string").alias("media_ref"), F.lit(2).alias("offset"),
        ),
    )
    with_spans = d.select("doc_id", spans.alias("spans"))
    joined = tokens_from_spans(F.col("spans"))
    return with_spans.select(
        "doc_id",
        F.size(F.filter("spans", lambda s: s["kind"] == "text"))
        .cast("long").alias("n_text_spans"),
        F.size(F.filter("spans", lambda s: s["kind"] == "media"))
        .cast("long").alias("n_media_spans"),
        F.size(F.split(joined, " ")).cast("long").alias("ws_tokens"),
        F.length(joined).cast("long").alias("n_chars"),
    )


QUERIES_BATCH3 = {
    "dataset_split": _q_dataset_split,
    "span_tokens": _q_span_tokens,
    "parse_spans": _q_parse_spans,
    "events_pivot": _q_events_pivot,
    "events_cube": _q_events_cube,
    "events_median": _q_events_median,
    "postings_idf": _q_postings_idf,
    "robots_gate": _q_robots_gate,
    "tfidf_search_multiset": _q_tfidf_search_multiset,
    "asof_join_events": _q_asof_join,
    "events_hopping": _q_events_hopping,
    "running_user_totals": _q_running_user_totals,
    "rollup_revenue": _q_rollup_revenue,
    "top_parts_per_supplier": _q_top_parts_per_supplier,
    "nations_except": _q_nations_except,
    "nations_intersect": _q_nations_intersect,
    "knn_ivf": _q_knn_ivf,
    "media_features": _q_media_features,
}


QUERIES_BATCH2 = {
    "dedup_exact": _q_dedup_exact,
    "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
    "dedup_minhash_signatures": _q_minhash_signatures,
    "dedup_minhash_lsh": _q_minhash_lsh,
    "dedup_simhash": _q_simhash,
    # Gated slot is the LSH-bucketed SCALE path (equi-join on
    # hyperplane bucket — never all-pairs); the exact all-pairs recall
    # baseline lives in extras as embedding_near_dup_allpairs.
    "embedding_near_dup": _q_embedding_near_dup_lsh,
    "knn_bruteforce": _q_knn_bruteforce,
    "knn_lsh_bucketed": _q_knn_lsh,
    "lang_id": _q_lang_id,
    "quality_score": _q_quality_score,
    "token_counts": _q_token_counts,
    "doc_fingerprint": _q_fingerprint,
    "media_inventory": _q_media_inventory,
    "media_frame_sample": _q_media_frame_sample,
    "events_tumbling": _q_events_tumbling,
    "events_sessionize": _q_events_sessionize,
    "tpch_pricing_summary": _q_tpch_pricing_summary,
    "tpch_top_orders": _q_tpch_top_orders,
    "region_order_counts": _q_region_order_counts,
}


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
    "document_frequency": _q_document_frequency,
    "tfidf_search": _q_tfidf_search,
    "point_lookup": _q_point_lookup,
}

def _q_pii_redact(spark, sf_dir):
    """Engine addition: PII redaction (email + IPv4) counts and the md5 of
    the redacted text. The synthetic corpus contains neither, so both
    engines first salt it deterministically from doc_id — the redaction is
    then observable and the oracle exact."""
    from see_spark.operators.textfilters import pii_redact

    d = _documents(spark, sf_dir)
    did = F.col("doc_id").cast("long")
    aug = d.select(
        did.alias("doc_id"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.col("text"), F.lit(" reach user"), did.cast("string"),
                F.lit("@mail.example.com or admin@test.org"),
            ),
        )
        .when(
            did % 3 == 1,
            F.concat(
                F.col("text"), F.lit(" server 10."), (did % 200).cast("string"),
                F.lit(".3."), (did % 250).cast("string"), F.lit(" up"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return pii_redact(aug)


def _q_gopher_repetition(spark, sf_dir):
    """Engine addition: Gopher-style per-doc repetition signals."""
    from see_spark.operators.textfilters import gopher_repetition

    return gopher_repetition(_documents(spark, sf_dir))


def _q_line_dedup(spark, sf_dir):
    """Engine addition: corpus-level line dedup (CCNet shape) over the
    dup-injected corpus — every line of a cloned doc occurs in 2 docs and
    is dropped at max_docs=1; unique docs survive intact."""
    from see_spark.operators.textfilters import line_dedup

    return line_dedup(_dup_corpus(spark, sf_dir), max_docs=1)


def _q_top_bigrams(spark, sf_dir):
    """Engine addition: corpus-wide top-20 bigrams, pinned tie-break."""
    from see_spark.operators.textfilters import top_bigrams

    return top_bigrams(_documents(spark, sf_dir), k=20)


def _q_stratified_sample(spark, sf_dir):
    """Engine addition: deterministic per-language stratified sample."""
    from see_spark.operators.textfilters import stratified_sample

    return stratified_sample(_documents(spark, sf_dir))


def _q_pagerank_synth(spark, sf_dir):
    """Engine addition: 5-iteration PageRank over the deterministic
    synthetic expander on documents doc_ids (operators/linkgraph.py);
    oracle = the unrolled power method in SQL."""
    from see_spark.operators.linkgraph import pagerank, synthetic_edges

    docs = _documents(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    edges = synthetic_edges(docs)
    return pagerank(nodes, edges, n_iter=5)


def _q_link_degree_stats(spark, sf_dir):
    """Engine addition: per-node in/out degree over the synthetic expander
    (the hub/authority raw counts)."""
    from see_spark.operators.linkgraph import degree_stats, synthetic_edges

    return degree_stats(synthetic_edges(_documents(spark, sf_dir)))


def _q_bm25_search(spark, sf_dir):
    """Engine addition: BM25 ranking over the same postings contract as
    tfidf_search (operators/search.py:search_bm25). Score rounded to 6dp
    (ln is the one non-exact op, same rule as the tfidf oracle). avgdl
    comes through the materialized corpus_stats path (here built in one
    shot from the whole corpus = the sum of run_round's per-round
    deltas), so the gated read path is the production plan: no postings
    aggregate at query time."""
    from see_spark.operators.indexer import corpus_stats_increment
    from see_spark.operators.search import search_bm25

    docs = _documents(spark, sf_dir)
    postings = _doc_postings(spark, sf_dir)
    res = search_bm25(
        spark,
        " ".join(_SEARCH_WORDS),
        postings,
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), F.col("source").alias("title")),
        docs.count(),
        corpus_stats=corpus_stats_increment(postings),
        round_dp=6,
    )
    return res.select(F.col("url").alias("doc_id"), "title", "score")


def _q_hits_synth(spark, sf_dir):
    """Engine addition: 3-iteration HITS (hubs & authorities, L1
    normalization) over the synthetic expander; oracle = unrolled CTEs."""
    from see_spark.operators.linkgraph import hits, synthetic_edges

    docs = _documents(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    return hits(nodes, synthetic_edges(docs), n_iter=3)


def _q_anchor_postings(spark, sf_dir):
    """Engine addition: anchor-text postings (terms attributed to the link
    TARGET) over deterministic HTML wrapped around each document's text
    prefix — exercises the real HTML parse + tokenizer path with a
    closed-form oracle."""
    from see_spark.operators.linkgraph import anchor_postings

    docs = _documents(spark, sf_dir)
    raw = docs.select(
        F.concat(F.lit("http://d"), F.col("doc_id").cast("string"), F.lit(".test/")).alias("url"),
        F.concat(
            F.lit('<a href="http://t'),
            (F.col("doc_id") % 7).cast("string"),
            F.lit('.test/x">'),
            # strip HTML-significant chars so the anchor text survives the
            # parse verbatim (entities/tags would split text nodes)
            F.substring(F.regexp_replace(F.col("text"), "[<>&]", " "), 1, 40),
            F.lit("</a>"),
        ).alias("body"),
    )
    return anchor_postings(raw)


_PHRASE = ["table", "hash"]  # 47 docs at sf0.01 — non-trivial hit set


def _q_positional_postings(spark, sf_dir):
    """Engine addition: positional inverted index — (doc_id, word, pos)
    with pos = index in the post-filter token sequence. Same pinned
    Catalyst tokenizer as tokenize_postings, one extra posexplode column."""
    from see_spark.operators.positional import positional_postings

    return positional_postings(
        _documents(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        )
    )


def _q_phrase_search(spark, sf_dir):
    """Exact-phrase query over the positional index: k-way equi-join on
    (doc_id, pos - i) — never an inequality join."""
    from see_spark.operators.positional import phrase_search

    return phrase_search(
        _documents(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ),
        _PHRASE,
    )


def _q_proximity_search(spark, sf_dir):
    """Two words within a 3-token window: per-doc equi-join + band filter."""
    from see_spark.operators.positional import proximity_search

    return proximity_search(
        _documents(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ),
        "customer", "join", window=3,
    )


def _q_search_snippets(spark, sf_dir):
    """First-occurrence snippet (±3 tokens) per phrase-matching doc —
    token arrays re-derived only for hits (O(hits) slice work)."""
    from see_spark.operators.positional import phrase_snippets

    return phrase_snippets(
        _documents(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ),
        _PHRASE, context=3,
    )


def _q_recrawl_schedule(spark, sf_dir):
    """Engine addition: change-rate-adaptive revisit scheduling
    (operators/recrawl.py) over a deterministic fetch history synthesized
    from events — round = per-user fetch sequence, content hash steps on
    each 'click' so pages change at different rates. Integer-exact
    backoff (shiftleft, no floats), one url-keyed shuffle."""
    from pyspark.sql import Window

    from see_spark.operators.recrawl import recrawl_schedule

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("event_id")
    version = F.sum(
        F.when(F.col("event_type") == "click", 1).otherwise(0)
    ).over(w)
    hist = e.select(
        F.concat(
            F.lit("http://h"), (F.col("user_id") % 37).cast("string"),
            F.lit(".test/p"), F.col("user_id").cast("string"),
        ).alias("url"),
        F.row_number().over(w).cast("long").alias("round"),
        F.md5(
            F.concat(
                F.col("user_id").cast("string"), F.lit(":"),
                version.cast("string"),
            )
        ).alias("content_hash"),
    )
    return recrawl_schedule(hist, min_interval=1, max_interval=16, now_round=70)


def _q_host_distinct_hll(spark, sf_dir):
    """Engine addition: per-host distinct-URL cardinality via the
    engine-portable HyperLogLog (functions/sketches.py) — mergeable
    sketch columns, ONE combinable shuffle, estimates reproduced
    bit-for-bit by the DuckDB oracle (impossible with HLL++'s opaque
    registers). n_exact rides along so the gate also demonstrates the
    estimator's error empirically."""
    from see_spark.functions.sketches import hll_distinct

    f = _orders_frontier(spark, sf_dir)
    est = hll_distinct(f, ["host"], "url", p=10)
    exact = f.groupBy("host").agg(F.countDistinct("url").alias("n_exact"))
    return exact.join(est, "host").select(
        "host", "n_exact", F.round("hll_estimate", 4).alias("hll_estimate")
    )


def _doc_postings_tf(spark, sf_dir):
    """_doc_postings + the precomputed tf column (O10) the ranked-search
    operators consume."""
    return _doc_postings(spark, sf_dir).withColumn(
        "tf", F.col("term_count") / F.col("doc_len")
    )


def _q_search_or(spark, sf_dir):
    """Engine addition: disjunctive (OR) tf-idf ranking — tfidf_search
    minus the AND gate (operators/search.py:search_or); any doc matching
    any of the three query words is a candidate. Score rounded to 6dp."""
    from see_spark.operators.search import search_or

    docs = _documents(spark, sf_dir)
    res = search_or(
        spark,
        " ".join(_SEARCH_WORDS),
        _doc_postings_tf(spark, sf_dir),
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("source").alias("title"),
        ),
        docs.count(),
    )
    return res.select(F.col("url").alias("doc_id"), "title", "score")


def _q_search_pruned(spark, sf_dir):
    """Engine addition: impact-index pruned disjunctive top-k
    (operators/search.py:search_or_pruned — the batch WAND/max-score
    shape with a Fagin threshold certificate). The oracle is the FLAT
    exact top-10 SQL: a pass proves the pruned path returns the exact
    answer, not an approximation. k=10 with a c=40 prefix so the
    certificate has to do real work at sf0.01 (the three query words
    are near-stopwords there — df ~ 0.78N, idf ~ 0.24 — and a c=40
    prefix's bound lands ABOVE the k-th score, so c=100 is the smallest
    round prefix that certifies; measured in round 3)."""
    from see_spark.operators.search import search_or_pruned

    docs = _documents(spark, sf_dir)
    res = search_or_pruned(
        spark,
        " ".join(_SEARCH_WORDS),
        _doc_postings_tf(spark, sf_dir),
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("source").alias("title"),
        ),
        docs.count(),
        k=10,
        c=100,
    )
    return res.select(F.col("url").alias("doc_id"), "title", "score")


def _q_search_title_boost(spark, sf_dir):
    """Engine addition: fielded (title-boosted) ranking
    (operators/search.py:search_fielded). The documents table has no real
    title, so the title field is pinned to the first 60 chars of text —
    deterministic, tokenizer-visible, reproduced verbatim by the oracle."""
    from see_spark.functions.udfs import tokenize_expr
    from see_spark.operators.search import search_fielded

    docs = _documents(spark, sf_dir)
    title_toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(tokenize_expr(F.substring(F.col("text"), 1, 60))).alias("word"),
    )
    title_counts = title_toks.groupBy("doc_id", "word").agg(
        F.count("*").alias("term_count")
    )
    title_postings = title_counts.withColumn(
        "tf",
        F.col("term_count")
        / F.sum("term_count").over(Window.partitionBy("doc_id")),
    )
    res = search_fielded(
        spark,
        " ".join(_SEARCH_WORDS),
        _doc_postings_tf(spark, sf_dir),
        title_postings,
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("source").alias("title"),
        ),
        docs.count(),
        title_weight=2.0,
    )
    return res.select(F.col("url").alias("doc_id"), "title", "score")


_FUZZY_TERMS = ["sow", "quer", "mall"]  # -> {slow,row}, {query}, {small}


def _q_fuzzy_term_expand(spark, sf_dir):
    """Engine addition: Levenshtein<=1 query-term expansion against the
    corpus vocabulary (operators/lexicon.py:fuzzy_expand) — one pruned
    vocab scan against the broadcast terms, JVM-codegen levenshtein."""
    from see_spark.operators.lexicon import fuzzy_expand, vocabulary

    vocab = vocabulary(_doc_postings(spark, sf_dir))
    exp = fuzzy_expand(spark, _FUZZY_TERMS, vocab, max_dist=1)
    return exp.join(vocab, "word").select(
        "term", "word", F.col("dist").cast("int").alias("dist"), "df"
    )


def _q_fuzzy_search(spark, sf_dir):
    """Engine addition: full fuzzy read path
    (operators/lexicon.py:search_fuzzy) — expansion feeding the
    disjunctive scorer with 1/(1+dist) match discounting."""
    from see_spark.operators.lexicon import search_fuzzy

    docs = _documents(spark, sf_dir)
    res = search_fuzzy(
        spark,
        " ".join(_FUZZY_TERMS),
        _doc_postings_tf(spark, sf_dir),
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("source").alias("title"),
        ),
        docs.count(),
    )
    return res.select(F.col("url").alias("doc_id"), "title", "score")


def _q_substring_search(spark, sf_dir):
    """Engine addition: trigram-index substring search
    (operators/lexicon.py) — pattern 'par' matches vocabulary words
    {part, spark}; docs ranked by total occurrences. The trigram index
    guarantees 100% recall (a word containing the pattern contains all
    its trigrams) and `contains` verification gives exactness, so the
    oracle can assert against a plain LIKE scan."""
    from see_spark.operators.lexicon import (
        substring_search,
        trigram_index,
        vocabulary,
    )

    postings = _doc_postings(spark, sf_dir)
    index = trigram_index(vocabulary(postings))
    return substring_search(postings, index, "par", k=100)


def _q_postings_gap_stats(spark, sf_dir):
    """Engine addition: per-word posting-list delta-gap stats
    (operators/indexstats.py) — the compressed-layout design numbers."""
    from see_spark.operators.indexstats import posting_gap_stats

    return posting_gap_stats(
        _doc_postings(spark, sf_dir).select("word", "doc_id")
    )


def _q_frontier_priority_indegree(spark, sf_dir):
    """O24 variant: importance-first checkout (OPIC-family) — per-host
    budget-3 window ordered by discovered in-degree DESC then (depth,
    seq) (operators/frontier.py:checkout_prioritized). In-degree is
    synthesized as the per-order lineitem count (lineitems 'link to'
    their order's URL)."""
    from see_spark.operators.frontier import checkout_prioritized

    f = _orders_frontier(spark, sf_dir).withColumn(
        "url_hash", F.xxhash64("url")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    indegree = li.groupBy("l_orderkey").agg(F.count("*").alias("indegree"))
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", (F.col("o_custkey") % N_HOSTS).cast("string").alias("__h")
    )
    indeg_urls = indegree.join(
        o, indegree["l_orderkey"] == o["o_orderkey"]
    ).select(
        F.concat(
            F.lit("http://host"), F.col("__h"), F.lit(".test/order/"),
            F.col("o_orderkey").cast("string"),
        ).alias("url"),
        "indegree",
    )
    batch = checkout_prioritized(f, indeg_urls, host_budget=3)
    return batch.select(
        "url", "host", "depth", "seq", "priority", "fetch_order"
    )


# Checked by scripts/check_correctness.py but NOT exported to the driver's
# 50-entry gate window: postings_tf is a projection of tokenize_postings
def _q_search_query(spark, sf_dir):
    """Engine addition: the structured query-language entry
    (operators/search.py:search_query, grammar core/queryparse.py) —
    one string composing AND terms, an exact-phrase gate, an exclusion,
    a title boost and a fuzzy scorer. The oracle reproduces every
    component with the fragments already proven by the standalone
    queries and composes them identically."""
    from see_spark.functions.udfs import tokenize_expr
    from see_spark.operators.search import search_query

    docs = _documents(spark, sf_dir)
    title_toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(tokenize_expr(F.substring(F.col("text"), 1, 60))).alias("word"),
    )
    title_counts = title_toks.groupBy("doc_id", "word").agg(
        F.count("*").alias("term_count")
    )
    title_postings = title_counts.withColumn(
        "tf",
        F.col("term_count")
        / F.sum("term_count").over(Window.partitionBy("doc_id")),
    )
    res = search_query(
        spark,
        'table join "slow small" -batch title:query quer~',
        _doc_postings_tf(spark, sf_dir),
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("source").alias("title"),
        ),
        docs.count(),
        title_postings=title_postings,
        text_docs=docs.select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ),
    )
    return res.select(F.col("url").alias("doc_id"), "title", "score")


def _q_error_backoff_checkout(spark, sf_dir):
    """Per-host exponential error backoff feeding the real checkout():
    synthetic error rows (every 50th-seq 'pending' row remapped, so
    per-host error counts — and therefore gaps 1/2/4/8 — actually vary),
    gap = min(2^n_errors, 8) rounds, hoststats last_fetch_round = hn%4,
    round 6, budget 2."""
    from see_spark.operators.frontier import checkout, error_backoff_gap

    f = (
        _orders_frontier(spark, sf_dir)
        .withColumn(
            "state",
            F.when(
                (F.col("state") == "pending") & (F.col("seq") % 50 == 0),
                "error",
            ).otherwise(F.col("state")),
        )
        .withColumn("url_hash", F.xxhash64("url"))
    )
    gap = error_backoff_gap(f, base_gap=1, cap_rounds=8)
    hn = F.regexp_extract("host", r"host(\d+)\.test", 1).cast("long")
    hoststats = f.select("host").distinct().select(
        "host",
        (hn % 4).cast("int").alias("last_fetch_round"),
        F.lit(0).cast("long").alias("fetched_total"),
    )
    batch = checkout(
        f, hoststats, round_no=6, host_budget=2, min_gap_rounds=1,
        host_gap=gap,
    )
    return batch.select(
        "url", "host", "depth", "seq",
        F.col("fetch_order").cast("long").alias("fetch_order"),
    )


def _q_epoch_mix(spark, sf_dir):
    """Engine addition: deterministic source-weighted epoch mixing —
    src0 upsampled 2.5x, src1 1.5x, src2 downsampled to 0.5x, everything
    else kept at 1.0x; fractional copies decided by a salted hash bucket
    (reproducible in any engine, never DataFrame.sample)."""
    from see_spark.operators.packing import epoch_mix

    d = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "source"
    )
    return epoch_mix(
        d, weights={"src0": 2500, "src1": 1500, "src2": 500},
        default_weight=1000,
    )


def _q_knn_pq(spark, sf_dir):
    """Engine addition: product-quantization ANN (ADC). Integer-quantized
    vectors + integer codebooks (first-16 subvectors, 4 subspaces of 16
    dims) make every adc_dist exact — the oracle reproduces encoding
    (argmin squared-L2 per subspace, tie -> lowest code) and the ADC sum
    bit-for-bit."""
    from see_spark.operators.similarity import knn_pq

    vecs = _qvecs(spark, sf_dir)
    queries_df = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return knn_pq(vecs, queries_df, k=10, m=4, n_codes=16, dim=64).select(
        "query_id", "vec_id", "adc_dist",
        F.col("rank").cast("long").alias("rank"),
    )


def _q_politeness_crawl_delay(spark, sf_dir):
    """Crawl-delay politeness through the REAL checkout() operator: a
    synthetic per-host gap dimension (hosts with hn%3==0 declare a delay
    of hn%5+2 rounds), synthetic hoststats last_fetch_round = hn%4,
    round 6, min gap 2, budget 3. The oracle reproduces eligibility
    (last <= round - max(min_gap, gap)), the per-host top-3 window and
    the dense global fetch_order."""
    from see_spark.operators.frontier import checkout

    f = _orders_frontier(spark, sf_dir).withColumn(
        "url_hash", F.xxhash64("url")
    )
    hn = F.regexp_extract("host", r"host(\d+)\.test", 1).cast("long")
    hosts = f.select("host").distinct()
    hoststats = hosts.select(
        "host",
        (hn % 4).cast("int").alias("last_fetch_round"),
        F.lit(0).cast("long").alias("fetched_total"),
    )
    host_gap = hosts.filter(hn % 3 == 0).select(
        "host", (hn % 5 + 2).cast("int").alias("gap_rounds")
    )
    batch = checkout(
        f, hoststats, round_no=6, host_budget=3, min_gap_rounds=2,
        host_gap=host_gap,
    )
    return batch.select(
        "url", "host", "depth", "seq",
        F.col("fetch_order").cast("long").alias("fetch_order"),
    )


def _q_decontaminate(spark, sf_dir):
    """Engine addition: benchmark decontamination (GPT-3 appendix-C shape).
    The 'benchmark' is derived deterministically from the corpus itself —
    every 41st doc contributes tokens 4..28 as a test-set passage — so
    contamination is real (those docs self-overlap) and the DuckDB oracle
    reproduces it exactly. 5-gram overlap, min_hits=1."""
    from see_spark.operators.textfilters import decontaminate

    d = _documents(spark, sf_dir)
    did = F.col("doc_id").cast("long")
    bench = d.filter(did % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 4, 25), " ").alias("text")
    )
    return decontaminate(d.select(did.alias("doc_id"), "text"), bench, n=5)


def _q_pack_sequences(spark, sf_dir):
    """Engine addition: LM sequence packing manifest — concat-and-chunk
    into 128-token sequences inside 8 salted buckets (window cumsum per
    bucket; no global sort). Integer-only output, bit-exact oracle."""
    from see_spark.operators.packing import pack_sequences

    d = _documents(spark, sf_dir)
    return pack_sequences(
        d.select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
        ctx_len=128,
        n_buckets=8,
    )


# (tf = term_count/doc_len, both gated there) and search_projection is
# tfidf_search + a metadata join (O14); freeing these two slots lets
# knn_ivf and media_features land inside the driver's window.
def _q_host_freq_cms(spark, sf_dir):
    """Engine addition: count-min sketch host-frequency estimates over the
    synthetic frontier, next to exact truth (est >= true by construction;
    see functions/sketches.py). Portable md5 hashing makes the DuckDB
    oracle bit-exact."""
    from see_spark.functions.sketches import cms_build, cms_estimate

    f = _orders_frontier(spark, sf_dir)
    counters = cms_build(f, "host", depth=4, width=256)
    truth = f.groupBy("host").agg(F.count("*").cast("long").alias("true_count"))
    return cms_estimate(counters, truth, "host", depth=4, width=256)


def _q_exact_substring(spark, sf_dir):
    """Engine addition: corpus-wide exact-substring duplication audit
    (Lee et al. 2021 ExactSubstr shape at fixed match length 10) — see
    operators/dedup.py:exact_substring_stats. Integer-only output."""
    from see_spark.operators.dedup import exact_substring_stats

    return exact_substring_stats(_documents(spark, sf_dir), window=10)


def _q_dsir_select(spark, sf_dir):
    """Engine addition: DSIR data selection (Xie et al. 2023) — hashed
    unigram importance weights, integer-quantized so the bucket scores and
    per-doc weight sums are exact across engines (see
    operators/selection.py). The 'target distribution' is pinned as every
    7th doc; the top-100 heaviest raw docs are returned."""
    from see_spark.operators.selection import dsir_topk

    d = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
        (F.col("doc_id") % 7 == 0).cast("int").alias("is_target"),
    )
    return dsir_topk(d, k=100, n_buckets=64, scale=1_000_000)


def _q_normalize_text(spark, sf_dir):
    """Engine addition: Unicode normalization (textfilters.py:
    normalize_text) over documents with deterministic mess injected in
    BOTH engines — decomposed accents (combining U+0301/U+0308), a BEL
    control char, and double spaces — so NFC composition, control strip,
    and whitespace collapse all fire. DuckDB nfc_normalize == Python
    unicodedata NFC, verified."""
    from see_spark.operators.textfilters import normalize_text

    d = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.col("text"),
                F.lit("  Cafe\u0301 "),  # decomposed e + combining acute
                F.lit("\x07nai\u0308ve"),  # BEL + decomposed diaeresis
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    return normalize_text(d)


def _q_chunk_documents(spark, sf_dir):
    """Engine addition: within-document token chunking with overlap
    (packing.py:chunk_documents — the retrieval/embedding manifest;
    chunk 32 / overlap 8). Zero-shuffle array transform; pinned tiling
    reproduced by list slicing in the oracle."""
    from see_spark.operators.packing import chunk_documents

    d = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return chunk_documents(d, chunk_tokens=32, overlap=8)


def _q_nll_buckets(spark, sf_dir):
    """Engine addition: CCNet head/middle/tail perplexity partition
    (lm.py:nll_buckets) — integer-quantized per-bigram avg NLL, exact
    interpolated terciles (the events_median percentile convention),
    bucket by threshold compare. Reference slice = doc_id%5==0."""
    from see_spark.operators.lm import nll_buckets

    d = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return nll_buckets(d, d.filter(F.col("doc_id") % 5 == 0))


def _q_corpus_pipeline(spark, sf_dir):
    """Engine addition: the composed corpus keep/drop decision
    (operators/pipeline.py:corpus_quality_pipeline) — language + Gopher
    repetition + length + heuristic quality + LM perplexity, each an
    individually exact-tested component, conjoined per doc_id. Reference
    slice for the LM = doc_id%5==0 (the lm_perplexity convention)."""
    from see_spark.operators.pipeline import corpus_quality_pipeline

    d = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return corpus_quality_pipeline(d, d.filter(F.col("doc_id") % 5 == 0))


def _q_spell_suggest(spark, sf_dir):
    """Engine addition: query spell suggestion (lexicon.py:
    suggest_corrections) — best correction per term by (edit distance,
    df desc, word); exact hits self-suggest at dist 0, hopeless terms
    emit nulls. Vocab = the corpus df table (word_stats shape)."""
    from see_spark.operators.lexicon import suggest_corrections

    vocab = (
        _doc_postings(spark, sf_dir)
        .groupBy("word")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
    )
    return suggest_corrections(
        spark, ["table", "tabel", "queryy", "zzzzxxxx"], vocab, max_dist=2
    )


def _q_redirect_chains(spark, sf_dir):
    """Engine addition: redirect-chain resolution by pointer doubling
    (operators/redirects.py) — O(log L) self-joins instead of L chases.
    Synthesized functional graph from orders: runs of consecutive
    orderkeys form chains (k -> k+1 for k%5<3), some k%5==3 rows close
    their chain into a 4-cycle, and k%5==4 & k%11==0 rows self-loop —
    guaranteed cycle coverage. Oracle = recursive-CTE step-by-step walk."""
    from see_spark.operators.redirects import resolve_redirect_chains

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey").cast("long")

    def url_of(expr):
        return F.concat(F.lit("http://r.test/p/"), expr.cast("string"))

    e1 = o.filter(k % 5 < 3).select(
        url_of(k).alias("url"), url_of(k + 1).alias("target")
    )
    e2 = o.filter((k % 5 == 3) & (k % 7 == 0)).select(
        url_of(k).alias("url"), url_of(k - 3).alias("target")
    )
    e3 = o.filter((k % 5 == 4) & (k % 11 == 0)).select(
        url_of(k).alias("url"), url_of(k).alias("target")
    )
    edges = e1.unionByName(e2).unionByName(e3)
    return resolve_redirect_chains(edges, max_doublings=6)


def _q_host_quota(spark, sf_dir):
    """Engine addition: per-host document quota (textfilters.py:
    host_quota_sample) over the synthetic frontier — keep <= 7 urls per
    host by salted-hash order (deterministic fair sample). One window
    shuffle; md5 ordering makes survivors engine-exact."""
    from see_spark.operators.textfilters import host_quota_sample

    f = _orders_frontier(spark, sf_dir).select("url", "host", "seq")
    return host_quota_sample(f, cap=7, host_col="host", id_col="seq").select(
        "url", "host", "seq", "host_rank"
    )


def _q_reindex_df_delta(spark, sf_dir):
    """Engine addition: signed word_stats delta when changed documents are
    re-indexed (indexer.py:word_stats_reindex_delta — the index-
    maintenance arm of conditional revisits). Changed slice = doc_id%3==0;
    the new version truncates the text to its first half and appends two
    marker words, so the delta has both negative rows (words lost with
    the tail) and positive rows (the markers). Tokenization is the pinned
    O8 pipeline in both engines."""
    from see_spark.functions.udfs import tokenize_expr
    from see_spark.operators.indexer import word_stats_reindex_delta

    docs = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    ).filter(F.col("doc_id") % 3 == 0)
    new_docs = docs.select(
        "doc_id",
        F.concat(
            F.substring(
                F.col("text"), 1, F.floor(F.length("text") / 2).cast("int")
            ),
            F.lit(" reindexed marker"),
        ).alias("text"),
    )

    def postings(d):
        return (
            d.select("doc_id", F.explode(tokenize_expr(F.col("text"))).alias("word"))
            .groupBy("doc_id", "word")
            .count()
        )

    return word_stats_reindex_delta(postings(docs), postings(new_docs)).select(
        "word", F.col("df").alias("df_delta")
    )


def _q_revisit_decide(spark, sf_dir):
    """Engine addition: conditional-revisit outcome classification
    (operators/revisit.py:revisit_decide) over a synthesized result table
    covering all arms — 304 validator hit, 200 with unchanged body, 200
    changed, 404, and null-status network failure. Pure Catalyst; md5
    validators make the decision table engine-exact."""
    from see_spark.operators.revisit import revisit_decide

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey").cast("long")
    case = k % 5
    results = o.select(
        F.concat(
            F.lit("http://host"), (F.col("o_custkey") % 97).cast("string"),
            F.lit(".test/order/"), k.cast("string"),
        ).alias("url"),
        F.when(case == 0, 304)
        .when(case.isin(1, 2), 200)
        .when(case == 3, 404)
        .otherwise(F.lit(None).cast("int"))
        .alias("status"),
        F.when(case == 1, F.concat(F.lit("s"), k.cast("string")))
        .when(case == 2, F.concat(F.lit("b"), k.cast("string")))
        .alias("body"),
        F.md5(F.concat(F.lit("s"), k.cast("string"))).alias("stored_hash"),
    )
    return revisit_decide(results).select(
        "url", F.col("status").cast("long").alias("status"),
        "outcome", "new_hash", "saved_fetch",
    )


def _q_content_classify(spark, sf_dir):
    """Engine addition: jusText-style boilerplate classification
    (operators/content.py:classify_blocks) — context-free density rules +
    the context-sensitive neighbor vote (two window passes on one doc_id
    shuffle). Blocks are synthesized identically in both engines from the
    documents table (12-word chunks; link chars from a pinned integer
    formula), so the label pipeline — the Catalyst part that runs at
    10^10-block scale — is exact-oracle-checked end to end; the HTML ->
    blocks kernel (core/htmlx.blocks) is pytest-pinned separately."""
    from see_spark.operators.content import classify_blocks

    d = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.filter(F.split("text", " "), lambda x: x != "").alias("t"),
    ).filter(F.size("t") >= 1)
    nb = F.ceil(F.size("t").cast("double") / 12.0).cast("long")
    texts = F.transform(
        F.sequence(F.lit(0).cast("long"), nb - 1),
        lambda i: F.array_join(
            F.slice(F.col("t"), (i * 12 + 1).cast("int"), 12), " "
        ),
    )
    blk = d.select("doc_id", F.posexplode(texts).alias("block_id", "text")).select(
        "doc_id",
        F.col("block_id").cast("long").alias("block_id"),
        "text",
        F.length("text").cast("long").alias("n_chars"),
        (
            (F.col("doc_id") * 7 + F.col("block_id") * 13)
            % (F.length("text") + 1)
        ).cast("long").alias("n_link_chars"),
    )
    return classify_blocks(blk).select(
        "doc_id", "block_id", "n_chars", "n_link_chars",
        "n_words", "n_stopwords", "ctx_label", "label",
    )


def _q_lm_perplexity(spark, sf_dir):
    """Engine addition: CCNet-style LM quality scoring (Wenzek et al.
    2020) — add-1 bigram LM trained on the doc_id%5==0 reference slice,
    every document scored by total bigram NLL in integer micro-nats
    (order-independent integer sum, engine-exact). See operators/lm.py."""
    from see_spark.operators.lm import doc_nll

    d = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return doc_nll(d, d.filter(F.col("doc_id") % 5 == 0))


def _q_url_trap_gate(spark, sf_dir):
    """Engine addition: crawler-trap gate (frontier.py:trap_stats) over a
    deterministic trap-shaped URL corpus synthesized from orders — some
    URLs repeat a tiny segment alphabet (the /a/b/a/b loop shape), some
    exceed depth/length bounds. Pure-Catalyst path heuristics; identical
    synthesis + logic in the DuckDB oracle."""
    from see_spark.operators.frontier import trap_stats

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = F.col("o_custkey") % 4 + 1
    nseg = (F.col("o_orderkey") % 12).cast("long")
    segs = F.when(
        nseg >= 1,
        F.transform(
            F.sequence(F.lit(1).cast("long"), nseg),
            lambda i: F.concat(
                F.lit("s"), ((F.col("o_orderkey") + i) % base).cast("string")
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    urls = o.select(
        F.concat(
            F.lit("http://t"),
            (F.col("o_custkey") % 7).cast("string"),
            F.lit(".test/"),
            F.array_join(segs, "/"),
        ).alias("url")
    )
    return trap_stats(urls, max_depth=8, max_seg_repeat=3, max_len=45)


def _q_bpe_merges(spark, sf_dir):
    """Engine addition: BPE tokenizer training (Sennrich et al. 2016) —
    corpus -> word histogram (the one corpus-sized shuffle) -> 8 greedy
    pair merges. See operators/bpe.py. The space-wrapped symbol-string
    representation makes every merge a built-in replace with identical
    greedy semantics in Spark and DuckDB, so the merge table is exact."""
    from see_spark.operators.bpe import bpe_train

    return bpe_train(_documents(spark, sf_dir), n_merges=8)


def _q_semdedup(spark, sf_dir):
    """Engine addition: SemDeDup semantic dedup (Abbas et al. 2023) —
    k-means cells bound the cosine comparisons to within-cluster
    equi-joins; keep = no smaller-id same-cluster neighbor above the
    threshold. See operators/dedup.py:semdedup. Same milli-quantized
    vectors + deterministic Lloyd training as knn_ivf, so the DuckDB
    oracle reproduces clusters and keep decisions bit-for-bit."""
    from see_spark.operators.dedup import semdedup

    return semdedup(
        _qvecs(spark, sf_dir), n_clusters=8, threshold=0.45, train_iters=1
    )


def _q_search_diversify(spark, sf_dir):
    """Engine addition: SERP host-collapse
    (operators/search.py:diversify_by_host) — per-host cap before the
    global top-k. Scores are a deterministic integer-valued double
    ((doc_id*37)%101) with heavy cross-host ties, so both the
    within-host rank tie-break and the global-cut tie-break are
    exercised; hosts = doc_id%7."""
    from see_spark.operators.search import diversify_by_host

    d = _documents(spark, sf_dir)
    r = d.select(
        F.col("doc_id").cast("long").alias("url"),
        F.concat(
            F.lit("h"), (F.col("doc_id") % 7).cast("string"), F.lit(".test")
        ).alias("host"),
        ((F.col("doc_id") * 37) % 101).cast("double").alias("score"),
    )
    return diversify_by_host(r, k=20, per_host=2)


def _q_host_reputation(spark, sf_dir):
    """Engine addition: host-reputation gate (operators/reputation.py —
    the FineWeb domain-level curation arm). Documents map onto hosts
    host{doc_id%50}.test (the frontier's host space is host{0..96}, so
    hosts 50..96 have NO evidence and must PASS via the cold-start
    rule); per-doc quality is the integer rational form of the pinned
    quality_score composite; the gate fails hosts with >= 3 scored docs
    whose summed q_milli < 60 * n_docs (integer cross-multiply — the
    measured per-host distribution spans 48..72, so both arms fire)."""
    from see_spark.operators.reputation import (
        doc_quality_milli,
        host_quality_gate,
        host_quality_stats,
    )

    docs = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text"),
        F.concat(
            F.lit("host"), (F.col("doc_id") % 50).cast("string"), F.lit(".test")
        ).alias("host"),
    )
    stats = host_quality_stats(doc_quality_milli(docs))
    f = _orders_frontier(spark, sf_dir).select("url", "host", "seq")
    return host_quality_gate(f, stats, min_docs=3, min_avg_milli=60).select(
        "url", "host", "seq", "n_docs", "sum_q_milli", "passed"
    )


def _q_search_anchor_boost(spark, sf_dir):
    """Engine addition: anchor-text-boosted ranking — THE classic web
    signal (terms other pages use to describe a target) folded into the
    fielded scorer. Link graph: doc k links to doc (k%97)*5 (~5
    in-links per target, so anchor term counts SUM across in-links)
    with anchor text = k's 40-char sanitized prefix; the anchor field
    rides the real HTML-parse -> resolver -> tokenizer path
    (linkgraph.anchor_postings) and search_fielded scores body +
    anchors at weight 1.5 with body-only df."""
    from see_spark.operators.linkgraph import anchor_postings
    from see_spark.operators.search import search_fielded

    docs = _documents(spark, sf_dir)
    raw = docs.select(
        F.concat(
            F.lit("http://d"), F.col("doc_id").cast("string"), F.lit(".test/")
        ).alias("url"),
        F.concat(
            F.lit('<a href="http://d'),
            ((F.col("doc_id") % 97) * 5).cast("long").cast("string"),
            F.lit('.test/">'),
            F.substring(F.regexp_replace(F.col("text"), "[<>&]", " "), 1, 40),
            F.lit("</a>"),
        ).alias("body"),
    )
    ap = anchor_postings(raw)
    target = F.regexp_extract(
        F.col("dst_url"), r"http://d([0-9]+)\.test/", 1
    ).cast("long")
    acounts = (
        ap.select(target.alias("doc_id"), "word", "term_count")
        .groupBy("doc_id", "word")
        .agg(F.sum("term_count").alias("term_count"))
    )
    anchor_post = acounts.withColumn(
        "tf",
        F.col("term_count")
        / F.sum("term_count").over(Window.partitionBy("doc_id")),
    )
    res = search_fielded(
        spark,
        " ".join(_SEARCH_WORDS),
        _doc_postings_tf(spark, sf_dir),
        anchor_post,
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("source").alias("title"),
        ),
        docs.count(),
        title_weight=1.5,
    )
    return res.select(F.col("url").alias("doc_id"), "title", "score")


def _q_bfs_depths(spark, sf_dir):
    """Engine addition: exact shortest-hop BFS distance from a seed set
    (linkgraph.py:bfs_depths, the crawl-depth audit) over a synthesized
    link graph from orders: chain edges (k -> k+1 for k%5<3), shortcut
    edges (k -> k+10 for k%7==0, creating diamonds whose MIN depth must
    win), and back edges (k -> k-20 for k%13==0, creating cycles that
    must terminate). Seeds = k%101==0. Delta-frontier iterative joins in
    Spark; recursive CTE with UNION dedup + MIN in DuckDB."""
    from see_spark.operators.linkgraph import bfs_depths

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey").cast("long")

    def url_of(expr):
        return F.concat(F.lit("http://g.test/p/"), expr.cast("string"))

    e1 = o.filter(k % 5 < 3).select(
        url_of(k).alias("src"), url_of(k + 1).alias("dst")
    )
    e2 = o.filter(k % 7 == 0).select(
        url_of(k).alias("src"), url_of(k + 10).alias("dst")
    )
    e3 = o.filter((k % 13 == 0) & (k >= 20)).select(
        url_of(k).alias("src"), url_of(k - 20).alias("dst")
    )
    edges = e1.unionByName(e2).unionByName(e3)
    seeds = o.filter(k % 101 == 0).select(url_of(k).alias("url"))
    return bfs_depths(edges, seeds, max_iters=8)


def _q_quality_classifier(spark, sf_dir):
    """Engine addition: trainable quality classifier (operators/
    classifier.py — the fastText/DCLM filtering shape) with the WHOLE
    logistic-regression training loop in int64 fixed point, so the
    DuckDB oracle reproduces every iteration bit-for-bit (weights,
    margins, fast-sigmoid outputs, gradient sums, final predictions).
    Corpus: documents with four marker tokens appended to the
    doc_id%3==0 slice in BOTH engines; labels = that same rule — a
    separable problem the trained model must actually solve (the pytest
    asserts accuracy, this gate asserts exactness)."""
    from see_spark.operators.classifier import train_and_score

    docs = _documents(spark, sf_dir)
    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" xqza xqzb xqzc xqzd")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        (F.col("doc_id") % 3 == 0).cast("long").alias("label"),
    )
    return train_and_score(d, n_buckets=64, iters=8, lr_num=1, lr_den=2)


def _classifier_oracle_sql(
    iters: int, d: int = 64, lr_num: int = 1, lr_den: int = 2
) -> str:
    """Unrolled-CTE replica of train_and_score: one (z, e, g, w) CTE
    block per gradient iteration (the BPE-oracle idiom). All integer."""
    fp = 1 << 20
    pfp = (
        f"({fp // 2} + (CASE WHEN z_int > 0 THEN 1 WHEN z_int < 0 THEN -1"
        f" ELSE 0 END) * ((abs(z_int) * {fp}) // (2 * ({fp} + abs(z_int)))))"
    )
    step = f"(({lr_num} * abs(g.g)) // ({lr_den} * n.c))"
    parts = [
        f"""
        WITH docs AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 CASE WHEN doc_id % 3 = 0
                      THEN text || ' xqza xqzb xqzc xqzd' ELSE text END AS text,
                 CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS y
          FROM documents),
        feats AS (
          SELECT DISTINCT doc_id,
                 ('0x' || substr(md5(tok), 1, 4))::BIGINT % {d} AS bucket
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM docs)
          UNION ALL
          SELECT doc_id, {d} AS bucket FROM docs),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM docs),
        w0 AS (SELECT CAST(b AS BIGINT) AS bucket, CAST(0 AS BIGINT) AS w
               FROM range({d + 1}) t(b))"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
        z{i} AS (SELECT f.doc_id, CAST(SUM(w.w) AS BIGINT) AS z_int
                 FROM feats f JOIN w{i - 1} w USING (bucket)
                 GROUP BY f.doc_id),
        e{i} AS (SELECT doc_id, CAST({pfp} - y * {fp} AS BIGINT) AS e
                 FROM (SELECT z.doc_id, z.z_int, dd.y
                       FROM z{i} z JOIN docs dd USING (doc_id))),
        g{i} AS (SELECT f.bucket, CAST(SUM(e.e) AS BIGINT) AS g
                 FROM feats f JOIN e{i} e USING (doc_id)
                 GROUP BY f.bucket),
        w{i} AS (SELECT w.bucket,
                        CAST(w.w - (CASE WHEN g.g > 0 THEN {step}
                                         WHEN g.g < 0 THEN -{step}
                                         ELSE 0 END) AS BIGINT) AS w
                 FROM w{i - 1} w LEFT JOIN g{i} g USING (bucket)
                 CROSS JOIN n)"""
        )
    parts.append(
        f""",
        zf AS (SELECT f.doc_id, CAST(SUM(w.w) AS BIGINT) AS z_int
               FROM feats f JOIN w{iters} w USING (bucket)
               GROUP BY f.doc_id)
        SELECT m.doc_id, m.y, m.z_int,
               CAST({pfp} AS BIGINT) AS p_fp,
               CAST(CASE WHEN {pfp} >= {fp // 2} THEN 1 ELSE 0 END AS BIGINT)
                 AS predicted
        FROM (SELECT z.doc_id, z.z_int, dd.y
              FROM zf z JOIN docs dd USING (doc_id)) m"""
    )
    return "".join(parts)


def _q_budgeted_checkout(spark, sf_dir):
    """Per-host budgets feeding the real checkout(): Hamilton
    apportionment of 60 slots over 97 hosts (shares < 1, so ~37 hosts
    get budget 0 and are SKIPPED this round — the exhaustion/reputation
    consumer arm), hosts with hn%5==3 withheld from the dimension (they
    fall back to the scalar default 2). Salted two-phase top-k must
    equal the oracle's plain per-host row_number cut at per-host
    budgets."""
    from see_spark.operators.frontier import allocate_budget, checkout

    f = _orders_frontier(spark, sf_dir).withColumn(
        "url_hash", F.xxhash64("url")
    )
    w = f.groupBy("host").agg(F.count("*").cast("long").alias("weight"))
    hn = F.regexp_extract("host", r"host(\d+)\.test", 1).cast("long")
    budgets = allocate_budget(w, 60).select("host", "budget").where(
        (hn % 5) != 3
    )
    hoststats = f.select("host").distinct().select(
        "host",
        F.lit(0).cast("int").alias("last_fetch_round"),
        F.lit(0).cast("long").alias("fetched_total"),
    )
    batch = checkout(
        f, hoststats, round_no=5, host_budget=2, min_gap_rounds=1,
        host_budgets=budgets,
    )
    return batch.select(
        "url", "host", "depth", "seq",
        F.col("fetch_order").cast("long").alias("fetch_order"),
    )


def _q_budget_allocation(spark, sf_dir):
    """Engine addition: Hamilton largest-remainder fetch-budget
    apportionment (operators/frontier.py:allocate_budget) — 10,000
    global fetch slots across the 97 frontier hosts weighted by order
    volume; sum(budget) == 10,000 exactly, every host within one slot
    of its exact share."""
    from see_spark.operators.frontier import allocate_budget

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = o.groupBy(
        F.concat(
            F.lit("host"), (F.col("o_custkey") % N_HOSTS).cast("string"),
            F.lit(".test"),
        ).alias("host")
    ).agg(F.count("*").cast("long").alias("weight"))
    return allocate_budget(w, 10_000)


def _q_curriculum(spark, sf_dir):
    """Engine addition: quality-curriculum training order
    (operators/packing.py:curriculum_order) — 4 exact-quantile threshold
    buckets over the pinned q_milli composite, salted-hash shuffle
    within buckets, round-robin interleave; positions via the
    distributed dense-sequence (no global window)."""
    from see_spark.operators.packing import curriculum_order
    from see_spark.operators.reputation import doc_quality_milli

    d = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    scores = doc_quality_milli(d.withColumn("host", F.lit("x"))).select(
        "doc_id", "q_milli"
    )
    return curriculum_order(scores, n_buckets=4, seed="r3")


def _q_vocab_growth(spark, sf_dir):
    """Engine addition: vocabulary growth per crawl round (the Heaps-law
    observability curve) through discovery_curve: new words per round +
    running distinct vocabulary. The documents table's synthetic corpus
    has a closed 30-word vocabulary (measured — no growth to observe),
    so the word stream is synthesized from orders with a GROWING modulus
    (word = orderkey mod (orderkey div 100 + 10), round = orderkey div
    1000): early rounds see a small vocabulary, later rounds keep
    introducing new ids — the Heaps shape, integer-exact in any
    engine."""
    from see_spark.operators.discovery import discovery_curve

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    p = o.select(
        F.concat(
            F.lit("w"),
            F.expr(
                "cast(o_orderkey % ((o_orderkey div 100) + 10) as string)"
            ),
        ).alias("word"),
        F.expr("o_orderkey div 1000").cast("long").alias("r"),
    )
    first = p.groupBy("word").agg(F.min("r").alias("first_round"))
    fs = first.select(
        F.lit("corpus").alias("host"),
        F.col("word").alias("url"),
        "first_round",
    )
    return discovery_curve(fs)


def _q_ring_assign(spark, sf_dir):
    """Engine addition: consistent-hash fetcher assignment
    (operators/ring.py) — 97 frontier hosts onto 5 workers x 16 vnodes
    via the portable 60-bit ring; successor = min (point, worker) at or
    after the host point, wraparound to the ring's first point."""
    from see_spark.operators.ring import assign_hosts, ring_points

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hosts = o.select(
        F.concat(
            F.lit("host"), (F.col("o_custkey") % N_HOSTS).cast("string"),
            F.lit(".test"),
        ).alias("host")
    ).distinct()
    ring = ring_points(spark, [f"w{i}" for i in range(5)], vnodes=16)
    return assign_hosts(hosts, ring)


def _q_canonical_election(spark, sf_dir):
    """Engine addition: quality-aware canonical election
    (operators/dedup.py:elect_canonical) over exact-dup groups of the
    dup-injected corpus. Exact dups have identical text, so scores tie
    within every group and the pinned doc_id tie-break arm is what this
    gate exercises end-to-end (the quality-beats-id arm is pinned by
    tests/test_ring_election.py on differing-text clusters)."""
    from see_spark.operators.dedup import elect_canonical, exact_dedup
    from see_spark.operators.reputation import doc_quality_milli

    corpus = _dup_corpus(spark, sf_dir)
    members = exact_dedup(corpus).select(
        F.col("text_hash").alias("cluster_id"), "doc_id"
    )
    scores = doc_quality_milli(
        corpus.withColumn("host", F.lit("x"))
    ).select("doc_id", "q_milli")
    return elect_canonical(members, scores)


def _q_crawl_anomaly_iqr(spark, sf_dir):
    """Engine addition: Tukey-fence crawl anomaly flags
    (operators/discovery.py:iqr_outlier_flags). Per-host fetch counts
    from lineitem with five suppkey residues folded onto one hot host
    (~5x the uniform count), so the is_high arm provably fires while
    the rest of the fleet sits inside the fences."""
    from see_spark.operators.discovery import iqr_outlier_flags

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    res = F.col("l_suppkey") % 50
    folded = F.when(res % 10 == 7, F.lit(7)).otherwise(res)
    counts = li.groupBy(
        F.concat(F.lit("h"), folded.cast("string"), F.lit(".test")).alias(
            "host"
        )
    ).agg(F.count("*").cast("long").alias("n"))
    return iqr_outlier_flags(counts, "n", key_cols=("host",), k_milli=1500)


def _q_shard_plan(spark, sf_dir):
    """Engine addition: LPT-striped index shard planning
    (operators/sharding.py) — docs ranked by size (char length of text)
    desc via the distributed dense-sequence, striped rank%8, audited by
    per-shard load_milli (1000 = perfect balance)."""
    from see_spark.operators.sharding import plan_shards, shard_stats

    d = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("size"),
    )
    return shard_stats(plan_shards(d, 8), 8)


def _q_discovery_unseen(spark, sf_dir):
    """Engine addition: Good-Turing host-exhaustion estimate
    (operators/discovery.py:unseen_mass). Sightings synthesized from
    lineitem (host = suppkey%25, url = partkey%400 — multiplicities
    arise naturally from the TPC-H key distribution); unseen_milli =
    1000*f1 div N, exhausted gated with the cold-start evidence floor."""
    from see_spark.operators.discovery import unseen_mass

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = li.select(
        F.concat(
            F.lit("h"), (F.col("l_suppkey") % 25).cast("string"), F.lit(".test")
        ).alias("host"),
        F.concat(
            F.lit("u"), (F.col("l_partkey") % 400).cast("string")
        ).alias("url"),
    )
    return unseen_mass(s, threshold_milli=100, min_obs=20)


def _q_epoch_shuffle(spark, sf_dir):
    """Engine addition: deterministic global training shuffle
    (operators/packing.py:epoch_shuffle) — dense epoch positions from
    the salted portable 60-bit hash order; no RNG, identical permutation
    in any engine at any parallelism."""
    from see_spark.operators.packing import epoch_shuffle

    d = _documents(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"))
    return epoch_shuffle(d, "r3")


def _q_autocomplete(spark, sf_dir):
    """Engine addition: query autocomplete
    (operators/lexicon.py:autocomplete) — per-prefix top-8 vocabulary
    completions by df desc, word asc; prefix 'zz' has no completion and
    must emit nothing. Vocab derived from the documents postings (the
    materialized word_stats table in the crawl deployment)."""
    from see_spark.operators.lexicon import autocomplete, vocabulary

    return autocomplete(
        spark,
        ["jo", "qu", "ta", "zz"],
        vocabulary(_doc_postings(spark, sf_dir)),
        k=8,
    )


def _q_adaptive_politeness(spark, sf_dir):
    """Engine addition: latency-adaptive politeness
    (operators/frontier.py:adaptive_host_delay). Observations synthesized
    from events (value pre-quantized to integer milli by _events): hosts
    h0/h1 get value div 100 latencies (forcing the MIN clamp at mult=8)
    while the 1..5x scale spread pushes every other host past the MAX
    clamp — both arms fire; all latency arithmetic is integer. p75 is the exact
    interpolated quartile (binary-exact fractions, events_median
    convention); delay and gap_rounds are integer-exact."""
    from see_spark.operators.frontier import adaptive_host_delay

    ev = _events(spark, sf_dir)  # value arrives quantized to milli (long)
    hi = F.col("user_id") % 40
    lat = (
        F.when(hi < 2, F.expr("value div 100"))
        .otherwise(F.col("value") * (1 + (hi % 5)))
        .cast("long")
    )
    obs = ev.select(
        F.concat(F.lit("h"), hi.cast("string"), F.lit(".test")).alias("host"),
        lat.alias("latency_ms"),
    )
    return adaptive_host_delay(
        obs, mult=8, min_delay_ms=100, max_delay_ms=10_000, round_ms=1000
    )


def _dust_pages(spark, sf_dir):
    """Synthetic (url, fp) page set for the DUST queries: 7 shop hosts,
    paths /item/{k%500}, params id=k (always), sid=orderkey (k%3==0 —
    a session id, content-irrelevant), page=orderkey%4 (k%5==0 —
    content-SELECTING). fp depends on (k, page) only, so sid earns
    evidence and page earns both evidence (page=0 collides with the
    no-page fingerprint) and counterexamples (page!=0)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ok = F.col("o_orderkey").cast("long")
    k = (ok % 500).cast("long")
    host = F.concat(
        F.lit("shop"), (F.col("o_custkey") % 7).cast("string"), F.lit(".test")
    )
    qs = F.concat(
        F.lit("id="),
        k.cast("string"),
        F.when(
            ok % 3 == 0, F.concat(F.lit("&sid="), ok.cast("string"))
        ).otherwise(F.lit("")),
        F.when(
            ok % 5 == 0, F.concat(F.lit("&page="), (ok % 4).cast("string"))
        ).otherwise(F.lit("")),
    )
    url = F.concat(
        F.lit("http://"), host, F.lit("/item/"), k.cast("string"),
        F.lit("?"), qs,
    )
    fp = (
        k * 7919
        + F.when(ok % 5 == 0, (ok % 4) * 13).otherwise(F.lit(0))
    ).cast("long")
    return o.select(url.alias("url"), fp.alias("fp")).distinct()


def _q_dust_param_rules(spark, sf_dir):
    """Engine addition: DUST-style query-param rule mining
    (operators/urlalias.py:mine_param_rules — Bar-Yossef et al. WWW'07).
    Evidence/counterexample counting over residual-URL lookups; a rule
    is strippable iff support >= 3 with zero counterexamples. The
    reference canonicalizer (see_crawler_url.erl) is syntax-only; this
    is the content-evidence loop on top of it."""
    from see_spark.operators.urlalias import mine_param_rules

    return mine_param_rules(_dust_pages(spark, sf_dir), min_support=3)


def _q_dust_apply(spark, sf_dir):
    """Engine addition: apply mined DUST rules to the same page set
    (operators/urlalias.py:apply_param_rules) and report the per-host
    frontier compression (distinct URLs vs distinct aliases)."""
    from see_spark.operators.urlalias import (
        apply_param_rules,
        mine_param_rules,
    )

    pages = _dust_pages(spark, sf_dir)
    rules = mine_param_rules(pages, min_support=3)
    aliased = apply_param_rules(pages, rules)
    return aliased.groupBy("host").agg(
        F.countDistinct("url").alias("n_urls"),
        F.countDistinct("alias_url").alias("n_aliases"),
    )


def _q_mirror_hosts(spark, sf_dir):
    """Engine addition: mirror-host detection
    (operators/urlalias.py:mirror_hosts) — hosts m0..m7 serve the same
    50 paths with path-determined fingerprints (mirrors of each other);
    m8/m9 serve host-specific content on the same paths (never pair).
    Integer Jaccard resemblance over an equi-join on (signature, fp) —
    no host x host cross join."""
    from see_spark.operators.urlalias import mirror_hosts

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ok = F.col("o_orderkey").cast("long")
    hi = (F.col("o_custkey") % 10).cast("long")
    k = (ok % 50).cast("long")
    url = F.concat(
        F.lit("http://m"), hi.cast("string"), F.lit(".test/p/"),
        k.cast("string"),
    )
    fp = F.when(hi >= 8, k * 100 + hi).otherwise(k).cast("long")
    pages = o.select(url.alias("url"), fp.alias("fp")).distinct()
    return mirror_hosts(pages, min_shared=20, min_resemblance_milli=800)


URL_BANNED_WORDS = [
    ("casino", 700),
    ("pills", 400),
    ("poker", 500),
    ("webcam", 900),
    ("torrent", 300),  # never injected: pins the zero-hit term to 0
]
URL_BANNED_DOMAINS = ["host3.test", "host7.test"]


def _q_url_filter(spark, sf_dir):
    """Engine addition: RefinedWeb-style URL filtering
    (operators/urlfilter.py:url_blocklist_score) — weighted banned-word
    soft score + strict domain blocklist, decided before any fetch.
    URLs are synthesized from orders with deterministic contamination:
    independent suffix slots (k%13 casino, k%11 pills, k%17 poker,
    k%29 webcam) so weights SUM on collision rows (700+400 >= the 800
    threshold), a mixed-case injection exercising lower(), and k%23
    rows on a cdn. subdomain of a blocked domain exercising the
    ends_with arm. Host comes from the URL via HOST_RE in both
    engines."""
    from see_spark.operators.urlfilter import url_blocklist_score

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey").cast("long")
    h = (F.col("o_custkey") % N_HOSTS).cast("string")
    sub = F.when(k % 23 == 0, F.lit("cdn.")).otherwise(F.lit(""))
    sfx = F.concat(
        F.when(k % 13 == 0, F.lit("?ref=CasinoFun")).otherwise(F.lit("")),
        F.when(k % 11 == 0, F.lit("/cheap-pills")).otherwise(F.lit("")),
        F.when(k % 17 == 0, F.lit("/poker-night")).otherwise(F.lit("")),
        F.when(k % 29 == 0, F.lit("/live-webcam-hd")).otherwise(F.lit("")),
    )
    f = o.select(
        F.concat(
            F.lit("http://"), sub, F.lit("host"), h, F.lit(".test/order/"),
            k.cast("string"), sfx,
        ).alias("url")
    )
    return url_blocklist_score(
        f, URL_BANNED_WORDS, URL_BANNED_DOMAINS, threshold_milli=800
    )


# The gated embedding_near_dup slot is the LSH-bucketed scale path;
# embedding_near_dup_allpairs here is its exact all-pairs recall
# baseline (quadratic by construction — correctness reference only).
QUERIES_EXTRA: dict = {
    "url_filter": _q_url_filter,
    "quality_classifier": _q_quality_classifier,
    "bfs_depths": _q_bfs_depths,
    "search_anchor_boost": _q_search_anchor_boost,
    "host_reputation": _q_host_reputation,
    "search_diversify": _q_search_diversify,
    "normalize_text": _q_normalize_text,
    "chunk_documents": _q_chunk_documents,
    "nll_buckets": _q_nll_buckets,
    "corpus_pipeline": _q_corpus_pipeline,
    "spell_suggest": _q_spell_suggest,
    "redirect_chains": _q_redirect_chains,
    "host_quota_sample": _q_host_quota,
    "reindex_df_delta": _q_reindex_df_delta,
    "revisit_decide": _q_revisit_decide,
    "content_classify": _q_content_classify,
    "lm_perplexity": _q_lm_perplexity,
    "url_trap_gate": _q_url_trap_gate,
    "bpe_merges": _q_bpe_merges,
    "semdedup": _q_semdedup,
    "dsir_select": _q_dsir_select,
    "exact_substring_dups": _q_exact_substring,
    "host_freq_cms": _q_host_freq_cms,
    "postings_tf": _q_postings_tf,
    "search_projection": _q_search_projection,
    "embedding_near_dup_allpairs": _q_embedding_near_dup,
    "dedup_simhash_pairs": _q_simhash_pairs,
    "url_seen_cuckoo": _q_url_seen_cuckoo,
    "dedup_clusters": _q_dedup_clusters,
    "pii_redact": _q_pii_redact,
    "gopher_repetition": _q_gopher_repetition,
    "line_dedup": _q_line_dedup,
    "top_bigrams": _q_top_bigrams,
    "stratified_sample": _q_stratified_sample,
    "pagerank_synth": _q_pagerank_synth,
    "link_degree_stats": _q_link_degree_stats,
    "bm25_search": _q_bm25_search,
    "anchor_postings": _q_anchor_postings,
    "hits_synth": _q_hits_synth,
    "positional_postings": _q_positional_postings,
    "phrase_search": _q_phrase_search,
    "proximity_search": _q_proximity_search,
    "search_snippets": _q_search_snippets,
    "host_distinct_hll": _q_host_distinct_hll,
    "recrawl_schedule": _q_recrawl_schedule,
    "search_or": _q_search_or,
    "search_topk_pruned": _q_search_pruned,
    "search_title_boost": _q_search_title_boost,
    "fuzzy_term_expand": _q_fuzzy_term_expand,
    "fuzzy_search": _q_fuzzy_search,
    "substring_search": _q_substring_search,
    "postings_gap_stats": _q_postings_gap_stats,
    "frontier_priority_indegree": _q_frontier_priority_indegree,
    "decontaminate": _q_decontaminate,
    "pack_sequences": _q_pack_sequences,
    "politeness_crawl_delay": _q_politeness_crawl_delay,
    "knn_pq": _q_knn_pq,
    "epoch_mix": _q_epoch_mix,
    "error_backoff_checkout": _q_error_backoff_checkout,
    "search_query_language": _q_search_query,
    "dust_param_rules": _q_dust_param_rules,
    "dust_apply": _q_dust_apply,
    "mirror_hosts": _q_mirror_hosts,
    "autocomplete": _q_autocomplete,
    "adaptive_politeness": _q_adaptive_politeness,
    "shard_plan": _q_shard_plan,
    "discovery_unseen_mass": _q_discovery_unseen,
    "epoch_shuffle": _q_epoch_shuffle,
    "ring_assign": _q_ring_assign,
    "canonical_election": _q_canonical_election,
    "crawl_anomaly_iqr": _q_crawl_anomaly_iqr,
    "curriculum_order": _q_curriculum,
    "vocab_growth": _q_vocab_growth,
    "budget_allocation": _q_budget_allocation,
    "budgeted_checkout": _q_budgeted_checkout,
}

# shared CTE fragments for batch-2 oracles ----------------------------------

_SHINGLES3_SQL = """
    toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                    string_split(text, ' ') AS t
             FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(t)-2, 1)+1),
                         i -> array_to_string(t[i:i+2], ' '))) AS shingle
           FROM toks)
"""

_JACCARD_SQL = f"""
    WITH {_SHINGLES3_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    jac AS (
      SELECT doc_a, doc_b,
             ROUND(c / (sa.n + sb.n - c), 9) AS jaccard
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b)
"""

_MINHASH_SQL = f"""
    WITH {_SHINGLES3_SQL},
    seeds AS (SELECT range AS seed_id,
                     (1103515245*(range+1) + 12345) % 2147483647 + 1 AS a,
                     (range*7919 + 13) % 2147483647 AS b
              FROM range(16)),
    hashed AS (SELECT doc_id,
                      ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647 AS h
               FROM sh),
    sig AS (SELECT doc_id, CAST(seed_id AS BIGINT) AS seed_id,
                   MIN((a*h + b) % 2147483647) AS minhash
            FROM hashed CROSS JOIN seeds GROUP BY 1, 2)
"""

_QNORM_SQL = f"""
    WITH q AS ({{qvec}}),
    nv AS (SELECT vec_id, v,
                  sqrt(CAST(list_sum(list_transform(v, x -> x*x)) AS DOUBLE)) AS nrm
           FROM q)
"""

ORACLES_BATCH2 = {
    "dedup_exact": f"""
        WITH corpus AS ({_DUP_CORPUS_SQL}),
        h AS (SELECT doc_id, md5(text) AS text_hash FROM corpus)
        SELECT doc_id, text_hash,
               COUNT(*) OVER (PARTITION BY text_hash) AS group_size,
               CAST(CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY text_hash)
                         THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
        FROM h
    """,
    "dedup_ngram_jaccard": f"""
        {_JACCARD_SQL}
        SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.1
    """,
    "dedup_minhash_signatures": f"""
        {_MINHASH_SQL}
        SELECT doc_id, seed_id, minhash FROM sig
    """,
    "dedup_minhash_lsh": f"""
        {_MINHASH_SQL},
        bands AS (
          SELECT doc_id, seed_id // 4 AS band,
                 md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed_id)) AS band_key
          FROM sig GROUP BY doc_id, seed_id // 4),
        cands AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        jac AS (
          SELECT doc_a, doc_b, ROUND(c / (sa.n + sb.n - c), 9) AS jaccard
          FROM common
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b)
        SELECT j.doc_a, j.doc_b, j.jaccard
        FROM jac j JOIN cands USING (doc_a, doc_b)
        WHERE j.jaccard >= 0.1
    """,
    "dedup_simhash": """
        WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                             unnest(string_split(text, ' ')) AS tok
                      FROM documents),
        tc AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
        th AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h, cnt
               FROM tc),
        votes AS (
          SELECT doc_id, b.range AS bit,
                 SUM(((h >> CAST(b.range AS INT)) % 2 * 2 - 1) * cnt) AS v
          FROM th CROSS JOIN range(48) b GROUP BY 1, 2)
        SELECT doc_id,
               CAST(SUM(CASE WHEN v > 0
                             THEN (CAST(1 AS BIGINT) << CAST(bit AS INT))
                             ELSE 0 END) AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id
    """,
    "embedding_near_dup": _QNORM_SQL.format(qvec=_QVEC_SQL) + """
        , bucketed AS (
          SELECT vec_id, v, nrm,
                 list_sum(list_transform(range(0, 6), j ->
                   CASE WHEN list_sum(list_transform(range(1, len(v)+1),
                          i -> v[i] * ((i*(j+7)) % 3 - 1))) > 0
                        THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END)) AS bucket
          FROM nv)
        SELECT * FROM (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 CAST(list_sum(list_transform(range(1, len(a.v)+1),
                               i -> a.v[i]*b.v[i])) AS DOUBLE)
                   / (a.nrm * b.nrm) AS cosine
          FROM bucketed a JOIN bucketed b
            ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
        WHERE cosine >= 0.45
    """,
    "knn_bruteforce": _QNORM_SQL.format(qvec=_QVEC_SQL) + """
        , qs AS (SELECT * FROM nv WHERE vec_id < 5),
        scored AS (
          SELECT qs.vec_id AS query_id, nv.vec_id AS vec_id,
                 CAST(list_sum(list_transform(range(1, len(qs.v)+1),
                               i -> qs.v[i]*nv.v[i])) AS DOUBLE)
                   / (qs.nrm * nv.nrm) AS cosine
          FROM qs CROSS JOIN nv)
        SELECT query_id, vec_id, cosine,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rank
        FROM scored QUALIFY rank <= 10
    """,
    "knn_lsh_bucketed": _QNORM_SQL.format(qvec=_QVEC_SQL) + """
        , bucketed AS (
          SELECT vec_id, v, nrm,
                 list_sum(list_transform(range(0, 6), j ->
                   CASE WHEN list_sum(list_transform(range(1, len(v)+1),
                          i -> v[i] * ((i*(j+7)) % 3 - 1))) > 0
                        THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END)) AS bucket
          FROM nv),
        qs AS (SELECT * FROM bucketed WHERE vec_id < 5),
        scored AS (
          SELECT qs.vec_id AS query_id, e.vec_id AS vec_id,
                 CAST(list_sum(list_transform(range(1, len(qs.v)+1),
                               i -> qs.v[i]*e.v[i])) AS DOUBLE)
                   / (qs.nrm * e.nrm) AS cosine
          FROM qs JOIN bucketed e ON qs.bucket = e.bucket)
        SELECT query_id, vec_id, cosine,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rank
        FROM scored QUALIFY rank <= 10
    """,
    "lang_id": """
        WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          string_split(lower(text), ' ') AS toks
                   FROM documents),
        h AS (SELECT doc_id,
          CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS BIGINT) AS hits_de,
          CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS BIGINT) AS hits_en,
          CAST(len(list_filter(toks, x -> list_contains(['el','la','los','y','es','un'], x))) AS BIGINT) AS hits_es,
          CAST(len(list_filter(toks, x -> list_contains(['le','la','les','et','est','un'], x))) AS BIGINT) AS hits_fr,
          CAST(len(list_filter(toks, x -> list_contains(['de','shi','le','zai','he'], x))) AS BIGINT) AS hits_zh
          FROM t)
        SELECT doc_id,
               CASE WHEN hits_de = best THEN 'de'
                    WHEN hits_en = best THEN 'en'
                    WHEN hits_es = best THEN 'es'
                    WHEN hits_fr = best THEN 'fr'
                    ELSE 'zh' END AS predicted_lang,
               best AS best_hits
        FROM (SELECT *, greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) AS best
              FROM h)
    """,
    "quality_score": """
        WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
                          string_split(text, ' ') AS toks
                   FROM documents),
        feats AS (SELECT doc_id,
          CAST(length(text) AS BIGINT) AS n_chars,
          CAST(len(toks) AS BIGINT) AS n_tokens,
          CAST(len(toks) - len(list_distinct(toks)) AS BIGINT) AS n_repeats,
          CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS BIGINT) AS n_stop,
          CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS BIGINT) AS n_punct
          FROM t)
        SELECT doc_id, n_chars, n_tokens,
               n_chars / n_tokens AS mean_tok_len,
               n_punct / n_chars AS punct_ratio,
               n_stop / n_tokens AS stop_ratio,
               1.0 - n_repeats / n_tokens AS distinct_ratio,
               least(n_tokens, 200) / 200.0
                 * (1.0 - n_repeats / n_tokens)
                 * (0.5 + 0.5 * n_stop / n_tokens) AS quality
        FROM feats
    """,
    "token_counts": """
        WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
                          string_split(text, ' ') AS toks
                   FROM documents)
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS ws_tokens,
               CAST(len(list_distinct(toks)) AS BIGINT) AS distinct_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                    AS BIGINT) AS bpe_ish_tokens
        FROM t
    """,
    "doc_fingerprint": """
        WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          string_split(text, ' ') AS tk
                   FROM documents),
        sh AS (SELECT doc_id,
                      unnest(list_transform(range(1, greatest(len(tk)-4, 1)+1),
                             i -> array_to_string(tk[i:i+4], ' '))) AS s
               FROM t)
        SELECT doc_id,
               MIN(('0x' || substr(md5(s), 1, 15))::BIGINT) AS fingerprint
        FROM sh GROUP BY doc_id
    """,
    "media_inventory": """
        SELECT CAST(doc_id AS VARCHAR) AS media_id,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
    """,
    "media_frame_sample": """
        WITH m AS (SELECT CAST(doc_id AS VARCHAR) AS media_id,
                          CAST(doc_id % 3 AS INT) AS k,
                          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
                   FROM documents)
        SELECT media_id,
               CAST(unnest(generate_series(0,
                    greatest(CAST(floor(n_bytes/50.0) AS INT), 0), 3)) AS BIGINT)
                 AS frame_no
        FROM m WHERE k = 2
    """,
    "events_tumbling": """
        WITH ev AS (SELECT *, CAST(round(value*1000) AS BIGINT) AS value_m
                    FROM events)
        SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
               event_type, COUNT(*) AS n_events,
               CAST(SUM(value_m) AS BIGINT) AS sum_value_milli
        FROM ev GROUP BY 1, 2
    """,
    "events_sessionize": """
        WITH ev AS (SELECT user_id, ts,
                           CAST(round(value*1000) AS BIGINT) AS value_m
                    FROM events),
        marked AS (
          SELECT user_id, ts, value_m,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        sess AS (
          SELECT user_id, ts, value_m,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_no
          FROM marked)
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(session_no AS BIGINT) AS session_no,
               epoch_us(MIN(ts)) AS session_start_us,
               epoch_us(MAX(ts)) AS session_end_us,
               COUNT(*) AS n_events,
               CAST(SUM(value_m) AS BIGINT) AS sum_value_milli
        FROM sess GROUP BY 1, 2
    """,
    "tpch_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
                 AS sum_qty_c,
               CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
                 AS sum_price_c,
               CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100)
                             AS BIGINT)) AS BIGINT)
                 AS sum_disc_price_c,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_top_orders": """
        SELECT CAST(l_orderkey AS BIGINT) AS orderkey,
               CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100)
                             AS BIGINT)) AS BIGINT)
                 AS revenue_c
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey
        ORDER BY revenue_c DESC, orderkey ASC LIMIT 10
    """,
    "region_order_counts": """
        SELECT r_name, COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
}


ORACLES_BATCH3 = {
    "dataset_split": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents),
        m AS (SELECT doc_id,
                     ((doc_id + 1) * 2654435761 + 40503) % 2147483647 AS mixed
              FROM d)
        SELECT doc_id, mixed % 100 AS bucket,
               CASE WHEN mixed % 100 < 90 THEN 'train'
                    WHEN mixed % 100 < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM m
    """,
    "span_tokens": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          string_split(text, ' ') AS w
                   FROM documents),
        halves AS (
          SELECT doc_id,
                 array_to_string(w[1:len(w)//2], ' ') AS first_half,
                 array_to_string(w[len(w)//2+1:len(w)], ' ') AS second_half
          FROM d)
        SELECT doc_id,
               CAST(2 AS BIGINT) AS n_text_spans,
               CAST(1 AS BIGINT) AS n_media_spans,
               CAST(len(string_split(first_half || ' ' || second_half, ' '))
                    AS BIGINT) AS ws_tokens,
               CAST(length(first_half || ' ' || second_half) AS BIGINT) AS n_chars
        FROM halves
    """,
    "parse_spans": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text
                   FROM documents WHERE doc_id < 300)
        SELECT doc_id, CAST(0 AS BIGINT) AS offset, 'title' AS kind,
               'doc ' || doc_id AS text, NULL AS media_ref FROM d
        UNION ALL
        SELECT doc_id, 1, 'text', 'doc ' || doc_id, NULL FROM d
        UNION ALL
        SELECT doc_id, 2, 'text', text || ' ', NULL FROM d
        UNION ALL
        SELECT doc_id, 3, 'text', 'anchor', NULL FROM d
        UNION ALL
        SELECT doc_id, 4, 'link', NULL, 'http://x.test/' || doc_id FROM d
    """,
    "events_pivot": """
        SELECT epoch_us(date_trunc('day', ts)) AS day_us,
               COUNT(*) FILTER (event_type = 'click') AS n_click,
               COUNT(*) FILTER (event_type = 'error') AS n_error,
               COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
               COUNT(*) FILTER (event_type = 'signup') AS n_signup,
               COUNT(*) FILTER (event_type = 'view') AS n_view
        FROM events GROUP BY 1
    """,
    "events_cube": """
        SELECT event_type, CAST(user_id % 4 AS BIGINT) AS user_bucket,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(round(value*1000) AS BIGINT)) AS BIGINT)
                 AS sum_value_milli
        FROM events GROUP BY CUBE(event_type, user_id % 4)
    """,
    "events_median": """
        WITH ev AS (SELECT event_type,
                           CAST(round(value*1000) AS BIGINT) AS v
                    FROM events)
        SELECT event_type,
               quantile_cont(v, 0.5) AS median_milli,
               quantile_cont(v, 0.25) AS p25_milli,
               quantile_cont(v, 0.75) AS p75_milli
        FROM ev GROUP BY event_type
    """,
    "postings_idf": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT word, COUNT(DISTINCT doc_id) AS df,
               ROUND(ln((SELECT n_docs FROM n) / (1.0 + COUNT(DISTINCT doc_id))), 6)
                 AS idf
        FROM postings GROUP BY word
    """,
    "robots_gate": f"""
        WITH frontier AS ({_FRONTIER_SQL})
        SELECT url,
               CASE WHEN state = 'unvisited'
                         AND CAST(regexp_extract(host, 'host(\\d+)\\.test', 1)
                                  AS BIGINT) % 5 = 0
                    THEN 'robots_blocked' ELSE state END AS state,
               CASE WHEN state = 'unvisited'
                         AND CAST(regexp_extract(host, 'host(\\d+)\\.test', 1)
                                  AS BIGINT) % 5 = 0
                    THEN 'robots_disallow' ELSE NULL END AS detail
        FROM frontier
    """,
    "tfidf_search_multiset": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        q AS (SELECT * FROM (VALUES ('table', 2), ('join', 1)) t(word, qcount)),
        dfs AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM postings GROUP BY word),
        matched AS (
          SELECT p.doc_id, p.term_count, p.doc_len, q.qcount, dfs.df
          FROM postings p JOIN q USING (word) JOIN dfs USING (word)),
        scored AS (
          SELECT doc_id, COUNT(*) AS n_words,
                 SUM(qcount * (term_count / doc_len)
                     * ln((SELECT n_docs FROM n) / (1.0 + df))) AS score
          FROM matched GROUP BY doc_id)
        SELECT doc_id, ROUND(score, 6) AS score
        FROM scored WHERE n_words = 2
        ORDER BY score DESC, doc_id ASC LIMIT 100
    """,
    "asof_join_events": """
        WITH ev AS (SELECT CAST(user_id AS BIGINT) AS user_id, ts,
                           CAST(event_id AS BIGINT) AS event_id
                    FROM events),
        markers AS (
          SELECT CAST(user_id AS BIGINT) AS user_id, ts,
                 MAX(CAST(event_id AS BIGINT)) AS marker_id
          FROM events WHERE event_id % 5 = 0 GROUP BY 1, 2)
        SELECT e.user_id, epoch_us(e.ts) AS ts_us, e.event_id,
               m.marker_id AS asof_marker_id, epoch_us(m.ts) AS asof_ts_us
        FROM ev e ASOF LEFT JOIN markers m
          ON e.user_id = m.user_id AND e.ts >= m.ts
    """,
    "events_hopping": """
        WITH ev AS (SELECT ts, event_type,
                           CAST(round(value*1000) AS BIGINT) AS value_m
                    FROM events),
        hopped AS (
          SELECT (epoch_us(ts) // 900000000) * 900000000 - k.k * 900000000
                   AS window_start_us,
                 event_type, value_m
          FROM ev CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k)
        SELECT window_start_us, event_type, COUNT(*) AS n_events,
               CAST(SUM(value_m) AS BIGINT) AS sum_value_milli
        FROM hopped GROUP BY 1, 2
    """,
    "running_user_totals": """
        SELECT CAST(user_id AS BIGINT) AS user_id,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(round(value*1000) AS BIGINT)) AS BIGINT)
                 AS sum_value_milli,
               MAX(epoch_us(ts)) AS last_ts_us
        FROM events GROUP BY 1
    """,
    "rollup_revenue": """
        SELECT r_name, n_name, COUNT(*) AS n_orders,
               CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
                 AS revenue_c
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
    """,
    "top_parts_per_supplier": """
        WITH per_part AS (
          SELECT CAST(l_suppkey AS BIGINT) AS suppkey,
                 CAST(l_partkey AS BIGINT) AS partkey,
                 CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100)
                               AS BIGINT)) AS BIGINT)
                   AS revenue_c
          FROM lineitem GROUP BY 1, 2)
        SELECT suppkey, partkey, revenue_c,
               CAST(row_number() OVER (PARTITION BY suppkey
                    ORDER BY revenue_c DESC, partkey ASC) AS BIGINT) AS part_rank
        FROM per_part QUALIFY part_rank <= 3
    """,
    "nations_except": """
        SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        EXCEPT
        SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    "nations_intersect": """
        SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        INTERSECT
        SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    "knn_ivf": _QNORM_SQL.format(qvec=_QVEC_SQL) + """
        -- one deterministic Lloyd iteration (ivf_train_centroids):
        -- init = first-8 vectors; assign; centroid = exact-rational mean
        -- (integer SUM / COUNT over the milli-quantized vectors)
        , cent0 AS (SELECT vec_id AS centroid_id,
                           list_transform(v, x -> CAST(x AS DOUBLE)) AS cv
                    FROM nv WHERE vec_id < 8),
        cn0 AS (SELECT centroid_id, cv,
                       sqrt(list_sum(list_transform(cv, x -> x*x))) AS cnrm
                FROM cent0),
        a0 AS (
          SELECT nv.vec_id, nv.v, nv.nrm, c.centroid_id,
                 CAST(list_sum(list_transform(range(1, len(nv.v)+1),
                               i -> nv.v[i]*c.cv[i])) AS DOUBLE)
                   / (nv.nrm * c.cnrm) AS cc
          FROM nv CROSS JOIN cn0 c),
        m0 AS (
          SELECT vec_id, v, centroid_id,
                 row_number() OVER (PARTITION BY vec_id
                      ORDER BY cc DESC, centroid_id ASC) AS cr
          FROM a0 QUALIFY cr = 1),
        sums AS (
          SELECT centroid_id, pos, SUM(x) AS s, COUNT(*) AS n
          FROM (SELECT centroid_id, unnest(v) AS x,
                       generate_subscripts(v, 1) AS pos
                FROM m0)
          GROUP BY 1, 2),
        cent1 AS (
          SELECT c0.centroid_id, COALESCE(nc.cv, c0.cv) AS cv
          FROM cent0 c0 LEFT JOIN
               (SELECT centroid_id,
                       list(CAST(s AS DOUBLE) / n ORDER BY pos) AS cv
                FROM sums GROUP BY centroid_id) nc USING (centroid_id)),
        cn1 AS (SELECT centroid_id, cv,
                       sqrt(list_sum(list_transform(cv, x -> x*x))) AS cnrm
                FROM cent1),
        assign AS (
          SELECT nv.vec_id, nv.v, nv.nrm, c.centroid_id,
                 CAST(list_sum(list_transform(range(1, len(nv.v)+1),
                               i -> nv.v[i]*c.cv[i])) AS DOUBLE)
                   / (nv.nrm * c.cnrm) AS cc
          FROM nv CROSS JOIN cn1 c),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                    ORDER BY cc DESC, centroid_id ASC) AS cr
          FROM assign),
        lists AS (SELECT vec_id, v, nrm, centroid_id FROM ranked WHERE cr = 1),
        probes AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, centroid_id
                   FROM ranked WHERE vec_id < 5 AND cr <= 2),
        scored AS (
          SELECT p.query_id, l.vec_id,
                 CAST(list_sum(list_transform(range(1, len(p.qv)+1),
                               i -> p.qv[i]*l.v[i])) AS DOUBLE)
                   / (p.qnrm * l.nrm) AS cosine
          FROM probes p JOIN lists l USING (centroid_id))
        SELECT query_id, vec_id, cosine,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rank
        FROM scored QUALIFY rank <= 10
    """,
    "media_features": """
        WITH m AS (SELECT CAST(doc_id AS VARCHAR) AS media_id,
                          CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                               WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                          string_split(text, '') AS chars,
                          CAST(length(text) AS BIGINT) AS n_bytes
                   FROM documents)
        SELECT media_id, kind, n_bytes,
               CAST(list_sum(list_transform(chars, c -> ascii(c))) AS DOUBLE)
                 / n_bytes AS byte_mean,
               list_aggregate(
                 list_transform(range(0, 16),
                   b -> CAST(len(list_filter(chars, c -> ascii(c) % 16 = b))
                             AS VARCHAR)),
                 'string_agg', ',') AS byte_histogram_csv
        FROM m
    """,
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
    "point_lookup": f"""
        WITH postings AS ({_POSTINGS_SQL})
        SELECT doc_id, word, term_count FROM postings WHERE doc_id IN (1, 2, 3)
    """,
}


ORACLES_EXTRA: dict = {
    # dedup_clusters: MinHash-LSH verified pairs (same math as the gated
    # dedup_minhash_lsh oracle, over the dup-injected corpus) -> connected
    # components via a recursive CTE propagating the min reachable node
    # over the symmetrized edge list -> one canonical doc per cluster.
    "dedup_clusters": f"""
        WITH RECURSIVE corpus AS ({_DUP_CORPUS_SQL}),
        toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
        sh AS (SELECT DISTINCT doc_id,
                      unnest(list_transform(range(1, greatest(len(t)-2, 1)+1),
                             i -> array_to_string(t[i:i+2], ' '))) AS shingle
               FROM toks),
        seeds AS (SELECT range AS seed_id,
                         (1103515245*(range+1) + 12345) % 2147483647 + 1 AS a,
                         (range*7919 + 13) % 2147483647 AS b
                  FROM range(16)),
        hashed AS (SELECT doc_id,
                          ('0x' || substr(md5(shingle), 1, 15))::BIGINT
                            % 2147483647 AS h
                   FROM sh),
        sig AS (SELECT doc_id, CAST(seed_id AS BIGINT) AS seed_id,
                       MIN((a*h + b) % 2147483647) AS minhash
                FROM hashed CROSS JOIN seeds GROUP BY 1, 2),
        bands AS (
          SELECT doc_id, seed_id // 4 AS band,
                 md5(string_agg(CAST(minhash AS VARCHAR), ','
                     ORDER BY seed_id)) AS band_key
          FROM sig GROUP BY doc_id, seed_id // 4),
        cands AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        verified AS (
          SELECT m.doc_a, m.doc_b
          FROM common m
          JOIN cands USING (doc_a, doc_b)
          JOIN sizes sa ON sa.doc_id = m.doc_a
          JOIN sizes sb ON sb.doc_id = m.doc_b
          WHERE m.c / (sa.n + sb.n - m.c) >= 0.5),
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM verified
                  UNION SELECT doc_b, doc_a FROM verified),
        reach AS (SELECT src AS node, src AS root FROM edges
                  UNION
                  SELECT e.dst, r.root
                  FROM reach r JOIN edges e ON e.src = r.node),
        comp AS (SELECT node AS doc_id, MIN(root) AS cluster_id
                 FROM reach GROUP BY node),
        lab AS (SELECT c.doc_id, COALESCE(p.cluster_id, c.doc_id) AS cluster_id
                FROM corpus c LEFT JOIN comp p USING (doc_id))
        SELECT doc_id, cluster_id,
               COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
               CAST(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END
                    AS BIGINT) AS is_canonical
        FROM lab
    """,
    "url_seen_cuckoo": f"""
        WITH frontier AS ({_FRONTIER_SQL}),
        cand AS (
          SELECT DISTINCT 'http://host' || (l_suppkey % 97) || '.test/order/'
                 || (l_orderkey * 4 + l_linenumber) AS url
          FROM lineitem)
        SELECT url FROM cand
        WHERE NOT EXISTS (SELECT 1 FROM frontier f WHERE f.url = cand.url)
    """,
    "dedup_simhash_pairs": f"""
        WITH corpus AS ({_DUP_CORPUS_SQL}),
        toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM corpus),
        tc AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
        th AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h, cnt
               FROM tc),
        votes AS (
          SELECT doc_id, b.range AS bit,
                 SUM(((h >> CAST(b.range AS INT)) % 2 * 2 - 1) * cnt) AS v
          FROM th CROSS JOIN range(48) b GROUP BY 1, 2),
        fp AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN v > 0
                               THEN (CAST(1 AS BIGINT) << CAST(bit AS INT))
                               ELSE 0 END) AS BIGINT) AS simhash
          FROM votes GROUP BY doc_id),
        banded AS (
          SELECT doc_id, simhash, b.range AS band,
                 (simhash >> CAST(b.range * 12 AS INT)) & 4095 AS band_key
          FROM fp CROSS JOIN range(4) b),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.simhash AS sa, b.simhash AS sb
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    """,
    "embedding_near_dup_allpairs": _QNORM_SQL.format(qvec=_QVEC_SQL) + """
        SELECT * FROM (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 CAST(list_sum(list_transform(range(1, len(a.v)+1),
                               i -> a.v[i]*b.v[i])) AS DOUBLE)
                   / (a.nrm * b.nrm) AS cosine
          FROM nv a JOIN nv b ON a.vec_id < b.vec_id)
        WHERE cosine >= 0.45
    """,
    "postings_tf": f"""
        WITH postings AS ({_POSTINGS_SQL})
        SELECT doc_id, word, term_count / doc_len AS tf FROM postings
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
    # NOTE: plain strings below (no f-interpolation) — the regex {m,n}
    # quantifiers would collide with format braces.
    "pii_redact": r"""
        WITH aug AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 CASE WHEN doc_id % 3 = 0
                      THEN text || ' reach user' || CAST(doc_id AS VARCHAR)
                           || '@mail.example.com or admin@test.org'
                      WHEN doc_id % 3 = 1
                      THEN text || ' server 10.' || CAST(doc_id % 200 AS VARCHAR)
                           || '.3.' || CAST(doc_id % 250 AS VARCHAR) || ' up'
                      ELSE text END AS text
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                    AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(text,
                    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))
                    AS BIGINT) AS n_ipv4,
               md5(regexp_replace(
                     regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                     '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}',
                     '<IP>', 'g')) AS redacted_md5
        FROM aug
    """,
    "gopher_repetition": """
        WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                             string_split(text, ' ') AS t FROM documents),
        base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
            list_transform(range(0, CAST(ceil(len(t)/8.0) AS BIGINT)),
                i -> array_to_string(
                       t[CAST(i*8+1 AS BIGINT):CAST(i*8+8 AS BIGINT)], ' '))
              AS lines,
            CASE WHEN len(t) >= 2
                 THEN list_transform(range(1, CAST(len(t) AS BIGINT)),
                                     i -> t[i] || ' ' || t[i+1])
                 ELSE [] END AS bigrams
          FROM toks),
        ls AS (SELECT doc_id, n_tokens, CAST(len(lines) AS BIGINT) AS n_lines,
                      CAST(len(list_distinct(lines)) AS BIGINT) AS n_distinct
               FROM base),
        bg AS (SELECT doc_id, unnest(bigrams) AS bigram FROM base),
        bc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        top AS (SELECT doc_id, MAX(c) AS top_cnt FROM bc GROUP BY doc_id)
        SELECT doc_id, n_tokens, n_lines, dup_line_frac, top_bigram_frac,
               CAST(CASE WHEN dup_line_frac > CAST(0.30 AS DOUBLE)
                           OR top_bigram_frac > CAST(0.20 AS DOUBLE)
                    THEN 1 ELSE 0 END AS BIGINT) AS flagged
        FROM (SELECT l.doc_id, l.n_tokens, l.n_lines,
                     1.0 - l.n_distinct / l.n_lines AS dup_line_frac,
                     COALESCE(2*t.top_cnt / l.n_tokens, CAST(0 AS DOUBLE))
                       AS top_bigram_frac
              FROM ls l LEFT JOIN top t USING (doc_id))
    """,
    "line_dedup": """
        WITH corpus AS (""" + _DUP_CORPUS_SQL + """),
        toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
        base AS (SELECT doc_id,
            list_transform(range(0, CAST(ceil(len(t)/8.0) AS BIGINT)),
                i -> array_to_string(
                       t[CAST(i*8+1 AS BIGINT):CAST(i*8+8 AS BIGINT)], ' '))
              AS lines
          FROM toks),
        ex AS (SELECT doc_id, generate_subscripts(lines, 1) AS pos,
                      unnest(lines) AS line FROM base),
        freq AS (SELECT ('0x' || substr(md5(line), 1, 15))::BIGINT AS line_h,
                        COUNT(DISTINCT doc_id) AS nd
                 FROM ex GROUP BY 1),
        kept AS (SELECT e.doc_id, e.pos, e.line FROM ex e
                 JOIN freq f
                   ON f.line_h = ('0x' || substr(md5(e.line), 1, 15))::BIGINT
                 WHERE f.nd <= 1),
        agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_lines,
                       md5(string_agg(line, ' ' ORDER BY pos)) AS kept_md5
                FROM kept GROUP BY doc_id)
        SELECT b.doc_id, CAST(len(b.lines) AS BIGINT) AS n_lines,
               CAST(COALESCE(a.kept_lines, 0) AS BIGINT) AS kept_lines,
               COALESCE(a.kept_md5, md5('')) AS kept_md5
        FROM base b LEFT JOIN agg a USING (doc_id)
    """,
    "top_bigrams": """
        WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        bg AS (SELECT unnest(
                 CASE WHEN len(t) >= 2
                      THEN list_transform(range(1, CAST(len(t) AS BIGINT)),
                                          i -> t[i] || ' ' || t[i+1])
                      ELSE [] END) AS bigram FROM toks)
        SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt FROM bg
        GROUP BY bigram ORDER BY cnt DESC, bigram ASC LIMIT 20
    """,
    "stratified_sample": """
        WITH b AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
                 ('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)),
                                 1, 15))::BIGINT % 1000 AS bucket
          FROM documents)
        SELECT doc_id, lang, CAST(bucket AS BIGINT) AS bucket FROM b
        WHERE bucket < CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 250
                                 WHEN 'es' THEN 250 WHEN 'fr' THEN 250
                                 WHEN 'zh' THEN 125 ELSE 100 END
    """,
}

# Link-graph oracles: the synthetic expander (strides pinned to
# see_spark.operators.linkgraph.SYNTH_STRIDES) shared by pagerank_synth and
# link_degree_stats.
from see_spark.operators.linkgraph import SYNTH_STRIDES as _STRIDES  # noqa: E402

_LINKGRAPH_SQL = (
    "nn AS (SELECT COUNT(*) AS n FROM documents),\n"
    "    nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),\n"
    "    edges AS (\n"
    "      SELECT DISTINCT src, dst FROM (\n"
    + "\n        UNION ALL\n".join(
        f"        SELECT node AS src, (node*{m} + {c}) % (SELECT n FROM nn) AS dst FROM nodes"
        for m, c in _STRIDES
    )
    + "\n      ) WHERE dst <> src),\n"
    "    outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)"
)


def _pagerank_oracle_sql(n_iter: int = 5, d: float = 0.85) -> str:
    """Unrolled power method, term-for-term the expression pagerank()
    evaluates (same IEEE op order), final ranks rounded to 9dp."""
    ctes = [
        _LINKGRAPH_SQL,
        "r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        p = f"r{i-1}"
        ctes.append(
            f"d{i} AS (SELECT COALESCE(SUM(r.rank), 0.0) AS dang FROM {p} r"
            f" LEFT JOIN outdeg o ON o.src = r.node WHERE o.src IS NULL)"
        )
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node, SUM(r.rank / o.deg) AS contrib"
            f" FROM edges e JOIN {p} r ON e.src = r.node"
            f" JOIN outdeg o ON o.src = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i} AS (SELECT b.node,"
            f" (1.0 - {d})/(SELECT n FROM nn)"
            f" + {d} * (COALESCE(c.contrib, 0.0)"
            f" + (SELECT dang FROM d{i})/(SELECT n FROM nn)) AS rank"
            f" FROM nodes b LEFT JOIN c{i} c ON c.node = b.node)"
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, ROUND(rank, 9) AS rank FROM r{n_iter}"
    )


def _hits_oracle_sql(n_iter: int = 3) -> str:
    """Unrolled HITS, term-for-term the hits() evaluation (L1 normalizers
    as scalar subqueries over the RAW per-direction sums)."""
    ctes = [
        _LINKGRAPH_SQL,
        "h0 AS (SELECT node, 1.0 AS hub FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"ar{i} AS (SELECT e.dst AS node, SUM(h.hub) AS authority"
            f" FROM edges e JOIN h{i-1} h ON e.src = h.node GROUP BY e.dst)"
        )
        ctes.append(
            f"at{i} AS (SELECT COALESCE(SUM(authority), 1.0) AS tot FROM ar{i})"
        )
        ctes.append(
            f"a{i} AS (SELECT n.node,"
            f" COALESCE(ar.authority, 0.0) / (SELECT tot FROM at{i}) AS authority"
            f" FROM nodes n LEFT JOIN ar{i} ar ON ar.node = n.node)"
        )
        ctes.append(
            f"hr{i} AS (SELECT e.src AS node, SUM(a.authority) AS hub"
            f" FROM edges e JOIN a{i} a ON e.dst = a.node GROUP BY e.src)"
        )
        ctes.append(f"ht{i} AS (SELECT COALESCE(SUM(hub), 1.0) AS tot FROM hr{i})")
        ctes.append(
            f"h{i} AS (SELECT n.node,"
            f" COALESCE(hr.hub, 0.0) / (SELECT tot FROM ht{i}) AS hub"
            f" FROM nodes n LEFT JOIN hr{i} hr ON hr.node = n.node)"
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT h.node, ROUND(h.hub, 9) AS hub,"
        f" ROUND(a.authority, 9) AS authority"
        f" FROM h{n_iter} h JOIN a{n_iter} a USING (node)"
    )


ORACLES_EXTRA.update(
    {
        "pagerank_synth": _pagerank_oracle_sql(),
        "hits_synth": _hits_oracle_sql(),
        "link_degree_stats": f"""
        WITH {_LINKGRAPH_SQL},
        o AS (SELECT src AS node, COUNT(*) AS out_deg FROM edges GROUP BY src),
        i AS (SELECT dst AS node, COUNT(*) AS in_deg FROM edges GROUP BY dst)
        SELECT COALESCE(o.node, i.node) AS node,
               CAST(COALESCE(o.out_deg, 0) AS BIGINT) AS out_deg,
               CAST(COALESCE(i.in_deg, 0) AS BIGINT) AS in_deg
        FROM o FULL OUTER JOIN i ON o.node = i.node
    """,
        # BM25 mirrors the Spark expression term-for-term; avgdl and N are
        # corpus scalars; score rounded to 6dp (ln is the non-exact op).
        "bm25_search": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        a AS (SELECT AVG(doc_len) AS avgdl
              FROM (SELECT DISTINCT doc_id, doc_len FROM postings)),
        q AS (SELECT unnest(['table', 'join', 'query']) AS word),
        dfs AS (SELECT word, COUNT(DISTINCT doc_id) AS df
                FROM postings JOIN q USING (word) GROUP BY word),
        matched AS (
          SELECT p.doc_id, p.term_count, p.doc_len, dfs.df
          FROM postings p JOIN q USING (word) JOIN dfs USING (word)),
        scored AS (
          SELECT doc_id, COUNT(*) AS n_words,
                 SUM(ln(1.0 + ((SELECT n_docs FROM n) - df + 0.5) / (df + 0.5))
                     * (term_count * 2.2)
                     / (term_count + 1.2 * ((1.0 - 0.75)
                        + 0.75 * doc_len / (SELECT avgdl FROM a)))) AS score
          FROM matched GROUP BY doc_id),
        top AS (
          SELECT doc_id, score FROM scored WHERE n_words = 3
          ORDER BY score DESC, doc_id ASC LIMIT 100)
        SELECT t.doc_id, d.source AS title, ROUND(t.score, 6) AS score
        FROM top t JOIN documents d ON d.doc_id = t.doc_id
    """,
        # anchor postings over deterministic single-link HTML: anchor text
        # = 40-char sanitized prefix, href absolute -> pass-through.
        "anchor_postings": f"""
        WITH anchors AS (
          SELECT 'http://d' || CAST(doc_id AS VARCHAR) || '.test/' AS src_url,
                 'http://t' || CAST(doc_id % 7 AS VARCHAR) || '.test/x' AS dst_url,
                 substr(regexp_replace(text, '[<>&]', ' ', 'g'), 1, 40) AS anchor
          FROM documents),
        toks AS (
          SELECT src_url, dst_url, lower(tok) AS word
          FROM (SELECT src_url, dst_url,
                       unnest(regexp_split_to_array(
                         regexp_replace(anchor, '{_SEP_SQL}', ' ', 'g'),
                         '[ \t\n\r]')) AS tok
                FROM anchors)
          WHERE strlen(tok) >= 2)
        SELECT word, dst_url, src_url, COUNT(*) AS term_count
        FROM toks GROUP BY 1, 2, 3
    """,
    }
)

# Positional-index oracles: positions reproduced via list_transform with an
# index lambda + row_number over kept tokens — same separator class, same
# byte-length guard, same post-filter numbering as posexplode(tokenize_expr).
_POS_TOKENS_SQL = f"""
    SELECT doc_id, lower(tok) AS word,
           row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS pos
    FROM (
      SELECT doc_id, unnest(z, recursive := true)
      FROM (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               list_transform(
                 regexp_split_to_array(
                   regexp_replace(text, '{_SEP_SQL}', ' ', 'g'), '[ \t\n\r]'),
                 (x, i) -> struct_pack(tok := x, ord := i)) AS z
        FROM documents))
    WHERE strlen(tok) >= 2
"""

# kept-token arrays (for snippet slicing): filter on raw byte length, then
# lowercase — the same order as tokenize_expr.
_TOKARR_SQL = f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           list_transform(
             list_filter(
               regexp_split_to_array(
                 regexp_replace(text, '{_SEP_SQL}', ' ', 'g'), '[ \t\n\r]'),
               x -> strlen(x) >= 2),
             x -> lower(x)) AS toks
    FROM documents
"""

_PHRASE_OCC_SQL = """
    a AS (SELECT doc_id, pos FROM pos WHERE word = 'table'),
    b AS (SELECT doc_id, pos - 1 AS pos FROM pos WHERE word = 'hash'),
    occ AS (SELECT a.doc_id, a.pos FROM a JOIN b USING (doc_id, pos))
"""

ORACLES_EXTRA.update(
    {
        "positional_postings": f"""
        SELECT doc_id, word, pos FROM ({_POS_TOKENS_SQL})
    """,
        "phrase_search": f"""
        WITH pos AS ({_POS_TOKENS_SQL}),
        {_PHRASE_OCC_SQL}
        SELECT doc_id, COUNT(*) AS n_occurrences, MIN(pos) AS first_pos
        FROM occ GROUP BY doc_id
    """,
        "proximity_search": f"""
        WITH pos AS ({_POS_TOKENS_SQL}),
        a AS (SELECT doc_id, pos AS pa FROM pos WHERE word = 'customer'),
        b AS (SELECT doc_id, pos AS pb FROM pos WHERE word = 'join'),
        pairs AS (
          SELECT a.doc_id, abs(pa - pb) AS dist
          FROM a JOIN b USING (doc_id) WHERE abs(pa - pb) <= 3)
        SELECT doc_id, COUNT(*) AS n_pairs, MIN(dist) AS min_dist
        FROM pairs GROUP BY doc_id
    """,
        "search_snippets": f"""
        WITH pos AS ({_POS_TOKENS_SQL}),
        {_PHRASE_OCC_SQL},
        hits AS (SELECT doc_id, MIN(pos) AS first_pos FROM occ GROUP BY doc_id),
        tokarr AS ({_TOKARR_SQL})
        SELECT h.doc_id, h.first_pos,
               array_to_string(
                 t.toks[greatest(1, h.first_pos + 1 - 3)
                        : h.first_pos + 2 + 3], ' ') AS snippet
        FROM hits h JOIN tokarr t USING (doc_id)
    """,
        # HLL mirrored step-for-step: 12 md5 bits -> bucket, leading-zero
        # CASE arithmetic on the next 60 bits -> integer rank (no floating
        # log2 anywhere), groupBy max -> registers, harmonic sum with 2^0
        # per empty bucket, linear-counting correction, alpha expression
        # written in the same evaluation order as the Python-side literal.
        "host_distinct_hll": f"""
        WITH frontier AS ({_FRONTIER_SQL}),
        r AS (
          SELECT host, url,
                 ('0x' || substr(md5(url), 1, 3))::BIGINT % 1024 AS bucket,
                 ltrim(substr(md5(url), 4, 15), '0') AS stripped
          FROM frontier),
        ranks AS (
          SELECT host, bucket,
                 CASE WHEN strlen(stripped) = 0 THEN 61
                      ELSE (15 - strlen(stripped)) * 4 +
                           CASE WHEN ('0x' || substr(stripped,1,1))::INT >= 8 THEN 0
                                WHEN ('0x' || substr(stripped,1,1))::INT >= 4 THEN 1
                                WHEN ('0x' || substr(stripped,1,1))::INT >= 2 THEN 2
                                ELSE 3 END + 1
                 END AS rank
          FROM r),
        sk AS (SELECT host, bucket, MAX(rank) AS register
               FROM ranks GROUP BY 1, 2),
        agg AS (SELECT host, COUNT(*) AS nb,
                       SUM(pow(2.0, -register)) AS obs
                FROM sk GROUP BY host),
        est AS (
          SELECT host,
                 CASE WHEN raw <= 2.5 * 1024 AND (1024 - nb) > 0
                      THEN 1024.0 * ln(1024.0 / (1024 - nb))
                      ELSE raw END AS e
          FROM (SELECT host, nb,
                       ((0.7213 / (1 + 1.079 / 1024)) * 1024) * 1024
                         / (obs + (1024 - nb)) AS raw
                FROM agg)),
        exact AS (SELECT host, COUNT(DISTINCT url) AS n_exact
                  FROM frontier GROUP BY host)
        SELECT host, n_exact, ROUND(e, 4) AS hll_estimate
        FROM exact JOIN est USING (host)
    """,
        # recrawl backoff mirrored integer-for-integer: same synthetic
        # history (per-user fetch sequence, click-stepped content hash),
        # same lag-based change flags, same trailing-streak derivation,
        # same clamped shiftleft interval. now_round = 70.
        "recrawl_schedule": """
        WITH hist AS (
          SELECT 'http://h' || CAST(user_id % 37 AS VARCHAR)
                   || '.test/p' || CAST(user_id AS VARCHAR) AS url,
                 CAST(row_number() OVER
                   (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS round,
                 md5(CAST(user_id AS VARCHAR) || ':' ||
                     CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                          OVER (PARTITION BY user_id ORDER BY event_id)
                          AS VARCHAR)) AS content_hash
          FROM events),
        marked AS (
          SELECT url, round,
                 CASE WHEN lag(content_hash) OVER w IS NULL
                        OR content_hash <> lag(content_hash) OVER w
                      THEN 1 ELSE 0 END AS changed,
                 row_number() OVER w AS rn
          FROM hist
          WINDOW w AS (PARTITION BY url ORDER BY round)),
        agg AS (
          SELECT url, MAX(round) AS last_round,
                 COUNT(*) AS n_fetches,
                 CAST(SUM(changed) AS BIGINT) AS n_changes,
                 CAST(MAX(rn) - MAX(CASE WHEN changed = 1 THEN rn END)
                      AS BIGINT) AS unchanged_streak
          FROM marked GROUP BY url),
        plan AS (
          SELECT url, last_round, n_fetches, n_changes, unchanged_streak,
                 -- BIGINT shift base: a bare 1 is INT32 in DuckDB and
                 -- 1 << 31 overflows (hit at sf0.1 streaks); the engine
                 -- shifts a BIGINT (recrawl.py), so mirror that exactly
                 CAST(least(16, CAST(1 AS BIGINT)
                        << CAST(least(unchanged_streak, 32) AS INT))
                      AS BIGINT) AS interval
          FROM agg)
        SELECT url, last_round, n_fetches, n_changes, unchanged_streak,
               interval,
               CAST(last_round + interval AS BIGINT) AS next_due_round,
               (last_round + interval) <= 70 AS due
        FROM plan
    """,
    }
)


# Batch-4 oracles: lexicon (fuzzy / trigram substring), fielded + OR
# ranking, index gap stats, priority checkout.
ORACLES_EXTRA.update(
    {
        "search_or": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        q AS (SELECT unnest(['table','join','query']) AS word),
        dfs AS (SELECT word, COUNT(DISTINCT doc_id) AS df
                FROM postings JOIN q USING (word) GROUP BY word),
        matched AS (
          SELECT p.doc_id, p.term_count, p.doc_len, dfs.df
          FROM postings p JOIN q USING (word) JOIN dfs USING (word)),
        scored AS (
          SELECT doc_id,
                 SUM((term_count / doc_len)
                     * ln((SELECT n_docs FROM n) / (1.0 + df))) AS score
          FROM matched GROUP BY doc_id),
        top AS (SELECT doc_id, score FROM scored
                ORDER BY score DESC, doc_id ASC LIMIT 100)
        SELECT t.doc_id, d.source AS title, ROUND(t.score, 6) AS score
        FROM top t JOIN documents d USING (doc_id)
    """,
        # the pruned query's oracle is the FLAT exact top-10: equality
        # proves the impact-prefix certificate produced the exact answer
        "search_topk_pruned": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        q AS (SELECT unnest(['table','join','query']) AS word),
        dfs AS (SELECT word, COUNT(DISTINCT doc_id) AS df
                FROM postings JOIN q USING (word) GROUP BY word),
        matched AS (
          SELECT p.doc_id, p.term_count, p.doc_len, dfs.df
          FROM postings p JOIN q USING (word) JOIN dfs USING (word)),
        scored AS (
          SELECT doc_id,
                 SUM((term_count / doc_len)
                     * ln((SELECT n_docs FROM n) / (1.0 + df))) AS score
          FROM matched GROUP BY doc_id),
        top AS (SELECT doc_id, score FROM scored
                ORDER BY score DESC, doc_id ASC LIMIT 10)
        SELECT t.doc_id, d.source AS title, ROUND(t.score, 6) AS score
        FROM top t JOIN documents d USING (doc_id)
    """,
        # title field = tokenized substr(text, 1, 60), weight 2.0; idf from
        # the body field only (left join + coalesce(df, 0)).
        "search_title_boost": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        q AS (SELECT unnest(['table','join','query']) AS word),
        ttoks AS (
          SELECT doc_id, lower(tok) AS word
          FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(
                     regexp_replace(substr(text, 1, 60), '{_SEP_SQL}', ' ', 'g'),
                     '[ \t\n\r]')) AS tok
            FROM documents)
          WHERE strlen(tok) >= 2),
        tcounts AS (SELECT doc_id, word, COUNT(*) AS term_count
                    FROM ttoks GROUP BY doc_id, word),
        tpost AS (SELECT doc_id, word, term_count,
                         CAST(SUM(term_count) OVER (PARTITION BY doc_id)
                              AS BIGINT) AS tlen
                  FROM tcounts),
        dfs AS (SELECT word, COUNT(DISTINCT doc_id) AS df
                FROM postings JOIN q USING (word) GROUP BY word),
        fields AS (
          SELECT doc_id, word, term_count / doc_len AS tf, 1.0 AS fweight
          FROM postings
          UNION ALL
          SELECT doc_id, word, term_count / tlen AS tf, 2.0 AS fweight
          FROM tpost),
        matched AS (
          SELECT f.doc_id, f.tf, f.fweight, COALESCE(dfs.df, 0) AS df
          FROM fields f JOIN q USING (word) LEFT JOIN dfs USING (word)),
        scored AS (
          SELECT doc_id,
                 SUM(fweight * tf
                     * ln((SELECT n_docs FROM n) / (1.0 + df))) AS score
          FROM matched GROUP BY doc_id),
        top AS (SELECT doc_id, score FROM scored
                ORDER BY score DESC, doc_id ASC LIMIT 100)
        SELECT t.doc_id, d.source AS title, ROUND(t.score, 6) AS score
        FROM top t JOIN documents d USING (doc_id)
    """,
        "fuzzy_term_expand": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        vocab AS (SELECT word, COUNT(DISTINCT doc_id) AS df
                  FROM postings GROUP BY word),
        t AS (SELECT unnest(['sow','quer','mall']) AS term)
        SELECT term, word, CAST(levenshtein(term, word) AS INT) AS dist, df
        FROM vocab, t
        WHERE levenshtein(term, word) <= 1
    """,
        "fuzzy_search": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        vocab AS (SELECT DISTINCT word FROM postings),
        t AS (SELECT unnest(['sow','quer','mall']) AS term),
        exp AS (SELECT term, word, levenshtein(term, word) AS dist
                FROM vocab, t WHERE levenshtein(term, word) <= 1),
        w AS (SELECT word, 1.0 / (1.0 + dist) AS weight FROM exp),
        dfs AS (SELECT word, COUNT(DISTINCT doc_id) AS df
                FROM postings
                WHERE word IN (SELECT word FROM w) GROUP BY word),
        matched AS (
          SELECT p.doc_id, w.weight, p.term_count / p.doc_len AS tf, dfs.df
          FROM postings p JOIN w USING (word) JOIN dfs USING (word)),
        scored AS (
          SELECT doc_id,
                 SUM(weight * tf
                     * ln((SELECT n_docs FROM n) / (1.0 + df))) AS score
          FROM matched GROUP BY doc_id),
        top AS (SELECT doc_id, score FROM scored
                ORDER BY score DESC, doc_id ASC LIMIT 100)
        SELECT t.doc_id, d.source AS title, ROUND(t.score, 6) AS score
        FROM top t JOIN documents d USING (doc_id)
    """,
        # trigram candidates + contains-verify == plain substring scan
        # (100% recall by construction), so the oracle asserts the LIKE
        # ground truth directly.
        "substring_search": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        m AS (SELECT DISTINCT word FROM postings
              WHERE position('par' IN word) > 0),
        agg AS (SELECT doc_id, COUNT(DISTINCT word) AS n_words,
                       CAST(SUM(term_count) AS BIGINT) AS hits
                FROM postings JOIN m USING (word) GROUP BY doc_id)
        SELECT doc_id, n_words, hits FROM agg
        ORDER BY hits DESC, doc_id ASC LIMIT 100
    """,
        "postings_gap_stats": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        g AS (SELECT word,
                     doc_id - lag(doc_id) OVER
                       (PARTITION BY word ORDER BY doc_id) AS gap
              FROM postings)
        SELECT word, COUNT(*) AS n_docs,
               ROUND(AVG(gap), 6) AS avg_gap,
               MAX(gap) AS max_gap,
               CAST(SUM(length(bin(gap))) AS BIGINT) AS gap_bits
        FROM g GROUP BY word
    """,
        "frontier_priority_indegree": f"""
        WITH f AS ({_FRONTIER_SQL}),
        ind AS (SELECT l_orderkey, COUNT(*) AS indegree
                FROM lineitem GROUP BY l_orderkey),
        elig AS (
          SELECT f.url, f.host, f.depth, f.seq,
                 CAST(COALESCE(ind.indegree, 0) AS BIGINT) AS priority
          FROM f LEFT JOIN ind ON ind.l_orderkey = f.seq
          WHERE f.state = 'unvisited'),
        ranked AS (
          SELECT *, row_number() OVER
                 (PARTITION BY host
                  ORDER BY priority DESC, depth, seq) AS rk
          FROM elig)
        SELECT url, host, depth, seq, priority,
               CAST(row_number() OVER
                 (ORDER BY priority DESC, depth, seq) - 1 AS BIGINT)
               AS fetch_order
        FROM ranked WHERE rk <= 3
    """,
    }
)


# Batch-5 oracles: training-data pipeline tail — decontamination and
# sequence packing (integer-only outputs) — plus crawl-delay politeness.
ORACLES_EXTRA.update(
    {
        "politeness_crawl_delay": f"""
        WITH f AS ({{_F}}),
        h AS (SELECT url, host, depth, seq,
                     CAST(regexp_extract(host, 'host(\\d+)\\.test', 1)
                          AS BIGINT) AS hn
              FROM f WHERE state = 'unvisited'),
        elig AS (
          SELECT url, host, depth, seq FROM h
          WHERE (hn % 4) <= 6 - greatest(
                  2, CASE WHEN hn % 3 = 0 THEN hn % 5 + 2 ELSE 2 END)),
        ranked AS (
          SELECT *, row_number() OVER
                 (PARTITION BY host ORDER BY depth, seq) AS rk
          FROM elig)
        SELECT url, host, depth, seq,
               CAST(row_number() OVER (ORDER BY depth, seq) - 1 AS BIGINT)
               AS fetch_order
        FROM ranked WHERE rk <= 3
    """.replace("{_F}", _FRONTIER_SQL),
        # PQ-ADC: m=4 subspaces x 16 dims, codebook = first-16 subvectors
        # (integer), encode = argmin squared L2 (tie -> lowest code),
        # score = sum of per-subspace code distances. All BIGINT.
        "knn_pq": """
        WITH nv AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                           list_transform(embedding,
                             x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                       AS BIGINT)) AS v
                    FROM embeddings),
        subs AS (SELECT unnest(range(0, 4)) AS sub),
        cb AS (SELECT sub, vec_id AS code,
                      v[sub*16+1 : sub*16+16] AS cv
               FROM nv, subs WHERE vec_id < 16),
        vsub AS (SELECT vec_id, sub, v[sub*16+1 : sub*16+16] AS sv
                 FROM nv, subs),
        dist AS (SELECT vec_id, sub, code,
                        CAST(list_sum(list_transform(range(1, 17),
                          i -> (sv[i]-cv[i])*(sv[i]-cv[i]))) AS BIGINT) AS d
                 FROM vsub JOIN cb USING (sub)),
        codes AS (SELECT vec_id, sub, code FROM (
                    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                               ORDER BY d, code) AS rn
                    FROM dist) WHERE rn = 1),
        qsub AS (SELECT vec_id AS query_id, sub,
                        v[sub*16+1 : sub*16+16] AS sv
                 FROM nv, subs WHERE vec_id < 5),
        qd AS (SELECT query_id, sub, code,
                      CAST(list_sum(list_transform(range(1, 17),
                        i -> (sv[i]-cv[i])*(sv[i]-cv[i]))) AS BIGINT) AS d
               FROM qsub JOIN cb USING (sub)),
        scored AS (SELECT query_id, c.vec_id,
                          CAST(SUM(qd.d) AS BIGINT) AS adc_dist
                   FROM codes c JOIN qd USING (sub, code)
                   GROUP BY 1, 2)
        SELECT query_id, vec_id, adc_dist,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY adc_dist ASC, vec_id ASC) AS BIGINT) AS rank
        FROM scored QUALIFY rank <= 10
    """,
        # milli-weight mixing: copies = w DIV 1000 + (hash bucket < w%1000)
        "epoch_mix": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
                          CASE source WHEN 'src0' THEN 2500
                                      WHEN 'src1' THEN 1500
                                      WHEN 'src2' THEN 500
                                      ELSE 1000 END AS rate,
                          ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)),
                                          1, 15))::BIGINT % 1000 AS bucket
                   FROM documents),
        n AS (SELECT doc_id, source,
                     rate // 1000
                       + CASE WHEN bucket < rate % 1000 THEN 1 ELSE 0 END
                       AS n_copies
              FROM d)
        SELECT doc_id, source, CAST(unnest(range(0, n_copies)) AS BIGINT) AS copy
        FROM n WHERE n_copies > 0
    """,
        # composite query language: AND('table','join') scored + phrase
        # gate "slow small" + -batch exclusion + title:query boost (x2.0,
        # df from body) + quer~ fuzzy scorer — each component verbatim
        # from its standalone oracle, composed in the pinned order.
        "search_query_language": f"""
        WITH postings AS ({{_P}}),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        q AS (SELECT unnest(['table','join']) AS word),
        dfs AS (SELECT word, COUNT(DISTINCT doc_id) AS df
                FROM postings JOIN q USING (word) GROUP BY word),
        and_scored AS (
          SELECT doc_id, COUNT(*) AS n_words,
                 SUM((term_count / doc_len)
                     * ln((SELECT n_docs FROM n) / (1.0 + df))) AS score
          FROM postings p JOIN q USING (word) JOIN dfs USING (word)
          GROUP BY doc_id),
        base AS (SELECT doc_id, score FROM and_scored WHERE n_words = 2),
        pos AS ({{_POS}}),
        occ AS (
          SELECT a.doc_id FROM
            (SELECT doc_id, pos FROM pos WHERE word = 'slow') a
          JOIN
            (SELECT doc_id, pos - 1 AS pos FROM pos WHERE word = 'small') b
          USING (doc_id, pos)),
        phrase_docs AS (SELECT DISTINCT doc_id FROM occ),
        excl AS (SELECT DISTINCT doc_id FROM postings WHERE word = 'batch'),
        ttoks AS (
          SELECT doc_id, lower(tok) AS word
          FROM (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   unnest(regexp_split_to_array(
                     regexp_replace(substr(text, 1, 60), '{{_SEP}}', ' ', 'g'),
                     '[ \t\n\r]')) AS tok
            FROM documents)
          WHERE strlen(tok) >= 2),
        tcounts AS (SELECT doc_id, word, COUNT(*) AS term_count
                    FROM ttoks GROUP BY doc_id, word),
        tpost AS (SELECT doc_id, word, term_count,
                         CAST(SUM(term_count) OVER (PARTITION BY doc_id)
                              AS BIGINT) AS tlen
                  FROM tcounts),
        tq AS (SELECT unnest(['query']) AS word),
        tdfs AS (SELECT word, COUNT(DISTINCT doc_id) AS df
                 FROM postings JOIN tq USING (word) GROUP BY word),
        tscored AS (
          SELECT doc_id,
                 SUM(2.0 * (term_count / tlen)
                     * ln((SELECT n_docs FROM n)
                          / (1.0 + COALESCE(df, 0)))) AS tscore
          FROM tpost JOIN tq USING (word) LEFT JOIN tdfs USING (word)
          GROUP BY doc_id),
        vocab AS (SELECT DISTINCT word FROM postings),
        fex AS (SELECT word, 1.0 / (1.0 + levenshtein('quer', word)) AS weight
                FROM vocab WHERE levenshtein('quer', word) <= 1),
        fdfs AS (SELECT word, COUNT(DISTINCT doc_id) AS df
                 FROM postings
                 WHERE word IN (SELECT word FROM fex) GROUP BY word),
        fscored AS (
          SELECT doc_id,
                 SUM(weight * (term_count / doc_len)
                     * ln((SELECT n_docs FROM n) / (1.0 + df))) AS fscore
          FROM postings JOIN fex USING (word) JOIN fdfs USING (word)
          GROUP BY doc_id),
        gated AS (
          SELECT b.doc_id, b.score
          FROM base b JOIN phrase_docs USING (doc_id)
          WHERE b.doc_id NOT IN (SELECT doc_id FROM excl)),
        total AS (
          SELECT g.doc_id,
                 g.score + COALESCE(t.tscore, 0) + COALESCE(f.fscore, 0)
                   AS total
          FROM gated g LEFT JOIN tscored t USING (doc_id)
                       LEFT JOIN fscored f USING (doc_id)),
        top AS (SELECT doc_id, total FROM total
                ORDER BY total DESC, doc_id ASC LIMIT 100)
        SELECT t.doc_id, d.source AS title, ROUND(t.total, 6) AS score
        FROM top t JOIN documents d USING (doc_id)
    """.replace("{_P}", _POSTINGS_SQL).replace("{_POS}", _POS_TOKENS_SQL)
        .replace("{_SEP}", _SEP_SQL),
        # error backoff: gap = min(2^least(n_errors,30), 8); 'pending'
        # rows are the synthetic error slice; eligibility vs hoststats
        # last=hn%4 at round 6 with min_gap 1, then the budget-2 windows.
        "error_backoff_checkout": """
        WITH f AS ({_F}),
        h AS (SELECT url, host, depth, seq, state,
                     CAST(regexp_extract(host, 'host(\\d+)\\.test', 1)
                          AS BIGINT) AS hn
              FROM f),
        g AS (SELECT host,
                     least(1 << least(COUNT(*), 30), 8) AS gap
              FROM h WHERE state = 'pending' AND seq % 50 = 0
              GROUP BY host),
        elig AS (
          SELECT h.url, h.host, h.depth, h.seq FROM h LEFT JOIN g USING (host)
          WHERE h.state = 'unvisited'
            AND (h.hn % 4) <= 6 - greatest(COALESCE(g.gap, 1), 1)),
        ranked AS (
          SELECT *, row_number() OVER
                 (PARTITION BY host ORDER BY depth, seq) AS rk
          FROM elig)
        SELECT url, host, depth, seq,
               CAST(row_number() OVER (ORDER BY depth, seq) - 1 AS BIGINT)
               AS fetch_order
        FROM ranked WHERE rk <= 2
    """.replace("{_F}", _FRONTIER_SQL),
        # benchmark = tokens 4..28 of every 41st doc; 5-gram overlap.
        # DuckDB list slice t[i:i+4] is INCLUSIVE (5 tokens), matching
        # Spark slice(toks, i, 5); both sides guard len >= 5 explicitly.
        "decontaminate": """
        WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                             string_split(text, ' ') AS t
                      FROM documents),
        bench AS (SELECT string_split(
                           array_to_string(t[4:28], ' '), ' ') AS t
                  FROM toks WHERE doc_id % 41 = 0),
        bng AS (SELECT DISTINCT
                       unnest(list_transform(range(1, len(t)-4+1),
                              i -> array_to_string(t[i:i+4], ' '))) AS ngram
                FROM bench WHERE len(t) >= 5),
        dng AS (SELECT doc_id,
                       unnest(list_distinct(
                         list_transform(range(1, len(t)-4+1),
                                i -> array_to_string(t[i:i+4], ' ')))) AS ngram
                FROM toks WHERE len(t) >= 5),
        hits AS (SELECT doc_id, COUNT(*) AS c
                 FROM dng JOIN bng USING (ngram) GROUP BY doc_id),
        base AS (SELECT doc_id,
                        CASE WHEN len(t) >= 5
                             THEN len(list_distinct(
                                    list_transform(range(1, len(t)-4+1),
                                      i -> array_to_string(t[i:i+4], ' '))))
                             ELSE 0 END AS n_ngrams
                 FROM toks)
        SELECT b.doc_id,
               CAST(b.n_ngrams AS BIGINT) AS n_ngrams,
               CAST(COALESCE(h.c, 0) AS BIGINT) AS n_contaminated,
               CAST(CASE WHEN COALESCE(h.c, 0) >= 1 THEN 1 ELSE 0 END
                    AS BIGINT) AS contaminated
        FROM base b LEFT JOIN hits h USING (doc_id)
    """,
        # ctx_len=128, n_buckets=8; bucket/order/cumsum identical to
        # packing.pack_sequences (hash60('pack:' || doc_id) % 8; in-bucket
        # order = doc_id; integer DIV throughout).
        "pack_sequences": """
        WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                             len(string_split(text, ' ')) AS n
                      FROM documents),
        b AS (SELECT doc_id, n,
                     ('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)),
                                     1, 15))::BIGINT % 8 AS bucket
              FROM toks),
        st AS (SELECT doc_id, n, bucket,
                      CAST(COALESCE(SUM(n) OVER
                        (PARTITION BY bucket ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS start
               FROM b),
        ex AS (SELECT *,
                      unnest(range(start // 128, (start + n - 1) // 128 + 1))
                        AS s
               FROM st)
        SELECT CAST(bucket * 1099511627776 + s AS BIGINT) AS seq_id,
               CAST(bucket AS BIGINT) AS bucket,
               doc_id,
               CAST(n AS BIGINT) AS n_tokens,
               CAST(greatest(0, s * 128 - start) AS BIGINT) AS tok_start,
               CAST(least(n, (s + 1) * 128 - start) AS BIGINT) AS tok_end,
               CAST(start + greatest(0, s * 128 - start) - s * 128
                    AS BIGINT) AS seq_off
        FROM ex
    """,
    }
)

ORACLES_EXTRA.update(
    {
        # DSIR importance weights: same md5-bucket / add-1-smoothed integer
        # likelihood-ratio / floor-div pipeline as operators/selection.py.
        "dsir_select": """
        WITH tk AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 CAST(doc_id % 7 = 0 AS INT) AS is_target,
                 unnest(string_split(text, ' ')) AS tok
          FROM documents),
        b AS (
          SELECT doc_id, is_target,
                 ('0x' || substr(md5(tok), 1, 4))::BIGINT % 64 AS bucket
          FROM tk),
        s AS (
          SELECT bucket,
                 CAST(SUM(is_target) AS BIGINT) AS ct,
                 CAST(SUM(1 - is_target) AS BIGINT) AS cr
          FROM b GROUP BY bucket),
        sc AS (
          SELECT bucket, ((ct + 1) * 1000000) // (cr + 1) AS score FROM s),
        w AS (
          SELECT b.doc_id, CAST(SUM(sc.score) AS BIGINT) AS weight
          FROM b JOIN sc USING (bucket)
          WHERE b.is_target = 0
          GROUP BY b.doc_id)
        SELECT doc_id, weight FROM w
        ORDER BY weight DESC, doc_id LIMIT 100
    """,
        # ExactSubstr audit: sliding 10-token window hashes, global >1
        # dup set, per-doc overlap-merged coverage. Same hash60 + island
        # logic as operators/dedup.py:exact_substring_stats.
        "exact_substring_dups": """
        WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          string_split(text, ' ') AS tk
                   FROM documents),
        base AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM t),
        wn AS (SELECT doc_id, unnest(range(1, len(tk) - 10 + 2)) AS p, tk
               FROM t WHERE len(tk) >= 10),
        wins AS (SELECT doc_id, p,
                        ('0x' || substr(md5(array_to_string(tk[p:p+9], ' ')),
                                        1, 15))::BIGINT AS h
                 FROM wn),
        dup AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) > 1),
        wdup AS (SELECT doc_id, p FROM wins WHERE h IN (SELECT h FROM dup)),
        d AS (SELECT doc_id, p,
                     CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p)
                               IS NULL
                            OR p > lag(p) OVER (PARTITION BY doc_id
                                                ORDER BY p) + 10
                          THEN 1 ELSE 0 END AS brk
              FROM wdup),
        i AS (SELECT doc_id, p,
                     SUM(brk) OVER (PARTITION BY doc_id ORDER BY p) AS island
              FROM d),
        r AS (SELECT doc_id, island, MIN(p) AS fp, MAX(p) AS lp
              FROM i GROUP BY 1, 2),
        agg AS (SELECT doc_id,
                       CAST(SUM(lp - fp + 10) AS BIGINT) AS dup_tokens,
                       CAST(COUNT(*) AS BIGINT) AS n_dup_ranges
                FROM r GROUP BY 1)
        SELECT b.doc_id, b.n_tokens,
               COALESCE(a.dup_tokens, 0) AS dup_tokens,
               COALESCE(a.n_dup_ranges, 0) AS n_dup_ranges
        FROM base b LEFT JOIN agg a USING (doc_id)
    """,
        # Count-min sketch: same 'cms{i}:' salted md5 buckets, counter
        # cells, and min-over-rows estimate as functions/sketches.py.
        "host_freq_cms": """
        WITH f AS ({_F}),
        rows AS (SELECT unnest(range(0, 4)) AS i),
        st AS (SELECT i,
                      ('0x' || substr(md5('cms' || i || ':' || host), 1, 15))
                        ::BIGINT % 256 AS bucket
               FROM f CROSS JOIN rows),
        counters AS (SELECT i, bucket, COUNT(*) AS cnt FROM st GROUP BY 1, 2),
        truth AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS true_count
                  FROM f GROUP BY 1),
        probes AS (SELECT t.host, t.true_count, r.i,
                          ('0x' || substr(md5('cms' || r.i || ':' || t.host),
                                          1, 15))::BIGINT % 256 AS bucket
                   FROM truth t CROSS JOIN rows r)
        SELECT p.host, p.true_count,
               CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cms_count
        FROM probes p
        LEFT JOIN counters c ON c.i = p.i AND c.bucket = p.bucket
        GROUP BY 1, 2
    """.replace("{_F}", _FRONTIER_SQL),
    }
)

# Shared IVF fragment for extras oracles: reproduces
# similarity.ivf_train_centroids(n=8, iters=1) + nearest-cell assignment —
# the same deterministic Lloyd iteration the gated knn_ivf oracle inlines
# (kept separate so the frozen gated SQL text is untouched). Ends with
# lists(vec_id, v, nrm, centroid_id).
_IVF_LISTS_SQL = _QNORM_SQL.format(qvec=_QVEC_SQL) + """
    , cent0 AS (SELECT vec_id AS centroid_id,
                       list_transform(v, x -> CAST(x AS DOUBLE)) AS cv
                FROM nv WHERE vec_id < 8),
    cn0 AS (SELECT centroid_id, cv,
                   sqrt(list_sum(list_transform(cv, x -> x*x))) AS cnrm
            FROM cent0),
    a0 AS (
      SELECT nv.vec_id, nv.v, nv.nrm, c.centroid_id,
             CAST(list_sum(list_transform(range(1, len(nv.v)+1),
                           i -> nv.v[i]*c.cv[i])) AS DOUBLE)
               / (nv.nrm * c.cnrm) AS cc
      FROM nv CROSS JOIN cn0 c),
    m0 AS (
      SELECT vec_id, v, centroid_id,
             row_number() OVER (PARTITION BY vec_id
                  ORDER BY cc DESC, centroid_id ASC) AS cr
      FROM a0 QUALIFY cr = 1),
    sums AS (
      SELECT centroid_id, pos, SUM(x) AS s, COUNT(*) AS n
      FROM (SELECT centroid_id, unnest(v) AS x,
                   generate_subscripts(v, 1) AS pos
            FROM m0)
      GROUP BY 1, 2),
    cent1 AS (
      SELECT c0.centroid_id, COALESCE(nc.cv, c0.cv) AS cv
      FROM cent0 c0 LEFT JOIN
           (SELECT centroid_id,
                   list(CAST(s AS DOUBLE) / n ORDER BY pos) AS cv
            FROM sums GROUP BY centroid_id) nc USING (centroid_id)),
    cn1 AS (SELECT centroid_id, cv,
                   sqrt(list_sum(list_transform(cv, x -> x*x))) AS cnrm
            FROM cent1),
    assign AS (
      SELECT nv.vec_id, nv.v, nv.nrm, c.centroid_id,
             CAST(list_sum(list_transform(range(1, len(nv.v)+1),
                           i -> nv.v[i]*c.cv[i])) AS DOUBLE)
               / (nv.nrm * c.cnrm) AS cc
      FROM nv CROSS JOIN cn1 c),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY cc DESC, centroid_id ASC) AS cr
      FROM assign),
    lists AS (SELECT vec_id, v, nrm, centroid_id FROM ranked WHERE cr = 1)
"""

ORACLES_EXTRA.update(
    {
        "semdedup": _IVF_LISTS_SQL + """
        , dup AS (
          SELECT DISTINCT a.vec_id
          FROM lists a JOIN lists b
            ON a.centroid_id = b.centroid_id AND a.vec_id > b.vec_id
          WHERE CAST(list_sum(list_transform(range(1, len(a.v)+1),
                              i -> a.v[i]*b.v[i])) AS DOUBLE)
                  / (a.nrm * b.nrm) >= 0.45)
        SELECT l.vec_id, l.centroid_id,
               CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
                 AS keep
        FROM lists l LEFT JOIN dup d USING (vec_id)
    """,
    }
)


def _bpe_oracle_sql(n_merges: int) -> str:
    """Unrolled-iteration BPE oracle (the same pattern as the pagerank /
    hits unrolled-CTE oracles): each merge is one pair-count aggregate,
    one pinned argmax, and one replace over the word histogram —
    reproducing operators/bpe.py bit-for-bit, including the greedy
    left-to-right within-word merge order (the '  ' symbol wrapping)."""
    parts = [
        """
    WITH words_raw AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    w0 AS MATERIALIZED (
      SELECT ' ' || array_to_string(string_split(word, ''), '  ') || ' '
               AS word_str,
             COUNT(*) AS cnt
      FROM words_raw WHERE word <> '' GROUP BY 1)
    """
    ]
    for i in range(n_merges):
        parts.append(f"""
    , p{i} AS (
      SELECT pair, SUM(cnt) AS c
      FROM (SELECT cnt,
                   unnest(list_transform(range(1, len(t)),
                          j -> t[j] || chr(1) || t[j+1])) AS pair
            FROM (SELECT cnt, string_split(trim(word_str), '  ') AS t
                  FROM w{i}))
      GROUP BY 1),
    b{i} AS MATERIALIZED (
      SELECT split_part(pair, chr(1), 1) AS l,
             split_part(pair, chr(1), 2) AS r, c
      FROM p{i} ORDER BY c DESC, l ASC, r ASC LIMIT 1),
    w{i + 1} AS MATERIALIZED (
      SELECT replace(word_str,
               ' ' || (SELECT l FROM b{i}) || '  '
                   || (SELECT r FROM b{i}) || ' ',
               ' ' || (SELECT l FROM b{i}) || (SELECT r FROM b{i}) || ' ')
               AS word_str,
             cnt
      FROM w{i})""")
    selects = [
        f"""SELECT CAST({i} AS BIGINT) AS rank, l AS "left", r AS "right",
                   CAST(c AS BIGINT) AS pair_count FROM b{i}"""
        for i in range(n_merges)
    ]
    parts.append("\n    " + "\n    UNION ALL ".join(selects))
    return "".join(parts)


ORACLES_EXTRA.update({"bpe_merges": _bpe_oracle_sql(8)})

ORACLES_EXTRA.update(
    {
        "normalize_text": """
        WITH d AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 CASE WHEN doc_id % 4 = 0
                      THEN text || '  Cafe' || chr(769) || ' ' || chr(7)
                           || 'nai' || chr(776) || 've'
                      ELSE text END AS text
          FROM documents),
        n AS (SELECT doc_id, text,
                     trim(regexp_replace(
                       regexp_replace(nfc_normalize(text),
                         '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),
                       '[ \\t]+', ' ', 'g')) AS text_norm
              FROM d)
        SELECT doc_id, text_norm,
               CAST(CASE WHEN text_norm <> text THEN 1 ELSE 0 END AS BIGINT)
                 AS changed,
               CAST(length(text_norm) AS BIGINT) AS n_chars
        FROM n
    """,
        "chunk_documents": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          list_filter(string_split(text, ' '), x -> x <> '')
                            AS t
                   FROM documents),
        b AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n
              FROM d WHERE len(t) >= 1),
        c AS (SELECT doc_id, t, n,
                     unnest(range(0, CASE WHEN n > 32
                                          THEN 1 + (n - 32 + 23) // 24
                                          ELSE 1 END)) AS i
              FROM b)
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
               CAST(i*24 + 1 AS BIGINT) AS start_tok,
               CAST(len(t[CAST(i*24+1 AS BIGINT) : CAST(i*24+32 AS BIGINT)])
                    AS BIGINT) AS n_tok,
               array_to_string(
                 t[CAST(i*24+1 AS BIGINT) : CAST(i*24+32 AS BIGINT)], ' ')
                 AS chunk_text
        FROM c
    """,
        "nll_buckets": """
        WITH b_d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                            list_filter(string_split(text, ' '),
                                        x -> x <> '') AS t
                     FROM documents),
        b_bg AS (SELECT doc_id,
                        unnest(list_transform(range(1, len(t)),
                               j -> t[j] || chr(1) || t[j+1])) AS pair
                 FROM b_d WHERE len(t) >= 2),
        b_refbg AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS c12
                    FROM b_bg WHERE doc_id % 5 = 0 GROUP BY 1),
        b_refctx AS (SELECT split_part(pair, chr(1), 1) AS w1,
                            CAST(SUM(c12) AS BIGINT) AS c1
                     FROM b_refbg GROUP BY 1),
        b_vocab AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
                    FROM (SELECT unnest(t) AS w FROM b_d
                          WHERE doc_id % 5 = 0)),
        b_sc AS (
          SELECT b.doc_id,
                 CAST(round(-ln(CAST(COALESCE(rb.c12, 0) + 1 AS DOUBLE)
                       / CAST(COALESCE(rc.c1, 0) + (SELECT v FROM b_vocab)
                              AS DOUBLE)) * 1000000) AS BIGINT) AS qn
          FROM b_bg b
          LEFT JOIN b_refbg rb USING (pair)
          LEFT JOIN b_refctx rc ON rc.w1 = split_part(b.pair, chr(1), 1)),
        b_per AS (SELECT doc_id, COUNT(*) AS nb, SUM(qn) AS nq
                  FROM b_sc GROUP BY 1),
        b_all AS (SELECT ids.doc_id,
                         CAST(COALESCE(b_per.nb, 0) AS BIGINT) AS n_bigrams,
                         CAST(COALESCE(b_per.nq, 0) AS BIGINT) AS nll_q
                  FROM (SELECT DISTINCT doc_id FROM b_d) ids
                  LEFT JOIN b_per USING (doc_id)),
        b_avg AS (SELECT *,
                         CASE WHEN n_bigrams > 0
                              THEN CAST((nll_q * 1000) // n_bigrams AS BIGINT)
                         END AS avg_q
                  FROM b_all),
        b_thr AS (SELECT quantile_cont(avg_q, 0.3333333333333333) AS t1,
                         quantile_cont(avg_q, 0.6666666666666666) AS t2
                  FROM b_avg WHERE n_bigrams > 0)
        SELECT doc_id, n_bigrams, nll_q, avg_q,
               CASE WHEN avg_q IS NULL THEN 'tail'
                    WHEN avg_q <= (SELECT t1 FROM b_thr) THEN 'head'
                    WHEN avg_q <= (SELECT t2 FROM b_thr) THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM b_avg
    """,
        # composed from the individually gated lang_id / gopher_repetition /
        # quality_score / lm_perplexity fragments (CTE-prefixed to avoid
        # collisions); the keep rule mirrors pipeline.corpus_quality_pipeline
        # defaults: en, not flagged, 20<=n_tokens<=100000, quality>=0.05,
        # nll_q <= n_bigrams * 3_400_000 (integer compare).
        "corpus_pipeline": """
        WITH lg_t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                             string_split(lower(text), ' ') AS toks
                      FROM documents),
        lg_h AS (SELECT doc_id,
          CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS BIGINT) AS hits_de,
          CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS BIGINT) AS hits_en,
          CAST(len(list_filter(toks, x -> list_contains(['el','la','los','y','es','un'], x))) AS BIGINT) AS hits_es,
          CAST(len(list_filter(toks, x -> list_contains(['le','la','les','et','est','un'], x))) AS BIGINT) AS hits_fr,
          CAST(len(list_filter(toks, x -> list_contains(['de','shi','le','zai','he'], x))) AS BIGINT) AS hits_zh
          FROM lg_t),
        lg AS (SELECT doc_id,
               CASE WHEN hits_de = best THEN 'de'
                    WHEN hits_en = best THEN 'en'
                    WHEN hits_es = best THEN 'es'
                    WHEN hits_fr = best THEN 'fr'
                    ELSE 'zh' END AS predicted_lang
          FROM (SELECT *, greatest(hits_de, hits_en, hits_es, hits_fr,
                                   hits_zh) AS best FROM lg_h)),
        g_toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          string_split(text, ' ') AS t FROM documents),
        g_base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
            list_transform(range(0, CAST(ceil(len(t)/8.0) AS BIGINT)),
                i -> array_to_string(
                       t[CAST(i*8+1 AS BIGINT):CAST(i*8+8 AS BIGINT)], ' '))
              AS lines,
            CASE WHEN len(t) >= 2
                 THEN list_transform(range(1, CAST(len(t) AS BIGINT)),
                                     i -> t[i] || ' ' || t[i+1])
                 ELSE [] END AS bigrams
          FROM g_toks),
        g_ls AS (SELECT doc_id, n_tokens,
                        CAST(len(lines) AS BIGINT) AS n_lines,
                        CAST(len(list_distinct(lines)) AS BIGINT) AS n_distinct
                 FROM g_base),
        g_bg AS (SELECT doc_id, unnest(bigrams) AS bigram FROM g_base),
        g_bc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM g_bg GROUP BY 1, 2),
        g_top AS (SELECT doc_id, MAX(c) AS top_cnt FROM g_bc GROUP BY doc_id),
        g AS (SELECT doc_id, n_tokens,
               CAST(CASE WHEN dup_line_frac > CAST(0.30 AS DOUBLE)
                           OR top_bigram_frac > CAST(0.20 AS DOUBLE)
                    THEN 1 ELSE 0 END AS BIGINT) AS flagged
          FROM (SELECT l.doc_id, l.n_tokens,
                       1.0 - l.n_distinct / l.n_lines AS dup_line_frac,
                       COALESCE(2*t.top_cnt / l.n_tokens, CAST(0 AS DOUBLE))
                         AS top_bigram_frac
                FROM g_ls l LEFT JOIN g_top t USING (doc_id))),
        q_t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
                       string_split(text, ' ') AS toks
                FROM documents),
        q_f AS (SELECT doc_id,
          CAST(len(toks) AS BIGINT) AS n_tokens,
          CAST(len(toks) - len(list_distinct(toks)) AS BIGINT) AS n_repeats,
          CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS BIGINT) AS n_stop
          FROM q_t),
        q AS (SELECT doc_id,
               least(n_tokens, 200) / 200.0
                 * (1.0 - n_repeats / n_tokens)
                 * (0.5 + 0.5 * n_stop / n_tokens) AS quality
          FROM q_f),
        lm_d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                        list_filter(string_split(text, ' '), x -> x <> '')
                          AS t
                 FROM documents),
        lm_bg AS (SELECT doc_id,
                         unnest(list_transform(range(1, len(t)),
                                j -> t[j] || chr(1) || t[j+1])) AS pair
                  FROM lm_d WHERE len(t) >= 2),
        lm_refbg AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS c12
                     FROM lm_bg WHERE doc_id % 5 = 0 GROUP BY 1),
        lm_refctx AS (SELECT split_part(pair, chr(1), 1) AS w1,
                             CAST(SUM(c12) AS BIGINT) AS c1
                      FROM lm_refbg GROUP BY 1),
        lm_vocab AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
                     FROM (SELECT unnest(t) AS w FROM lm_d
                           WHERE doc_id % 5 = 0)),
        lm_scored AS (
          SELECT b.doc_id,
                 CAST(round(-ln(CAST(COALESCE(rb.c12, 0) + 1 AS DOUBLE)
                       / CAST(COALESCE(rc.c1, 0) + (SELECT v FROM lm_vocab)
                              AS DOUBLE)) * 1000000) AS BIGINT) AS qn
          FROM lm_bg b
          LEFT JOIN lm_refbg rb USING (pair)
          LEFT JOIN lm_refctx rc ON rc.w1 = split_part(b.pair, chr(1), 1)),
        lm_per AS (SELECT doc_id, COUNT(*) AS nb, SUM(qn) AS nq
                   FROM lm_scored GROUP BY 1),
        lm AS (SELECT ids.doc_id,
                      CAST(COALESCE(lm_per.nb, 0) AS BIGINT) AS n_bigrams,
                      CAST(COALESCE(lm_per.nq, 0) AS BIGINT) AS nll_q
               FROM (SELECT DISTINCT doc_id FROM lm_d) ids
               LEFT JOIN lm_per USING (doc_id))
        SELECT lg.doc_id, lg.predicted_lang, g.flagged, g.n_tokens,
               q.quality, lm.n_bigrams, lm.nll_q,
               CAST(CASE WHEN lg.predicted_lang = 'en' AND g.flagged = 0
                          AND g.n_tokens >= 20 AND g.n_tokens <= 100000
                          AND q.quality >= 0.05
                          AND lm.nll_q <= lm.n_bigrams * 3400000
                    THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM lg JOIN g USING (doc_id) JOIN q USING (doc_id)
        JOIN lm USING (doc_id)
    """,
        "spell_suggest": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        vocab AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                  FROM postings GROUP BY word),
        t AS (SELECT unnest(['table','tabel','queryy','zzzzxxxx']) AS term),
        exp AS (SELECT term, word,
                       CAST(levenshtein(term, word) AS BIGINT) AS dist, df
                FROM vocab, t WHERE levenshtein(term, word) <= 2),
        best AS (
          SELECT term, word, dist, df,
                 row_number() OVER (PARTITION BY term
                      ORDER BY dist ASC, df DESC, word ASC) AS rn
          FROM exp QUALIFY rn = 1)
        SELECT t.term, b.word AS suggestion, b.dist, b.df
        FROM t LEFT JOIN best b USING (term)
    """,
        "redirect_chains": """
        WITH RECURSIVE ks AS (
          SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders),
        e AS (
          SELECT 'http://r.test/p/' || CAST(k AS VARCHAR) AS src,
                 'http://r.test/p/' || CAST(k + 1 AS VARCHAR) AS dst
          FROM ks WHERE k % 5 < 3
          UNION ALL
          SELECT 'http://r.test/p/' || CAST(k AS VARCHAR),
                 'http://r.test/p/' || CAST(k - 3 AS VARCHAR)
          FROM ks WHERE k % 5 = 3 AND k % 7 = 0
          UNION ALL
          SELECT 'http://r.test/p/' || CAST(k AS VARCHAR),
                 'http://r.test/p/' || CAST(k AS VARCHAR)
          FROM ks WHERE k % 5 = 4 AND k % 11 = 0),
        walk(u, p, hops) AS (
          SELECT src, dst, CAST(1 AS BIGINT) FROM e
          UNION ALL
          SELECT w.u, e2.dst, w.hops + 1
          FROM walk w JOIN e e2 ON w.p = e2.src
          WHERE w.hops < 64),
        last AS (
          SELECT u, p, hops,
                 row_number() OVER (PARTITION BY u ORDER BY hops DESC) AS rn
          FROM walk QUALIFY rn = 1),
        srcs AS (SELECT DISTINCT src FROM e)
        SELECT l.u AS url,
               CASE WHEN s.src IS NULL THEN l.p END AS final_url,
               CAST(CASE WHEN s.src IS NULL THEN l.hops ELSE 0 END AS BIGINT)
                 AS chain_len,
               CAST(CASE WHEN s.src IS NULL THEN 0 ELSE 1 END AS BIGINT)
                 AS is_cycle
        FROM last l LEFT JOIN srcs s ON l.p = s.src
    """,
        "host_quota_sample": """
        WITH f AS ({_F}),
        ranked AS (
          SELECT url, host, seq,
                 CAST(row_number() OVER (
                   PARTITION BY host
                   ORDER BY ('0x' || substr(md5('hq:' || CAST(seq AS VARCHAR)),
                             1, 15))::BIGINT ASC, seq ASC) AS BIGINT)
                   AS host_rank
          FROM f)
        SELECT url, host, seq, host_rank FROM ranked WHERE host_rank <= 7
    """.replace("{_F}", _FRONTIER_SQL),
        "reindex_df_delta": f"""
        WITH changed AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id, text
          FROM documents WHERE doc_id % 3 = 0),
        newdocs AS (
          SELECT doc_id,
                 substr(text, 1, CAST(floor(length(text) / 2) AS INT))
                   || ' reindexed marker' AS text
          FROM changed),
        old_t AS (
          SELECT DISTINCT doc_id, lower(tok) AS word
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(
                         regexp_replace(text, '{_SEP_SQL}', ' ', 'g'),
                         '[ \t\n\r]')) AS tok
                FROM changed)
          WHERE strlen(tok) >= 2),
        new_t AS (
          SELECT DISTINCT doc_id, lower(tok) AS word
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(
                         regexp_replace(text, '{_SEP_SQL}', ' ', 'g'),
                         '[ \t\n\r]')) AS tok
                FROM newdocs)
          WHERE strlen(tok) >= 2),
        oc AS (SELECT word, COUNT(*) AS c FROM old_t GROUP BY 1),
        nc AS (SELECT word, COUNT(*) AS c FROM new_t GROUP BY 1)
        SELECT COALESCE(oc.word, nc.word) AS word,
               CAST(COALESCE(nc.c, 0) - COALESCE(oc.c, 0) AS BIGINT)
                 AS df_delta
        FROM oc FULL OUTER JOIN nc ON oc.word = nc.word
        WHERE COALESCE(nc.c, 0) - COALESCE(oc.c, 0) <> 0
    """,
        "revisit_decide": """
        WITH r AS (
          SELECT 'http://host' || CAST(o_custkey % 97 AS VARCHAR)
                   || '.test/order/' || CAST(o_orderkey AS VARCHAR) AS url,
                 CASE o_orderkey % 5 WHEN 0 THEN 304 WHEN 1 THEN 200
                      WHEN 2 THEN 200 WHEN 3 THEN 404 END AS status,
                 CASE o_orderkey % 5
                      WHEN 1 THEN 's' || CAST(o_orderkey AS VARCHAR)
                      WHEN 2 THEN 'b' || CAST(o_orderkey AS VARCHAR)
                 END AS body,
                 md5('s' || CAST(o_orderkey AS VARCHAR)) AS stored_hash
          FROM orders)
        SELECT url, CAST(status AS BIGINT) AS status,
               CASE WHEN status = 304 THEN 'unchanged_304'
                    WHEN status = 200 AND md5(COALESCE(body, '')) = stored_hash
                         THEN 'unchanged_body'
                    WHEN status = 200 THEN 'changed'
                    ELSE 'error' END AS outcome,
               CASE WHEN status = 200 THEN md5(COALESCE(body, ''))
                    ELSE stored_hash END AS new_hash,
               CAST(CASE WHEN status = 304 THEN 1 ELSE 0 END AS BIGINT)
                 AS saved_fetch
        FROM r
    """,
        "content_classify": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          list_filter(string_split(text, ' '), x -> x <> '')
                            AS t
                   FROM documents),
        dd AS (SELECT doc_id, t FROM d WHERE len(t) >= 1),
        blk AS (
          SELECT doc_id, CAST(i AS BIGINT) AS block_id,
                 array_to_string(t[CAST(i*12+1 AS BIGINT)
                                   : CAST(i*12+12 AS BIGINT)], ' ') AS btext
          FROM (SELECT doc_id, t,
                       unnest(range(0, CAST(ceil(len(t) / 12.0) AS BIGINT)))
                         AS i
                FROM dd)),
        s AS (
          SELECT doc_id, block_id,
                 CAST(strlen(btext) AS BIGINT) AS n_chars,
                 CAST((doc_id*7 + block_id*13) % (strlen(btext) + 1)
                      AS BIGINT) AS n_link_chars,
                 CAST(len(list_filter(string_split(btext, ' '),
                                      x -> x <> '')) AS BIGINT) AS n_words,
                 CAST(len(list_filter(string_split(btext, ' '),
                        x -> list_contains(
                          ['the','of','and','a','to','in','is','it'],
                          lower(x)))) AS BIGINT) AS n_stopwords
          FROM blk),
        c AS (
          SELECT *,
                 CASE WHEN n_chars = 0
                           OR CAST(n_link_chars AS DOUBLE) / n_chars > 0.4
                      THEN 'bad'
                      WHEN n_words >= 20
                           AND CAST(n_stopwords AS DOUBLE) / n_words >= 0.3
                      THEN 'good'
                      WHEN n_words < 5 THEN 'short'
                      ELSE 'neargood' END AS ctx_label
          FROM s),
        f AS (
          SELECT *,
                 last_value(CASE WHEN ctx_label IN ('good','bad')
                                 THEN ctx_label END IGNORE NULLS)
                   OVER (PARTITION BY doc_id ORDER BY block_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev,
                 first_value(CASE WHEN ctx_label IN ('good','bad')
                                  THEN ctx_label END IGNORE NULLS)
                   OVER (PARTITION BY doc_id ORDER BY block_id
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS nxt
          FROM c)
        SELECT doc_id, block_id, n_chars, n_link_chars, n_words,
               n_stopwords, ctx_label,
               CASE WHEN ctx_label IN ('good','bad') THEN ctx_label
                    WHEN ctx_label = 'neargood' THEN
                      CASE WHEN COALESCE(prev,'bad') = 'good'
                                OR COALESCE(nxt,'bad') = 'good'
                           THEN 'good' ELSE 'bad' END
                    ELSE
                      CASE WHEN COALESCE(prev,'bad') = 'good'
                                AND COALESCE(nxt,'bad') = 'good'
                           THEN 'good' ELSE 'bad' END END AS label
        FROM f
    """,
        "lm_perplexity": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          list_filter(string_split(text, ' '), x -> x <> '')
                            AS t
                   FROM documents),
        bg AS (SELECT doc_id,
                      unnest(list_transform(range(1, len(t)),
                             j -> t[j] || chr(1) || t[j+1])) AS pair
               FROM d WHERE len(t) >= 2),
        refbg AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS c12
                  FROM bg WHERE doc_id % 5 = 0 GROUP BY 1),
        refctx AS (SELECT split_part(pair, chr(1), 1) AS w1,
                          CAST(SUM(c12) AS BIGINT) AS c1
                   FROM refbg GROUP BY 1),
        vocab AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
                  FROM (SELECT unnest(t) AS w FROM d WHERE doc_id % 5 = 0)),
        scored AS (
          SELECT b.doc_id,
                 CAST(round(-ln(CAST(COALESCE(rb.c12, 0) + 1 AS DOUBLE)
                       / CAST(COALESCE(rc.c1, 0) + (SELECT v FROM vocab)
                              AS DOUBLE)) * 1000000) AS BIGINT) AS q
          FROM bg b
          LEFT JOIN refbg rb USING (pair)
          LEFT JOIN refctx rc ON rc.w1 = split_part(b.pair, chr(1), 1)),
        per AS (SELECT doc_id, COUNT(*) AS nb, SUM(q) AS nq
                FROM scored GROUP BY 1)
        SELECT ids.doc_id,
               CAST(COALESCE(per.nb, 0) AS BIGINT) AS n_bigrams,
               CAST(COALESCE(per.nq, 0) AS BIGINT) AS nll_q
        FROM (SELECT DISTINCT doc_id FROM d) ids LEFT JOIN per USING (doc_id)
    """,
        "url_trap_gate": """
        WITH u AS (
          SELECT 'http://t' || CAST(o_custkey % 7 AS VARCHAR) || '.test/' ||
                 COALESCE(array_to_string(
                   list_transform(range(1, CAST(o_orderkey % 12 AS BIGINT) + 1),
                     i -> 's' || CAST((o_orderkey + i) % (1 + o_custkey % 4)
                                      AS VARCHAR)),
                   '/'), '') AS url
          FROM orders),
        s AS (SELECT url,
                     list_filter(
                       string_split(
                         regexp_replace(url, '^[a-z]+://[^/]*', ''), '/'),
                       x -> x <> '') AS segs
              FROM u),
        m AS (SELECT url, segs,
                     CAST(COALESCE(list_max(list_transform(segs,
                            sg -> len(list_filter(segs, y -> y = sg)))), 0)
                          AS BIGINT) AS max_repeat
              FROM s)
        SELECT url,
               CAST(len(segs) AS BIGINT) AS depth_segs,
               max_repeat,
               CAST(strlen(url) AS BIGINT) AS url_len,
               CAST(CASE WHEN len(segs) > 8 OR max_repeat >= 3
                              OR strlen(url) > 45
                         THEN 1 ELSE 0 END AS BIGINT) AS is_trap
        FROM m
    """,
    }
)


ORACLES_EXTRA.update({"quality_classifier": _classifier_oracle_sql(8)})

ORACLES_EXTRA.update(
    {
        "search_diversify": """
        WITH r AS (
          SELECT CAST(doc_id AS BIGINT) AS url,
                 'h' || CAST(doc_id % 7 AS VARCHAR) || '.test' AS host,
                 CAST((doc_id * 37) % 101 AS DOUBLE) AS score
          FROM documents),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY host ORDER BY score DESC, url ASC) AS host_rank
          FROM r)
        SELECT url, host, score, CAST(host_rank AS BIGINT) AS host_rank
        FROM ranked WHERE host_rank <= 2
        ORDER BY score DESC, url ASC LIMIT 20
    """,
        "host_reputation": f"""
        WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          'host' || CAST(doc_id % 50 AS VARCHAR) || '.test'
                            AS host,
                          string_split(text, ' ') AS toks
                   FROM documents),
        feats AS (SELECT doc_id, host,
            CAST(len(toks) AS BIGINT) AS n,
            CAST(len(toks) - len(list_distinct(toks)) AS BIGINT) AS rep,
            CAST(len(list_filter(toks,
                 x -> list_contains(['the','a','of','and','to','in','is'], x)))
              AS BIGINT) AS stop
          FROM t),
        dq AS (SELECT host,
                      (1000 * least(n, 200) * (n - rep) * (n + stop))
                        // (400 * n * n) AS q_milli
               FROM feats),
        hs AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(q_milli) AS BIGINT) AS sum_q_milli
               FROM dq GROUP BY host),
        f AS (
          SELECT 'http://host' || CAST(o_custkey % {N_HOSTS} AS VARCHAR)
                   || '.test/order/' || CAST(o_orderkey AS VARCHAR) AS url,
                 'host' || CAST(o_custkey % {N_HOSTS} AS VARCHAR) || '.test'
                   AS host,
                 CAST(o_orderkey AS BIGINT) AS seq
          FROM orders),
        j AS (
          SELECT f.url, f.host, f.seq,
                 COALESCE(hs.n_docs, 0) AS n_docs,
                 COALESCE(hs.sum_q_milli, 0) AS sum_q_milli
          FROM f LEFT JOIN hs USING (host))
        SELECT url, host, seq, n_docs, sum_q_milli,
               CAST(CASE WHEN n_docs >= 3 AND sum_q_milli < 60 * n_docs
                    THEN 0 ELSE 1 END AS BIGINT) AS passed
        FROM j
    """,
        "search_anchor_boost": f"""
        WITH postings AS ({{_P}}),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        q AS (SELECT unnest(['table','join','query']) AS word),
        anchors AS (
          SELECT (doc_id % 97) * 5 AS tgt,
                 substr(regexp_replace(text, '[<>&]', ' ', 'g'), 1, 40)
                   AS anchor
          FROM documents),
        atoks AS (
          SELECT tgt, lower(tok) AS word
          FROM (SELECT tgt,
                       unnest(regexp_split_to_array(
                         regexp_replace(anchor, '{_SEP_SQL}', ' ', 'g'),
                         '[ \t\n\r]')) AS tok
                FROM anchors)
          WHERE strlen(tok) >= 2),
        acounts AS (SELECT tgt AS doc_id, word, COUNT(*) AS term_count
                    FROM atoks GROUP BY 1, 2),
        apost AS (SELECT doc_id, word, term_count,
                         CAST(SUM(term_count) OVER (PARTITION BY doc_id)
                              AS BIGINT) AS alen
                  FROM acounts),
        dfs AS (SELECT word, COUNT(DISTINCT doc_id) AS df
                FROM postings JOIN q USING (word) GROUP BY word),
        fields AS (
          SELECT doc_id, word, term_count / doc_len AS tf, 1.0 AS fweight
          FROM postings
          UNION ALL
          SELECT doc_id, word, term_count / alen AS tf, 1.5 AS fweight
          FROM apost),
        matched AS (
          SELECT f.doc_id, f.tf, f.fweight, COALESCE(dfs.df, 0) AS df
          FROM fields f JOIN q USING (word) LEFT JOIN dfs USING (word)),
        scored AS (
          SELECT doc_id,
                 SUM(fweight * tf
                     * ln((SELECT n_docs FROM n) / (1.0 + df))) AS score
          FROM matched GROUP BY doc_id),
        top AS (SELECT doc_id, score FROM scored
                ORDER BY score DESC, doc_id ASC LIMIT 100)
        SELECT t.doc_id, d.source AS title, ROUND(t.score, 6) AS score
        FROM top t JOIN documents d USING (doc_id)
    """.replace("{_P}", _POSTINGS_SQL),
        "bfs_depths": """
        WITH RECURSIVE ks AS (
          SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders),
        e AS (
          SELECT 'http://g.test/p/' || CAST(k AS VARCHAR) AS src,
                 'http://g.test/p/' || CAST(k + 1 AS VARCHAR) AS dst
          FROM ks WHERE k % 5 < 3
          UNION ALL
          SELECT 'http://g.test/p/' || CAST(k AS VARCHAR),
                 'http://g.test/p/' || CAST(k + 10 AS VARCHAR)
          FROM ks WHERE k % 7 = 0
          UNION ALL
          SELECT 'http://g.test/p/' || CAST(k AS VARCHAR),
                 'http://g.test/p/' || CAST(k - 20 AS VARCHAR)
          FROM ks WHERE k % 13 = 0 AND k >= 20),
        s AS (
          SELECT 'http://g.test/p/' || CAST(k AS VARCHAR) AS url
          FROM ks WHERE k % 101 = 0),
        r(url, depth) AS (
          SELECT url, CAST(0 AS BIGINT) FROM s
          UNION
          SELECT e.dst, r.depth + 1
          FROM r JOIN e ON e.src = r.url
          WHERE r.depth < 8)
        SELECT url, CAST(MIN(depth) AS BIGINT) AS depth
        FROM r GROUP BY url
    """,
    }
)

ORACLES_EXTRA.update(
    {
        "url_filter": f"""
        WITH f AS (
            SELECT 'http://'
                || (CASE WHEN o_orderkey % 23 = 0 THEN 'cdn.' ELSE '' END)
                || 'host' || CAST(o_custkey % {N_HOSTS} AS VARCHAR)
                || '.test/order/' || CAST(o_orderkey AS VARCHAR)
                || (CASE WHEN o_orderkey % 13 = 0 THEN '?ref=CasinoFun' ELSE '' END)
                || (CASE WHEN o_orderkey % 11 = 0 THEN '/cheap-pills' ELSE '' END)
                || (CASE WHEN o_orderkey % 17 = 0 THEN '/poker-night' ELSE '' END)
                || (CASE WHEN o_orderkey % 29 = 0 THEN '/live-webcam-hd' ELSE '' END)
                AS url
            FROM orders
        ), m AS (
            SELECT url,
                regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
                CAST((CASE WHEN contains(lower(url), 'casino') THEN 700 ELSE 0 END)
                   + (CASE WHEN contains(lower(url), 'pills') THEN 400 ELSE 0 END)
                   + (CASE WHEN contains(lower(url), 'poker') THEN 500 ELSE 0 END)
                   + (CASE WHEN contains(lower(url), 'webcam') THEN 900 ELSE 0 END)
                   + (CASE WHEN contains(lower(url), 'torrent') THEN 300 ELSE 0 END)
                  AS BIGINT) AS score_milli,
                CAST((CASE WHEN contains(lower(url), 'casino') THEN 1 ELSE 0 END)
                   + (CASE WHEN contains(lower(url), 'pills') THEN 1 ELSE 0 END)
                   + (CASE WHEN contains(lower(url), 'poker') THEN 1 ELSE 0 END)
                   + (CASE WHEN contains(lower(url), 'webcam') THEN 1 ELSE 0 END)
                   + (CASE WHEN contains(lower(url), 'torrent') THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hits
            FROM f
        ), b AS (
            SELECT *,
                CAST(CASE WHEN host = 'host3.test'
                       OR ends_with(host, '.host3.test')
                       OR host = 'host7.test'
                       OR ends_with(host, '.host7.test')
                     THEN 1 ELSE 0 END AS BIGINT) AS domain_blocked
            FROM m
        )
        SELECT url, host, score_milli, n_hits, domain_blocked,
            CAST(CASE WHEN domain_blocked = 1 OR score_milli >= 800
                 THEN 1 ELSE 0 END AS BIGINT) AS dropped
        FROM b
    """,
    }
)

# DUST alias-mining oracles: shared CTE chain (pages -> url parts ->
# positioned param occurrences -> residual lookup -> rules)
_DUST_CORE_SQL = r"""
    raw AS (
      SELECT DISTINCT
        'http://shop' || CAST(o_custkey % 7 AS VARCHAR) || '.test/item/'
          || CAST(o_orderkey % 500 AS VARCHAR)
          || '?id=' || CAST(o_orderkey % 500 AS VARCHAR)
          || (CASE WHEN o_orderkey % 3 = 0
              THEN '&sid=' || CAST(o_orderkey AS VARCHAR) ELSE '' END)
          || (CASE WHEN o_orderkey % 5 = 0
              THEN '&page=' || CAST(o_orderkey % 4 AS VARCHAR) ELSE '' END)
          AS url,
        CAST((o_orderkey % 500) * 7919
          + (CASE WHEN o_orderkey % 5 = 0
             THEN (o_orderkey % 4) * 13 ELSE 0 END) AS BIGINT) AS fp
      FROM orders),
    parts AS (
      SELECT url, fp,
        regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
        regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1)
          AS path,
        CASE WHEN contains(url, '?')
             THEN regexp_extract(url, '\?([^#]*)', 1) ELSE '' END AS qs
      FROM raw),
    kv AS (
      SELECT url, host, path, fp,
             unnest(string_split(qs, '&')) AS kvs,
             unnest(range(len(string_split(qs, '&')))) AS pos
      FROM parts WHERE qs <> ''),
    res AS (
      SELECT a.url, a.host, a.path, a.fp, a.pos, a.kvs,
             COALESCE(string_agg(b.kvs, '&' ORDER BY b.pos), '') AS rqs
      FROM kv a LEFT JOIN kv b ON b.url = a.url AND b.pos <> a.pos
      GROUP BY a.url, a.host, a.path, a.fp, a.pos, a.kvs),
    ev AS (
      SELECT r.host, string_split(r.kvs, '=')[1] AS param,
             CASE WHEN t.fp = r.fp THEN 1 ELSE 0 END AS evid,
             CASE WHEN t.fp <> r.fp THEN 1 ELSE 0 END AS cex
      FROM res r JOIN parts t
        ON t.host = r.host AND t.path = r.path AND t.qs = r.rqs),
    rules AS (
      SELECT host, param,
             CAST(SUM(evid) AS BIGINT) AS support,
             CAST(SUM(cex) AS BIGINT) AS counterexamples,
             CAST(CASE WHEN SUM(evid) >= 3 AND SUM(cex) = 0
                  THEN 1 ELSE 0 END AS BIGINT) AS strippable
      FROM ev GROUP BY host, param)
"""

ORACLES_EXTRA.update(
    {
        "dust_param_rules": f"""
        WITH {_DUST_CORE_SQL}
        SELECT host, param, support, counterexamples, strippable
        FROM rules
    """,
        "dust_apply": f"""
        WITH {_DUST_CORE_SQL},
        strip AS (SELECT host, param FROM rules WHERE strippable = 1),
        kept AS (
          SELECT k.url, k.pos, k.kvs
          FROM kv k LEFT JOIN strip s
            ON s.host = k.host AND s.param = string_split(k.kvs, '=')[1]
          WHERE s.host IS NULL),
        rebuilt AS (
          SELECT url, string_agg(kvs, '&' ORDER BY pos) AS new_qs
          FROM kept GROUP BY url),
        alias AS (
          SELECT p.url, p.host,
                 regexp_extract(p.url, '^([a-z][a-z0-9+.-]*)://', 1)
                   || '://' || p.host || p.path
                   || (CASE WHEN COALESCE(r.new_qs, '') <> ''
                       THEN '?' || r.new_qs ELSE '' END) AS alias_url
          FROM parts p LEFT JOIN rebuilt r USING (url))
        SELECT host, CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
               CAST(COUNT(DISTINCT alias_url) AS BIGINT) AS n_aliases
        FROM alias GROUP BY host
    """,
        "mirror_hosts": """
        WITH raw AS (
          SELECT DISTINCT
            'http://m' || CAST(o_custkey % 10 AS VARCHAR) || '.test/p/'
              || CAST(o_orderkey % 50 AS VARCHAR) AS url,
            CAST(CASE WHEN o_custkey % 10 >= 8
                 THEN (o_orderkey % 50) * 100 + (o_custkey % 10)
                 ELSE o_orderkey % 50 END AS BIGINT) AS fp
          FROM orders),
        sigs AS (
          SELECT DISTINCT
            regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
            regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1)
              AS sig,
            fp
          FROM raw),
        sizes AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS sz
                  FROM sigs GROUP BY host),
        pairs AS (
          SELECT a.host AS host_a, b.host AS host_b,
                 CAST(COUNT(*) AS BIGINT) AS shared
          FROM sigs a JOIN sigs b
            ON a.sig = b.sig AND a.fp = b.fp AND a.host < b.host
          GROUP BY 1, 2)
        SELECT host_a, host_b, shared, sa.sz AS size_a, sb.sz AS size_b,
               CAST((1000 * shared) // (sa.sz + sb.sz - shared)
                    AS BIGINT) AS resemblance_milli
        FROM pairs
        JOIN sizes sa ON sa.host = host_a
        JOIN sizes sb ON sb.host = host_b
        WHERE shared >= 20
          AND (1000 * shared) // (sa.sz + sb.sz - shared) >= 800
    """,
    }
)


ORACLES_EXTRA.update(
    {
        "autocomplete": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        vocab AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                  FROM postings GROUP BY word),
        p AS (SELECT unnest(['jo','qu','ta','zz']) AS prefix),
        cand AS (SELECT p.prefix, v.word, v.df
                 FROM vocab v JOIN p ON starts_with(v.word, p.prefix)),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY prefix ORDER BY df DESC, word ASC) AS rank
          FROM cand)
        SELECT prefix, word, df, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= 8
    """,
        "adaptive_politeness": """
        WITH ev AS (
          SELECT user_id, CAST(round(value * 1000) AS BIGINT) AS v
          FROM events),
        obs AS (
          SELECT 'h' || CAST(user_id % 40 AS VARCHAR) || '.test' AS host,
                 CAST(CASE WHEN user_id % 40 < 2 THEN v // 100
                      ELSE v * (1 + (user_id % 40) % 5) END
                   AS BIGINT) AS latency_ms
          FROM ev),
        agg AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_obs,
                       quantile_cont(latency_ms, 0.75) AS p75_ms
                FROM obs GROUP BY host),
        d AS (SELECT *,
                CAST(least(CAST(10000 AS BIGINT),
                     greatest(CAST(100 AS BIGINT),
                              CAST(floor(8 * p75_ms) AS BIGINT)))
                  AS BIGINT) AS delay_ms
              FROM agg)
        SELECT host, n_obs, p75_ms, delay_ms,
               greatest(CAST(1 AS BIGINT),
                        (delay_ms + 1000 - 1) // 1000) AS gap_rounds
        FROM d
    """,
    }
)


ORACLES_EXTRA.update(
    {
        "shard_plan": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          CAST(length(text) AS BIGINT) AS size
                   FROM documents),
        r AS (SELECT doc_id, size,
                     row_number() OVER (ORDER BY size DESC, doc_id ASC) - 1
                       AS rank
              FROM d),
        a AS (SELECT doc_id, size, CAST(rank % 8 AS BIGINT) AS shard FROM r),
        per AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
                       CAST(SUM(size) AS BIGINT) AS total_size
                FROM a GROUP BY shard)
        SELECT shard, n_docs, total_size,
               CAST((1000 * total_size * 8)
                    // (SELECT SUM(size) FROM a) AS BIGINT) AS load_milli
        FROM per
    """,
        "discovery_unseen_mass": """
        WITH s AS (
          SELECT 'h' || CAST(l_suppkey % 25 AS VARCHAR) || '.test' AS host,
                 'u' || CAST(l_partkey % 400 AS VARCHAR) AS url
          FROM lineitem),
        per_url AS (SELECT host, url, CAST(COUNT(*) AS BIGINT) AS n
                    FROM s GROUP BY host, url),
        per_host AS (
          SELECT host, CAST(SUM(n) AS BIGINT) AS n_obs,
                 CAST(COUNT(*) AS BIGINT) AS n_distinct,
                 CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1
          FROM per_url GROUP BY host)
        SELECT host, n_obs, n_distinct, f1,
               CAST((1000 * f1) // n_obs AS BIGINT) AS unseen_milli,
               CAST(CASE WHEN n_obs >= 20 AND (1000 * f1) // n_obs < 100
                    THEN 1 ELSE 0 END AS BIGINT) AS exhausted
        FROM per_host
    """,
        "epoch_shuffle": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents),
        k AS (SELECT doc_id,
                     ('0x' || substr(md5('shuffle:r3:'
                        || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS key
              FROM d)
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY key ASC, doc_id ASC) - 1
                    AS BIGINT) AS shuffle_pos
        FROM k
    """,
    }
)


ORACLES_EXTRA.update(
    {
        "ring_assign": f"""
        WITH hosts AS (
          SELECT DISTINCT 'host' || CAST(o_custkey % {N_HOSTS} AS VARCHAR)
                 || '.test' AS host
          FROM orders),
        ring AS (
          SELECT 'w' || CAST(t.w AS VARCHAR) AS worker,
                 ('0x' || substr(md5('ring:w' || CAST(t.w AS VARCHAR)
                    || ':' || CAST(u.v AS VARCHAR)), 1, 15))::BIGINT AS point
          FROM range(5) t(w), range(16) u(v)),
        h AS (SELECT host,
                     ('0x' || substr(md5('chhost:' || host), 1, 15))::BIGINT
                       AS hpoint
              FROM hosts),
        succ AS (
          SELECT host, worker FROM (
            SELECT h.host, r.worker,
                   row_number() OVER (
                     PARTITION BY h.host ORDER BY r.point, r.worker) AS rn
            FROM h JOIN ring r ON r.point >= h.hpoint)
          WHERE rn = 1),
        wrap AS (SELECT worker FROM ring ORDER BY point, worker LIMIT 1)
        SELECT h.host,
               COALESCE(s.worker, (SELECT worker FROM wrap)) AS worker
        FROM h LEFT JOIN succ s USING (host)
    """,
        "canonical_election": f"""
        WITH corpus AS ({_DUP_CORPUS_SQL}),
        m AS (SELECT md5(text) AS cluster_id, doc_id FROM corpus),
        t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
        q AS (SELECT doc_id,
                (1000 * least(len(toks), 200)
                 * (len(toks) - (len(toks) - len(list_distinct(toks))))
                 * (len(toks) + len(list_filter(toks,
                     x -> list_contains(
                       ['the','a','of','and','to','in','is'], x))))
                ) // (400 * len(toks) * len(toks)) AS q_milli
              FROM t),
        j AS (SELECT m.cluster_id, m.doc_id, q.q_milli AS score
              FROM m JOIN q USING (doc_id)),
        r AS (SELECT *, row_number() OVER (
                PARTITION BY cluster_id ORDER BY score DESC, doc_id ASC)
                AS rn
              FROM j)
        SELECT cluster_id, doc_id, CAST(score AS BIGINT) AS score,
               CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_kept
        FROM r
    """,
        "crawl_anomaly_iqr": """
        WITH c AS (
          SELECT 'h' || CAST(CASE WHEN (l_suppkey % 50) % 10 = 7 THEN 7
                             ELSE l_suppkey % 50 END AS VARCHAR)
                 || '.test' AS host,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM lineitem GROUP BY 1),
        q AS (SELECT quantile_cont(CAST(n AS DOUBLE), 0.25) AS q1,
                     quantile_cont(CAST(n AS DOUBLE), 0.75) AS q3
              FROM c)
        SELECT host, CAST(n AS DOUBLE) AS value, q.q1, q.q3,
               CAST(CASE WHEN n < q.q1 - 1500 * (q.q3 - q.q1) / 1000.0
                    THEN 1 ELSE 0 END AS BIGINT) AS is_low,
               CAST(CASE WHEN n > q.q3 + 1500 * (q.q3 - q.q1) / 1000.0
                    THEN 1 ELSE 0 END AS BIGINT) AS is_high
        FROM c, q
    """,
    }
)


ORACLES_EXTRA.update(
    {
        "curriculum_order": """
        WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          string_split(text, ' ') AS toks
                   FROM documents),
        q AS (SELECT doc_id,
                (1000 * least(len(toks), 200)
                 * (len(toks) - (len(toks) - len(list_distinct(toks))))
                 * (len(toks) + len(list_filter(toks,
                     x -> list_contains(
                       ['the','a','of','and','to','in','is'], x))))
                ) // (400 * len(toks) * len(toks)) AS score
              FROM t),
        th AS (SELECT quantile_cont(CAST(score AS DOUBLE), 0.25) AS t1,
                      quantile_cont(CAST(score AS DOUBLE), 0.50) AS t2,
                      quantile_cont(CAST(score AS DOUBLE), 0.75) AS t3
               FROM q),
        b AS (SELECT doc_id,
                CAST((CASE WHEN score <= th.t3 THEN 1 ELSE 0 END)
                   + (CASE WHEN score <= th.t2 THEN 1 ELSE 0 END)
                   + (CASE WHEN score <= th.t1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS bucket
              FROM q, th),
        k AS (SELECT doc_id, bucket,
                     ('0x' || substr(md5('cur:r3:'
                        || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
              FROM b),
        r AS (SELECT doc_id, bucket,
                     row_number() OVER (
                       PARTITION BY bucket ORDER BY h, doc_id) - 1 AS rk
              FROM k)
        SELECT doc_id, bucket,
               CAST(row_number() OVER (ORDER BY rk, bucket, doc_id) - 1
                    AS BIGINT) AS pos
        FROM r
    """,
        "vocab_growth": """
        WITH p AS (
          SELECT 'w' || CAST(o_orderkey % ((o_orderkey // 100) + 10)
                            AS VARCHAR) AS word,
                 o_orderkey // 1000 AS r
          FROM orders),
        first AS (SELECT word, MIN(r) AS first_round
                  FROM p GROUP BY word),
        per AS (SELECT CAST(first_round AS BIGINT) AS round,
                       CAST(COUNT(*) AS BIGINT) AS n_new
                FROM first GROUP BY first_round)
        SELECT 'corpus' AS host, round, n_new,
               CAST(SUM(n_new) OVER (
                 ORDER BY round ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS cum_urls
        FROM per
    """,
    }
)


ORACLES_EXTRA.update(
    {
        "budget_allocation": f"""
        WITH w AS (
          SELECT 'host' || CAST(o_custkey % {N_HOSTS} AS VARCHAR)
                 || '.test' AS host,
                 CAST(COUNT(*) AS BIGINT) AS weight
          FROM orders GROUP BY 1),
        t AS (SELECT SUM(weight) AS tw FROM w),
        s AS (SELECT host, weight,
                     (10000 * weight) // t.tw AS base,
                     (10000 * weight) % t.tw AS rem
              FROM w, t),
        l AS (SELECT 10000 - SUM(base) AS lo FROM s),
        r AS (SELECT *, row_number() OVER (
                ORDER BY rem DESC, host ASC) - 1 AS rk
              FROM s)
        SELECT host, weight,
               CAST(base + CASE WHEN rk < (SELECT lo FROM l)
                    THEN 1 ELSE 0 END AS BIGINT) AS budget
        FROM r
    """,
    }
)


ORACLES_EXTRA.update(
    {
        "budgeted_checkout": """
        WITH f AS ({_F}),
        w AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS weight
              FROM f GROUP BY host),
        t AS (SELECT SUM(weight) AS tw FROM w),
        s AS (SELECT host, weight,
                     (60 * weight) // t.tw AS base,
                     (60 * weight) % t.tw AS rem
              FROM w, t),
        l AS (SELECT 60 - SUM(base) AS lo FROM s),
        r AS (SELECT *, row_number() OVER (
                ORDER BY rem DESC, host ASC) - 1 AS rk
              FROM s),
        b AS (SELECT host,
                     base + CASE WHEN rk < (SELECT lo FROM l)
                            THEN 1 ELSE 0 END AS budget
              FROM r
              WHERE CAST(regexp_extract(host, 'host(\\d+)\\.test', 1)
                         AS BIGINT) % 5 <> 3),
        u AS (SELECT f.url, f.host, f.depth, f.seq,
                     COALESCE(b.budget, 2) AS eb
              FROM f LEFT JOIN b USING (host)
              WHERE f.state = 'unvisited'),
        ranked AS (SELECT *, row_number() OVER (
                     PARTITION BY host ORDER BY depth, seq) AS rk
                   FROM u)
        SELECT url, host, depth, seq,
               CAST(row_number() OVER (ORDER BY depth, seq) - 1 AS BIGINT)
                 AS fetch_order
        FROM ranked WHERE rk <= eb
    """.replace("{_F}", _FRONTIER_SQL),
    }
)


# --------------------------------------------------------------------------
# SURT/CDX web-archive index (operators/cdx.py) — engine addition.
# --------------------------------------------------------------------------


def _cdx_captures(spark, sf_dir):
    """Deterministic capture log from lineitem: each lineitem is one
    capture of its order's URL at ts = linenumber (1..7), so most URLs
    have several captures; digest = md5(url#ts) in both engines."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    k = F.col("l_orderkey").cast("long")
    url = F.concat(
        F.lit("http://host"), (k % N_HOSTS).cast("string"),
        F.lit(".test/order/"), k.cast("string"),
    )
    ts = F.col("l_linenumber").cast("long")
    return li.select(
        url.alias("url"),
        ts.alias("ts"),
        F.lit(200).cast("int").alias("status"),
        F.md5(F.concat(url, F.lit("#"), ts.cast("string"))).alias("digest"),
    )


def _q_surt_keys(spark, sf_dir):
    """SURT canonical key (operators/cdx.py:surt_expr) over an
    alias-heavy URL mix: mixed case, a WWW. prefix (k%2), default port
    :80 (k%5) and non-default :8080 (k%7, kept), a fragment (k%11,
    dropped), and out-of-order query params (k%3, sorted). Pure
    Catalyst in Spark; the oracle re-derives the same string pipeline
    step-for-step in DuckDB."""
    from see_spark.operators.cdx import surt_expr

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey").cast("long")
    url = F.concat(
        F.lit("http://"),
        F.when(k % 2 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("Host"), (k % N_HOSTS).cast("string"), F.lit(".Test"),
        F.when(k % 5 == 0, F.lit(":80"))
        .when(k % 7 == 0, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.lit("/Order/"), k.cast("string"),
        F.when(k % 3 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("")),
        F.when(k % 11 == 0, F.lit("#Frag")).otherwise(F.lit("")),
    )
    return o.select(url.alias("url"), surt_expr(url))


def _q_cdx_latest(spark, sf_dir):
    """Wayback 'current version' lookup: build the range-sorted CDX
    index from the capture log, then one window keyed on surt picks the
    newest capture (ts desc, digest/url pinned ties)
    (operators/cdx.py:cdx_latest)."""
    from see_spark.operators.cdx import build_cdx, cdx_latest

    cdx = build_cdx(_cdx_captures(spark, sf_dir))
    return cdx_latest(cdx).select("surt", "ts", "url", "status", "digest")


def _q_cdx_prefix_lookup(spark, sf_dir):
    """Prefix scan over the CDX index — every capture of host7's subtree
    in capture order (operators/cdx.py:cdx_prefix). StartsWith pushes to
    the scan; on the materialized range-sorted index the file min/max
    surt stats prune to the prefix interval."""
    from see_spark.operators.cdx import build_cdx, cdx_prefix

    cdx = build_cdx(_cdx_captures(spark, sf_dir))
    return cdx_prefix(cdx, "test,host7)").select(
        "surt", "ts", "url", "status", "digest"
    )


def _q_focused_priority(spark, sf_dir):
    """Focused-crawl best-first priorities (operators/focused.py:
    shark_priorities — shark-search, Hersovici et al. WWW'98): parent
    relevance decays 0.5 per hop and anchor text mentioning a topic word
    adds a flat bonus; per discovered URL the MAX over incoming links
    wins. Parents are order URLs scored (k*37)%1000; links are lineitems
    pointing at part URLs with the part NAME as anchor text (TPC-H part
    names are lowercase color words, so 'green'/'blue'/'ivory' genuinely
    hit). Integer milli math in both engines."""
    from see_spark.operators.focused import shark_priorities

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    k = F.col("l_orderkey").cast("long")
    links = li.join(part, li["l_partkey"] == part["p_partkey"]).select(
        F.concat(
            F.lit("http://host"), (k % N_HOSTS).cast("string"),
            F.lit(".test/order/"), k.cast("string"),
        ).alias("src_url"),
        F.concat(
            F.lit("http://host"),
            (F.col("l_suppkey").cast("long") % 50).cast("string"),
            F.lit(".test/part/"), F.col("l_partkey").cast("string"),
        ).alias("dst_url"),
        F.col("p_name").alias("anchor"),
    )
    ok = F.col("o_orderkey").cast("long")
    parents = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.concat(
            F.lit("http://host"), (ok % N_HOSTS).cast("string"),
            F.lit(".test/order/"), ok.cast("string"),
        ).alias("url"),
        ((ok * 37) % 1000).alias("score_milli"),
    )
    return shark_priorities(
        parents, links, ["green", "blue", "ivory"],
        decay_milli=500, anchor_bonus_milli=200,
    )


def _q_host_span_mix(spark, sf_dir):
    """Per-host interleaved-payload composition (input_hint contract:
    spans of kind text/title/link/media): parse the synthesized HTML
    corpus into text/title/link spans, interleave MEDIA documents the
    way the crawl's state router stores them — a media fetch is one
    document with a single kind='media' span (operators/crawl.py) —
    every 2nd text doc gets a sibling media doc, every 5th a second
    one, then aggregate span-kind counts per host. Media ratio in
    integer milli math. One combinable shuffle keyed by host; the parse
    is the same Arrow-batched kernel as parse_spans (core/htmlx.py,
    see_html.erl:39-52 semantics)."""
    from see_spark.functions.udfs import parse_html_udf

    docs = _documents(spark, sf_dir).filter(F.col("doc_id") < 300)
    d = F.col("doc_id").cast("long")
    host = F.concat(F.lit("host"), (d % 11).cast("string"), F.lit(".test"))
    html = F.concat(
        F.lit("<html><title>doc "), d.cast("string"),
        F.lit("</title><body>"), F.col("text"),
        F.lit(' <a href="http://x.test/'), d.cast("string"),
        F.lit('">anchor</a></body></html>'),
    )
    parsed = (
        docs.select(
            host.alias("host"), d.alias("doc_id"),
            parse_html_udf(html).alias("p"),
        )
        .select("host", "doc_id", F.explode("p.spans").alias("s"))
        .select("host", "doc_id", F.col("s.kind").alias("kind"))
    )
    media = (
        docs.filter(d % 2 == 0)
        .select(host.alias("host"), (d + 1000).alias("doc_id"),
                F.lit("media").alias("kind"))
        .unionByName(
            docs.filter(d % 5 == 0).select(
                host.alias("host"), (d + 2000).alias("doc_id"),
                F.lit("media").alias("kind"),
            )
        )
    )
    spans = parsed.unionByName(media)
    return spans.groupBy("host").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum(F.when(F.col("kind") == "title", 1).otherwise(0))
        .cast("long").alias("n_title"),
        F.sum(F.when(F.col("kind") == "text", 1).otherwise(0))
        .cast("long").alias("n_text"),
        F.sum(F.when(F.col("kind") == "link", 1).otherwise(0))
        .cast("long").alias("n_link"),
        F.sum(F.when(F.col("kind") == "media", 1).otherwise(0))
        .cast("long").alias("n_media"),
    ).withColumn(
        "media_per_doc_milli",
        F.expr("(n_media * 1000) div n_docs").cast("long"),
    )


def _q_retrieval_metrics(spark, sf_dir):
    """TREC-style relevance harness (operators/evaluation.py:
    retrieval_metrics): per-query precision@10 / recall@10 / MRR /
    NDCG@10 over a deterministic (results, qrels) pair — 17 synthetic
    queries whose ranked lists are the orders partitioned by k%17 and
    whose graded judgments cover every third order. NDCG uses the
    Järvelin-Kekäläinen (2^rel-1)/log2(rank+1) form in both engines."""
    from see_spark.operators.evaluation import retrieval_metrics

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey").cast("long")
    url = F.concat(F.lit("http://host"), (k % N_HOSTS).cast("string"),
                   F.lit(".test/order/"), k.cast("string"))
    base = o.select((k % 17).alias("query_id"), url.alias("url"),
                    k.alias("__k"))
    w = Window.partitionBy("query_id").orderBy("__k")
    results = base.select(
        "query_id", "url", F.row_number().over(w).cast("long").alias("rank")
    )
    qrels = base.filter(F.col("__k") % 3 == 0).select(
        "query_id", "url",
        ((F.expr("__k div 3") % 3) + 1).alias("rel"),
    )
    return retrieval_metrics(results, qrels, k=10)


def _segments(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey").cast("long")
    return o.select(
        k.alias("segment_id"),
        ((k * 7919) % 100000 + 1).alias("size_bytes"),
    )


def _q_segment_merge_plan(spark, sf_dir):
    """Tiered index-compaction planning (operators/segments.py:
    plan_merges — Lucene TieredMergePolicy / LSM size-tiering): per-round
    postings segments bucket into exact decimal-digit size tiers, chunk
    merge_factor=4 at a time (size desc, id), and only FULL groups merge.
    Pure window math over segment METADATA."""
    from see_spark.operators.segments import plan_merges

    return plan_merges(_segments(spark, sf_dir), merge_factor=4)


def _q_segment_merge_audit(spark, sf_dir):
    """Write-amplification audit of the same plan (operators/segments.py:
    merge_amplification): segment counts before/after and integer-milli
    rewrite fraction — the compaction cost model the driver logs."""
    from see_spark.operators.segments import merge_amplification, plan_merges

    return merge_amplification(plan_merges(_segments(spark, sf_dir), 4))


def _q_doc_keywords(spark, sf_dir):
    """Per-document top-3 tf-idf keywords (operators/indexer.py:
    doc_keywords): index-time summarization with the reference idf form
    (negative idf sinks ubiquitous words, see_rank_tfidf.erl semantics);
    ties pinned (score desc, word asc)."""
    from see_spark.operators.indexer import doc_keywords

    n = _documents(spark, sf_dir).count()
    return doc_keywords(_doc_postings_tf(spark, sf_dir), n, k=3)


def _q_pld_rollup(spark, sf_dir):
    """Registrable-domain rollup (operators/pld.py — the public-suffix
    grouping real crawlers budget by): a host mix covering two-label
    suffixes (co.uk), one-label suffixes (com/test), unknown TLDs
    (pinned two-label fallback), and single-label hosts, rolled up to
    (pld, n_hosts, weight)."""
    from see_spark.operators.pld import pld_rollup

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey").cast("long")
    host = (
        F.when(k % 5 == 0,
               F.concat(F.lit("sub"), (k % 3).cast("string"), F.lit(".shop"),
                        (k % 20).cast("string"), F.lit(".co.uk")))
        .when(k % 5 == 1,
              F.concat(F.lit("www.site"), (k % 30).cast("string"),
                       F.lit(".com")))
        .when(k % 5 == 2,
              F.concat(F.lit("a.b.host"), (k % 11).cast("string"),
                       F.lit(".test")))
        .when(k % 5 == 3,
              F.concat(F.lit("cdn"), (k % 7).cast("string"), F.lit(".weird"),
                       (k % 4).cast("string"), F.lit(".zz")))
        .otherwise(F.lit("single"))
    )
    return pld_rollup(o.select(host.alias("host")))


def _q_segment_skip(spark, sf_dir):
    """Segment skipping audit (operators/segments.py:segment_skip_audit):
    postings bucketed into 16 round-segments by doc_id; the search-suite
    query words decide which segments a query must open (can_skip /
    has_all_words arms both fire at corpus scale)."""
    from see_spark.operators.segments import segment_skip_audit

    seg = _doc_postings(spark, sf_dir).select(
        (F.col("doc_id") % 16).cast("long").alias("segment_id"), "word"
    )
    return segment_skip_audit(seg, _SEARCH_WORDS)


def _q_embedding_audit(spark, sf_dir):
    """Pre-ANN corpus audit (operators/similarity.py:embedding_audit):
    zero vectors injected at vec_id%97==0 and NaNs at vec_id%101==0 so
    every arm fires; norm stats computed over FINITE rows only with
    per-row micro quantization before the exact integer mean."""
    from see_spark.operators.similarity import embedding_audit

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vid = F.col("vec_id").cast("long")
    aug = e.select(
        vid.alias("vec_id"),
        F.when(
            vid % 97 == 0,
            F.transform("embedding", lambda x: F.lit(0.0).cast("float")),
        )
        .when(
            vid % 101 == 0,
            F.concat(
                F.array(F.lit(float("nan")).cast("float")),
                F.slice("embedding", 2, 63),
            ),
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    return embedding_audit(aug)


def _q_readability(spark, sf_dir):
    """Flesch-Kincaid grade (operators/textstats.py:readability) in
    integer milli over the corpus — punctuation injected every 4th doc
    so the sentence count genuinely varies."""
    from see_spark.operators.textstats import readability

    d = _documents(spark, sf_dir)
    k = F.col("doc_id").cast("long")
    aug = d.select(
        k.alias("doc_id"),
        F.when(
            k % 4 == 0,
            F.concat(F.col("text"), F.lit(". Short tail! Done?")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return readability(aug)


def _q_percolate(spark, sf_dir):
    """Prospective search (operators/search.py:percolate): 40 standing
    conjunctive subscriptions (1-3 words each, drawn deterministically
    from the corpus vocabulary by df rank so matches genuinely occur)
    against the round's postings delta; only full AND matches emit."""
    from see_spark.operators.search import percolate

    postings = _doc_postings(spark, sf_dir).select("doc_id", "word")
    top_words = (
        postings.groupBy("word")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("df"), F.asc("word"))
        .limit(30)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("df"), F.asc("word"))
            ).cast("long"),
        )
    )
    qids = spark.range(40).select(
        F.col("id").cast("long").alias("query_id"),
        F.explode(
            F.array_distinct(
                F.array(
                    (F.col("id") % 30) + 1,
                    ((F.col("id") * 7) % 30) + 1,
                    ((F.col("id") * 13) % 30) + 1,
                )
            )
        ).alias("rk"),
    )
    standing = qids.join(top_words.select("rk", "word"), "rk").select(
        "query_id", "word"
    )
    return percolate(postings, standing)


def _q_pld_budgets(spark, sf_dir):
    """Two-level Hamilton budget apportionment (operators/pld.py:
    allocate_budget_by_pld): global budget -> registrable domains by
    summed weight -> hosts within each domain; sum(budget) == total
    exactly. Host mix reuses the pld_rollup arms (co.uk / com / test
    suffixes) with per-host weights = order counts; total = 5000."""
    from see_spark.operators.pld import allocate_budget_by_pld

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey").cast("long")
    host = (
        F.when(k % 3 == 0,
               F.concat(F.lit("sub"), (k % 4).cast("string"), F.lit(".shop"),
                        (k % 9).cast("string"), F.lit(".co.uk")))
        .when(k % 3 == 1,
              F.concat(F.lit("www.site"), (k % 13).cast("string"),
                       F.lit(".com")))
        .otherwise(
            F.concat(F.lit("a.host"), (k % 6).cast("string"), F.lit(".test"))
        )
    )
    hw = (
        o.select(host.alias("host"))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("weight"))
    )
    return allocate_budget_by_pld(hw, 5000)


def _q_link_farms(spark, sf_dir):
    """Link-farm detection (operators/linkgraph.py:link_farm_scores):
    hosts whose outlinks concentrate on one beneficiary get flagged.
    Synthesized edges make every 5th source host point 80-90% at a
    single target (the farm arm) while the rest spread over 60 targets;
    both flag arms and the min-evidence guard fire."""
    from see_spark.operators.linkgraph import link_farm_scores

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sk = F.col("l_suppkey").cast("long")
    ok = F.col("l_orderkey").cast("long")
    pk = F.col("l_partkey").cast("long")
    src = F.concat(F.lit("s"), (sk % 40).cast("string"), F.lit(".test"))
    dst = F.when(
        ((sk % 40) % 5 == 0) & (ok % 10 < 9),
        F.concat(F.lit("beneficiary"), ((sk % 40) % 3).cast("string"),
                 F.lit(".test")),
    ).otherwise(
        F.concat(F.lit("d"), (pk % 60).cast("string"), F.lit(".test"))
    )
    edges = li.select(src.alias("src_host"), dst.alias("dst_host"))
    return link_farm_scores(edges, min_links=10, share_threshold_milli=800)


def _q_trustrank(spark, sf_dir):
    """TrustRank (operators/linkgraph.py:trustrank — Gyongyi et al.
    VLDB'04): seed-personalized PageRank over the synthetic expander;
    every 10th doc is a trusted seed, dangling mass teleports to seeds.
    Oracle = the unrolled power method, term-for-term."""
    from see_spark.operators.linkgraph import synthetic_edges, trustrank

    docs = _documents(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    seeds = nodes.filter(F.col("node") % 10 == 0)
    return trustrank(nodes, synthetic_edges(docs), seeds, n_iter=5)


def _trustrank_oracle_sql(n_iter: int = 5, d: float = 0.85) -> str:
    """Unrolled seed-personalized power method, term-for-term the
    expression trustrank() evaluates (same IEEE op order)."""
    ctes = [
        _LINKGRAPH_SQL,
        "sm AS (SELECT COUNT(*) AS m FROM nodes WHERE node % 10 = 0)",
        "tl AS (SELECT node, CASE WHEN node % 10 = 0"
        " THEN 1.0/(SELECT m FROM sm) ELSE 0.0 END AS tele FROM nodes)",
        "r0 AS (SELECT node, tele AS rank FROM tl)",
    ]
    for i in range(1, n_iter + 1):
        p = f"r{i-1}"
        ctes.append(
            f"d{i} AS (SELECT COALESCE(SUM(r.rank), 0.0) AS dang FROM {p} r"
            f" LEFT JOIN outdeg o ON o.src = r.node WHERE o.src IS NULL)"
        )
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node, SUM(r.rank / o.deg) AS contrib"
            f" FROM edges e JOIN {p} r ON e.src = r.node"
            f" JOIN outdeg o ON o.src = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i} AS (SELECT b.node,"
            f" (1.0 - {d}) * b.tele"
            f" + {d} * (COALESCE(c.contrib, 0.0)"
            f" + (SELECT dang FROM d{i}) * b.tele) AS rank"
            f" FROM tl b LEFT JOIN c{i} c ON c.node = b.node)"
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, ROUND(rank, 9) AS rank FROM r{n_iter}"
    )


def _q_search_collapse(spark, sf_dir):
    """SERP duplicate collapse (operators/search.py:collapse_duplicates)
    over the OR-ranked top-100: each result maps to its exact-dup
    canonical (md5 groups — the corpus genuinely contains dups), the
    best-scoring member represents its cluster, then the page re-cuts
    to 20. Oracle composes the proven search_or + md5-group fragments."""
    from see_spark.operators.dedup import exact_dedup
    from see_spark.operators.search import collapse_duplicates, search_or

    docs = _documents(spark, sf_dir)
    res = search_or(
        spark,
        " ".join(_SEARCH_WORDS),
        _doc_postings_tf(spark, sf_dir),
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("source").alias("title"),
        ),
        docs.count(),
    ).select(F.col("url").cast("long").alias("url"), "score")
    dmap = (
        exact_dedup(
            docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        )
        .withColumn(
            "canonical_id",
            F.min("doc_id").over(Window.partitionBy("text_hash")),
        )
        .select("doc_id", "canonical_id")
    )
    return collapse_duplicates(res, dmap, k=20).select(
        F.col("url").alias("doc_id"), "canonical_id", "score"
    )


def _q_sitemap_coverage(spark, sf_dir):
    """Sitemap-coverage audit (operators/robots.py:sitemap_coverage):
    per host, declared URLs vs discovered (in frontier) vs fetched
    (visited) in integer milli — even orders are declared AND in the
    frontier, every third key declares an /extra/ URL the crawl never
    discovered, so all three ratios separate."""
    from see_spark.operators.robots import sitemap_coverage

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey").cast("long")
    h = (F.col("o_custkey").cast("long") % N_HOSTS).cast("string")
    host = F.concat(F.lit("host"), h, F.lit(".test"))
    in_frontier = o.filter(k % 2 == 0).select(
        host.alias("host"),
        F.concat(F.lit("http://host"), h, F.lit(".test/order/"),
                 k.cast("string")).alias("url"),
    )
    extra = o.filter(k % 3 == 0).select(
        host.alias("host"),
        F.concat(F.lit("http://host"), h, F.lit(".test/extra/"),
                 k.cast("string")).alias("url"),
    )
    declared = in_frontier.unionByName(extra)
    return sitemap_coverage(declared, _orders_frontier(spark, sf_dir))


def _q_hot_terms(spark, sf_dir):
    """Hot-tier dictionary plan (operators/indexstats.py:
    hot_term_cache_plan): smallest term prefix covering 80% of accesses
    goes RAM-resident. Access log synthesized with genuine skew (even
    keys concentrate on 7 words) so the hot/cold boundary is interior."""
    from see_spark.operators.indexstats import hot_term_cache_plan

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey").cast("long")
    wid = F.when(k % 2 == 0, k % 7).otherwise(k % 150)
    access = (
        o.select(F.concat(F.lit("w"), wid.cast("string")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n_queries"))
    )
    return hot_term_cache_plan(access, hot_mass_milli=800)


def _q_zipf_fit(spark, sf_dir):
    """Zipf rank-frequency slope over the corpus term distribution
    (operators/indexstats.py:zipf_fit): least-squares over integer
    milli-nat quantized (ln rank, ln freq) — every sum exact int64, so
    the fit is engine- and partitioning-exact."""
    from see_spark.operators.indexstats import zipf_fit

    return zipf_fit(_doc_postings(spark, sf_dir), top_n=300)


def _q_feed_seeds(spark, sf_dir):
    """RSS/Atom feed ingestion (operators/robots.py:feed_seed_urls):
    even docs render an RSS channel (text links: channel + variable
    item count), odd docs an Atom feed (rel=self / rel=hub /
    rel=enclosure excluded; rel-less + rel=alternate + entry links
    kept), and the oracle enumerates the expected URLs CLOSED-FORM from
    the construction — independent of the extraction regexes."""
    from see_spark.operators.robots import feed_seed_urls

    docs = _documents(spark, sf_dir).filter(F.col("doc_id") < 100)
    d = F.col("doc_id").cast("long")
    h = (d % 7).cast("string")
    base = F.concat(F.lit("http://host"), h, F.lit(".test"))
    feed_url = F.concat(base, F.lit("/feed/"), d.cast("string"))
    items = F.array_join(
        F.transform(
            F.sequence(F.lit(0), (d % 3).cast("int")),
            lambda i: F.concat(
                F.lit("<item><link>"), base, F.lit("/art/"),
                d.cast("string"), F.lit("-"), i.cast("string"),
                F.lit("</link></item>"),
            ),
        ),
        "",
    )
    rss_body = F.concat(
        F.lit("<rss><channel><link>"), base, F.lit("/</link>"),
        items, F.lit("</channel></rss>"),
    )
    entries = F.array_join(
        F.transform(
            F.sequence(F.lit(0), (d % 3).cast("int")),
            lambda i: F.concat(
                F.lit('<entry><link href="'), base, F.lit("/art/"),
                d.cast("string"), F.lit("-"), i.cast("string"),
                F.lit('"/></entry>'),
            ),
        ),
        "",
    )
    atom_body = F.concat(
        F.lit('<feed><link rel="self" href="'), feed_url, F.lit('"/>'),
        F.lit('<link rel="hub" href="http://hub.test/"/>'),
        F.lit('<link href="'), base, F.lit('/front"/>'),
        F.lit('<link rel="alternate" href="'), base, F.lit('/alt"/>'),
        F.lit('<link rel="enclosure" href="'), base,
        F.lit('/media.mp3"/>'),
        entries, F.lit("</feed>"),
    )
    feeds = docs.select(
        feed_url.alias("url"),
        F.when(d % 2 == 0, rss_body).otherwise(atom_body).alias("body"),
    )
    return feed_seed_urls(feeds)


def _q_rel_canonical(spark, sf_dir):
    """Publisher-declared alias edges (operators/urlalias.py:
    rel_canonical_edges, RFC 6596): HTML synthesized with all arms —
    absolute cross-host canonicals, self-canonicals, root-relative
    (resolved to the page origin), bare-relative (unresolved -> NULL +
    audit flag), attribute-order-swapped tags, and tag-less pages (no
    row). The oracle derives the expected edges CLOSED-FORM from the
    construction — independent of the extraction regexes."""
    from see_spark.operators.urlalias import rel_canonical_edges

    docs = _documents(spark, sf_dir).filter(F.col("doc_id") < 300)
    d = F.col("doc_id").cast("long")
    page = F.concat(
        F.lit("http://host"), (d % 11).cast("string"), F.lit(".test/doc/"),
        d.cast("string"),
    )
    href = (
        F.when((d % 3 == 0) & (d % 4 == 0), page)
        .when(d % 3 == 0,
              F.concat(F.lit("http://canon.test/c/"),
                       F.expr("CAST(doc_id AS BIGINT) div 3").cast("string")))
        .when((d % 3 == 1) & (d % 7 == 1),
              F.concat(F.lit("c/"), d.cast("string")))
        .when(d % 3 == 1, F.concat(F.lit("/c/"), d.cast("string")))
        .otherwise(F.lit(None))
    )
    tag = F.when(
        d % 5 == 0,
        F.concat(F.lit('<link href="'), href, F.lit('" rel="canonical">')),
    ).otherwise(
        F.concat(F.lit('<link rel="canonical" href="'), href, F.lit('">'))
    )
    html = F.concat(
        F.lit("<html><head>"), F.coalesce(tag, F.lit("")),
        F.lit("</head><body>"), F.col("text"), F.lit("</body></html>"),
    )
    raw = docs.select(page.alias("url"), html.alias("body"))
    return rel_canonical_edges(raw)


def _q_politeness_audit(spark, sf_dir):
    """Politeness COMPLIANCE audit (operators/robots.py:
    politeness_audit): per-host smallest observed fetch gap vs the
    promised crawl-delay, violation counts, compliance flag — the
    governance check over an executed fetch log. Synthesized log has
    genuine collisions (modular timestamps) so both violation arms
    fire."""
    from see_spark.operators.robots import politeness_audit

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    hn = (F.col("l_suppkey").cast("long") % 29)
    log = li.select(
        F.concat(F.lit("h"), hn.cast("string"), F.lit(".test")).alias("host"),
        (
            (F.col("l_orderkey").cast("long") * 13
             + F.col("l_linenumber").cast("long") * 7) % 100000
        ).alias("fetch_ts"),
    )
    delays = spark.range(29).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".test"))
        .alias("host"),
        ((F.col("id") % 5 + 1) * 3).alias("min_gap"),
    )
    return politeness_audit(log, delays)


def _q_related_terms(spark, sf_dir):
    """PMI query expansion (operators/lexicon.py:related_terms — Church
    & Hanks 1990): top-5 document-level co-occurrence partners per
    search-suite seed word, min_df=2 guarding the rare-word PMI
    inflation; ties pinned (pmi desc, word asc)."""
    from see_spark.operators.lexicon import related_terms

    n = _documents(spark, sf_dir).count()
    return related_terms(
        _doc_postings(spark, sf_dir), _SEARCH_WORDS, n, min_df=2, k=5
    )


def _q_lsh_eval(spark, sf_dir):
    """Dedup-config quality audit (operators/dedup.py:lsh_eval): recall
    and candidate precision of the 16-hash/4-band MinHash banding vs the
    exact all-pairs Jaccard truth at the same threshold — the offline
    measurement that sizes (num_hashes, bands) before a 100 TB run."""
    from see_spark.operators.dedup import lsh_eval

    return lsh_eval(
        _documents(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ),
        num_hashes=16, bands=4, n=3, threshold=0.1,
    )


QUERIES_EXTRA.update(
    {
        "lsh_eval": _q_lsh_eval,
        "doc_keywords": _q_doc_keywords,
        "related_terms": _q_related_terms,
        "politeness_audit": _q_politeness_audit,
        "rel_canonical": _q_rel_canonical,
        "feed_seeds": _q_feed_seeds,
        "zipf_fit": _q_zipf_fit,
        "sitemap_coverage": _q_sitemap_coverage,
        "hot_terms": _q_hot_terms,
        "search_dedup_collapse": _q_search_collapse,
        "trustrank_synth": _q_trustrank,
        "link_farm_scores": _q_link_farms,
        "pld_rollup": _q_pld_rollup,
        "pld_budgets": _q_pld_budgets,
        "percolate_standing": _q_percolate,
        "readability_fk": _q_readability,
        "embedding_audit": _q_embedding_audit,
        "segment_skip_audit": _q_segment_skip,
        "surt_keys": _q_surt_keys,
        "cdx_latest": _q_cdx_latest,
        "cdx_prefix_lookup": _q_cdx_prefix_lookup,
        "focused_priority": _q_focused_priority,
        "retrieval_metrics": _q_retrieval_metrics,
        "host_span_mix": _q_host_span_mix,
        "segment_merge_plan": _q_segment_merge_plan,
        "segment_merge_audit": _q_segment_merge_audit,
    }
)

_CDX_CAPTURES_SQL = f"""
    cap AS (
      SELECT 'http://host' || CAST(l_orderkey % {N_HOSTS} AS VARCHAR)
             || '.test/order/' || CAST(l_orderkey AS VARCHAR) AS url,
             CAST(l_linenumber AS BIGINT) AS ts,
             CAST(200 AS INTEGER) AS status
      FROM lineitem),
    capd AS (
      SELECT url, ts, status,
             md5(url || '#' || CAST(ts AS VARCHAR)) AS digest,
             'test,host' || CAST(CAST(regexp_extract(url,
                 'host(\\d+)\\.test', 1) AS BIGINT) AS VARCHAR)
             || ')/order/' || regexp_extract(url, '/order/(\\d+)$', 1)
               AS surt
      FROM cap)
"""

ORACLES_EXTRA.update(
    {
        "surt_keys": f"""
        WITH urls AS (
          SELECT 'http://'
                 || CASE WHEN o_orderkey % 2 = 0 THEN 'WWW.' ELSE '' END
                 || 'Host' || CAST(o_orderkey % {N_HOSTS} AS VARCHAR)
                 || '.Test'
                 || CASE WHEN o_orderkey % 5 = 0 THEN ':80'
                         WHEN o_orderkey % 7 = 0 THEN ':8080'
                         ELSE '' END
                 || '/Order/' || CAST(o_orderkey AS VARCHAR)
                 || CASE WHEN o_orderkey % 3 = 0 THEN '?b=2&a=1'
                         ELSE '' END
                 || CASE WHEN o_orderkey % 11 = 0 THEN '#Frag'
                         ELSE '' END AS url
          FROM orders),
        s1 AS (SELECT url,
                      regexp_replace(regexp_replace(url,
                        '^[A-Za-z][A-Za-z0-9+.\\-]*://', ''),
                        '#.*$', '') AS rest
               FROM urls),
        s2 AS (SELECT url, rest,
                      lower(regexp_extract(rest, '^([^/?]*)', 1)) AS auth
               FROM s1),
        s3 AS (SELECT url,
                      substring(rest, 1 + length(auth)) AS pathq,
                      regexp_extract(auth, ':(\\d+)$', 1) AS port,
                      regexp_replace(regexp_replace(auth,
                        ':\\d+$', ''), '^www\\.', '') AS host
               FROM s2),
        s4 AS (SELECT url,
                      array_to_string(list_reverse(
                        string_split(host, '.')), ',')
                      || (CASE WHEN port IN ('', '80', '443') THEN ''
                               ELSE ':' || port END) AS rev,
                      lower(regexp_extract(pathq, '^([^?]*)', 1)) AS p,
                      regexp_extract(pathq, '^[^?]*\\?(.*)$', 1) AS q
               FROM s3)
        SELECT url,
               rev || ')'
               || (CASE WHEN p = '' THEN '/' ELSE p END)
               || (CASE WHEN q = '' THEN ''
                        ELSE '?' || array_to_string(
                          list_sort(string_split(q, '&')), '&') END)
                 AS surt
        FROM s4
    """,
        "cdx_latest": f"""
        WITH {_CDX_CAPTURES_SQL},
        r AS (SELECT surt, ts, url, status, digest,
                     row_number() OVER (
                       PARTITION BY surt
                       ORDER BY ts DESC, digest DESC, url ASC) AS rk
              FROM capd)
        SELECT surt, ts, url, status, digest FROM r WHERE rk = 1
    """,
        "cdx_prefix_lookup": f"""
        WITH {_CDX_CAPTURES_SQL}
        SELECT surt, ts, url, status, digest
        FROM capd
        WHERE surt LIKE 'test,host7)%'
        ORDER BY surt, ts, digest
    """,
        "focused_priority": f"""
        WITH l AS (
          SELECT 'http://host' || CAST(l_orderkey % {N_HOSTS} AS VARCHAR)
                 || '.test/order/' || CAST(l_orderkey AS VARCHAR) AS src_url,
                 'http://host' || CAST(l_suppkey % 50 AS VARCHAR)
                 || '.test/part/' || CAST(l_partkey AS VARCHAR) AS dst_url,
                 p_name AS anchor
          FROM lineitem JOIN part ON p_partkey = l_partkey),
        p AS (
          SELECT 'http://host' || CAST(o_orderkey % {N_HOSTS} AS VARCHAR)
                 || '.test/order/' || CAST(o_orderkey AS VARCHAR) AS url,
                 (o_orderkey * 37) % 1000 AS score_milli
          FROM orders),
        j AS (
          SELECT l.dst_url,
                 (500 * p.score_milli) // 1000
                 + 200 * len(list_intersect(
                     string_split(lower(l.anchor), ' '),
                     ['green', 'blue', 'ivory'])) AS pri
          FROM l JOIN p ON p.url = l.src_url)
        SELECT dst_url AS url,
               CAST(MAX(pri) AS BIGINT) AS priority_milli,
               CAST(COUNT(*) AS BIGINT) AS n_parents
        FROM j GROUP BY dst_url
    """,
        "retrieval_metrics": f"""
        WITH base AS (
          SELECT o_orderkey % 17 AS query_id,
                 'http://host' || CAST(o_orderkey % {N_HOSTS} AS VARCHAR)
                 || '.test/order/' || CAST(o_orderkey AS VARCHAR) AS url,
                 o_orderkey AS k
          FROM orders),
        results AS (
          SELECT query_id, url,
                 row_number() OVER (PARTITION BY query_id ORDER BY k)
                   AS rank
          FROM base),
        qrels AS (
          SELECT query_id, url, ((k // 3) % 3) + 1 AS rel
          FROM base WHERE k % 3 = 0),
        judged AS (
          SELECT r.query_id, r.rank, COALESCE(q.rel, 0) AS rel
          FROM results r LEFT JOIN qrels q USING (query_id, url)
          WHERE r.rank <= 10),
        per_q AS (
          SELECT query_id,
                 CAST(COUNT(*) AS BIGINT) AS n_results,
                 SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS hits,
                 SUM((pow(2.0, rel) - 1.0)
                     / (ln(CAST(rank AS DOUBLE) + 1.0) / ln(2.0))) AS dcg,
                 MIN(CASE WHEN rel > 0 THEN rank END) AS first_rel
          FROM judged GROUP BY query_id),
        ranked_rel AS (
          SELECT query_id, rel,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY rel DESC, url ASC) AS r
          FROM qrels WHERE rel > 0),
        ideal AS (
          SELECT query_id,
                 CAST(COUNT(*) AS BIGINT) AS n_relevant,
                 SUM(CASE WHEN r <= 10
                     THEN (pow(2.0, rel) - 1.0)
                          / (ln(CAST(r AS DOUBLE) + 1.0) / ln(2.0))
                     ELSE 0.0 END) AS idcg
          FROM ranked_rel GROUP BY query_id)
        SELECT p.query_id, p.n_results, i.n_relevant,
               round(p.hits / 10.0, 6) AS precision_at_k,
               round(CAST(p.hits AS DOUBLE) / i.n_relevant, 6)
                 AS recall_at_k,
               round(COALESCE(1.0 / p.first_rel, 0.0), 6) AS mrr,
               round(p.dcg / i.idcg, 6) AS ndcg
        FROM per_q p JOIN ideal i USING (query_id)
    """,
        "host_span_mix": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS k
                   FROM documents WHERE doc_id < 300),
        per AS (
          SELECT 'host' || CAST(k % 11 AS VARCHAR) || '.test' AS host, k,
                 (CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END)
                 + (CASE WHEN k % 5 = 0 THEN 1 ELSE 0 END) AS m
          FROM d)
        SELECT host,
               CAST(COUNT(*) + SUM(m) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_title,
               CAST(3 * COUNT(*) AS BIGINT) AS n_text,
               CAST(COUNT(*) AS BIGINT) AS n_link,
               CAST(SUM(m) AS BIGINT) AS n_media,
               CAST((SUM(m) * 1000) // (COUNT(*) + SUM(m)) AS BIGINT)
                 AS media_per_doc_milli
        FROM per GROUP BY host
    """,
        "segment_merge_plan": """
        WITH s AS (SELECT o_orderkey AS segment_id,
                          (o_orderkey * 7919) % 100000 + 1 AS size_bytes
                   FROM orders),
        t AS (SELECT segment_id, CAST(size_bytes AS BIGINT) AS size_bytes,
                     CAST(length(CAST(greatest(size_bytes, 1) AS VARCHAR))
                          - 1 AS BIGINT) AS tier
              FROM s),
        g AS (SELECT *, (row_number() OVER (
                PARTITION BY tier
                ORDER BY size_bytes DESC, segment_id) - 1) // 4 AS mg
              FROM t),
        c AS (SELECT *,
                     COUNT(*) OVER (PARTITION BY tier, mg) AS n,
                     SUM(size_bytes) OVER (PARTITION BY tier, mg) AS sm
              FROM g)
        SELECT CAST(segment_id AS BIGINT) AS segment_id, size_bytes, tier,
               CAST(CASE WHEN n = 4 THEN mg ELSE -1 END AS BIGINT)
                 AS merge_group,
               (n = 4) AS will_merge,
               CAST(CASE WHEN n = 4 THEN sm ELSE size_bytes END AS BIGINT)
                 AS target_size
        FROM c
    """,
        "segment_skip_audit": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        seg AS (SELECT DISTINCT doc_id % 16 AS segment_id, word
                FROM postings),
        q AS (SELECT unnest(['join', 'query', 'table']) AS word),
        present AS (
          SELECT segment_id,
                 CAST(COUNT(DISTINCT s.word) AS BIGINT) AS n
          FROM seg s JOIN q ON q.word = s.word
          GROUP BY segment_id),
        base AS (SELECT DISTINCT segment_id FROM seg)
        SELECT CAST(b.segment_id AS BIGINT) AS segment_id,
               CAST(COALESCE(p.n, 0) AS BIGINT) AS n_words_present,
               (COALESCE(p.n, 0) = 0) AS can_skip,
               (COALESCE(p.n, 0) = 3) AS has_all_words
        FROM base b LEFT JOIN present p USING (segment_id)
    """,
        "embedding_audit": """
        WITH aug AS (
          SELECT vec_id,
                 CASE
                   WHEN vec_id % 97 = 0 THEN
                     list_transform(embedding, x -> CAST(0.0 AS FLOAT))
                   WHEN vec_id % 101 = 0 THEN
                     [CAST('NaN' AS FLOAT)] || embedding[2:64]
                   ELSE embedding
                 END AS embedding
          FROM embeddings),
        rows_ AS (
          SELECT len(embedding) AS dim,
                 len(list_filter(embedding,
                     x -> isnan(x) OR abs(x) > 1e30)) > 0 AS bad,
                 CASE WHEN NOT (len(list_filter(embedding,
                        x -> isnan(x) OR abs(x) > 1e30)) > 0)
                      THEN CAST(round(list_sum(list_transform(embedding,
                             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                             * 1e6) AS BIGINT)
                 END AS n2
          FROM aug)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
               CAST(MIN(dim) AS BIGINT) AS dim_min,
               CAST(MAX(dim) AS BIGINT) AS dim_max,
               CAST(SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nonfinite,
               CAST(SUM(CASE WHEN n2 < 1000 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_zero_norm,
               CAST(SUM(n2) // SUM(CASE WHEN NOT bad THEN 1 ELSE 0 END)
                    AS BIGINT) AS mean_norm2_micro
        FROM rows_
    """,
        "readability_fk": """
        WITH d AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 CASE WHEN doc_id % 4 = 0
                      THEN text || '. Short tail! Done?'
                      ELSE text END AS text
          FROM documents),
        c AS (
          SELECT doc_id,
                 greatest(len(list_filter(string_split_regex(text, '\\s+'),
                                          x -> x <> '')), 1) AS n_words,
                 greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                   AS n_sentences,
                 len(regexp_extract_all(lower(text), '[aeiouy]+'))
                   AS n_syllables
          FROM d)
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
               CAST(n_sentences AS BIGINT) AS n_sentences,
               CAST(n_syllables AS BIGINT) AS n_syllables,
               CAST((390 * n_words) // n_sentences
                    + (11800 * n_syllables) // n_words
                    - 15590 AS BIGINT) AS fk_grade_milli
        FROM c
    """,
        "percolate_standing": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        dw AS (SELECT DISTINCT doc_id, word FROM postings),
        topw AS (
          SELECT word,
                 row_number() OVER (
                   ORDER BY COUNT(DISTINCT doc_id) DESC, word ASC) AS rk
          FROM dw GROUP BY word
          QUALIFY rk <= 30),
        qids AS (
          SELECT id AS query_id,
                 unnest(list_distinct([
                   (id % 30) + 1,
                   ((id * 7) % 30) + 1,
                   ((id * 13) % 30) + 1
                 ])) AS rk
          FROM range(40) t(id)),
        standing AS (
          SELECT DISTINCT q.query_id, w.word
          FROM qids q JOIN topw w USING (rk)),
        sizes AS (SELECT query_id, COUNT(*) AS need
                  FROM standing GROUP BY query_id),
        matched AS (
          SELECT d.doc_id, s.query_id,
                 CAST(COUNT(DISTINCT s.word) AS BIGINT) AS n_matched
          FROM dw d JOIN standing s USING (word)
          GROUP BY d.doc_id, s.query_id)
        SELECT m.doc_id, CAST(m.query_id AS BIGINT) AS query_id, m.n_matched
        FROM matched m JOIN sizes z USING (query_id)
        WHERE m.n_matched = z.need
    """,
        "pld_budgets": """
        WITH hosts AS (
          SELECT CASE
            WHEN o_orderkey % 3 = 0 THEN
              'sub' || CAST(o_orderkey % 4 AS VARCHAR) || '.shop'
              || CAST(o_orderkey % 9 AS VARCHAR) || '.co.uk'
            WHEN o_orderkey % 3 = 1 THEN
              'www.site' || CAST(o_orderkey % 13 AS VARCHAR) || '.com'
            ELSE 'a.host' || CAST(o_orderkey % 6 AS VARCHAR) || '.test'
          END AS host
          FROM orders),
        hw AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS weight
               FROM hosts GROUP BY host),
        hp AS (
          SELECT host, weight, labs, n,
                 CASE
                   WHEN n >= 2 AND labs[-2] || '.' || labs[-1] = 'co.uk'
                     THEN CASE WHEN n >= 3
                          THEN labs[-3] || '.' || labs[-2] || '.' || labs[-1]
                          ELSE labs[-2] || '.' || labs[-1] END
                   ELSE labs[-2] || '.' || labs[-1]
                 END AS pld
          FROM (SELECT host, weight,
                       string_split(lower(host), '.') AS labs,
                       len(string_split(lower(host), '.')) AS n
                FROM hw)),
        gw AS (SELECT pld, SUM(weight) AS pw FROM hp GROUP BY pld),
        tw AS (SELECT SUM(pw) AS W FROM gw),
        s1 AS (SELECT pld, pw, (5000 * pw) // t.W AS base,
                      (5000 * pw) % t.W AS rem
               FROM gw, tw t),
        l1 AS (SELECT 5000 - SUM(base) AS lo FROM s1),
        r1 AS (SELECT *, row_number() OVER (
                 ORDER BY rem DESC, pld ASC) - 1 AS rk FROM s1),
        pb AS (SELECT pld, pw,
                      base + CASE WHEN rk < (SELECT lo FROM l1)
                             THEN 1 ELSE 0 END AS b
               FROM r1),
        s2 AS (SELECT h.host, h.weight, h.pld, pb.b, pb.pw,
                      (pb.b * h.weight) // pb.pw AS base2,
                      (pb.b * h.weight) % pb.pw AS rem2
               FROM hp h JOIN pb USING (pld)),
        l2 AS (SELECT pld, b - SUM(base2) AS lo2 FROM s2 GROUP BY pld, b),
        r2 AS (SELECT *, row_number() OVER (
                 PARTITION BY pld ORDER BY rem2 DESC, host ASC) - 1 AS rk2
               FROM s2)
        SELECT r2.host, r2.pld, r2.weight,
               CAST(base2 + CASE WHEN rk2 < l2.lo2 THEN 1 ELSE 0 END
                    AS BIGINT) AS budget
        FROM r2 JOIN l2 USING (pld)
    """,
        "pld_rollup": """
        WITH hosts AS (
          SELECT CASE
            WHEN o_orderkey % 5 = 0 THEN
              'sub' || CAST(o_orderkey % 3 AS VARCHAR) || '.shop'
              || CAST(o_orderkey % 20 AS VARCHAR) || '.co.uk'
            WHEN o_orderkey % 5 = 1 THEN
              'www.site' || CAST(o_orderkey % 30 AS VARCHAR) || '.com'
            WHEN o_orderkey % 5 = 2 THEN
              'a.b.host' || CAST(o_orderkey % 11 AS VARCHAR) || '.test'
            WHEN o_orderkey % 5 = 3 THEN
              'cdn' || CAST(o_orderkey % 7 AS VARCHAR) || '.weird'
              || CAST(o_orderkey % 4 AS VARCHAR) || '.zz'
            ELSE 'single' END AS host
          FROM orders),
        parts AS (
          SELECT host, string_split(lower(host), '.') AS labs,
                 len(string_split(lower(host), '.')) AS n
          FROM hosts),
        t AS (
          SELECT host, labs, n,
                 labs[-1] AS t1,
                 CASE WHEN n >= 2 THEN labs[-2] || '.' || labs[-1] END AS t2
          FROM parts),
        p AS (
          SELECT CASE
            WHEN n <= 1 THEN host
            WHEN t2 IN ('co.uk','ac.uk','gov.uk','com.au','co.jp','or.jp')
              THEN CASE WHEN n >= 3 THEN labs[-3] || '.' || t2 ELSE t2 END
            WHEN t1 IN ('com','org','net','edu','gov','io','dev','test')
              THEN t2
            ELSE t2 END AS pld
          FROM t)
        SELECT pld, CAST(COUNT(*) AS BIGINT) AS n_hosts,
               CAST(COUNT(*) AS BIGINT) AS weight
        FROM p GROUP BY pld
    """,
        "link_farm_scores": """
        WITH e AS (
          SELECT 's' || CAST(l_suppkey % 40 AS VARCHAR) || '.test'
                   AS src_host,
                 CASE WHEN (l_suppkey % 40) % 5 = 0 AND l_orderkey % 10 < 9
                      THEN 'beneficiary'
                           || CAST((l_suppkey % 40) % 3 AS VARCHAR)
                           || '.test'
                      ELSE 'd' || CAST(l_partkey % 60 AS VARCHAR) || '.test'
                 END AS dst_host
          FROM lineitem),
        c AS (SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n
              FROM e GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (
                PARTITION BY src_host
                ORDER BY n DESC, dst_host DESC) AS rk,
                     SUM(n) OVER (PARTITION BY src_host) AS n_links
              FROM c)
        SELECT src_host, CAST(n_links AS BIGINT) AS n_links,
               dst_host AS top_dst, n AS top_dst_links,
               CAST((n * 1000) // n_links AS BIGINT) AS top_share_milli,
               ((n * 1000) // n_links >= 800 AND n_links >= 10)
                 AS is_suspect
        FROM r WHERE rk = 1
    """,
        "search_dedup_collapse": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        q AS (SELECT unnest(['table','join','query']) AS word),
        dfs AS (SELECT word, COUNT(DISTINCT doc_id) AS df
                FROM postings JOIN q USING (word) GROUP BY word),
        matched AS (
          SELECT p.doc_id, p.term_count, p.doc_len, dfs.df
          FROM postings p JOIN q USING (word) JOIN dfs USING (word)),
        scored AS (
          SELECT doc_id,
                 SUM((term_count / doc_len)
                     * ln((SELECT n_docs FROM n) / (1.0 + df))) AS score
          FROM matched GROUP BY doc_id),
        top_raw AS (SELECT doc_id, score FROM scored
                    ORDER BY score DESC, doc_id ASC LIMIT 100),
        top AS (SELECT doc_id, ROUND(score, 6) AS score FROM top_raw),
        canon AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                         MIN(CAST(doc_id AS BIGINT)) OVER (
                           PARTITION BY md5(text)) AS canonical_id
                  FROM documents),
        mapped AS (SELECT t.doc_id, t.score, c.canonical_id
                   FROM top t JOIN canon c USING (doc_id)),
        best AS (SELECT *, row_number() OVER (
                   PARTITION BY canonical_id
                   ORDER BY score DESC, doc_id ASC) AS rk
                 FROM mapped)
        SELECT doc_id, canonical_id, score
        FROM best WHERE rk = 1
        ORDER BY score DESC, canonical_id ASC LIMIT 20
    """,
        "sitemap_coverage": f"""
        WITH f AS ({_FRONTIER_SQL}),
        declared AS (
          SELECT 'host' || CAST(o_custkey % {N_HOSTS} AS VARCHAR)
                 || '.test' AS host,
                 'http://host' || CAST(o_custkey % {N_HOSTS} AS VARCHAR)
                 || '.test/order/' || CAST(o_orderkey AS VARCHAR) AS url
          FROM orders WHERE o_orderkey % 2 = 0
          UNION
          SELECT 'host' || CAST(o_custkey % {N_HOSTS} AS VARCHAR)
                 || '.test',
                 'http://host' || CAST(o_custkey % {N_HOSTS} AS VARCHAR)
                 || '.test/extra/' || CAST(o_orderkey AS VARCHAR)
          FROM orders WHERE o_orderkey % 3 = 0),
        j AS (SELECT d.host, f.state
              FROM declared d LEFT JOIN f ON f.url = d.url),
        agg AS (
          SELECT host,
                 CAST(COUNT(*) AS BIGINT) AS n_declared,
                 CAST(SUM(CASE WHEN state IS NOT NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_discovered,
                 CAST(SUM(CASE WHEN state = 'visited' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_fetched
          FROM j GROUP BY host)
        SELECT host, n_declared, n_discovered, n_fetched,
               CAST((n_discovered * 1000) // n_declared AS BIGINT)
                 AS discovered_milli,
               CAST((n_fetched * 1000) // n_declared AS BIGINT)
                 AS fetched_milli
        FROM agg
    """,
        "hot_terms": """
        WITH a AS (
          SELECT 'w' || CAST(CASE WHEN o_orderkey % 2 = 0
                                  THEN o_orderkey % 7
                                  ELSE o_orderkey % 150 END AS VARCHAR)
                   AS word,
                 CAST(COUNT(*) AS BIGINT) AS n_queries
          FROM orders GROUP BY 1),
        t AS (SELECT SUM(n_queries) AS tot FROM a),
        c AS (SELECT word, n_queries,
                     CAST(row_number() OVER (
                       ORDER BY n_queries DESC, word ASC) AS BIGINT)
                       AS cum_rank,
                     CAST(SUM(n_queries) OVER (
                       ORDER BY n_queries DESC, word ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
              FROM a)
        SELECT word, n_queries, cum_rank,
               CAST((cum * 1000) // t.tot AS BIGINT) AS cum_milli,
               ((cum * 1000) // t.tot <= 800 OR cum_rank = 1) AS is_hot
        FROM c, t
    """,
        "zipf_fit": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        freqs AS (SELECT word, CAST(SUM(term_count) AS BIGINT) AS freq
                  FROM postings GROUP BY word),
        top AS (SELECT word, freq,
                       row_number() OVER (ORDER BY freq DESC, word ASC)
                         AS rank
                FROM freqs QUALIFY rank <= 300),
        q AS (SELECT freq,
                     CAST(round(ln(CAST(rank AS DOUBLE)) * 1000)
                          AS BIGINT) AS x,
                     CAST(round(ln(CAST(freq AS DOUBLE)) * 1000)
                          AS BIGINT) AS y
              FROM top),
        s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
                     CAST(MAX(freq) AS BIGINT) AS top_freq,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(x * y) AS BIGINT) AS sxy,
                     CAST(SUM(x * x) AS BIGINT) AS sxx
              FROM q)
        SELECT n_words, top_freq,
               CAST(((n_words * sxy - sx * sy) * 1000)
                    // (n_words * sxx - sx * sx) AS BIGINT) AS slope_milli
        FROM s
    """,
        "feed_seeds": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS k
                   FROM documents WHERE doc_id < 100),
        b AS (SELECT k,
                     'http://host' || CAST(k % 7 AS VARCHAR) || '.test'
                       AS base,
                     'http://host' || CAST(k % 7 AS VARCHAR)
                     || '.test/feed/' || CAST(k AS VARCHAR) AS source_feed
              FROM d),
        rss AS (
          -- pos 0 = channel link, pos 1..n = items (even docs)
          SELECT base || '/' AS url, source_feed, 'rss' AS kind,
                 CAST(0 AS BIGINT) AS pos
          FROM b WHERE k % 2 = 0
          UNION ALL
          SELECT base || '/art/' || CAST(k AS VARCHAR) || '-'
                 || CAST(i AS VARCHAR),
                 source_feed, 'rss', CAST(i + 1 AS BIGINT)
          FROM b, unnest(range(0, (k % 3) + 1)) AS t(i)
          WHERE k % 2 = 0),
        atom AS (
          -- front (pos 0), alt (pos 1), entries (pos 2..) — self/hub/
          -- enclosure excluded by the rel rule (odd docs)
          SELECT base || '/front' AS url, source_feed, 'atom' AS kind,
                 CAST(0 AS BIGINT) AS pos
          FROM b WHERE k % 2 = 1
          UNION ALL
          SELECT base || '/alt', source_feed, 'atom', CAST(1 AS BIGINT)
          FROM b WHERE k % 2 = 1
          UNION ALL
          SELECT base || '/art/' || CAST(k AS VARCHAR) || '-'
                 || CAST(i AS VARCHAR),
                 source_feed, 'atom', CAST(i + 2 AS BIGINT)
          FROM b, unnest(range(0, (k % 3) + 1)) AS t(i)
          WHERE k % 2 = 1)
        SELECT url, source_feed, kind, pos FROM rss
        UNION ALL
        SELECT url, source_feed, kind, pos FROM atom
    """,
        "rel_canonical": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS k
                   FROM documents WHERE doc_id < 300),
        arms AS (
          SELECT k,
                 'http://host' || CAST(k % 11 AS VARCHAR)
                 || '.test/doc/' || CAST(k AS VARCHAR) AS url,
                 CASE
                   WHEN k % 3 = 2 THEN NULL
                   WHEN k % 3 = 0 AND k % 4 = 0 THEN 'self'
                   WHEN k % 3 = 0 THEN 'abs'
                   WHEN k % 7 = 1 THEN 'unresolved'
                   ELSE 'rootrel'
                 END AS arm
          FROM d)
        SELECT url,
               CASE arm
                 WHEN 'self' THEN url
                 WHEN 'abs' THEN 'http://canon.test/c/'
                                 || CAST(k // 3 AS VARCHAR)
                 WHEN 'rootrel' THEN 'http://host' || CAST(k % 11 AS VARCHAR)
                                     || '.test/c/' || CAST(k AS VARCHAR)
                 ELSE NULL
               END AS canonical_url,
               CASE WHEN arm = 'unresolved' THEN NULL
                    ELSE (arm = 'self') END AS is_self,
               CASE WHEN arm = 'unresolved' THEN NULL
                    ELSE (arm = 'abs') END AS is_cross_host,
               (arm = 'unresolved') AS href_unresolved
        FROM arms WHERE arm IS NOT NULL
    """,
        "politeness_audit": """
        WITH log AS (
          SELECT 'h' || CAST(l_suppkey % 29 AS VARCHAR) || '.test' AS host,
                 (l_orderkey * 13 + l_linenumber * 7) % 100000 AS fetch_ts
          FROM lineitem),
        delays AS (
          SELECT 'h' || CAST(range AS VARCHAR) || '.test' AS host,
                 (range % 5 + 1) * 3 AS min_gap
          FROM range(29)),
        gaps AS (
          SELECT host,
                 fetch_ts - lag(fetch_ts) OVER (
                   PARTITION BY host ORDER BY fetch_ts) AS g
          FROM log),
        per AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_fetches,
                       CAST(MIN(g) AS BIGINT) AS min_gap_observed
                FROM gaps GROUP BY host),
        viol AS (
          SELECT g.host, CAST(COUNT(*) AS BIGINT) AS n_violations
          FROM gaps g JOIN delays d USING (host)
          WHERE g.g IS NOT NULL AND g.g < d.min_gap
          GROUP BY g.host)
        SELECT p.host, p.n_fetches, p.min_gap_observed,
               CAST(COALESCE(d.min_gap, 0) AS BIGINT) AS min_gap_required,
               CAST(COALESCE(v.n_violations, 0) AS BIGINT) AS n_violations,
               (COALESCE(v.n_violations, 0) = 0) AS is_compliant
        FROM per p
        LEFT JOIN delays d USING (host)
        LEFT JOIN viol v USING (host)
    """,
        "related_terms": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        dw AS (SELECT DISTINCT doc_id, word FROM postings),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        seeds AS (SELECT unnest(['join', 'query', 'table']) AS seed),
        sd AS (SELECT s.seed, d.doc_id
               FROM dw d JOIN seeds s ON d.word = s.seed),
        pairs AS (SELECT sd.seed, d.word
                  FROM sd JOIN dw d USING (doc_id)
                  WHERE d.word <> sd.seed),
        co AS (SELECT seed, word, COUNT(*) AS df_pair
               FROM pairs GROUP BY 1, 2),
        dfs AS (SELECT word, COUNT(*) AS df_w FROM dw GROUP BY word),
        sdf AS (SELECT dfs.word AS seed, dfs.df_w AS df_s
                FROM dfs JOIN seeds ON dfs.word = seeds.seed),
        scored AS (
          SELECT co.seed, co.word, co.df_pair,
                 ln(((SELECT n_docs FROM n) * co.df_pair)
                    / (sdf.df_s * d2.df_w)) AS pmi
          FROM co
          JOIN dfs d2 ON d2.word = co.word
          JOIN sdf ON sdf.seed = co.seed
          WHERE d2.df_w >= 2),
        r AS (SELECT *, row_number() OVER (
                PARTITION BY seed ORDER BY pmi DESC, word ASC) AS rk
              FROM scored)
        SELECT seed, word, CAST(df_pair AS BIGINT) AS df_pair,
               round(pmi, 6) AS pmi, CAST(rk AS BIGINT) AS expansion_rank
        FROM r WHERE rk <= 5
    """,
        "doc_keywords": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        dfs AS (SELECT word, COUNT(DISTINCT doc_id) AS df
                FROM postings GROUP BY word),
        scored AS (
          SELECT p.doc_id, p.word,
                 (CAST(p.term_count AS DOUBLE) / p.doc_len)
                 * ln((SELECT n_docs FROM n) / (1.0 + d.df)) AS s
          FROM postings p JOIN dfs d USING (word)),
        r AS (SELECT doc_id, word, s,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY s DESC, word ASC) AS rk
              FROM scored)
        SELECT doc_id, word, CAST(rk AS BIGINT) AS keyword_rank,
               round(s, 6) AS score
        FROM r WHERE rk <= 3
    """,
        "lsh_eval": f"""
        {_MINHASH_SQL},
        bands AS (
          SELECT doc_id, seed_id // 4 AS band,
                 md5(string_agg(CAST(minhash AS VARCHAR), ','
                     ORDER BY seed_id)) AS band_key
          FROM sig GROUP BY doc_id, seed_id // 4),
        cands AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        jac AS (
          SELECT doc_a, doc_b, c / (sa.n + sb.n - c) AS jaccard
          FROM common
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b),
        exact AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.1),
        found AS (SELECT j.doc_a, j.doc_b
                  FROM jac j JOIN cands USING (doc_a, doc_b)
                  WHERE j.jaccard >= 0.1)
        SELECT CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_exact,
               CAST((SELECT COUNT(*) FROM cands) AS BIGINT) AS n_candidates,
               CAST((SELECT COUNT(*) FROM found) AS BIGINT) AS n_found,
               CAST(((SELECT COUNT(*) FROM found) * 1000)
                    // (SELECT COUNT(*) FROM exact) AS BIGINT)
                 AS recall_milli,
               CAST(((SELECT COUNT(*) FROM found) * 1000)
                    // (SELECT COUNT(*) FROM cands) AS BIGINT)
                 AS candidate_precision_milli
    """,
        "segment_merge_audit": """
        WITH s AS (SELECT o_orderkey AS segment_id,
                          (o_orderkey * 7919) % 100000 + 1 AS size_bytes
                   FROM orders),
        t AS (SELECT segment_id, CAST(size_bytes AS BIGINT) AS size_bytes,
                     CAST(length(CAST(greatest(size_bytes, 1) AS VARCHAR))
                          - 1 AS BIGINT) AS tier
              FROM s),
        g AS (SELECT *, (row_number() OVER (
                PARTITION BY tier
                ORDER BY size_bytes DESC, segment_id) - 1) // 4 AS mg
              FROM t),
        c AS (SELECT *, COUNT(*) OVER (PARTITION BY tier, mg) AS n
              FROM g)
        SELECT CAST(COUNT(*) AS BIGINT) AS segments_before,
               CAST(COUNT(*)
                    - SUM(CASE WHEN n = 4 THEN 1 ELSE 0 END)
                    + COUNT(DISTINCT CASE WHEN n = 4
                        THEN CAST(tier AS VARCHAR) || ':'
                             || CAST(mg AS VARCHAR) END) AS BIGINT)
                 AS segments_after,
               CAST(SUM(CASE WHEN n = 4 THEN size_bytes ELSE 0 END)
                    AS BIGINT) AS bytes_rewritten,
               CAST((SUM(CASE WHEN n = 4 THEN size_bytes ELSE 0 END) * 1000)
                    // SUM(size_bytes) AS BIGINT) AS rewrite_milli
        FROM c
    """,
    }
)

ORACLES_EXTRA.update({"trustrank_synth": _trustrank_oracle_sql()})


# --- weighted sampling + ranker-agreement eval ------------------------------


def _q_weighted_sample(spark, sf_dir):
    """Engine addition: Efraimidis-Spirakis weighted sampling without
    replacement (operators/textfilters.py:weighted_sample), weight =
    n_chars, k = 100. The sample SET itself is deterministic (seeded
    md5-derived u, exact power-of-two division, libm ln), so the oracle
    reproduces the exact same 100 rows."""
    from see_spark.operators.textfilters import weighted_sample

    return weighted_sample(
        _documents(spark, sf_dir), k=100, weight_col="n_chars"
    )


def _q_rank_agreement(spark, sf_dir):
    """Engine addition: Spearman/Kendall agreement between two corpus
    quality signals — Flesch-Kincaid grade vs the stopword/repetition
    quality score (operators/evaluation.py:rank_agreement). Exact integer
    ranks (pinned ties) -> exact integer rho/tau milli with sign-factored
    truncation."""
    from see_spark.operators.evaluation import rank_agreement
    from see_spark.operators.reputation import doc_quality_milli
    from see_spark.operators.textstats import readability

    d = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    a = readability(d).select("doc_id", "fk_grade_milli")
    b = doc_quality_milli(d.withColumn("host", F.lit("x"))).select(
        "doc_id", "q_milli"
    )
    return rank_agreement(
        a, b, id_col="doc_id", score_a="fk_grade_milli", score_b="q_milli"
    )


QUERIES_EXTRA.update(
    {
        "weighted_sample": _q_weighted_sample,
        "rank_agreement": _q_rank_agreement,
    }
)

ORACLES_EXTRA.update(
    {
        "weighted_sample": """
        WITH w AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 CAST(n_chars AS BIGINT) AS weight,
                 ln((('0x' || substr(md5('ws1:' || CAST(doc_id AS VARCHAR)),
                       1, 15))::BIGINT + 1) / 1152921504606846976.0)
                   / CAST(n_chars AS DOUBLE) AS key
          FROM documents WHERE n_chars > 0)
        SELECT id, weight, round(key, 9) AS ws_key
        FROM w ORDER BY key DESC, id ASC LIMIT 100
    """,
        "rank_agreement": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text
                   FROM documents),
        fk AS (
          SELECT doc_id,
                 (390 * greatest(len(list_filter(
                      string_split_regex(text, '\\s+'), x -> x <> '')), 1))
                   // greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                 + (11800 * len(regexp_extract_all(lower(text), '[aeiouy]+')))
                   // greatest(len(list_filter(
                      string_split_regex(text, '\\s+'), x -> x <> '')), 1)
                 - 15590 AS score_a
          FROM d),
        feats AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
                 CAST(len(string_split(text, ' '))
                      - len(list_distinct(string_split(text, ' ')))
                   AS BIGINT) AS rep,
                 CAST(len(list_filter(string_split(text, ' '),
                      x -> list_contains(
                        ['the','a','of','and','to','in','is'], x)))
                   AS BIGINT) AS stop
          FROM d),
        q AS (SELECT doc_id,
                     (1000 * least(n, 200) * (n - rep) * (n + stop))
                       // (400 * n * n) AS score_b
              FROM feats),
        ra AS (SELECT doc_id AS id, row_number() OVER (
                 ORDER BY score_a DESC, doc_id ASC) AS ra FROM fk),
        rb AS (SELECT doc_id AS id, row_number() OVER (
                 ORDER BY score_b DESC, doc_id ASC) AS rb FROM q),
        j AS (SELECT ra.id, ra.ra, rb.rb FROM ra JOIN rb USING (id)),
        base AS (SELECT COUNT(*) AS n,
                        CAST(SUM((ra - rb) * (ra - rb)) AS BIGINT) AS sum_d2
                 FROM j),
        cd AS (SELECT
                 CAST(SUM(CASE WHEN (a.ra - b.ra) * (a.rb - b.rb) > 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
                 CAST(SUM(CASE WHEN (a.ra - b.ra) * (a.rb - b.rb) < 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS discordant
               FROM j a JOIN j b ON a.id < b.id),
        o AS (SELECT n, sum_d2, concordant, discordant,
                     n * (n * n - 1) - 6 * sum_d2 AS spnum,
                     n * (n * n - 1) AS spden,
                     concordant - discordant AS ktnum,
                     (n * (n - 1)) // 2 AS ktden
              FROM base, cd)
        SELECT CAST(n AS BIGINT) AS n, sum_d2, concordant, discordant,
               CAST((CASE WHEN spnum < 0 THEN -1 ELSE 1 END)
                    * ((1000 * abs(spnum)) // spden) AS BIGINT)
                 AS spearman_milli,
               CAST((CASE WHEN ktnum < 0 THEN -1 ELSE 1 END)
                    * ((1000 * abs(ktnum)) // ktden) AS BIGINT)
                 AS kendall_milli
        FROM o
    """,
    }
)



# --- soft-404 detection + frontier backlog audit ---------------------------


def _q_soft404(spark, sf_dir):
    """Engine addition: soft-404 detection (operators/soft404.py —
    Bar-Yossef et al. 2004). Synthetic fetch results over documents:
    every 17th doc is the host's error template (digits vary per page —
    the normalization must strip them), every 29th+5 is a short
    phrase-heuristic page, every 31st is an honest 404 (never flagged).
    Probe table = one cannot-exist fetch per host."""
    from see_spark.operators.soft404 import soft404_flags

    d = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(
            F.lit("h"), (F.col("doc_id") % 23).cast("string"), F.lit(".test")
        ).alias("host"),
        F.when(F.col("doc_id") % 31 == 0, F.lit(404))
        .otherwise(F.lit(200)).cast("int").alias("status"),
        F.when(
            F.col("doc_id") % 17 == 0,
            F.concat(
                F.lit("Oops! page Not Found: /order/"),
                F.col("doc_id").cast("string"),
            ),
        )
        .when(F.col("doc_id") % 29 == 5, F.lit("sorry, this item does not exist"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    probes = (
        _documents(spark, sf_dir)
        .select(
            F.concat(
                F.lit("h"), (F.col("doc_id") % 23).cast("string"), F.lit(".test")
            ).alias("host")
        )
        .distinct()
        .select("host", F.lit("Oops! page Not Found: /order/999999").alias("text"))
    )
    return soft404_flags(d, probes, short_chars=80)


def _q_backlog_audit(spark, sf_dir):
    """Engine addition: per-host frontier backlog / starvation audit
    (operators/frontier.py:backlog_audit) over the synthetic frontier with
    a budget dimension containing real zeros (hostnum % 4 == 0 hosts),
    exercising the -1 drain sentinel."""
    from see_spark.operators.frontier import backlog_audit

    f = _orders_frontier(spark, sf_dir)
    budgets = (
        f.select("host").distinct().select(
            "host",
            (
                F.regexp_extract("host", r"host(\d+)\.test", 1).cast("long") % 4
            ).alias("budget"),
        )
    )
    return backlog_audit(f, budgets, rounds_threshold=10)


QUERIES_EXTRA.update(
    {
        "soft404_detect": _q_soft404,
        "backlog_audit": _q_backlog_audit,
    }
)

_SOFT404_NORM = (
    "md5(trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '', 'g'),"
    " '[ \t\n\r]+', ' ', 'g')))"
)
_SOFT404_PHRASE = "(not found|no longer available|does not exist)"

ORACLES_EXTRA.update(
    {
        "soft404_detect": f"""
        WITH d AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 'h' || CAST(doc_id % 23 AS VARCHAR) || '.test' AS host,
                 CAST(CASE WHEN doc_id % 31 = 0 THEN 404 ELSE 200 END
                      AS INTEGER) AS status,
                 CASE WHEN doc_id % 17 = 0
                      THEN 'Oops! page Not Found: /order/'
                           || CAST(doc_id AS VARCHAR)
                      WHEN doc_id % 29 = 5
                      THEN 'sorry, this item does not exist'
                      ELSE text END AS text
          FROM documents),
        p AS (
          SELECT DISTINCT 'h' || CAST(doc_id % 23 AS VARCHAR) || '.test'
                   AS host,
                 'Oops! page Not Found: /order/999999' AS text
          FROM documents),
        sig AS (SELECT host, {_SOFT404_NORM} AS err_sig FROM p),
        dd AS (SELECT doc_id, host, status, {_SOFT404_NORM} AS s,
                      lower(text) AS low, length(text) AS len
               FROM d)
        SELECT dd.doc_id, dd.host, dd.status,
               CASE WHEN status = 200 AND s = err_sig
                    THEN 'probe_signature'
                    WHEN status = 200 AND len <= 80
                         AND regexp_matches(low, '{_SOFT404_PHRASE}')
                    THEN 'error_phrase'
                    ELSE 'ok' END AS reason,
               (status = 200 AND (s = err_sig OR (len <= 80
                    AND regexp_matches(low, '{_SOFT404_PHRASE}'))))
                 AS is_soft404
        FROM dd JOIN sig USING (host)
    """,
        "backlog_audit": rf"""
        WITH frontier AS ({{_F}}),
        unv AS (
          SELECT host, COUNT(*) AS n_unvisited, MIN(seq) AS oldest_seq,
                 MAX(seq) AS newest_seq
          FROM frontier WHERE state = 'unvisited' GROUP BY host),
        bud AS (
          SELECT DISTINCT host,
                 CAST(CAST(regexp_extract(host, 'host(\d+)\.test', 1)
                      AS BIGINT) % 4 AS BIGINT) AS budget
          FROM frontier)
        SELECT u.host,
               CAST(u.n_unvisited AS BIGINT) AS n_unvisited,
               CAST(u.oldest_seq AS BIGINT) AS oldest_seq,
               CAST(u.newest_seq AS BIGINT) AS newest_seq,
               COALESCE(b.budget, 0) AS budget,
               CAST(CASE WHEN COALESCE(b.budget, 0) > 0
                    THEN (u.n_unvisited + b.budget - 1) // b.budget
                    ELSE -1 END AS BIGINT) AS drain_rounds,
               (CASE WHEN COALESCE(b.budget, 0) > 0
                     THEN (u.n_unvisited + b.budget - 1) // b.budget
                     ELSE -1 END) >= 10 OR COALESCE(b.budget, 0) <= 0
                 AS is_starved
        FROM unv u LEFT JOIN bud b USING (host)
    """.replace("{_F}", _FRONTIER_SQL),
    }
)



# --- winnowing fingerprints (MOSS local copy detection) --------------------


def _winnow_sel_sql(k: int = 3, w: int = 4) -> str:
    """Shared CTE chain: positional tokens -> k-gram hashes -> the
    closed-form window-minimum selection (same lag/lead expressions, same
    null handling as operators/winnow.winnow_select)."""
    gram = " || ' ' || ".join(
        ["word"] + [f"lead(word, {i}) OVER wv" for i in range(1, k)]
    )
    lags = ", ".join(
        f"lag(khash, {i}) OVER w2 AS l{i}, lead(khash, {i}) OVER w2 AS r{i}"
        for i in range(1, w)
    )
    a_terms, b_terms = [], []
    a_conj, b_conj = [], []
    for i in range(1, w):
        a_conj.append(f"COALESCE(l{i} >= khash, FALSE)")
        b_conj.append(f"COALESCE(r{i} > khash, FALSE)")
        a_terms.append("CASE WHEN " + " AND ".join(a_conj) + " THEN 1 ELSE 0 END")
        b_terms.append("CASE WHEN " + " AND ".join(b_conj) + " THEN 1 ELSE 0 END")
    absum = " + ".join(a_terms + b_terms)
    return f"""
    pos AS ({_POS_TOKENS_SQL}),
    g AS (SELECT doc_id, pos, {gram} AS gram,
                 lead(word, {k - 1}) OVER wv AS lastw
          FROM pos WINDOW wv AS (PARTITION BY doc_id ORDER BY pos)),
    kg AS (SELECT doc_id, pos,
                  ('0x' || substr(md5(gram), 1, 15))::BIGINT AS khash
           FROM g WHERE lastw IS NOT NULL),
    lg AS (SELECT doc_id, pos, khash, {lags},
                  COUNT(*) OVER (PARTITION BY doc_id) AS n
           FROM kg WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)),
    sel AS (SELECT doc_id, pos, khash,
                   ({absum}) >= LEAST({w}, n) - 1 AS selected
            FROM lg)
"""


def _q_winnow_stats(spark, sf_dir):
    """Engine addition: per-doc winnowing fingerprint audit
    (operators/winnow.py — Schleimer/Wilkerson/Aiken 2003, k=3, w=4);
    density_milli should sit near 2000/(w+1)=400 on non-degenerate text."""
    from see_spark.operators.positional import positional_postings
    from see_spark.operators.winnow import winnow_stats

    return winnow_stats(positional_postings(_documents(spark, sf_dir)))


def _q_winnow_matches(spark, sf_dir):
    """Engine addition: copied-passage candidate pairs — selected
    fingerprints equi-joined on the 60-bit hash with a df<=50 ubiquity cap
    before the fan-out; >= 2 shared fingerprints to pair."""
    from see_spark.operators.positional import positional_postings
    from see_spark.operators.winnow import winnow_matches

    return winnow_matches(positional_postings(_documents(spark, sf_dir)))


QUERIES_EXTRA.update(
    {
        "winnow_stats": _q_winnow_stats,
        "winnow_matches": _q_winnow_matches,
    }
)

ORACLES_EXTRA.update(
    {
        "winnow_stats": f"""
        WITH {_winnow_sel_sql()}
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_kgrams,
               CAST(SUM(CASE WHEN selected THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_selected,
               CAST((SUM(CASE WHEN selected THEN 1 ELSE 0 END) * 1000)
                    // COUNT(*) AS BIGINT) AS density_milli
        FROM sel GROUP BY doc_id
    """,
        "winnow_matches": f"""
        WITH {_winnow_sel_sql()},
        fp AS (SELECT DISTINCT doc_id, khash FROM sel WHERE selected),
        dfc AS (SELECT khash FROM fp GROUP BY khash HAVING COUNT(*) <= 50),
        kept AS (SELECT fp.doc_id, fp.khash FROM fp JOIN dfc USING (khash))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS shared_fps
        FROM kept a JOIN kept b ON a.khash = b.khash AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """,
    }
)



# --- graph-density spam signals: triangles + reciprocity ------------------

_COMMUNITY_SQL = """
    nn AS (SELECT COUNT(*) AS n FROM documents),
    cnodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
    cedges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT node AS src,
               (node - node % 8) + (node % 8 + 1) % 8 AS dst FROM cnodes
        UNION ALL
        SELECT node, (node - node % 8) + (node % 8 + 2) % 8 FROM cnodes
        UNION ALL
        SELECT node, (node - node % 8) + (node % 8 + 3) % 8 FROM cnodes
        UNION ALL
        SELECT node, (node - node % 8) + (node % 8 + 6) % 8 FROM cnodes
        WHERE node % 3 = 0
      ) WHERE dst <> src AND dst < (SELECT n FROM nn))
"""


def _q_triangle_counts(spark, sf_dir):
    """Engine addition: per-node triangle count + local clustering
    coefficient (integer milli) over the deterministic community graph
    (operators/linkgraph.py:triangle_counts — degree-ordered orientation,
    Suri & Vassilvitskii 2011, so no hub ever fans out deg^2). Oracle =
    id-ordered brute triangle enumeration (orientation-invariant set)."""
    from see_spark.operators.linkgraph import community_edges, triangle_counts

    return triangle_counts(community_edges(_documents(spark, sf_dir)))


def _q_link_reciprocity(spark, sf_dir):
    """Engine addition: per-source link reciprocity in integer milli over
    the directed community graph (operators/linkgraph.py:reciprocity) —
    the link-exchange web-spam signal complementing link_farm_scores."""
    from see_spark.operators.linkgraph import community_edges, reciprocity

    return reciprocity(community_edges(_documents(spark, sf_dir)))


QUERIES_EXTRA.update(
    {
        "triangle_counts": _q_triangle_counts,
        "link_reciprocity": _q_link_reciprocity,
    }
)

ORACLES_EXTRA.update(
    {
        "triangle_counts": f"""
        WITH {_COMMUNITY_SQL},
        und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
                FROM cedges),
        deg AS (SELECT node, COUNT(*) AS degree FROM (
                  SELECT a AS node FROM und UNION ALL SELECT b FROM und)
                GROUP BY node),
        tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
                FROM und e1
                JOIN und e2 ON e2.a = e1.b
                JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        corners AS (SELECT node, COUNT(*) AS triangles FROM (
                      SELECT u AS node FROM tri
                      UNION ALL SELECT v FROM tri
                      UNION ALL SELECT w FROM tri)
                    GROUP BY node)
        SELECT d.node,
               CAST(d.degree AS BIGINT) AS degree,
               CAST(COALESCE(c.triangles, 0) AS BIGINT) AS triangles,
               CAST(CASE WHEN d.degree >= 2
                    THEN (COALESCE(c.triangles, 0) * 2000)
                         // (d.degree * (d.degree - 1))
                    ELSE 0 END AS BIGINT) AS clustering_milli
        FROM deg d LEFT JOIN corners c ON c.node = d.node
    """,
        "link_reciprocity": f"""
        WITH {_COMMUNITY_SQL},
        m AS (SELECT e.src, e.dst,
                     CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END AS back
              FROM cedges e
              LEFT JOIN cedges r ON r.src = e.dst AND r.dst = e.src)
        SELECT src,
               CAST(COUNT(*) AS BIGINT) AS out_links,
               CAST(SUM(back) AS BIGINT) AS reciprocated,
               CAST((SUM(back) * 1000) // COUNT(*) AS BIGINT)
                 AS reciprocity_milli
        FROM m GROUP BY src
    """,
    }
)



# --- best-window snippets + host-template boilerplate mass ------------------


def _q_search_snippets(spark, sf_dir):
    """Engine addition: best-passage snippet extraction
    (operators/positional.py:best_window_snippets) — densest width-10
    token window over the search-suite query terms, ties to the earliest
    start; snippet resolved from the kept-token arrays."""
    from see_spark.functions.udfs import tokenize_expr
    from see_spark.operators.positional import (
        best_window_snippets, positional_postings,
    )

    d = _documents(spark, sf_dir)
    toks = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokenize_expr(F.col("text")).alias("toks"),
    )
    return best_window_snippets(
        positional_postings(d), toks, _SEARCH_WORDS, width=10
    )


def _q_template_mass(spark, sf_dir):
    """Engine addition: per-doc boilerplate ratio from winnowing
    fingerprints (operators/winnow.py:template_mass). Docs are augmented
    with a per-host nav prefix so host-template hashes genuinely exist;
    a hash is template when >= 50% of the host's docs (>= 3 docs
    evidence) contain it."""
    from see_spark.operators.positional import positional_postings
    from see_spark.operators.winnow import fingerprints, template_mass

    d = _documents(spark, sf_dir)
    k = F.col("doc_id").cast("long")
    aug = d.select(
        k.alias("doc_id"),
        F.concat(
            F.lit("nav home about contact host"),
            (k % 13).cast("string"),
            F.lit(" menu "),
            F.col("text"),
        ).alias("text"),
    )
    hosts = aug.select(
        "doc_id",
        F.concat(
            F.lit("h"), (F.col("doc_id") % 13).cast("string"), F.lit(".test")
        ).alias("host"),
    )
    fps = fingerprints(positional_postings(aug)).select("doc_id", "khash")
    return template_mass(fps, hosts, share_milli=500, min_docs=3)


QUERIES_EXTRA.update(
    {
        "search_snippets": _q_search_snippets,
        "template_mass": _q_template_mass,
    }
)

ORACLES_EXTRA.update(
    {
        "search_snippets": f"""
        WITH pos AS ({_POS_TOKENS_SQL}),
        ta AS ({_TOKARR_SQL}),
        occ AS (SELECT doc_id, pos FROM pos
                WHERE word IN ('table', 'join', 'query')),
        dens AS (SELECT doc_id, pos,
                   CAST(COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
                        RANGE BETWEEN CURRENT ROW AND 9 FOLLOWING)
                     AS BIGINT) AS density
                 FROM occ),
        best AS (SELECT doc_id, density, pos AS start,
                   row_number() OVER (PARTITION BY doc_id
                     ORDER BY density DESC, pos ASC) AS rn
                 FROM dens)
        SELECT b.doc_id, CAST(b.start AS BIGINT) AS start, b.density,
               array_to_string(
                 list_slice(ta.toks, b.start + 1, b.start + 10), ' ')
                 AS snippet
        FROM best b JOIN ta USING (doc_id) WHERE rn = 1
    """,
        "template_mass": f"""
        WITH docaug AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 'nav home about contact host' || CAST(doc_id % 13 AS VARCHAR)
                 || ' menu ' || text AS text
          FROM documents),
        {_winnow_sel_sql().replace("FROM documents", "FROM docaug")},
        fsel AS (SELECT DISTINCT doc_id, khash FROM sel WHERE selected),
        hosts AS (SELECT doc_id,
                         'h' || CAST(doc_id % 13 AS VARCHAR) || '.test'
                           AS host
                  FROM docaug),
        f AS (SELECT fsel.doc_id, fsel.khash, hosts.host
              FROM fsel JOIN hosts USING (doc_id)),
        hd AS (SELECT host, COUNT(DISTINCT doc_id) AS hn
               FROM hosts GROUP BY host),
        hdf AS (SELECT host, khash, COUNT(DISTINCT doc_id) AS dfh
                FROM f GROUP BY host, khash),
        tpl AS (SELECT host, khash FROM hdf JOIN hd USING (host)
                WHERE hn >= 3 AND dfh * 1000 >= 500 * hn),
        m AS (SELECT f.doc_id, f.host,
                     CASE WHEN t.khash IS NOT NULL THEN 1 ELSE 0 END AS tp
              FROM f LEFT JOIN tpl t
                ON t.host = f.host AND t.khash = f.khash)
        SELECT doc_id, host,
               CAST(COUNT(*) AS BIGINT) AS n_fps,
               CAST(SUM(tp) AS BIGINT) AS n_template,
               CAST((SUM(tp) * 1000) // COUNT(*) AS BIGINT)
                 AS template_milli
        FROM m GROUP BY doc_id, host
    """,
    }
)




# --- change-rate estimation + charset sniffing ------------------------------


def _q_change_rate(spark, sf_dir):
    """Engine addition: Cho & Garcia-Molina Poisson change-rate estimator
    (operators/recrawl.py:change_rate_estimate) over a synthetic fetch
    history from lineitem (url per order, round = linenumber, content
    hash flips at round 4 so short histories give X=0 and longer ones
    X>=1; single-fetch urls exercise the NULL-evidence arm)."""
    from see_spark.operators.recrawl import change_rate_estimate

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    hist = li.select(
        F.concat(F.lit("u"), F.col("l_orderkey").cast("string")).alias("url"),
        F.col("l_linenumber").cast("long").alias("round"),
        F.expr("cast((l_orderkey + (l_linenumber div 4)) % 3 as string)")
        .alias("content_hash"),
    )
    return change_rate_estimate(hist)


def _q_charset_sniff(spark, sf_dir):
    """Engine addition: WHATWG-precedence charset sniffing
    (operators/charset.py) over synthetic header/BOM/meta evidence —
    every precedence combination occurs (BOM beats meta beats header
    beats the utf-8 default)."""
    from see_spark.operators.charset import charset_sniff

    d = _documents(spark, sf_dir)
    k = F.col("doc_id").cast("long")
    ev = d.select(
        k.alias("doc_id"),
        F.when(k % 5 == 0, F.lit("text/html; charset=ISO-8859-1"))
        .when(k % 5 == 2, F.lit('text/plain; charset="Windows-1252"'))
        .otherwise(F.lit("text/html")).alias("content_type"),
        F.when(k % 7 == 0, F.lit("EFBBBF3C68746D6C"))
        .when(k % 7 == 1, F.lit("fffe3c00"))
        .when(k % 7 == 2, F.lit("feff003c"))
        .otherwise(F.lit("3c68746d6c")).alias("body_prefix_hex"),
        F.when(
            k % 3 == 0,
            F.lit('<html><head><meta charset="KOI8-R"><title>'),
        )
        .when(
            k % 3 == 1,
            F.lit('<html><head><meta http-equiv="Content-Type" '
                  'content="text/html; charset=Shift_JIS">'),
        )
        .otherwise(F.lit("<html><head><title>x</title>")).alias("body_prefix"),
    )
    return charset_sniff(ev)


QUERIES_EXTRA.update(
    {
        "change_rate": _q_change_rate,
        "charset_sniff": _q_charset_sniff,
    }
)

ORACLES_EXTRA.update(
    {
        "change_rate": """
        WITH h AS (
          SELECT 'u' || CAST(l_orderkey AS VARCHAR) AS url,
                 CAST(l_linenumber AS BIGINT) AS round,
                 CAST((l_orderkey + l_linenumber // 4) % 3 AS VARCHAR)
                   AS content_hash
          FROM lineitem),
        f AS (SELECT url, round, content_hash,
                     lag(content_hash) OVER (
                       PARTITION BY url ORDER BY round) AS prev
              FROM h),
        a AS (SELECT url,
                CAST(COUNT(CASE WHEN prev IS NOT NULL THEN 1 END)
                  AS BIGINT) AS n_cmp,
                CAST(COALESCE(SUM(CASE WHEN prev IS NOT NULL
                     AND content_hash <> prev THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_changes,
                CAST(MAX(round) - MIN(round) AS BIGINT) AS span
              FROM f GROUP BY url)
        SELECT url, n_cmp, n_changes, span,
               CASE WHEN n_cmp > 0 AND span > 0
                    THEN round(-ln((2 * (n_cmp - n_changes) + 1)
                         / CAST(2 * n_cmp + 1 AS DOUBLE)) * n_cmp / span, 6)
                    END AS lambda_6,
               CASE WHEN n_cmp > 0 AND span > 0 AND n_changes > 0
                    THEN round(ln(2.0)
                         / (-ln((2 * (n_cmp - n_changes) + 1)
                            / CAST(2 * n_cmp + 1 AS DOUBLE))
                            * n_cmp / span), 6)
                    END AS half_life_6
        FROM a
    """,
        "charset_sniff": r"""
        WITH ev AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 CASE WHEN doc_id % 5 = 0
                      THEN 'text/html; charset=ISO-8859-1'
                      WHEN doc_id % 5 = 2
                      THEN 'text/plain; charset="Windows-1252"'
                      ELSE 'text/html' END AS content_type,
                 CASE WHEN doc_id % 7 = 0 THEN 'EFBBBF3C68746D6C'
                      WHEN doc_id % 7 = 1 THEN 'fffe3c00'
                      WHEN doc_id % 7 = 2 THEN 'feff003c'
                      ELSE '3c68746d6c' END AS body_prefix_hex,
                 CASE WHEN doc_id % 3 = 0
                      THEN '<html><head><meta charset="KOI8-R"><title>'
                      WHEN doc_id % 3 = 1
                      THEN '<html><head><meta http-equiv="Content-Type" '
                           || 'content="text/html; charset=Shift_JIS">'
                      ELSE '<html><head><title>x</title>' END AS body_prefix
          FROM documents),
        s AS (
          SELECT doc_id,
                 CASE WHEN lower(body_prefix_hex) LIKE 'efbbbf%'
                      THEN 'utf-8'
                      WHEN lower(body_prefix_hex) LIKE 'fffe%'
                      THEN 'utf-16le'
                      WHEN lower(body_prefix_hex) LIKE 'feff%'
                      THEN 'utf-16be'
                      ELSE '' END AS bom,
                 lower(regexp_extract(lower(body_prefix),
                   '<meta[^>]*charset\s*=\s*["'']?([a-zA-Z0-9._:-]+)', 1))
                   AS meta,
                 lower(regexp_extract(lower(COALESCE(content_type, '')),
                   'charset\s*=\s*["'']?([a-zA-Z0-9._:-]+)', 1)) AS header
          FROM ev)
        SELECT doc_id,
               CASE WHEN bom <> '' THEN bom
                    WHEN meta <> '' THEN meta
                    WHEN header <> '' THEN header
                    ELSE 'utf-8' END AS charset,
               CASE WHEN bom <> '' THEN 'bom'
                    WHEN meta <> '' THEN 'meta'
                    WHEN header <> '' THEN 'header'
                    ELSE 'default' END AS charset_source
        FROM s
    """,
    }
)




# --- k-core peeling + more-like-this ----------------------------------------


K_CORE_K = 10


def _kcore_oracle_sql(k: int = 5, n_iter: int = 8) -> str:
    """Unrolled peeling, round-for-round what linkgraph.kcore computes
    (peeling is monotone, so extra rounds past the fixpoint are no-ops)."""
    ctes = [
        _COMMUNITY_SQL,
        "xedges AS MATERIALIZED (SELECT src, dst FROM cedges UNION ALL "
        + " UNION ALL ".join(
            f"SELECT node AS src, (node*{m} + {c}) % (SELECT n FROM nn)"
            f" AS dst FROM cnodes"
            for m, c in _STRIDES
        )
        + ")",
        "a0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,"
        " GREATEST(src, dst) AS b FROM xedges WHERE src <> dst)",
    ]
    # MATERIALIZED: without it DuckDB inlines a{i-1} into all three of
    # a{i}'s references -> 3^n_iter scan blow-up (observed as fd
    # exhaustion on the parquet view)
    for i in range(1, n_iter + 1):
        p = f"a{i-1}"
        ctes.append(
            f"d{i} AS MATERIALIZED (SELECT node, COUNT(*) AS d FROM ("
            f"SELECT a AS node FROM {p} UNION ALL SELECT b FROM {p})"
            f" GROUP BY node)"
        )
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT x.a, x.b FROM {p} x"
            f" JOIN d{i} da ON da.node = x.a AND da.d >= {k}"
            f" JOIN d{i} db ON db.node = x.b AND db.d >= {k})"
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
      SELECT a AS node FROM a{n_iter}
      UNION ALL SELECT b FROM a{n_iter})
    GROUP BY node"""
    )


def _q_kcore(spark, sf_dir):
    """Engine addition: 5-core of the deterministic community graph
    (operators/linkgraph.py:kcore — Batagelj-Zaversnik peeling, 8
    rounds, past the cascade's fixpoint). Oracle = the unrolled peel."""
    from see_spark.operators.linkgraph import (
        community_edges, kcore, synthetic_edges,
    )

    d = _documents(spark, sf_dir)
    mixed = community_edges(d).unionAll(synthetic_edges(d))
    return kcore(mixed, k=K_CORE_K, n_iter=8)


def _q_more_like_this(spark, sf_dir):
    """Engine addition: 'more like this' related-document ranking
    (operators/search.py:more_like_this) seeded at doc 7 — top-5
    distinguishing terms, sum tf-idf over them, top-10 (all tie-breaks
    pinned). The df aggregate is word-restricted (plan-guarded family)."""
    from see_spark.operators.search import more_like_this

    return more_like_this(
        _doc_postings_tf(spark, sf_dir),
        source_id=7,
        page_count=_documents(spark, sf_dir).count(),
        m=5,
        k=10,
    )


QUERIES_EXTRA.update(
    {
        "kcore": _q_kcore,
        "more_like_this": _q_more_like_this,
    }
)

ORACLES_EXTRA.update(
    {
        "kcore": _kcore_oracle_sql(k=K_CORE_K),
        "more_like_this": f"""
        WITH p0 AS ({_POSTINGS_SQL}),
        p AS (SELECT doc_id, word, term_count / doc_len AS tf FROM p0),
        nn AS (SELECT COUNT(*) AS n FROM documents),
        src AS (SELECT word, tf AS src_tf FROM p WHERE doc_id = 7),
        dfb AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM p
                WHERE word IN (SELECT word FROM src) GROUP BY word),
        kw AS (SELECT s.word,
                      ln(CAST((SELECT n FROM nn) AS DOUBLE) / (1.0 + d.df))
                        AS idf,
                      s.src_tf
                      * ln(CAST((SELECT n FROM nn) AS DOUBLE) / (1.0 + d.df))
                        AS kscore
               FROM src s JOIN dfb d USING (word)
               ORDER BY kscore DESC, word ASC LIMIT 5),
        cand AS (SELECT p.doc_id, p.tf * kw.idf AS part
                 FROM p JOIN kw USING (word) WHERE p.doc_id <> 7),
        scored AS (SELECT doc_id,
                          CAST(COUNT(*) AS BIGINT) AS n_shared,
                          SUM(part) AS score
                   FROM cand GROUP BY doc_id)
        SELECT doc_id, n_shared, round(score, 6) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
    """,
    }
)




# --- HTTP freshness lifetime + language contamination ------------------------


def _q_http_ttl(spark, sf_dir):
    """Engine addition: RFC 9111 freshness lifetime per stored response
    (operators/httpcache.py:http_ttl) over synthetic header evidence from
    orders — every precedence arm occurs (no-store/no-cache beats
    max-age beats Expires beats the 10% Last-Modified heuristic beats
    none)."""
    from see_spark.operators.httpcache import http_ttl

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey").cast("long")
    date_s = (F.lit(1000000) + k % 100).cast("long")
    resp = o.select(
        F.concat(F.lit("u"), k.cast("string")).alias("url"),
        F.when(k % 6 == 0, F.lit("no-store"))
        .when(k % 6 == 1, F.lit("public, max-age=3600"))
        .when(k % 6 == 2, F.lit("private, no-cache, max-age=60"))
        .when(k % 6 == 3, F.lit("public"))
        .when(k % 6 == 4, F.lit('max-age="120"'))
        .otherwise(F.lit(None).cast("string")).alias("cache_control"),
        date_s.alias("date_s"),
        F.when(k % 5 == 0, date_s + 500)
        .when(k % 5 == 1, date_s - 50)
        .otherwise(F.lit(None).cast("long")).alias("expires_s"),
        F.when(k % 4 == 0, date_s - (k % 1000) * 10)
        .otherwise(F.lit(None).cast("long")).alias("last_modified_s"),
    )
    return http_ttl(resp)


def _q_lang_outliers(spark, sf_dir):
    """Engine addition: host-majority language contamination audit
    (operators/textstats.py:lang_outliers); every 97th doc sits alone on
    a rare host, exercising the min_docs evidence floor."""
    from see_spark.operators.textstats import lang_outliers

    d = _documents(spark, sf_dir)
    k = F.col("doc_id").cast("long")
    dd = d.select(
        k.alias("doc_id"),
        F.when(
            k % 97 == 0, F.concat(F.lit("rare"), k.cast("string"))
        ).otherwise(
            F.concat(F.lit("h"), (k % 19).cast("string"))
        ).alias("host"),
        "lang",
    )
    return lang_outliers(dd, min_docs=3)


QUERIES_EXTRA.update(
    {
        "http_ttl": _q_http_ttl,
        "lang_outliers": _q_lang_outliers,
    }
)

_TTL_MAXAGE = r"""regexp_extract(cc, '(?:^|[,\s])max-age\s*=\s*"?([0-9]+)', 1)"""
_TTL_NOSTORE = r"""regexp_matches(cc, '(?:^|[,\s])(no-store|no-cache)(?:$|[,\s=])')"""

ORACLES_EXTRA.update(
    {
        "http_ttl": f"""
        WITH r AS (
          SELECT 'u' || CAST(o_orderkey AS VARCHAR) AS url,
                 CASE o_orderkey % 6
                      WHEN 0 THEN 'no-store'
                      WHEN 1 THEN 'public, max-age=3600'
                      WHEN 2 THEN 'private, no-cache, max-age=60'
                      WHEN 3 THEN 'public'
                      WHEN 4 THEN 'max-age="120"'
                      END AS cache_control,
                 CAST(1000000 + o_orderkey % 100 AS BIGINT) AS date_s,
                 CASE WHEN o_orderkey % 5 = 0
                      THEN CAST(1000000 + o_orderkey % 100 + 500 AS BIGINT)
                      WHEN o_orderkey % 5 = 1
                      THEN CAST(1000000 + o_orderkey % 100 - 50 AS BIGINT)
                      END AS expires_s,
                 CASE WHEN o_orderkey % 4 = 0
                      THEN CAST(1000000 + o_orderkey % 100
                           - (o_orderkey % 1000) * 10 AS BIGINT)
                      END AS last_modified_s
          FROM orders),
        s AS (SELECT url, lower(COALESCE(cache_control, '')) AS cc,
                     date_s, expires_s, last_modified_s
              FROM r)
        SELECT url,
               CAST(CASE
                 WHEN {_TTL_NOSTORE} THEN 0
                 WHEN {_TTL_MAXAGE} <> ''
                   THEN CAST({_TTL_MAXAGE} AS BIGINT)
                 WHEN expires_s IS NOT NULL AND date_s IS NOT NULL
                   THEN greatest(expires_s - date_s, 0)
                 WHEN last_modified_s IS NOT NULL AND date_s IS NOT NULL
                   THEN greatest(date_s - last_modified_s, 0) // 10
                 END AS BIGINT) AS ttl_s,
               CASE
                 WHEN {_TTL_NOSTORE} THEN 'no-store'
                 WHEN {_TTL_MAXAGE} <> '' THEN 'max-age'
                 WHEN expires_s IS NOT NULL AND date_s IS NOT NULL
                   THEN 'expires'
                 WHEN last_modified_s IS NOT NULL AND date_s IS NOT NULL
                   THEN 'heuristic'
                 ELSE 'none' END AS ttl_source
        FROM s
    """,
        "lang_outliers": """
        WITH d AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 CASE WHEN doc_id % 97 = 0
                      THEN 'rare' || CAST(doc_id AS VARCHAR)
                      ELSE 'h' || CAST(doc_id % 19 AS VARCHAR) END AS host,
                 lang
          FROM documents),
        c AS (SELECT host, lang, COUNT(*) AS n FROM d GROUP BY 1, 2),
        p AS (SELECT host, n, lang,
                     SUM(n) OVER (PARTITION BY host) AS host_docs,
                     row_number() OVER (PARTITION BY host
                       ORDER BY n DESC, lang DESC) AS rn
              FROM c),
        dim AS (SELECT host, host_docs, lang AS majority_lang,
                       (n * 1000) // host_docs AS majority_milli
                FROM p WHERE rn = 1)
        SELECT d.doc_id, d.host, d.lang, dim.majority_lang,
               CAST(dim.majority_milli AS BIGINT) AS majority_milli,
               (d.lang <> dim.majority_lang AND dim.host_docs >= 3)
                 AS is_outlier
        FROM d JOIN dim USING (host)
    """,
    }
)


def _q_allpairs_ppjoin(spark, sf_dir):
    """Engine addition: EXACT threshold-Jaccard set-similarity self-join
    with the All-Pairs/PPJoin prefix filter (Bayardo et al. WWW 2007;
    Xiao et al. WWW 2008) over per-document token sets — provably
    complete candidate pruning (rarest-df-first prefixes), integer-milli
    scores (operators/simjoin.py). The oracle is the BRUTE-FORCE pair
    join, so the gate check proves the pruned plan loses no pair."""
    from see_spark.operators.simjoin import ppjoin_pairs

    return ppjoin_pairs(_documents(spark, sf_dir), threshold_milli=900)


def _q_kmv_jaccard(spark, sf_dir):
    """Engine addition: KMV (bottom-k) sketch Jaccard estimation
    (Bar-Yossef et al. 2002; Beyer et al. SIGMOD 2007) — k=16 smallest
    60-bit shingle hashes per doc; candidate pairs via sketch-hash
    equi-join; estimate = shared fraction of the bottom-k of the sketch
    union, audited against exact truth (operators/simjoin.py). Integer
    milli throughout, bit-exact oracle."""
    from see_spark.operators.simjoin import kmv_jaccard_pairs

    return kmv_jaccard_pairs(_documents(spark, sf_dir), k=16, n=3)


def _q_opic_importance(spark, sf_dir):
    """Engine addition: OPIC crawl-importance (Abiteboul et al. WWW 2003)
    over the deterministic synthetic expander — 4 synchronous rounds of
    integer micro-cash distribution (operators/linkgraph.py:opic); the
    oracle unrolls the identical BIGINT arithmetic, so the check is
    bit-exact (no float tolerance, unlike PageRank's 9dp rounding)."""
    from see_spark.operators.linkgraph import opic, synthetic_edges

    docs = _documents(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    return opic(nodes, synthetic_edges(docs), n_iter=4)


def _q_redde_selection(spark, sf_dir):
    """Engine addition: ReDDE shard selection (Si & Callan SIGIR 2003) —
    rank 8 document shards for the pinned query from a deterministic
    ~1/7 central sample (operators/sharding.py:redde_shard_ranks).
    Integer-milli estimates, bit-exact oracle."""
    from see_spark.operators.sharding import redde_shard_ranks

    return redde_shard_ranks(
        _documents(spark, sf_dir), _SEARCH_WORDS,
        n_shards=8, sample_mod=7, top_n=50,
    )


QUERIES_EXTRA.update(
    {
        "allpairs_ppjoin": _q_allpairs_ppjoin,
        "kmv_jaccard": _q_kmv_jaccard,
        "opic_importance": _q_opic_importance,
        "redde_selection": _q_redde_selection,
    }
)


def _opic_oracle_sql(n_iter: int = 4, grain: int = 1_000_000) -> str:
    """Unrolled OPIC cash rounds, term-for-term linkgraph.opic(): same
    floor divisions, same virtual-pot scalar, all BIGINT."""
    ctes = [
        _LINKGRAPH_SQL,
        f"s0 AS (SELECT node, CAST({grain} AS BIGINT) AS cash,"
        f" CAST(0 AS BIGINT) AS hist FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        p = f"s{i-1}"
        ctes.append(
            f"v{i} AS (SELECT CAST(COALESCE(SUM("
            f"CASE WHEN o.deg IS NULL THEN s.cash"
            f" ELSE s.cash - o.deg * (s.cash // o.deg) END), 0) AS BIGINT)"
            f" AS pot FROM {p} s LEFT JOIN outdeg o ON o.src = s.node)"
        )
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node,"
            f" CAST(SUM(s.cash // o.deg) AS BIGINT) AS contrib"
            f" FROM edges e JOIN {p} s ON e.src = s.node"
            f" JOIN outdeg o ON o.src = e.src GROUP BY 1)"
        )
        ctes.append(
            f"s{i} AS (SELECT n.node,"
            f" CAST(COALESCE(c.contrib, 0)"
            f" + (SELECT pot FROM v{i}) // (SELECT n FROM nn) AS BIGINT)"
            f" AS cash, CAST(s.hist + s.cash AS BIGINT) AS hist"
            f" FROM nodes n JOIN {p} s ON s.node = n.node"
            f" LEFT JOIN c{i} c ON c.node = n.node)"
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, hist AS hist_micro, cash AS cash_micro"
        f" FROM s{n_iter}"
    )


ORACLES_EXTRA.update({"opic_importance": _opic_oracle_sql()})

ORACLES_EXTRA.update(
    {
        # Brute-force referee for the prefix-filtered join: every pair,
        # no pruning — identical qualifying set proves completeness.
        "allpairs_ppjoin": f"""
        WITH toks AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id, word
                      FROM ({_TOKENS_SQL})),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1),
        common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                          COUNT(*) AS c
                   FROM toks a JOIN toks b
                     ON a.word = b.word AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
        SELECT doc_a, doc_b, CAST(c AS BIGINT) AS inter,
               CAST(sa.n AS BIGINT) AS size_a, CAST(sb.n AS BIGINT) AS size_b,
               CAST((1000 * c) // (sa.n + sb.n - c) AS BIGINT) AS jac_milli
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE 1000 * c >= 900 * (sa.n + sb.n - c)
    """,
        # Replays kmv_sketches + kmv_jaccard_pairs step-for-step: same
        # md5 60-bit hash, same bottom-k windows, same floor-milli math.
        "kmv_jaccard": f"""
        WITH {_SHINGLES3_SQL},
        h AS (SELECT doc_id, shingle,
                     ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS khash
              FROM sh),
        sk AS (SELECT doc_id, khash FROM (
                 SELECT doc_id, khash,
                        row_number() OVER (PARTITION BY doc_id
                                           ORDER BY khash, shingle) AS r
                 FROM h)
               WHERE r <= 16),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM sk a JOIN sk b
                   ON a.khash = b.khash AND a.doc_id < b.doc_id),
        m AS (SELECT doc_a, doc_b, khash,
                     MAX(in_a) AS in_a, MAX(in_b) AS in_b
              FROM (SELECT c.doc_a, c.doc_b, s.khash, 1 AS in_a, 0 AS in_b
                    FROM cand c JOIN sk s ON s.doc_id = c.doc_a
                    UNION ALL
                    SELECT c.doc_a, c.doc_b, s.khash, 0, 1
                    FROM cand c JOIN sk s ON s.doc_id = c.doc_b)
              GROUP BY 1, 2, 3),
        est AS (SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS k_used,
                       CAST(SUM(in_a * in_b) AS BIGINT) AS matching
                FROM (SELECT *, row_number() OVER (
                        PARTITION BY doc_a, doc_b ORDER BY khash) AS r
                      FROM m)
                WHERE r <= 16 GROUP BY 1, 2),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        tr AS (SELECT e.doc_a, e.doc_b, COUNT(*) AS ti
               FROM est e
               JOIN sh a ON a.doc_id = e.doc_a
               JOIN sh b ON b.doc_id = e.doc_b AND b.shingle = a.shingle
               GROUP BY 1, 2)
        SELECT e.doc_a, e.doc_b, e.k_used, e.matching,
               CAST((1000 * e.matching) // e.k_used AS BIGINT) AS est_milli,
               CAST(COALESCE((1000 * tr.ti) // (sa.sz + sb.sz - tr.ti), 0)
                    AS BIGINT) AS true_milli
        FROM est e
        LEFT JOIN tr ON tr.doc_a = e.doc_a AND tr.doc_b = e.doc_b
        LEFT JOIN sizes sa ON sa.doc_id = e.doc_a
        LEFT JOIN sizes sb ON sb.doc_id = e.doc_b
    """,
        # ReDDE replay: same md5 sampling, same distinct-query-word
        # scores, same top-50 window and inverse-rate scale-up.
        "redde_selection": f"""
        WITH toks AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id, word
                      FROM ({_TOKENS_SQL})),
        base AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                        CAST(doc_id AS BIGINT) % 8 AS shard,
                        CASE WHEN ('0x' || substr(md5(
                               CAST(CAST(doc_id AS BIGINT) AS VARCHAR)),
                               1, 15))::BIGINT % 7 = 0
                             THEN 1 ELSE 0 END AS in_sample
                 FROM documents),
        q AS (SELECT unnest(['table', 'join', 'query']) AS word),
        scores AS (SELECT t.doc_id, COUNT(*) AS score
                   FROM toks t
                   JOIN q USING (word)
                   JOIN base b ON b.doc_id = t.doc_id AND b.in_sample = 1
                   GROUP BY 1),
        hits AS (SELECT b.shard, COUNT(*) AS sample_hits
                 FROM (SELECT doc_id, row_number() OVER (
                         ORDER BY score DESC, doc_id) AS r
                       FROM scores) s
                 JOIN base b ON b.doc_id = s.doc_id
                 WHERE s.r <= 50 GROUP BY 1),
        tallies AS (SELECT shard, COUNT(*) AS shard_docs,
                           SUM(in_sample) AS sample_docs
                    FROM base GROUP BY 1),
        est AS (SELECT t.shard,
                       CAST(t.shard_docs AS BIGINT) AS shard_docs,
                       CAST(t.sample_docs AS BIGINT) AS sample_docs,
                       CAST(COALESCE(h.sample_hits, 0) AS BIGINT)
                         AS sample_hits,
                       CAST(CASE WHEN t.sample_docs > 0
                            THEN (1000 * COALESCE(h.sample_hits, 0)
                                  * t.shard_docs) // t.sample_docs
                            ELSE 0 END AS BIGINT) AS est_rel_milli
                FROM tallies t LEFT JOIN hits h ON h.shard = t.shard)
        SELECT est.*, CAST(row_number() OVER (
                 ORDER BY est_rel_milli DESC, shard) AS BIGINT) AS rank
        FROM est
    """,
    }
)


def _q_label_propagation(spark, sf_dir):
    """Engine addition: synchronous label-propagation communities
    (Raghavan et al. 2007) over the deterministic synthetic expander —
    4 rounds, most-frequent-neighbor label, min-label ties
    (operators/linkgraph.py:label_propagation); the oracle unrolls the
    identical rounds, bit-exact integer labels."""
    from see_spark.operators.linkgraph import label_propagation, synthetic_edges

    docs = _documents(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    return label_propagation(nodes, synthetic_edges(docs), n_iter=4)


def _q_maxmin_fair(spark, sf_dir):
    """Engine addition: max-min fair (water-filling) fetch-budget
    allocation across hosts by backlog (operators/frontier.py:
    maxmin_fair_alloc) — exact integer rule, skewed synthetic demands
    (per-host doc counts × a 1–5 multiplier) + one zero-demand host,
    budget 300 < total so the water line is real at every sf."""
    from see_spark.operators.frontier import maxmin_fair_alloc

    docs = _documents(spark, sf_dir)
    bucket = (F.col("doc_id").cast("long") % 19).alias("bucket")
    demands = (
        docs.groupBy(bucket)
        .agg(F.count("*").alias("n"))
        .select(
            F.concat(F.lit("h"), F.col("bucket").cast("string")).alias("host"),
            (F.col("n") * (1 + F.col("bucket") % 5)).cast("long").alias("demand"),
        )
        .unionByName(
            docs.sparkSession.createDataFrame(
                [("zzz-idle", 0)], "host string, demand long"
            )
        )
    )
    return maxmin_fair_alloc(demands, 300)


QUERIES_EXTRA.update(
    {
        "label_propagation": _q_label_propagation,
        "maxmin_fair_alloc": _q_maxmin_fair,
    }
)


def _lpa_oracle_sql(n_iter: int = 4) -> str:
    """Unrolled synchronous LPA rounds, term-for-term
    linkgraph.label_propagation(): same undirected edge set, same
    (count DESC, label ASC) argmax, isolated nodes keep their label."""
    ctes = [
        _LINKGRAPH_SQL,
        "und AS (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)"
        " WHERE src <> dst)",
        "l0 AS (SELECT node, node AS label FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        p = f"l{i-1}"
        ctes.append(
            f"g{i} AS (SELECT u.src AS node, l.label, COUNT(*) AS cnt"
            f" FROM und u JOIN {p} l ON l.node = u.dst GROUP BY 1, 2)"
        )
        ctes.append(
            f"b{i} AS (SELECT node, label FROM ("
            f"SELECT node, label, row_number() OVER (PARTITION BY node"
            f" ORDER BY cnt DESC, label ASC) AS rn FROM g{i}) WHERE rn = 1)"
        )
        ctes.append(
            f"l{i} AS (SELECT n.node, COALESCE(b.label, l.label) AS label"
            f" FROM nodes n JOIN {p} l USING (node)"
            f" LEFT JOIN b{i} b USING (node))"
        )
    last = f"l{n_iter}"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    sizes AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS community_size
              FROM {last} GROUP BY 1)
    SELECT l.node, CAST(l.label AS BIGINT) AS label, s.community_size
    FROM {last} l JOIN sizes s USING (label)"""
    )


ORACLES_EXTRA.update(
    {
        "label_propagation": _lpa_oracle_sql(),
        # Replays maxmin_fair_alloc's exact integer water-filling rule:
        # same ascending (demand, host) order, same fully-served
        # condition, same div/mod level+spare, spare +1 by host order.
        "maxmin_fair_alloc": """
        WITH d AS (
          SELECT 'h' || CAST(b AS VARCHAR) AS host,
                 CAST(n * (1 + b % 5) AS BIGINT) AS demand
          FROM (SELECT CAST(doc_id AS BIGINT) % 19 AS b, COUNT(*) AS n
                FROM documents GROUP BY 1)
          UNION ALL SELECT 'zzz-idle', 0),
        pos AS (SELECT host, demand,
                       row_number() OVER (ORDER BY demand, host) AS r,
                       SUM(demand) OVER (ORDER BY demand, host
                         ROWS UNBOUNDED PRECEDING) AS p
                FROM d WHERE demand > 0),
        nn AS (SELECT COUNT(*) AS n FROM pos),
        c AS (SELECT *,
                     (p + demand * ((SELECT n FROM nn) - r) <= 300) AS fully
              FROM pos),
        ks AS (SELECT COALESCE(SUM(CASE WHEN fully THEN 1 ELSE 0 END), 0) AS k,
                      COALESCE(MAX(CASE WHEN fully THEN p END), 0) AS s,
                      COALESCE(MAX(demand), 0) AS dmax
               FROM c),
        lv AS (SELECT CASE WHEN (SELECT n FROM nn) > k
                        THEN (300 - s) // ((SELECT n FROM nn) - k)
                        ELSE dmax END AS lev,
                      CASE WHEN (SELECT n FROM nn) > k
                        THEN (300 - s) % ((SELECT n FROM nn) - k)
                        ELSE 0 END AS spare
               FROM ks),
        unsat AS (SELECT host, demand,
                         row_number() OVER (ORDER BY host) AS hr
                  FROM c WHERE NOT fully)
        SELECT host, demand, CAST(demand AS BIGINT) AS alloc,
               TRUE AS satisfied,
               CAST((SELECT lev FROM lv) AS BIGINT) AS water_level
        FROM c WHERE fully
        UNION ALL
        SELECT host, demand,
               CAST((SELECT lev FROM lv)
                    + CASE WHEN hr <= (SELECT spare FROM lv)
                           THEN 1 ELSE 0 END AS BIGINT) AS alloc,
               ((SELECT lev FROM lv)
                + CASE WHEN hr <= (SELECT spare FROM lv)
                       THEN 1 ELSE 0 END) = demand AS satisfied,
               CAST((SELECT lev FROM lv) AS BIGINT) AS water_level
        FROM unsat
        UNION ALL
        SELECT host, demand, CAST(0 AS BIGINT) AS alloc, TRUE AS satisfied,
               CAST(NULL AS BIGINT) AS water_level
        FROM d WHERE demand <= 0
    """,
    }
)


def _c4_corpus(spark, sf_dir):
    """Deterministic line-structured corpus for the C4-filter gate: the
    word-soup documents re-chunked into 8-token pseudo-lines, each line
    punctuated by (doc_id + line#) % 4 -> '.', '!', '?', or nothing (the
    bare case exercises the terminal-punctuation drop; the final partial
    chunk exercises the min-words drop), plus a 'lorem ipsum' line on
    every 41st doc and a curly-brace line on every 43rd (the page-level
    drops). Constructed identically in the SQL oracle."""
    docs = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(8.0)).cast("int")
    terms = F.array(F.lit("."), F.lit("!"), F.lit("?"), F.lit(""))
    lines = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat(
            F.array_join(F.slice(toks, i * 8 + 1, 8), " "),
            F.element_at(terms, ((F.col("doc_id") + i) % 4 + 1).cast("int")),
        ),
    )
    text2 = F.array_join(lines, "\n")
    text2 = F.when(
        F.col("doc_id") % 41 == 0,
        F.concat(text2, F.lit("\nlorem ipsum dolor sit amet.")),
    ).otherwise(text2)
    text2 = F.when(
        F.col("doc_id") % 43 == 0,
        F.concat(text2, F.lit("\nsee the { spec here.")),
    ).otherwise(text2)
    return docs.select("doc_id", text2.alias("text"))


_C4_CORPUS_SQL = """
        toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                        string_split(text, ' ') AS t FROM documents),
        ln AS (SELECT doc_id, t,
                      unnest(range(0, CAST(ceil(len(t)/8.0) AS BIGINT))) AS i
               FROM toks),
        l2 AS (SELECT doc_id, i,
                      array_to_string(
                        t[CAST(i*8+1 AS BIGINT):CAST(i*8+8 AS BIGINT)], ' ')
                      || (CASE CAST((doc_id + i) % 4 AS INT)
                            WHEN 0 THEN '.' WHEN 1 THEN '!'
                            WHEN 2 THEN '?' ELSE '' END) AS line
               FROM ln),
        c0 AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS text
               FROM l2 GROUP BY 1),
        c AS (SELECT doc_id, text
              || CASE WHEN doc_id % 41 = 0
                   THEN chr(10) || 'lorem ipsum dolor sit amet.'
                   ELSE '' END
              || CASE WHEN doc_id % 43 = 0
                   THEN chr(10) || 'see the { spec here.'
                   ELSE '' END AS text
              FROM c0)
"""


def _q_c4_filters(spark, sf_dir):
    """Engine addition: C4-style heuristic cleaning (Raffel et al. 2020
    §2.2) — terminal-punctuation / min-words / 'javascript' line rules +
    lorem-ipsum / curly-brace page rules — over the deterministically
    punctuated pseudo-line corpus (textfilters.py:c4_filters). Zero
    shuffle; kept content pinned by md5."""
    from see_spark.operators.textfilters import c4_filters

    return c4_filters(_c4_corpus(spark, sf_dir))


def _q_ltr_features(spark, sf_dir):
    """Engine addition: learning-to-rank feature assembly for the pinned
    query — text-match signals (postings) joined with link-graph
    degrees (search.py:ltr_features); all integer-exact."""
    from see_spark.operators.linkgraph import synthetic_edges
    from see_spark.operators.search import ltr_features

    docs = _documents(spark, sf_dir)
    return ltr_features(
        _doc_postings(spark, sf_dir), synthetic_edges(docs), _SEARCH_WORDS
    )


QUERIES_EXTRA.update(
    {
        "c4_filters": _q_c4_filters,
        "ltr_features": _q_ltr_features,
    }
)


ORACLES_EXTRA.update(
    {
        # Replays _c4_corpus construction + the c4_filters rules
        # term-for-term (same trim, regex word split, terminal-char set).
        "c4_filters": f"""
        WITH {_C4_CORPUS_SQL},
        l AS (SELECT doc_id, text,
                     list_transform(string_split(text, chr(10)),
                                    x -> trim(x)) AS ls
              FROM c),
        k AS (SELECT doc_id, text, ls,
                     list_filter(ls, x -> x <> ''
                       AND right(x, 1) IN ('.', '!', '?', '"')
                       AND len(string_split_regex(x, ' +')) >= 5
                       AND NOT contains(lower(x), 'javascript')) AS kept
              FROM l)
        SELECT doc_id,
               CAST(len(ls) AS BIGINT) AS n_lines,
               CAST(len(kept) AS BIGINT) AS kept_lines,
               CAST(COALESCE(list_aggregate(
                 list_transform(kept,
                   x -> len(string_split_regex(x, ' +'))), 'sum'), 0)
                 AS BIGINT) AS kept_words,
               contains(text, '{{') AS has_brace,
               contains(lower(text), 'lorem ipsum') AS has_lorem,
               (len(kept) >= 3 AND NOT contains(text, '{{')
                AND NOT contains(lower(text), 'lorem ipsum')) AS keep,
               md5(COALESCE(array_to_string(kept, chr(10)), '')) AS kept_md5
        FROM k
    """,
        # Postings + link-graph degree assembly, all BIGINT.
        "ltr_features": f"""
        WITH p AS ({_POSTINGS_SQL}),
        {_LINKGRAPH_SQL},
        m AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     COUNT(DISTINCT word) AS n_match,
                     SUM(term_count) AS tf_sum,
                     MAX(doc_len) AS doc_len
              FROM p WHERE word IN ('table', 'join', 'query')
              GROUP BY 1),
        ind AS (SELECT dst AS doc_id, COUNT(*) AS in_deg
                FROM edges GROUP BY 1),
        outd AS (SELECT src AS doc_id, COUNT(*) AS out_deg
                 FROM edges GROUP BY 1)
        SELECT m.doc_id,
               CAST(n_match AS BIGINT) AS n_match,
               CAST(tf_sum AS BIGINT) AS tf_sum,
               CAST(doc_len AS BIGINT) AS doc_len,
               CAST((1000 * tf_sum) // doc_len AS BIGINT) AS tf_norm_milli,
               CAST(COALESCE(ind.in_deg, 0) AS BIGINT) AS in_deg,
               CAST(COALESCE(outd.out_deg, 0) AS BIGINT) AS out_deg
        FROM m
        LEFT JOIN ind USING (doc_id)
        LEFT JOIN outd USING (doc_id)
    """,
    }
)


def _snapshot_spans(spark, sf_dir, new: bool):
    """Deterministic interleaved span snapshot (input_hint shape, one row
    per span): 8-token text chunks + a media span wherever
    (doc_id + chunk#) % 3 == 0. The NEW snapshot perturbs it: every 7th
    doc loses its first text span and gains one media ref (content
    change + media churn), every 11th doc duplicates its second chunk
    (exercises multiset multiplicity). Built identically in SQL."""
    d = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(8.0)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("pos"), F.array_join(F.slice(toks, i * 8 + 1, 8), " ").alias("line")
        ),
    )
    ex = d.select("doc_id", F.explode(lines).alias("s")).select(
        "doc_id",
        F.col("s.pos").cast("long").alias("pos"),
        F.col("s.line").alias("line"),
    )
    text_rows = ex.select(
        "doc_id",
        F.lit("text").alias("kind"),
        F.col("line").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.col("pos").alias("offset"),
    )
    media_rows = ex.where((F.col("doc_id") + F.col("pos")) % 3 == 0).select(
        "doc_id",
        F.lit("media").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.concat(
            F.lit("img://"),
            F.col("doc_id").cast("string"),
            F.lit("/"),
            F.col("pos").cast("string"),
        ).alias("media_ref"),
        F.col("pos").alias("offset"),
    )
    if not new:
        return text_rows.unionByName(media_rows)
    kept_text = text_rows.where(
        ~((F.col("doc_id") % 7 == 0) & (F.col("offset") == 0))
    )
    dup = text_rows.where((F.col("doc_id") % 11 == 0) & (F.col("offset") == 1))
    extra_media = d.where(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.lit("media").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.concat(F.lit("img://new/"), F.col("doc_id").cast("string")).alias(
            "media_ref"
        ),
        F.lit(999).cast("long").alias("offset"),
    )
    return kept_text.unionByName(dup).unionByName(media_rows).unionByName(
        extra_media
    )


def _q_span_diff(spark, sf_dir):
    """Engine addition: span-level recrawl change audit over interleaved
    documents (operators/spandiff.py) — per-doc multiset diff of two
    snapshots; raw span text never shuffles (60-bit hashes)."""
    from see_spark.operators.spandiff import span_diff

    return span_diff(
        _snapshot_spans(spark, sf_dir, new=False),
        _snapshot_spans(spark, sf_dir, new=True),
    )


def _q_index_tiers(spark, sf_dir):
    """Engine addition: tiered-index assignment + first-tier-sufficiency
    audit (Risvik et al. 2003; operators/indexstats.py:index_tiers) —
    closed-form ntile over a DISTRIBUTED rank, integer static scores,
    exact top-20 coverage per tier."""
    from see_spark.operators.indexstats import index_tiers

    return index_tiers(_doc_postings(spark, sf_dir), _SEARCH_WORDS)


QUERIES_EXTRA.update(
    {
        "span_diff": _q_span_diff,
        "index_tiers": _q_index_tiers,
    }
)


_CHUNKS_SQL = """
        toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                        string_split(text, ' ') AS t FROM documents),
        ch AS (SELECT doc_id, t,
                      unnest(range(0, CAST(ceil(len(t)/8.0) AS BIGINT))) AS i
               FROM toks),
        l2 AS (SELECT doc_id, i,
                      array_to_string(
                        t[CAST(i*8+1 AS BIGINT):CAST(i*8+8 AS BIGINT)], ' ')
                        AS line
               FROM ch)
"""


ORACLES_EXTRA.update(
    {
        # Rebuilds both snapshots then diffs (kind, text, media_ref)
        # multisets per doc — hash-free equality, same semantics as the
        # 60-bit-hash Spark path.
        "span_diff": f"""
        WITH {_CHUNKS_SQL},
        sp_old AS (
          SELECT doc_id, 'text' AS kind, line AS text,
                 CAST(NULL AS VARCHAR) AS media_ref FROM l2
          UNION ALL
          SELECT doc_id, 'media', NULL,
                 'img://' || CAST(doc_id AS VARCHAR) || '/'
                          || CAST(i AS VARCHAR)
          FROM l2 WHERE (doc_id + i) % 3 = 0),
        sp_new AS (
          SELECT doc_id, 'text' AS kind, line AS text,
                 CAST(NULL AS VARCHAR) AS media_ref
          FROM l2 WHERE NOT (doc_id % 7 = 0 AND i = 0)
          UNION ALL
          SELECT doc_id, 'text', line, NULL
          FROM l2 WHERE doc_id % 11 = 0 AND i = 1
          UNION ALL
          SELECT doc_id, 'media', NULL,
                 'img://' || CAST(doc_id AS VARCHAR) || '/'
                          || CAST(i AS VARCHAR)
          FROM l2 WHERE (doc_id + i) % 3 = 0
          UNION ALL
          SELECT DISTINCT doc_id, 'media', NULL,
                 'img://new/' || CAST(doc_id AS VARCHAR)
          FROM l2 WHERE doc_id % 7 = 0),
        oc AS (SELECT doc_id, kind, text, media_ref, COUNT(*) AS c
               FROM sp_old GROUP BY 1, 2, 3, 4),
        nc AS (SELECT doc_id, kind, text, media_ref, COUNT(*) AS c
               FROM sp_new GROUP BY 1, 2, 3, 4),
        m AS (SELECT COALESCE(oc.doc_id, nc.doc_id) AS doc_id,
                     COALESCE(oc.kind, nc.kind) AS kind,
                     COALESCE(oc.c, 0) AS c_old,
                     COALESCE(nc.c, 0) AS c_new
              FROM oc FULL OUTER JOIN nc
                ON oc.doc_id = nc.doc_id AND oc.kind = nc.kind
               AND COALESCE(oc.text, chr(1)) = COALESCE(nc.text, chr(1))
               AND COALESCE(oc.media_ref, chr(1))
                   = COALESCE(nc.media_ref, chr(1)))
        SELECT doc_id,
               CAST(SUM(c_old) AS BIGINT) AS n_old_spans,
               CAST(SUM(c_new) AS BIGINT) AS n_new_spans,
               CAST(SUM(GREATEST(c_new - c_old, 0)) AS BIGINT) AS added,
               CAST(SUM(GREATEST(c_old - c_new, 0)) AS BIGINT) AS removed,
               CAST(SUM(LEAST(c_old, c_new)) AS BIGINT) AS unchanged,
               CAST(SUM(CASE WHEN kind = 'media'
                        THEN GREATEST(c_new - c_old, 0) ELSE 0 END)
                    AS BIGINT) AS media_added,
               CAST(SUM(CASE WHEN kind = 'media'
                        THEN GREATEST(c_old - c_new, 0) ELSE 0 END)
                    AS BIGINT) AS media_removed,
               SUM(GREATEST(c_new - c_old, 0))
                 + SUM(GREATEST(c_old - c_new, 0)) > 0 AS changed
        FROM m GROUP BY doc_id
    """,
        # Same closed-form ntile rule (never SQL NTILE — pinning the
        # formula keeps the Spark distributed-rank path checkable).
        "index_tiers": f"""
        WITH p AS ({_POSTINGS_SQL}),
        pd AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                      COUNT(DISTINCT word) AS nd, MAX(doc_len) AS dl
               FROM p GROUP BY 1),
        sc AS (SELECT doc_id, (1000 * nd) // dl AS score FROM pd),
        nn AS (SELECT COUNT(*) AS n FROM sc),
        rk AS (SELECT doc_id, score,
                      row_number() OVER (ORDER BY score DESC, doc_id) - 1
                        AS r
               FROM sc),
        ti AS (SELECT doc_id, score,
                      CASE WHEN r < ((SELECT n FROM nn) // 3 + 1)
                                    * ((SELECT n FROM nn) % 3)
                           THEN r // ((SELECT n FROM nn) // 3 + 1)
                           ELSE CASE WHEN (SELECT n FROM nn) // 3 > 0
                                THEN (r - (SELECT n FROM nn) % 3)
                                     // ((SELECT n FROM nn) // 3)
                                ELSE r END
                      END AS tier
               FROM rk),
        tk AS (SELECT doc_id FROM (
                 SELECT doc_id, SUM(term_count) AS tf
                 FROM p WHERE word IN ('table', 'join', 'query')
                 GROUP BY 1 ORDER BY tf DESC, doc_id LIMIT 20)),
        tot AS (SELECT COUNT(*) AS c FROM tk),
        h AS (SELECT tier, COUNT(*) AS topk_hits
              FROM ti JOIN tk USING (doc_id) GROUP BY 1),
        pt AS (SELECT tier, COUNT(*) AS n_docs,
                      MIN(score) AS min_score, MAX(score) AS max_score
               FROM ti GROUP BY 1)
        SELECT CAST(pt.tier AS BIGINT) AS tier,
               CAST(n_docs AS BIGINT) AS n_docs,
               CAST(min_score AS BIGINT) AS min_score,
               CAST(max_score AS BIGINT) AS max_score,
               CAST(COALESCE(h.topk_hits, 0) AS BIGINT) AS topk_hits,
               CAST(SUM(COALESCE(h.topk_hits, 0))
                    OVER (ORDER BY pt.tier) AS BIGINT) AS cum_hits,
               SUM(COALESCE(h.topk_hits, 0)) OVER (ORDER BY pt.tier)
                 >= (SELECT c FROM tot) AS covers_topk
        FROM pt LEFT JOIN h USING (tier)
    """,
    }
)


def _q_cocitation(spark, sf_dir):
    """Engine addition: co-citation relatedness (Small 1973) over the
    synthetic expander — pages co-linked by a shared source, hub-capped
    self-join (linkgraph.py:cocitation_pairs)."""
    from see_spark.operators.linkgraph import cocitation_pairs, synthetic_edges

    return cocitation_pairs(synthetic_edges(_documents(spark, sf_dir)))


def _q_coupling(spark, sf_dir):
    """Engine addition: bibliographic coupling (Kessler 1963), the dual
    signal — pages sharing outlink targets, in-degree-capped
    (linkgraph.py:coupling_pairs)."""
    from see_spark.operators.linkgraph import coupling_pairs, synthetic_edges

    return coupling_pairs(synthetic_edges(_documents(spark, sf_dir)))


def _q_host_graph(spark, sf_dir):
    """Engine addition: host-graph condensation (linkgraph.py:
    host_condense) — the page graph collapsed to host edges with link
    multiplicity + distinct endpoint counts; hosts = doc_id % 19."""
    from see_spark.operators.linkgraph import host_condense, synthetic_edges

    edges = synthetic_edges(_documents(spark, sf_dir))
    host = lambda c: F.concat(F.lit("h"), (F.col(c) % 19).cast("string"))
    return host_condense(edges, host("src"), host("dst"))


def _q_query_chains(spark, sf_dir):
    """Engine addition: next-query suggestion mining (query-flow-graph
    count core) from a deterministic query log derived from events —
    session gap 1800 s, top-3 per query (lexicon.py:query_chains)."""
    from see_spark.operators.lexicon import query_chains

    ev = _events(spark, sf_dir)
    q = ev.select(
        "user_id",
        # unix_micros on the session-TZ-cast timestamp matches DuckDB
        # epoch_us on the naive value (pinned convention, _events)
        F.expr("unix_micros(ts) div 1000000").alias("ts"),
        F.concat(F.lit("q"), (F.col("event_id") % 23).cast("string")).alias(
            "query"
        ),
    )
    return query_chains(q)


QUERIES_EXTRA.update(
    {
        "cocitation": _q_cocitation,
        "coupling": _q_coupling,
        "host_graph": _q_host_graph,
        "query_chains": _q_query_chains,
    }
)


ORACLES_EXTRA.update(
    {
        "cocitation": f"""
        WITH {_LINKGRAPH_SQL},
        dg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
        e AS (SELECT edges.src, edges.dst FROM edges
              JOIN dg ON dg.src = edges.src AND dg.d <= 64)
        SELECT a.dst AS doc_a, b.dst AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS cocite
        FROM e a JOIN e b ON a.src = b.src AND a.dst < b.dst
        GROUP BY 1, 2
    """,
        "coupling": f"""
        WITH {_LINKGRAPH_SQL},
        dg AS (SELECT dst, COUNT(*) AS d FROM edges GROUP BY 1),
        e AS (SELECT edges.src, edges.dst FROM edges
              JOIN dg ON dg.dst = edges.dst AND dg.d <= 64)
        SELECT a.src AS doc_a, b.src AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS coupling
        FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
        GROUP BY 1, 2
    """,
        "host_graph": f"""
        WITH {_LINKGRAPH_SQL}
        SELECT 'h' || CAST(src % 19 AS VARCHAR) AS src_host,
               'h' || CAST(dst % 19 AS VARCHAR) AS dst_host,
               CAST(COUNT(*) AS BIGINT) AS n_links,
               CAST(COUNT(DISTINCT src) AS BIGINT) AS n_src_pages,
               CAST(COUNT(DISTINCT dst) AS BIGINT) AS n_dst_pages,
               ('h' || CAST(src % 19 AS VARCHAR))
                 = ('h' || CAST(dst % 19 AS VARCHAR)) AS self_loop
        FROM edges GROUP BY 1, 2
    """,
        # lead() pairing over (ts-seconds, query) is a total order for
        # distinct queries; identical rows pair invariantly (see
        # lexicon.query_chains docstring).
        "query_chains": """
        WITH q AS (SELECT user_id, epoch_ms(ts) // 1000 AS ts,
                          'q' || CAST(event_id % 23 AS VARCHAR) AS query
                   FROM events),
        nx AS (SELECT user_id, ts, query,
                      lead(query) OVER (PARTITION BY user_id
                                        ORDER BY ts, query) AS nq,
                      lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, query) AS nts
               FROM q),
        p AS (SELECT query, nq AS next_query, COUNT(*) AS n_obs
              FROM nx
              WHERE nq IS NOT NULL AND nts - ts <= 1800 AND nq <> query
              GROUP BY 1, 2)
        SELECT query, next_query, n_obs, rank FROM (
          SELECT query, next_query, CAST(n_obs AS BIGINT) AS n_obs,
                 CAST(row_number() OVER (PARTITION BY query
                        ORDER BY n_obs DESC, next_query) AS BIGINT) AS rank
          FROM p)
        WHERE rank <= 3
    """,
    }
)


def _q_hyperball(spark, sf_dir):
    """Engine addition: HyperBall 2-hop neighborhood-size estimation
    (Boldi & Vigna 2013; linkgraph.py:hyperball) over the synthetic
    expander, p=8 portable-HLL sketches — audited against the exact
    2-hop ball size computed inline (sketch-union idempotence makes the
    oracle a direct HLL over the exact member set)."""
    from see_spark.operators.linkgraph import hyperball, synthetic_edges

    docs = _documents(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    e = synthetic_edges(docs)
    m0 = nodes.select("node", F.col("node").alias("member"))
    m1 = e.select(F.col("src").alias("node"), F.col("dst").alias("member"))
    m2 = (
        e.alias("a")
        .join(e.alias("b"), F.col("a.dst") == F.col("b.src"))
        .select(F.col("a.src").alias("node"), F.col("b.dst").alias("member"))
    )
    exact = (
        m0.unionByName(m1)
        .unionByName(m2)
        .distinct()
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_exact"))
    )
    return hyperball(nodes, e, n_iter=2, p=8).join(exact, "node").select(
        "node", "n_exact", "ball_estimate"
    )


def _q_skew_audit(spark, sf_dir):
    """Engine addition: shuffle-key skew audit + salting recommendation
    (sharding.py:skew_audit) over the synthetic frontier's host key —
    integer-exact share/Gini/salt-factor, top-10 heavy hitters."""
    from see_spark.operators.sharding import skew_audit

    return skew_audit(
        _orders_frontier(spark, sf_dir), "host", top_k=10,
        target_share_milli=50,
    )


QUERIES_EXTRA.update(
    {
        "hyperball": _q_hyperball,
        "skew_audit": _q_skew_audit,
    }
)

# alpha * m^2 evaluated in Python once (hll_estimate does the same), so
# the SQL literal is the identical double
_HB_ALPHA_MM = 0.7213 / (1 + 1.079 / 256) * 256 * 256

ORACLES_EXTRA.update(
    {
        # Exact 2-hop member sets -> portable-HLL registers (same md5
        # bucket / leading-zero CASE rank as host_distinct_hll, m=256)
        # -> same harmonic estimate with the Python-literal alpha*m^2.
        "hyperball": f"""
        WITH {_LINKGRAPH_SQL},
        m0 AS (SELECT node, node AS member FROM nodes),
        m1 AS (SELECT src AS node, dst AS member FROM edges),
        m2 AS (SELECT a.src AS node, b.dst AS member
               FROM edges a JOIN edges b ON a.dst = b.src),
        mem AS (SELECT DISTINCT node, member FROM (
                  SELECT * FROM m0 UNION ALL
                  SELECT * FROM m1 UNION ALL
                  SELECT * FROM m2)),
        r AS (SELECT node,
                     ('0x' || substr(md5(CAST(member AS VARCHAR)), 1, 3))
                       ::BIGINT % 256 AS bucket,
                     ltrim(substr(md5(CAST(member AS VARCHAR)), 4, 15), '0')
                       AS stripped
              FROM mem),
        ranks AS (SELECT node, bucket,
                 CASE WHEN strlen(stripped) = 0 THEN 61
                      ELSE (15 - strlen(stripped)) * 4 +
                           CASE WHEN ('0x' || substr(stripped,1,1))::INT >= 8
                                  THEN 0
                                WHEN ('0x' || substr(stripped,1,1))::INT >= 4
                                  THEN 1
                                WHEN ('0x' || substr(stripped,1,1))::INT >= 2
                                  THEN 2
                                ELSE 3 END + 1
                 END AS rank
                 FROM r),
        sk AS (SELECT node, bucket, MAX(rank) AS register
               FROM ranks GROUP BY 1, 2),
        agg AS (SELECT node, COUNT(*) AS nb,
                       SUM(pow(2.0, -register)) AS obs
                FROM sk GROUP BY node),
        est AS (SELECT node,
                       CASE WHEN raw <= 2.5 * 256 AND (256 - nb) > 0
                            THEN 256.0 * ln(256.0 / (256 - nb))
                            ELSE raw END AS e
                FROM (SELECT node, nb,
                             {_HB_ALPHA_MM!r} / (obs + (256 - nb)) AS raw
                      FROM agg)),
        exact AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_exact
                  FROM mem GROUP BY node)
        SELECT est.node, exact.n_exact, ROUND(est.e, 4) AS ball_estimate
        FROM est JOIN exact USING (node)
    """,
        # Exact-integer skew measures replayed: rank-formula Gini over
        # counts sorted (n, key), floor-div shares, ceil-div salt.
        "skew_audit": f"""
        WITH frontier AS ({_FRONTIER_SQL}),
        c AS (SELECT host AS key, COUNT(*) AS n FROM frontier GROUP BY 1),
        rk AS (SELECT key, n,
                      row_number() OVER (ORDER BY n, key) AS r
               FROM c),
        scal AS (SELECT COUNT(*) AS k, SUM(n) AS tot,
                        SUM(r * n) AS sumrx, MAX(n) AS maxn
                 FROM rk)
        SELECT key, CAST(n AS BIGINT) AS n,
               CAST((1000 * n) // (SELECT tot FROM scal) AS BIGINT)
                 AS share_milli,
               CAST(row_number() OVER (ORDER BY n DESC, key) AS BIGINT)
                 AS rank,
               CAST((SELECT k FROM scal) AS BIGINT) AS n_keys,
               CAST((SELECT tot FROM scal) AS BIGINT) AS total,
               CAST((2000 * (SELECT sumrx FROM scal)
                     - 1000 * ((SELECT k FROM scal) + 1)
                       * (SELECT tot FROM scal))
                    // ((SELECT k FROM scal) * (SELECT tot FROM scal))
                    AS BIGINT) AS gini_milli,
               CAST(GREATEST(
                 (((1000 * (SELECT maxn FROM scal))
                   // (SELECT tot FROM scal)) + 49) // 50, 1) AS BIGINT)
                 AS salt_k
        FROM c ORDER BY n DESC, key LIMIT 10
    """,
    }
)


def _q_content_novelty(spark, sf_dir):
    """Engine addition: content-level crawl yield curve — per synthetic
    round (doc_id % 5), the fraction of distinct 3-word shingles never
    seen in earlier rounds (discovery.py:content_novelty)."""
    from see_spark.operators.discovery import content_novelty

    docs = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
        (F.col("doc_id").cast("long") % 5).alias("round"),
    )
    return content_novelty(docs, n=3)


def _q_padding_waste(spark, sf_dir):
    """Engine addition: length-bucketed batching waste audit
    (packing.py:padding_waste) — pad-to-boundary token waste per bucket,
    integer-exact."""
    from see_spark.operators.packing import padding_waste

    return padding_waste(_documents(spark, sf_dir))


def _q_cloaking_audit(spark, sf_dir):
    """Engine addition: dual-UA cloaking detection (Wu & Davison 2005;
    reputation.py:cloaking_audit) over a deterministic probe log — user
    variant differs on a per-host modulus, every 17th URL lacks the
    user probe (evidence-floor path)."""
    from see_spark.operators.reputation import cloaking_audit

    d = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    base = d.select(
        "doc_id",
        F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("doc_id") % 19).cast("string")).alias(
            "host"
        ),
        "text",
        (F.lit(3) + (F.col("doc_id") % 19) % 4).alias("__div"),
    )
    bot = base.select(
        "url", "host", F.lit("bot").alias("ua"), F.md5("text").alias("content_hash")
    )
    usr = base.where(F.col("doc_id") % 17 != 0).select(
        "url",
        "host",
        F.lit("user").alias("ua"),
        F.md5(
            F.concat(
                F.col("text"),
                F.when(F.col("doc_id") % F.col("__div") == 0, F.lit("AD"))
                .otherwise(F.lit("")),
            )
        ).alias("content_hash"),
    )
    return cloaking_audit(bot.unionByName(usr))


QUERIES_EXTRA.update(
    {
        "content_novelty": _q_content_novelty,
        "padding_waste": _q_padding_waste,
        "cloaking_audit": _q_cloaking_audit,
    }
)


ORACLES_EXTRA.update(
    {
        # Same distinct-shingle rounds: min round per shingle = novelty.
        "content_novelty": f"""
        WITH {_SHINGLES3_SQL},
        rs AS (SELECT DISTINCT (doc_id % 5) AS round, shingle FROM sh),
        fr AS (SELECT shingle, MIN(round) AS first_round
               FROM rs GROUP BY 1),
        pr AS (SELECT rs.round,
                      COUNT(*) AS n_shingles,
                      SUM(CASE WHEN rs.round = fr.first_round
                          THEN 1 ELSE 0 END) AS n_novel
               FROM rs JOIN fr USING (shingle) GROUP BY 1),
        dr AS (SELECT (CAST(doc_id AS BIGINT) % 5) AS round,
                      COUNT(*) AS n_docs
               FROM documents GROUP BY 1)
        SELECT dr.round, CAST(dr.n_docs AS BIGINT) AS n_docs,
               CAST(COALESCE(pr.n_shingles, 0) AS BIGINT) AS n_shingles,
               CAST(COALESCE(pr.n_novel, 0) AS BIGINT) AS n_novel,
               CAST(CASE WHEN COALESCE(pr.n_shingles, 0) > 0
                    THEN (1000 * pr.n_novel) // pr.n_shingles
                    ELSE 0 END AS BIGINT) AS novelty_milli
        FROM dr LEFT JOIN pr USING (round)
    """,
        "padding_waste": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          len(string_split(text, ' ')) AS n
                   FROM documents),
        b AS (SELECT doc_id, n,
                     CASE WHEN n <= 64 THEN '64'
                          WHEN n <= 128 THEN '128'
                          WHEN n <= 256 THEN '256'
                          WHEN n <= 512 THEN '512'
                          ELSE 'overflow' END AS bucket,
                     CASE WHEN n <= 64 THEN 64 - n
                          WHEN n <= 128 THEN 128 - n
                          WHEN n <= 256 THEN 256 - n
                          WHEN n <= 512 THEN 512 - n
                          ELSE 0 END AS pad
              FROM d)
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS total_tokens,
               CAST(SUM(pad) AS BIGINT) AS total_padding,
               CAST((1000 * SUM(pad)) // (SUM(pad) + SUM(n)) AS BIGINT)
                 AS padding_milli
        FROM b GROUP BY 1
    """,
        "cloaking_audit": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
                          'u' || CAST(doc_id AS VARCHAR) AS url,
                          'h' || CAST(CAST(doc_id AS BIGINT) % 19 AS VARCHAR)
                            AS host,
                          3 + (CAST(doc_id AS BIGINT) % 19) % 4 AS dv
                   FROM documents),
        probes AS (SELECT url, host, md5(text) AS bot_h,
                          CASE WHEN doc_id % 17 <> 0
                               THEN md5(text || CASE WHEN doc_id % dv = 0
                                                THEN 'AD' ELSE '' END)
                               END AS usr_h
                   FROM d),
        per AS (SELECT host, COUNT(*) AS n_probed,
                       SUM(CASE WHEN usr_h IS NOT NULL THEN 1 ELSE 0 END)
                         AS n_both,
                       SUM(CASE WHEN usr_h IS NOT NULL AND usr_h <> bot_h
                           THEN 1 ELSE 0 END) AS n_diff
                FROM probes GROUP BY 1)
        SELECT host, CAST(n_probed AS BIGINT) AS n_probed,
               CAST(n_both AS BIGINT) AS n_both,
               CAST(n_diff AS BIGINT) AS n_diff,
               CAST(CASE WHEN n_both > 0 THEN (1000 * n_diff) // n_both
                    ELSE 0 END AS BIGINT) AS cloak_milli,
               (n_both >= 3 AND CASE WHEN n_both > 0
                  THEN (1000 * n_diff) // n_both ELSE 0 END >= 300)
                 AS flagged
        FROM per
    """,
    }
)


def _q_media_reuse(spark, sf_dir):
    """Engine addition: hotlink/shared-asset audit over interleaved media
    spans (multimodal.py:media_reuse) — every even-position media slot
    points at a shared asset (doc_id % 7 pool), odd slots are unique."""
    from see_spark.operators.multimodal import media_reuse

    d = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(8.0)).cast("int")
    ex = d.select(
        "doc_id", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("pos")
    ).where((F.col("doc_id") + F.col("pos")) % 3 == 0)
    spans = ex.select(
        "doc_id",
        F.lit("media").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.when(
            F.col("pos") % 2 == 0,
            F.concat(F.lit("img://shared/"), (F.col("doc_id") % 7).cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("img://"),
                F.col("doc_id").cast("string"),
                F.lit("/"),
                F.col("pos").cast("string"),
            )
        )
        .alias("media_ref"),
        F.col("pos").cast("long").alias("offset"),
    )
    return media_reuse(spans)


QUERIES_EXTRA.update({"media_reuse": _q_media_reuse})


ORACLES_EXTRA.update(
    {
        "media_reuse": f"""
        WITH {_CHUNKS_SQL},
        sp AS (SELECT doc_id,
                      CASE WHEN i % 2 = 0
                           THEN 'img://shared/' || CAST(doc_id % 7 AS VARCHAR)
                           ELSE 'img://' || CAST(doc_id AS VARCHAR) || '/'
                                || CAST(i AS VARCHAR) END AS media_ref
               FROM l2 WHERE (doc_id + i) % 3 = 0)
        SELECT media_ref, CAST(COUNT(*) AS BIGINT) AS n_refs,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               COUNT(DISTINCT doc_id) > 1 AS shared
        FROM sp GROUP BY 1
    """,
    }
)


def _q_nepotism_audit(spark, sf_dir):
    """Engine addition: nepotistic-link audit (Davison 2000) over the
    condensed host graph — hosts 's{doc%3}.org{doc%7}.com' share PLDs in
    triples, so same-PLD cross-host edges are real
    (pld.py:nepotism_audit over linkgraph.host_condense)."""
    from see_spark.operators.linkgraph import host_condense, synthetic_edges
    from see_spark.operators.pld import nepotism_audit

    edges = synthetic_edges(_documents(spark, sf_dir))
    host = lambda c: F.concat(
        F.lit("s"), (F.col(c) % 3).cast("string"),
        F.lit(".org"), (F.col(c) % 7).cast("string"), F.lit(".com"),
    )
    return nepotism_audit(host_condense(edges, host("src"), host("dst")))


QUERIES_EXTRA.update({"nepotism_audit": _q_nepotism_audit})


ORACLES_EXTRA.update(
    {
        # PLD of 's{a}.org{b}.com' is the last two labels (suffix 'com'
        # + one label) — the pld_expr rule specialized to this shape.
        "nepotism_audit": f"""
        WITH {_LINKGRAPH_SQL},
        he AS (SELECT 's' || CAST(src % 3 AS VARCHAR) || '.org'
                        || CAST(src % 7 AS VARCHAR) || '.com' AS src_host,
                      's' || CAST(dst % 3 AS VARCHAR) || '.org'
                        || CAST(dst % 7 AS VARCHAR) || '.com' AS dst_host,
                      COUNT(*) AS n_links
               FROM edges GROUP BY 1, 2),
        p AS (SELECT src_host, dst_host, n_links,
                     'org' || string_split(src_host, '.')[2][4:]
                       || '.com' AS pld,
                     'org' || string_split(dst_host, '.')[2][4:]
                       || '.com' AS dst_pld
              FROM he),
        agg AS (SELECT pld,
                       COUNT(DISTINCT src_host) AS n_hosts,
                       SUM(CASE WHEN src_host = dst_host
                           THEN n_links ELSE 0 END) AS intra_links,
                       SUM(CASE WHEN src_host <> dst_host AND pld = dst_pld
                           THEN n_links ELSE 0 END) AS nepotistic_links,
                       SUM(CASE WHEN pld <> dst_pld
                           THEN n_links ELSE 0 END) AS external_links
                FROM p GROUP BY 1)
        SELECT pld, CAST(n_hosts AS BIGINT) AS n_hosts,
               CAST(intra_links AS BIGINT) AS intra_links,
               CAST(nepotistic_links AS BIGINT) AS nepotistic_links,
               CAST(external_links AS BIGINT) AS external_links,
               CAST(CASE WHEN nepotistic_links + external_links > 0
                    THEN (1000 * nepotistic_links)
                         // (nepotistic_links + external_links)
                    ELSE 0 END AS BIGINT) AS nepotism_milli,
               (CASE WHEN nepotistic_links + external_links > 0
                 THEN (1000 * nepotistic_links)
                      // (nepotistic_links + external_links)
                 ELSE 0 END >= 500 AND nepotistic_links >= 3) AS flagged
        FROM agg
    """,
    }
)


def _q_click_attribution(spark, sf_dir):
    """Engine addition: click-to-impression attribution — the
    stream-stream interval join's batch twin on static frames
    (streaming/joins.py:click_attribution, same function; stream==batch
    pinned by tests/test_stream_join.py). 2-hour window, inclusive."""
    from see_spark.streaming.joins import click_attribution

    ev = _events(spark, sf_dir)
    imps = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("imp_id")
    )
    clks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    return click_attribution(imps, clks, window_s=7200)


def _q_anchor_diversity(spark, sf_dir):
    """Engine addition: anchor-text diversity audit (exact-match anchor
    concentration, the over-optimization signal) over a deterministic
    inlink log (linkgraph.py:anchor_diversity)."""
    from see_spark.operators.linkgraph import anchor_diversity

    d = _documents(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"))
    anchors = d.select(
        F.concat(F.lit("u"), (F.col("doc_id") % 37).cast("string")).alias("href"),
        F.concat(
            F.lit("text"),
            (F.col("doc_id") % (2 + (F.col("doc_id") % 37) % 3)).cast("string"),
        ).alias("anchor"),
    )
    return anchor_diversity(anchors)


QUERIES_EXTRA.update(
    {
        "click_attribution": _q_click_attribution,
        "anchor_diversity": _q_anchor_diversity,
    }
)


ORACLES_EXTRA.update(
    {
        "click_attribution": """
        WITH imps AS (SELECT user_id, ts AS imp_ts, event_id AS imp_id
                      FROM events WHERE event_type = 'view'),
        clks AS (SELECT user_id, ts AS click_ts, event_id AS click_id
                 FROM events WHERE event_type = 'click')
        SELECT i.user_id, CAST(i.imp_id AS BIGINT) AS imp_id,
               CAST(c.click_id AS BIGINT) AS click_id,
               i.imp_ts, c.click_ts,
               (epoch_us(c.click_ts) - epoch_us(i.imp_ts)) // 1000000
                 AS lag_s
        FROM imps i JOIN clks c
          ON i.user_id = c.user_id
         AND c.click_ts >= i.imp_ts
         AND c.click_ts <= i.imp_ts + INTERVAL 7200 SECONDS
    """,
        "anchor_diversity": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents),
        a AS (SELECT 'u' || CAST(doc_id % 37 AS VARCHAR) AS href,
                     'text' || CAST(doc_id % (2 + (doc_id % 37) % 3)
                                    AS VARCHAR) AS anchor
              FROM d),
        c AS (SELECT href, anchor, COUNT(*) AS cnt FROM a GROUP BY 1, 2),
        t AS (SELECT href, anchor AS top_anchor, cnt AS top_cnt FROM (
                SELECT href, anchor, cnt,
                       row_number() OVER (PARTITION BY href
                         ORDER BY cnt DESC, anchor ASC) AS rn
                FROM c) WHERE rn = 1),
        p AS (SELECT href, SUM(cnt) AS n_anchors, COUNT(*) AS n_distinct
              FROM c GROUP BY 1)
        SELECT p.href, CAST(n_anchors AS BIGINT) AS n_anchors,
               CAST(n_distinct AS BIGINT) AS n_distinct,
               t.top_anchor,
               CAST((1000 * t.top_cnt) // n_anchors AS BIGINT)
                 AS top_share_milli,
               (n_anchors >= 5 AND (1000 * t.top_cnt) // n_anchors >= 900)
                 AS flagged
        FROM p JOIN t USING (href)
    """,
    }
)


def _q_grouped_split(spark, sf_dir):
    """Engine addition: leakage-safe GROUP-wise train/val/test split
    (selection.py:grouped_split) — the split hashes the host, so a
    site's near-duplicate pages can never straddle splits."""
    from see_spark.operators.selection import grouped_split

    docs = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(F.lit("h"), (F.col("doc_id") % 19).cast("string")).alias(
            "host"
        ),
    )
    return grouped_split(docs)


def _q_pagerank_residuals(spark, sf_dir):
    """Engine addition: PageRank convergence audit — per-iteration L1
    residual + max delta over the synthetic expander
    (linkgraph.py:pagerank_residuals); oracle unrolls the identical
    power method and residual sums, 9dp."""
    from see_spark.operators.linkgraph import pagerank_residuals, synthetic_edges

    docs = _documents(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    return pagerank_residuals(nodes, synthetic_edges(docs), n_iter=5)


QUERIES_EXTRA.update(
    {
        "grouped_split": _q_grouped_split,
        "pagerank_residuals": _q_pagerank_residuals,
    }
)


def _pagerank_residuals_oracle_sql(n_iter: int = 5, d: float = 0.85) -> str:
    """The _pagerank_oracle_sql unroll, emitting per-iteration L1/max
    residuals instead of final ranks."""
    ctes = [
        _LINKGRAPH_SQL,
        "r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        p = f"r{i-1}"
        ctes.append(
            f"d{i} AS (SELECT COALESCE(SUM(r.rank), 0.0) AS dang FROM {p} r"
            f" LEFT JOIN outdeg o ON o.src = r.node WHERE o.src IS NULL)"
        )
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node, SUM(r.rank / o.deg) AS contrib"
            f" FROM edges e JOIN {p} r ON e.src = r.node"
            f" JOIN outdeg o ON o.src = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i} AS (SELECT b.node,"
            f" (1.0 - {d})/(SELECT n FROM nn)"
            f" + {d} * (COALESCE(c.contrib, 0.0)"
            f" + (SELECT dang FROM d{i})/(SELECT n FROM nn)) AS rank"
            f" FROM nodes b LEFT JOIN c{i} c ON c.node = b.node)"
        )
        ctes.append(
            f"res{i} AS (SELECT CAST({i} AS BIGINT) AS iteration,"
            f" ROUND(SUM(ABS(a.rank - b.rank)), 9) AS l1_residual,"
            f" ROUND(MAX(ABS(a.rank - b.rank)), 9) AS max_delta"
            f" FROM r{i} a JOIN r{i-1} b USING (node))"
        )
    union = "\n    UNION ALL ".join(f"SELECT * FROM res{i}" for i in range(1, n_iter + 1))
    return "WITH " + ",\n    ".join(ctes) + "\n    " + union


ORACLES_EXTRA.update(
    {
        "grouped_split": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          'h' || CAST(CAST(doc_id AS BIGINT) % 19 AS VARCHAR)
                            AS grp
                   FROM documents),
        b AS (SELECT doc_id, grp,
                     ('0x' || substr(md5(grp), 1, 15))::BIGINT % 1000
                       AS bucket
              FROM d)
        SELECT doc_id, grp AS "group", CAST(bucket AS BIGINT) AS bucket,
               CASE WHEN bucket < 800 THEN 'train'
                    WHEN bucket < 900 THEN 'val'
                    ELSE 'test' END AS split
        FROM b
    """,
        "pagerank_residuals": _pagerank_residuals_oracle_sql(),
    }
)


def _q_search_rrf(spark, sf_dir):
    """Engine addition: reciprocal-rank fusion (Cormack et al. 2009) of
    the tf-sum and tf-rate rankers for the pinned query — integer-micro
    contributions, engine-exact (search.py:search_rrf)."""
    from see_spark.operators.search import search_rrf

    return search_rrf(_doc_postings(spark, sf_dir), _SEARCH_WORDS)


QUERIES_EXTRA.update({"search_rrf": _q_search_rrf})


ORACLES_EXTRA.update(
    {
        "search_rrf": f"""
        WITH p AS ({_POSTINGS_SQL}),
        m AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     SUM(term_count) AS tf_sum, MAX(doc_len) AS doc_len
              FROM p WHERE word IN ('table', 'join', 'query') GROUP BY 1),
        m2 AS (SELECT doc_id, tf_sum,
                      (1000 * tf_sum) // doc_len AS tf_norm
               FROM m),
        a AS (SELECT doc_id, row_number() OVER
                (ORDER BY tf_sum DESC, doc_id) AS rank_a
              FROM m2 ORDER BY tf_sum DESC, doc_id LIMIT 50),
        b AS (SELECT doc_id, row_number() OVER
                (ORDER BY tf_norm DESC, doc_id) AS rank_b
              FROM m2 ORDER BY tf_norm DESC, doc_id LIMIT 50),
        f AS (SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
                     COALESCE(rank_a, 0) AS rank_a,
                     COALESCE(rank_b, 0) AS rank_b
              FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id),
        s AS (SELECT doc_id, CAST(rank_a AS BIGINT) AS rank_a,
                     CAST(rank_b AS BIGINT) AS rank_b,
                     CAST(CASE WHEN rank_a > 0
                            THEN 1000000 // (60 + rank_a) ELSE 0 END
                        + CASE WHEN rank_b > 0
                            THEN 1000000 // (60 + rank_b) ELSE 0 END
                        AS BIGINT) AS rrf_micro
              FROM f)
        SELECT doc_id, rank_a, rank_b, rrf_micro,
               CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id)
                    AS BIGINT) AS rank
        FROM s ORDER BY rrf_micro DESC, doc_id LIMIT 20
    """,
    }
)


def _q_spam_mass(spark, sf_dir):
    """Engine addition: relative spam-mass estimation (Gyongyi,
    Garcia-Molina & Pedersen VLDB 2006) over the synthetic expander —
    (PageRank - TrustRank)/PageRank with every 10th doc trusted
    (linkgraph.py:spam_mass). Oracle = BOTH unrolled power methods
    joined, term-for-term."""
    from see_spark.operators.linkgraph import spam_mass, synthetic_edges

    docs = _documents(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    seeds = nodes.filter(F.col("node") % 10 == 0)
    return spam_mass(nodes, synthetic_edges(docs), seeds, n_iter=5)


QUERIES_EXTRA.update({"spam_mass": _q_spam_mass})


def _spam_mass_oracle_sql(n_iter: int = 5, d: float = 0.85) -> str:
    """Both unrolled power methods (uniform-teleport chain p*, the
    seed-personalized chain t*) in one statement, each term-for-term the
    expression the engine evaluates, joined for the mass computation."""
    ctes = [
        _LINKGRAPH_SQL,
        "sm AS (SELECT COUNT(*) AS m FROM nodes WHERE node % 10 = 0)",
        "tl AS (SELECT node, CASE WHEN node % 10 = 0"
        " THEN 1.0/(SELECT m FROM sm) ELSE 0.0 END AS tele FROM nodes)",
        "p0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS rank FROM nodes)",
        "t0 AS (SELECT node, tele AS rank FROM tl)",
    ]
    for i in range(1, n_iter + 1):
        for pre, base_cte in (("p", "nodes"), ("t", "tl")):
            prev = f"{pre}{i-1}"
            ctes.append(
                f"{pre}d{i} AS (SELECT COALESCE(SUM(r.rank), 0.0) AS dang"
                f" FROM {prev} r LEFT JOIN outdeg o ON o.src = r.node"
                f" WHERE o.src IS NULL)"
            )
            ctes.append(
                f"{pre}c{i} AS (SELECT e.dst AS node,"
                f" SUM(r.rank / o.deg) AS contrib"
                f" FROM edges e JOIN {prev} r ON e.src = r.node"
                f" JOIN outdeg o ON o.src = e.src GROUP BY e.dst)"
            )
            if pre == "p":
                rank_expr = (
                    f"(1.0 - {d})/(SELECT n FROM nn)"
                    f" + {d} * (COALESCE(c.contrib, 0.0)"
                    f" + (SELECT dang FROM pd{i})/(SELECT n FROM nn))"
                )
            else:
                rank_expr = (
                    f"(1.0 - {d}) * b.tele"
                    f" + {d} * (COALESCE(c.contrib, 0.0)"
                    f" + (SELECT dang FROM td{i}) * b.tele)"
                )
            ctes.append(
                f"{pre}{i} AS (SELECT b.node, {rank_expr} AS rank"
                f" FROM {base_cte} b LEFT JOIN {pre}c{i} c ON c.node = b.node)"
            )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT p.node,
           ROUND(p.rank, 9) AS rank,
           ROUND(t.rank, 9) AS trust,
           ROUND((p.rank - t.rank) / p.rank, 9) AS rel_mass,
           CAST(CASE WHEN ROUND((p.rank - t.rank) / p.rank, 9) >= 0.98
                      AND ROUND(p.rank, 9) * (SELECT n FROM nn) >= 1.0
                 THEN 1 ELSE 0 END AS INT) AS spam_candidate
    FROM p{n_iter} p JOIN t{n_iter} t USING (node)
    """
    )


ORACLES_EXTRA.update({"spam_mass": _spam_mass_oracle_sql()})


def _q_search_bm25f(spark, sf_dir):
    """Engine addition: BM25F multi-field ranking (Robertson, Zaragoza &
    Taylor CIKM 2004 — saturation AFTER field combination;
    search.py:search_bm25f). Title field = first-60-chars prefix, the same
    deterministic convention as search_title_boost; field length rides
    the postings rows. Score rounded to 6dp (ln rule)."""
    from see_spark.functions.udfs import tokenize_expr
    from see_spark.operators.search import search_bm25f

    docs = _documents(spark, sf_dir)
    title_counts = (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.explode(
                tokenize_expr(F.substring(F.col("text"), 1, 60))
            ).alias("word"),
        )
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("term_count"))
    )
    title_postings = title_counts.withColumn(
        "title_len",
        F.sum("term_count")
        .over(Window.partitionBy("doc_id"))
        .cast("long"),
    )
    from see_spark.operators.indexer import corpus_stats_increment

    body_postings = _doc_postings(spark, sf_dir)
    # per-field stats via the materialized corpus_stats path (the whole
    # corpus as one delta): query time never aggregates either postings
    # table for avg lengths
    stats = corpus_stats_increment(body_postings).unionByName(
        corpus_stats_increment(
            title_postings, field="title", len_col="title_len"
        )
    )
    res = search_bm25f(
        spark,
        " ".join(_SEARCH_WORDS),
        body_postings,
        title_postings,
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("source").alias("title"),
        ),
        docs.count(),
        corpus_stats=stats,
    )
    return res.select(F.col("url").alias("doc_id"), "title", "score")


QUERIES_EXTRA.update({"search_bm25f": _q_search_bm25f})


ORACLES_EXTRA.update(
    {
        # BM25F, term-for-term search_bm25f's IEEE expression: per-field
        # weighted tf over the field-length norm, summed per (doc, word)
        # BEFORE the k1 saturation; df over docs matching in ANY field.
        "search_bm25f": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        q AS (SELECT unnest(['table','join','query']) AS word),
        ttoks AS (
          SELECT doc_id, lower(tok) AS word
          FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(
                     regexp_replace(substr(text, 1, 60), '{_SEP_SQL}', ' ', 'g'),
                     '[ \t\n\r]')) AS tok
            FROM documents)
          WHERE strlen(tok) >= 2),
        tcounts AS (SELECT doc_id, word, COUNT(*) AS term_count
                    FROM ttoks GROUP BY doc_id, word),
        tpost AS (SELECT doc_id, word, term_count,
                         CAST(SUM(term_count) OVER (PARTITION BY doc_id)
                              AS BIGINT) AS title_len
                  FROM tcounts),
        ab AS (SELECT AVG(doc_len) AS a
               FROM (SELECT DISTINCT doc_id, doc_len FROM postings)),
        at AS (SELECT AVG(title_len) AS a
               FROM (SELECT DISTINCT doc_id, title_len FROM tpost)),
        fields AS (
          SELECT doc_id, word,
                 (1.0 * term_count)
                 / ((1.0 - 0.75) + 0.75 * doc_len / (SELECT a FROM ab)) AS wtf
          FROM postings JOIN q USING (word)
          UNION ALL
          SELECT doc_id, word,
                 (3.0 * term_count)
                 / ((1.0 - 0.6) + 0.6 * title_len / (SELECT a FROM at)) AS wtf
          FROM tpost JOIN q USING (word)),
        per_word AS (
          SELECT doc_id, word, SUM(wtf) AS tfn
          FROM fields GROUP BY doc_id, word),
        dfs AS (
          SELECT word, COUNT(DISTINCT doc_id) AS df
          FROM (SELECT word, doc_id FROM postings JOIN q USING (word)
                UNION ALL
                SELECT word, doc_id FROM tpost JOIN q USING (word))
          GROUP BY word),
        scored AS (
          SELECT doc_id, COUNT(*) AS n_words,
                 SUM(ln(1.0 + ((SELECT n_docs FROM n) - df + 0.5)
                              / (df + 0.5))
                     * tfn / (1.2 + tfn)) AS score
          FROM per_word JOIN dfs USING (word) GROUP BY doc_id),
        top AS (SELECT doc_id, score FROM scored WHERE n_words = 3
                ORDER BY score DESC, doc_id ASC LIMIT 100)
        SELECT t.doc_id, d.source AS title, ROUND(t.score, 6) AS score
        FROM top t JOIN documents d USING (doc_id)
    """,
    }
)




def _q_distance_distribution(spark, sf_dir):
    """Engine addition: neighborhood function + effective diameter from
    HyperBall (Boldi & Vigna 2013; linkgraph.py:distance_distribution)
    over the synthetic expander, p=8 — per-radius integer-e4 estimate
    sums and milli-hop interpolated 90th-percentile diameter; oracle =
    direct HLL over the exact r-ball member sets per radius (sketch-union
    idempotence), same integer pipeline."""
    from see_spark.operators.linkgraph import (
        distance_distribution, synthetic_edges,
    )

    docs = _documents(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    return distance_distribution(
        nodes, synthetic_edges(docs), n_iter=2, p=8, percentile_milli=900
    )


QUERIES_EXTRA.update({"distance_distribution": _q_distance_distribution})


ORACLES_EXTRA.update(
    {
        # Exact member sets at radius 0/1/2 -> the hyperball oracle's
        # register pipeline keyed by (radius, node) -> per-node estimate
        # -> integer-e4 sums -> integer milli-hop interpolation.
        "distance_distribution": f"""
        WITH {_LINKGRAPH_SQL},
        m0 AS (SELECT node, node AS member FROM nodes),
        m1 AS (SELECT src AS node, dst AS member FROM edges),
        m2 AS (SELECT a.src AS node, b.dst AS member
               FROM edges a JOIN edges b ON a.dst = b.src),
        allmem AS (
          SELECT 0 AS radius, node, member FROM m0
          UNION ALL
          SELECT 1, node, member FROM (
            SELECT DISTINCT node, member FROM (
              SELECT * FROM m0 UNION ALL SELECT * FROM m1))
          UNION ALL
          SELECT 2, node, member FROM (
            SELECT DISTINCT node, member FROM (
              SELECT * FROM m0 UNION ALL SELECT * FROM m1
              UNION ALL SELECT * FROM m2))),
        r AS (SELECT radius, node,
                     ('0x' || substr(md5(CAST(member AS VARCHAR)), 1, 3))
                       ::BIGINT % 256 AS bucket,
                     ltrim(substr(md5(CAST(member AS VARCHAR)), 4, 15), '0')
                       AS stripped
              FROM allmem),
        ranks AS (SELECT radius, node, bucket,
                 CASE WHEN strlen(stripped) = 0 THEN 61
                      ELSE (15 - strlen(stripped)) * 4 +
                           CASE WHEN ('0x' || substr(stripped,1,1))::INT >= 8
                                  THEN 0
                                WHEN ('0x' || substr(stripped,1,1))::INT >= 4
                                  THEN 1
                                WHEN ('0x' || substr(stripped,1,1))::INT >= 2
                                  THEN 2
                                ELSE 3 END + 1
                 END AS rank
                 FROM r),
        sk AS (SELECT radius, node, bucket, MAX(rank) AS register
               FROM ranks GROUP BY 1, 2, 3),
        agg AS (SELECT radius, node, COUNT(*) AS nb,
                       SUM(pow(2.0, -register)) AS obs
                FROM sk GROUP BY 1, 2),
        est AS (SELECT radius, node,
                       CASE WHEN raw <= 2.5 * 256 AND (256 - nb) > 0
                            THEN 256.0 * ln(256.0 / (256 - nb))
                            ELSE raw END AS e
                FROM (SELECT radius, node, nb,
                             {_HB_ALPHA_MM!r} / (obs + (256 - nb)) AS raw
                      FROM agg)),
        nf AS (SELECT radius,
                      CAST(SUM(CAST(ROUND(e * 10000, 0) AS BIGINT))
                           AS BIGINT) AS nf_e4
               FROM est GROUP BY radius),
        tgt AS (SELECT (900 * nf_e4) // 1000 AS t FROM nf WHERE radius = 2),
        crs AS (SELECT MIN(radius) AS r FROM nf
                WHERE nf_e4 >= (SELECT t FROM tgt)),
        effc AS (SELECT (SELECT r FROM crs) AS r, (SELECT t FROM tgt) AS t,
                        (SELECT nf_e4 FROM nf
                          WHERE radius = (SELECT r FROM crs)) AS cur,
                        COALESCE((SELECT nf_e4 FROM nf
                          WHERE radius = (SELECT r FROM crs) - 1), 0) AS prev),
        eff AS (SELECT CASE WHEN r = 0 THEN 0
                       ELSE (r - 1) * 1000
                            + ((t - prev) * 1000) // (cur - prev)
                       END AS e FROM effc)
        SELECT CAST(radius AS INT) AS radius, nf_e4,
               CAST(nf_e4 - COALESCE(lag(nf_e4) OVER (ORDER BY radius), 0)
                    AS BIGINT) AS delta_e4,
               CAST((SELECT e FROM eff) AS BIGINT) AS eff_diameter_milli
        FROM nf ORDER BY radius
    """,
    }
)




def _q_bowtie_classify(spark, sf_dir):
    """Engine addition: bow-tie decomposition relative to the seed's SCC
    (Broder et al. WWW 2000; linkgraph.py:bowtie_classify) over the
    deterministic bow-tie fixture graph (linkgraph.py:
    synthetic_bowtie_edges) — three delta-frontier BFS reachabilities,
    seed = doc 0 inside the core. Oracle = recursive-CTE reachability,
    set-exact."""
    from see_spark.operators.linkgraph import (
        bowtie_classify, synthetic_bowtie_edges,
    )

    docs = _documents(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    return bowtie_classify(
        nodes, synthetic_bowtie_edges(docs), seed=0, max_iters=60
    )


QUERIES_EXTRA.update({"bowtie_classify": _q_bowtie_classify})


ORACLES_EXTRA.update(
    {
        # The same bow-tie fixture graph, then WITH RECURSIVE forward /
        # backward / undirected reachability from node 0.
        "bowtie_classify": """
        WITH RECURSIVE
        nn AS (SELECT COUNT(*) AS n FROM documents),
        lm AS (SELECT n - n // 10 AS l FROM nn),
        mm AS (SELECT ((SELECT l FROM lm) + 3) // 4 AS m),
        ids AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents
                WHERE doc_id < (SELECT l FROM lm)),
        eraw AS (
          SELECT id AS src,
                 ((id // 4 + 1) % (SELECT m FROM mm)) * 4 AS dst
          FROM ids WHERE id % 4 = 0
          UNION ALL
          SELECT id, ((id // 4 + 5) % (SELECT m FROM mm)) * 4
          FROM ids WHERE id % 4 = 0
          UNION ALL
          SELECT id, ((id // 4 + 25) % (SELECT m FROM mm)) * 4
          FROM ids WHERE id % 4 = 0
          UNION ALL
          SELECT id, id - 1 FROM ids WHERE id % 4 = 1
          UNION ALL
          SELECT id, id + 2 FROM ids
          WHERE id % 4 = 0 AND id + 2 < (SELECT l FROM lm)
          UNION ALL
          SELECT id, id + 2 FROM ids
          WHERE id % 4 = 1 AND id + 2 < (SELECT l FROM lm)),
        e AS (SELECT src, dst FROM eraw WHERE src <> dst),
        und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        fwd(node) AS (
          SELECT CAST(0 AS BIGINT)
          UNION
          SELECT e.dst FROM fwd, e WHERE e.src = fwd.node),
        bwd(node) AS (
          SELECT CAST(0 AS BIGINT)
          UNION
          SELECT e.src FROM bwd, e WHERE e.dst = bwd.node),
        wk(node) AS (
          SELECT CAST(0 AS BIGINT)
          UNION
          SELECT und.dst FROM wk, und WHERE und.src = wk.node)
        SELECT b.node,
               CASE WHEN f.node IS NOT NULL AND bb.node IS NOT NULL
                      THEN 'scc'
                    WHEN bb.node IS NOT NULL THEN 'in'
                    WHEN f.node IS NOT NULL THEN 'out'
                    WHEN w.node IS NOT NULL THEN 'tendril'
                    ELSE 'disconnected' END AS component
        FROM (SELECT CAST(doc_id AS BIGINT) AS node FROM documents) b
        LEFT JOIN fwd f ON f.node = b.node
        LEFT JOIN bwd bb ON bb.node = b.node
        LEFT JOIN wk w ON w.node = b.node
    """,
    }
)




def _q_salsa_synth(spark, sf_dir):
    """Engine addition: 3-iteration SALSA (Lempel & Moran WWW 2000 — the
    stochastic hub/authority walks; linkgraph.py:salsa) over the
    deterministic synthetic expander on documents doc_ids. Oracle = the
    unrolled backward/forward bipartite walk in SQL, term-for-term."""
    from see_spark.operators.linkgraph import salsa, synthetic_edges

    docs = _documents(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    return salsa(nodes, synthetic_edges(docs), n_iter=3)


QUERIES_EXTRA.update({"salsa_synth": _q_salsa_synth})


def _salsa_oracle_sql(n_iter: int = 3) -> str:
    """Unrolled SALSA, term-for-term the salsa() evaluation: each
    iteration is a backward half-step (authority mass to hubs across
    in-links, divided by the target's in-degree) then a forward half-step
    (hub mass to authorities across out-links, divided by the source's
    out-degree), and the mirror pair for the hub walk. No normalizers —
    both half-steps are stochastic."""
    ctes = [
        _LINKGRAPH_SQL,
        "indeg AS (SELECT dst, COUNT(*) AS deg FROM edges GROUP BY dst)",
        "an AS (SELECT DISTINCT dst AS node FROM edges)",
        "hn AS (SELECT DISTINCT src AS node FROM edges)",
        "a0 AS (SELECT node, 1.0/(SELECT COUNT(*) FROM an) AS authority FROM an)",
        "h0 AS (SELECT node, 1.0/(SELECT COUNT(*) FROM hn) AS hub FROM hn)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"hm{i} AS (SELECT e.src AS node, SUM(a.authority / ind.deg) AS mass"
            f" FROM edges e JOIN a{i-1} a ON e.dst = a.node"
            f" JOIN indeg ind ON ind.dst = e.dst GROUP BY e.src)"
        )
        ctes.append(
            f"a{i} AS (SELECT e.dst AS node, SUM(m.mass / o.deg) AS authority"
            f" FROM edges e JOIN hm{i} m ON e.src = m.node"
            f" JOIN outdeg o ON o.src = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"am{i} AS (SELECT e.dst AS node, SUM(h.hub / o.deg) AS mass"
            f" FROM edges e JOIN h{i-1} h ON e.src = h.node"
            f" JOIN outdeg o ON o.src = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"h{i} AS (SELECT e.src AS node, SUM(m.mass / ind.deg) AS hub"
            f" FROM edges e JOIN am{i} m ON e.dst = m.node"
            f" JOIN indeg ind ON ind.dst = e.dst GROUP BY e.src)"
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT n.node, ROUND(COALESCE(h.hub, 0.0), 9) AS hub,"
        f" ROUND(COALESCE(a.authority, 0.0), 9) AS authority"
        f" FROM nodes n LEFT JOIN h{n_iter} h ON h.node = n.node"
        f" LEFT JOIN a{n_iter} a ON a.node = n.node"
    )


ORACLES_EXTRA.update({"salsa_synth": _salsa_oracle_sql()})







def _q_degree_assortativity(spark, sf_dir):
    """Engine addition: the four directed degree-assortativity Pearson
    coefficients (Foster et al. PNAS 2010; linkgraph.py:
    degree_assortativity) over the synthetic expander — exact BIGINT
    moments, fixed-order double formula, so bit-identical to the SQL
    oracle."""
    from see_spark.operators.linkgraph import (
        degree_assortativity, synthetic_edges,
    )

    docs = _documents(spark, sf_dir)
    return degree_assortativity(synthetic_edges(docs))


QUERIES_EXTRA.update({"degree_assortativity": _q_degree_assortativity})


def _assort_case(name, xy, x, x2, y, y2):
    """One directed-assortativity CASE arm, same double op order and
    zero-variance NULL guard as linkgraph.degree_assortativity."""
    md = "CAST(m AS DOUBLE)"
    vx = f"({md}*CAST({x2} AS DOUBLE) - CAST({x} AS DOUBLE)*CAST({x} AS DOUBLE))"
    vy = f"({md}*CAST({y2} AS DOUBLE) - CAST({y} AS DOUBLE)*CAST({y} AS DOUBLE))"
    num = f"({md}*CAST({xy} AS DOUBLE) - CAST({x} AS DOUBLE)*CAST({y} AS DOUBLE))"
    return (
        f"CASE WHEN {vx} > 0 AND {vy} > 0 THEN "
        f"ROUND({num} / (SQRT({vx}) * SQRT({vy})), 9) END AS {name}"
    )


_ASSORT_CASES = ", ".join(
    _assort_case(*args)
    for args in [
        ("r_out_out", "s_oo", "sx_o", "sx_o2", "sy_o", "sy_o2"),
        ("r_out_in", "s_oi", "sx_o", "sx_o2", "sy_i", "sy_i2"),
        ("r_in_out", "s_io", "sx_i", "sx_i2", "sy_o", "sy_o2"),
        ("r_in_in", "s_ii", "sx_i", "sx_i2", "sy_i", "sy_i2"),
    ]
)


ORACLES_EXTRA.update(
    {
        # Same exact-integer moment sums over the expander edge list, same
        # double formula and op order, same zero-variance NULL guard.
        "degree_assortativity": f"""
        WITH {_LINKGRAPH_SQL},
        ideg AS (SELECT dst, COUNT(*) AS deg FROM edges GROUP BY dst),
        deg AS (
          SELECT COALESCE(o.src, i.dst) AS node,
                 COALESCE(o.deg, 0) AS out_deg, COALESCE(i.deg, 0) AS in_deg
          FROM outdeg o FULL OUTER JOIN ideg i ON o.src = i.dst),
        ed AS (
          SELECT s.out_deg AS s_out, s.in_deg AS s_in,
                 d.out_deg AS d_out, d.in_deg AS d_in
          FROM edges e JOIN deg s ON s.node = e.src
                       JOIN deg d ON d.node = e.dst),
        sums AS (
          SELECT COUNT(*) AS m,
                 SUM(s_out) AS sx_o, SUM(s_out*s_out) AS sx_o2,
                 SUM(s_in)  AS sx_i, SUM(s_in*s_in)   AS sx_i2,
                 SUM(d_out) AS sy_o, SUM(d_out*d_out) AS sy_o2,
                 SUM(d_in)  AS sy_i, SUM(d_in*d_in)   AS sy_i2,
                 SUM(s_out*d_out) AS s_oo, SUM(s_out*d_in) AS s_oi,
                 SUM(s_in*d_out)  AS s_io, SUM(s_in*d_in)  AS s_ii
          FROM ed)
        SELECT CAST(m AS BIGINT) AS m, {_ASSORT_CASES}
        FROM sums
    """,
    }
)




def _q_token_entropy(spark, sf_dir):
    """Engine addition: per-document Shannon entropy of the
    whitespace-token distribution (textstats.py:token_entropy) — the
    unigram-diversity quality signal next to quality_score and the Gopher
    repetition rules."""
    from see_spark.operators.textstats import token_entropy

    return token_entropy(_documents(spark, sf_dir))


QUERIES_EXTRA.update({"token_entropy": _q_token_entropy})


ORACLES_EXTRA.update(
    {
        # Same whitespace split as the token_counts oracle, same
        # H = log2(n) - sum(c*log2(c))/n form and 6dp rounding.
        "token_entropy": """
        WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          unnest(string_split(text, ' ')) AS tok
                   FROM documents),
        c AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY doc_id, tok),
        a AS (SELECT doc_id,
                     CAST(SUM(c) AS BIGINT) AS n_tokens,
                     CAST(COUNT(*) AS BIGINT) AS n_types,
                     SUM(c * log2(c)) AS s
              FROM c GROUP BY doc_id)
        SELECT doc_id, n_tokens, n_types,
               ROUND(log2(n_tokens) - s / n_tokens, 6) AS entropy_bits,
               CASE WHEN n_types > 1
                    THEN ROUND((log2(n_tokens) - s / n_tokens)
                               / log2(n_types), 6)
               END AS norm_entropy
        FROM a
    """,
    }
)




def _q_harmonic_centrality(spark, sf_dir):
    """Engine addition: n_iter-truncated harmonic centrality from
    HyperBall in-ball sketches on the transposed expander (Boldi & Vigna
    2013 §5; linkgraph.py:harmonic_centrality) — integer-e4 estimates,
    lcm-scaled exact harmonic sum. Oracle = direct HLL over the exact
    reversed r-ball member sets (sketch-union idempotence), same integer
    pipeline."""
    from see_spark.operators.linkgraph import (
        harmonic_centrality, synthetic_edges,
    )

    docs = _documents(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    return harmonic_centrality(nodes, synthetic_edges(docs), n_iter=2, p=8)


QUERIES_EXTRA.update({"harmonic_centrality": _q_harmonic_centrality})


ORACLES_EXTRA.update(
    {
        # Exact REVERSED-ball member sets at radius 0/1/2 -> the hyperball
        # register pipeline keyed by (radius, node) -> per-node integer-e4
        # estimates -> h = (e1-e0)*2 + (e2-e1), lcm(1,2)=2.
        "harmonic_centrality": f"""
        WITH {_LINKGRAPH_SQL},
        m0 AS (SELECT node, node AS member FROM nodes),
        m1 AS (SELECT dst AS node, src AS member FROM edges),
        m2 AS (SELECT b.dst AS node, a.src AS member
               FROM edges a JOIN edges b ON a.dst = b.src),
        allmem AS (
          SELECT 0 AS radius, node, member FROM m0
          UNION ALL
          SELECT 1, node, member FROM (
            SELECT DISTINCT node, member FROM (
              SELECT * FROM m0 UNION ALL SELECT * FROM m1))
          UNION ALL
          SELECT 2, node, member FROM (
            SELECT DISTINCT node, member FROM (
              SELECT * FROM m0 UNION ALL SELECT * FROM m1
              UNION ALL SELECT * FROM m2))),
        r AS (SELECT radius, node,
                     ('0x' || substr(md5(CAST(member AS VARCHAR)), 1, 3))
                       ::BIGINT % 256 AS bucket,
                     ltrim(substr(md5(CAST(member AS VARCHAR)), 4, 15), '0')
                       AS stripped
              FROM allmem),
        ranks AS (SELECT radius, node, bucket,
                 CASE WHEN strlen(stripped) = 0 THEN 61
                      ELSE (15 - strlen(stripped)) * 4 +
                           CASE WHEN ('0x' || substr(stripped,1,1))::INT >= 8
                                  THEN 0
                                WHEN ('0x' || substr(stripped,1,1))::INT >= 4
                                  THEN 1
                                WHEN ('0x' || substr(stripped,1,1))::INT >= 2
                                  THEN 2
                                ELSE 3 END + 1
                 END AS rank
                 FROM r),
        sk AS (SELECT radius, node, bucket, MAX(rank) AS register
               FROM ranks GROUP BY 1, 2, 3),
        agg AS (SELECT radius, node, COUNT(*) AS nb,
                       SUM(pow(2.0, -register)) AS obs
                FROM sk GROUP BY 1, 2),
        est AS (SELECT radius, node,
                       CAST(ROUND((CASE WHEN raw <= 2.5 * 256
                                          AND (256 - nb) > 0
                                   THEN 256.0 * ln(256.0 / (256 - nb))
                                   ELSE raw END) * 10000, 0) AS BIGINT)
                         AS e4
                FROM (SELECT radius, node, nb,
                             {_HB_ALPHA_MM!r} / (obs + (256 - nb)) AS raw
                      FROM agg)),
        piv AS (SELECT n.node,
                       e0.e4 AS e0, e1.e4 AS e1, e2.e4 AS e2
                FROM nodes n
                JOIN est e0 ON e0.node = n.node AND e0.radius = 0
                JOIN est e1 ON e1.node = n.node AND e1.radius = 1
                JOIN est e2 ON e2.node = n.node AND e2.radius = 2)
        SELECT node,
               CAST((e1 - e0) * 2 + (e2 - e1) AS BIGINT) AS h_lcm_e4,
               CAST(2 AS BIGINT) AS lcm
        FROM piv
    """,
    }
)




def _q_modularity(spark, sf_dir):
    """Engine addition: directed modularity per community (Leicht &
    Newman PRL 2008; linkgraph.py:modularity) of the node%7 partition of
    the synthetic expander — exact BIGINT edge/degree counts, fixed-order
    double contribution."""
    from see_spark.operators.linkgraph import modularity, synthetic_edges

    docs = _documents(spark, sf_dir)
    assign = docs.select(
        F.col("doc_id").cast("long").alias("node"),
        (F.col("doc_id") % 7).cast("long").alias("community"),
    )
    return modularity(synthetic_edges(docs), assign)


QUERIES_EXTRA.update({"modularity": _q_modularity})


ORACLES_EXTRA.update(
    {
        # Same partition, same exact counts, same double op order.
        "modularity": f"""
        WITH {_LINKGRAPH_SQL},
        a AS (SELECT node, node % 7 AS community FROM nodes),
        ed AS (SELECT s.community AS sc, d.community AS dc
               FROM edges e JOIN a s ON s.node = e.src
                            JOIN a d ON d.node = e.dst),
        m AS (SELECT COUNT(*) AS m FROM ed),
        ko AS (SELECT sc AS community, COUNT(*) AS kout FROM ed GROUP BY sc),
        ki AS (SELECT dc AS community, COUNT(*) AS kin FROM ed GROUP BY dc),
        intra AS (SELECT sc AS community, COUNT(*) AS intra_edges
                  FROM ed WHERE sc = dc GROUP BY sc),
        per AS (SELECT COALESCE(ko.community, ki.community) AS community,
                       COALESCE(intra_edges, 0) AS intra_edges,
                       COALESCE(kout, 0) AS kout, COALESCE(kin, 0) AS kin
                FROM ko FULL OUTER JOIN ki ON ko.community = ki.community
                LEFT JOIN intra
                  ON intra.community = COALESCE(ko.community, ki.community))
        SELECT community,
               CAST(intra_edges AS BIGINT) AS intra_edges,
               CAST(kout AS BIGINT) AS kout,
               CAST(kin AS BIGINT) AS kin,
               ROUND(CAST(intra_edges AS DOUBLE) / CAST((SELECT m FROM m) AS DOUBLE)
                     - (CAST(kout AS DOUBLE) * CAST(kin AS DOUBLE))
                       / (CAST((SELECT m FROM m) AS DOUBLE)
                          * CAST((SELECT m FROM m) AS DOUBLE)), 9)
                 AS q_contrib
        FROM per
    """,
    }
)




def _q_kneser_ney(spark, sf_dir):
    """Engine addition: interpolated Kneser-Ney bigram estimation
    (Kneser & Ney 1995 / Chen & Goodman 1998; lm.py:kneser_ney_bigram)
    over the documents corpus — exact BIGINT count aggregates, fixed-order
    per-row probability, D=0.75."""
    from see_spark.operators.lm import kneser_ney_bigram

    return kneser_ney_bigram(_documents(spark, sf_dir))


QUERIES_EXTRA.update({"kneser_ney_bigram": _q_kneser_ney})


ORACLES_EXTRA.update(
    {
        # Same tokenization/bigram pipeline as the lm_perplexity oracle,
        # same count aggregates, same double op order (parens pinned).
        "kneser_ney_bigram": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          list_filter(string_split(text, ' '), x -> x <> '')
                            AS t
                   FROM documents),
        bg AS (SELECT unnest(list_transform(range(1, len(t)),
                             j -> t[j] || chr(1) || t[j+1])) AS pair
               FROM d WHERE len(t) >= 2),
        counts AS (SELECT split_part(pair, chr(1), 1) AS w1,
                          split_part(pair, chr(1), 2) AS w2,
                          CAST(COUNT(*) AS BIGINT) AS c12
                   FROM bg GROUP BY 1, 2),
        ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                       CAST(COUNT(*) AS BIGINT) AS n1l
                FROM counts GROUP BY 1),
        rgt AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1r
                FROM counts GROUP BY 1),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM counts)
        SELECT c.w1, c.w2, c.c12,
               ROUND(GREATEST(CAST(c.c12 AS DOUBLE) - 0.75, 0.0)
                       / CAST(x.c1 AS DOUBLE)
                     + (0.75 * CAST(x.n1l AS DOUBLE) / CAST(x.c1 AS DOUBLE))
                       * (CAST(r.n1r AS DOUBLE)
                          / CAST((SELECT t FROM tot) AS DOUBLE)), 9)
                 AS p_kn
        FROM counts c JOIN ctx x USING (w1) JOIN rgt r USING (w2)
    """,
    }
)




def _q_wl_refine(spark, sf_dir):
    """Engine addition: 2-round Weisfeiler-Leman label refinement
    (Shervashidze et al. JMLR 2011; linkgraph.py:wl_refine) over the
    synthetic expander — the structural template-clustering fingerprint;
    oracle = the unrolled relabeling with the shared 60-bit md5-slice
    hash, bit-exact."""
    from see_spark.operators.linkgraph import synthetic_edges, wl_refine

    docs = _documents(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    return wl_refine(nodes, synthetic_edges(docs), n_iter=2)


QUERIES_EXTRA.update({"wl_refine": _q_wl_refine})


ORACLES_EXTRA.update(
    {
        # Unrolled 2-iteration WL: same degree seed, same sorted
        # neighbor-label string, same hash60 convention.
        "wl_refine": f"""
        WITH {_LINKGRAPH_SQL},
        l0 AS (SELECT n.node, CAST(COALESCE(o.deg, 0) AS BIGINT) AS label
               FROM nodes n LEFT JOIN outdeg o ON o.src = n.node),
        n1 AS (SELECT e.src AS node,
                      array_to_string(list_sort(list(l.label)), ',') AS ns
               FROM edges e JOIN l0 l ON l.node = e.dst GROUP BY e.src),
        l1 AS (SELECT l.node,
                      ('0x' || substr(md5(CAST(l.label AS VARCHAR) || '|'
                                          || COALESCE(n1.ns, '')), 1, 15))
                        ::BIGINT AS label
               FROM l0 l LEFT JOIN n1 ON n1.node = l.node),
        n2 AS (SELECT e.src AS node,
                      array_to_string(list_sort(list(l.label)), ',') AS ns
               FROM edges e JOIN l1 l ON l.node = e.dst GROUP BY e.src),
        l2 AS (SELECT l.node,
                      ('0x' || substr(md5(CAST(l.label AS VARCHAR) || '|'
                                          || COALESCE(n2.ns, '')), 1, 15))
                        ::BIGINT AS label
               FROM l1 l LEFT JOIN n2 ON n2.node = l.node)
        SELECT node, label AS wl_label FROM l2
    """,
    }
)




def _q_search_facets(spark, sf_dir):
    """Engine addition: faceted-search counts (search.py:facet_counts)
    over the gated tfidf top-100 page — lang and source refinement
    counts, result page broadcast into the metadata join."""
    from see_spark.operators.search import facet_counts

    results = _q_tfidf_search(spark, sf_dir)
    return facet_counts(
        results, _documents(spark, sf_dir), ["lang", "source"]
    )


QUERIES_EXTRA.update({"search_facets": _q_search_facets})


ORACLES_EXTRA.update(
    {
        # The gated tfidf_search top-100 (same CTE) -> metadata join ->
        # stacked per-facet counts.
        "search_facets": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        q AS (SELECT unnest(['table','join','query']) AS word),
        dfs AS (SELECT word, COUNT(DISTINCT doc_id) AS df
                FROM postings GROUP BY word),
        matched AS (
          SELECT p.doc_id, p.term_count, p.doc_len, dfs.df
          FROM postings p JOIN q USING (word) JOIN dfs USING (word)),
        scored AS (
          SELECT doc_id,
                 COUNT(*) AS n_words,
                 SUM((term_count / doc_len)
                     * ln((SELECT n_docs FROM n) / (1.0 + df))) AS score
          FROM matched GROUP BY doc_id),
        top AS (SELECT doc_id FROM scored WHERE n_words = 3
                ORDER BY score DESC, doc_id ASC LIMIT 100),
        meta AS (SELECT d.* FROM documents d
                 JOIN top ON top.doc_id = d.doc_id)
        SELECT 'lang' AS facet, CAST(lang AS VARCHAR) AS value,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM meta GROUP BY 2
        UNION ALL
        SELECT 'source', CAST(source AS VARCHAR), CAST(COUNT(*) AS BIGINT)
        FROM meta GROUP BY 2
    """,
    }
)




def _q_budget_select(spark, sf_dir):
    """Engine addition: token-budget corpus selection (selection.py:
    budget_select) — "best docs by quality until N tokens" via ONE
    distributed prefix sum (never a global single-partition window);
    score = n_chars%101 spread, cost = whitespace token count, budget
    20k."""
    from see_spark.operators.selection import budget_select

    docs = _documents(spark, sf_dir)
    scored = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.col("n_chars") % 101).cast("long").alias("score"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return budget_select(scored, token_budget=20000)


QUERIES_EXTRA.update({"budget_select": _q_budget_select})


ORACLES_EXTRA.update(
    {
        # Single-window cumulative-sum form of the same prefix cut.
        "budget_select": """
        WITH s AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          CAST(n_chars % 101 AS BIGINT) AS score,
                          CAST(len(string_split(text, ' ')) AS BIGINT)
                            AS n_tokens
                   FROM documents),
        c AS (SELECT doc_id, score, n_tokens,
                     CAST(SUM(n_tokens) OVER (
                       ORDER BY score DESC, doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_tokens
              FROM s)
        SELECT doc_id, score, n_tokens, cum_tokens
        FROM c WHERE cum_tokens <= 20000
    """,
    }
)




def _q_katz_synth(spark, sf_dir):
    """Engine addition: truncated Katz centrality (linkgraph.py:
    katz_centrality) over the deterministic synthetic expander — exact
    BIGINT walk counts per iteration, beta-weighted sum only at the end;
    oracle = unrolled walk-count CTEs."""
    from see_spark.operators.linkgraph import katz_centrality, synthetic_edges

    docs = _documents(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    return katz_centrality(nodes, synthetic_edges(docs), n_iter=4, beta=0.05)


def _q_link_prediction(spark, sf_dir):
    """Engine addition: neighborhood-overlap link prediction
    (linkgraph.py:link_prediction — common neighbors / Jaccard milli /
    Adamic-Adar) on the undirected view of the synthetic expander;
    candidate pairs generated only through shared neighbors."""
    from see_spark.operators.linkgraph import link_prediction, synthetic_edges

    return link_prediction(synthetic_edges(_documents(spark, sf_dir)), min_common=2)


QUERIES_EXTRA.update(
    {"katz_synth": _q_katz_synth, "link_prediction": _q_link_prediction}
)


def _katz_oracle_sql(n_iter: int = 4, beta: float = 0.05) -> str:
    """Unrolled integer walk-count iteration; the float Katz sum is the
    same left-associated t-ascending expression katz_centrality builds,
    with identical Python-repr beta^t literals."""
    ctes = [
        _LINKGRAPH_SQL,
        "w0 AS (SELECT node, CAST(1 AS BIGINT) AS w FROM nodes)",
    ]
    for t in range(1, n_iter + 1):
        ctes.append(
            f"a{t} AS (SELECT e.dst AS node, CAST(SUM(w.w) AS BIGINT) AS w"
            f" FROM edges e JOIN w{t-1} w ON e.src = w.node GROUP BY e.dst)"
        )
        ctes.append(
            f"w{t} AS (SELECT n.node,"
            f" CAST(COALESCE(a.w, 0) AS BIGINT) AS w"
            f" FROM nodes n LEFT JOIN a{t} a ON a.node = n.node)"
        )
    score = "0.0"
    for t in range(1, n_iter + 1):
        score = f"({score} + {beta ** t!r} * w{t}.w)"
    joins = " ".join(
        f"JOIN w{t} ON w{t}.node = w{n_iter}.node" for t in range(1, n_iter)
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT w{n_iter}.node, w{n_iter}.w AS walks_last,"
        f" ROUND({score}, 9) AS score FROM w{n_iter} {joins}"
    )


ORACLES_EXTRA.update(
    {
        "katz_synth": _katz_oracle_sql(),
        "link_prediction": f"""
        WITH {_LINKGRAPH_SQL},
        und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
                FROM edges WHERE src <> dst),
        adj AS (SELECT a AS node, b AS nb FROM und
                UNION ALL SELECT b AS node, a AS nb FROM und),
        deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY node),
        wedges AS (SELECT l.node AS u, r.node AS v, l.nb AS w
                   FROM adj l JOIN adj r ON l.nb = r.nb AND l.node < r.node),
        pairs AS (SELECT w.u AS a, w.v AS b,
                         CAST(COUNT(*) AS BIGINT) AS common,
                         SUM(1.0 / ln(d.deg)) AS adamic_adar
                  FROM wedges w JOIN deg d ON d.node = w.w
                  GROUP BY w.u, w.v
                  HAVING COUNT(*) >= 2),
        unlinked AS (SELECT p.* FROM pairs p
                     LEFT JOIN und ON und.a = p.a AND und.b = p.b
                     WHERE und.a IS NULL)
        SELECT p.a, p.b, p.common,
               CAST(p.common * 1000 // (da.deg + db.deg - p.common) AS BIGINT)
                 AS jaccard_milli,
               ROUND(p.adamic_adar, 9) AS adamic_adar
        FROM unlinked p
        JOIN deg da ON da.node = p.a
        JOIN deg db ON db.node = p.b
    """,
    }
)




def _q_scd2_user_type(spark, sf_dir):
    """Engine addition: SCD Type-2 version ledger (history.py:
    scd2_versions) over each user's event_type observation stream —
    consecutive equal observations collapse, a version opens per change;
    ONE hash shuffle on the key, both windows share its partitioning."""
    from see_spark.operators.history import scd2_versions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return scd2_versions(
        ev,
        key_col="user_id",
        ts_col="ts",
        value_col="event_type",
        tiebreak_col="event_id",
    )


def _q_late_events(spark, sf_dir):
    """Engine addition: watermark-lateness audit (history.py:
    late_events) — replay events in event_id arrival order, watermark =
    exclusive prefix-max(event time) - 30s via the distributed
    seq.with_prefix_max scan; per-minute tumbling counts."""
    from see_spark.operators.history import late_events

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # synthetic events are ts-ordered by event_id, which makes lateness
    # degenerate; scramble arrival by 60-bit md5 of the id (the repo's
    # standard engine-portable hash) so the audit exercises real
    # out-of-order arrival.
    ev = ev.withColumn(
        "arrival",
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10
        ).cast("long"),
    )
    return late_events(
        ev,
        arrival_col="arrival",
        ts_col="ts",
        delay_us=30_000_000,
        window_us=60_000_000,
    )


QUERIES_EXTRA.update(
    {"scd2_user_type": _q_scd2_user_type, "late_events": _q_late_events}
)


ORACLES_EXTRA.update(
    {
        "scd2_user_type": """
        WITH o AS (
          SELECT user_id, ts, event_type, event_id,
                 CASE WHEN LAG(event_type) OVER w IS NULL
                           OR LAG(event_type) OVER w <> event_type
                      THEN 1 ELSE 0 END AS chg
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        v AS (
          SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver
          FROM o),
        g AS (
          SELECT user_id AS key, ver, MIN(event_type) AS value,
                 MIN(ts) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_obs
          FROM v GROUP BY user_id, ver)
        SELECT key, value, valid_from,
               LEAD(valid_from) OVER wv AS valid_to,
               (LEAD(valid_from) OVER wv IS NULL) AS is_current,
               n_obs
        FROM g WINDOW wv AS (PARTITION BY key ORDER BY ver)
    """,
        "late_events": """
        WITH b AS (SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                           1, 15))::BIGINT AS arr,
                          epoch_us(ts) AS ts_us FROM events),
        s AS (SELECT ts_us,
                     MAX(ts_us) OVER (ORDER BY arr
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS seen
              FROM b),
        f AS (SELECT ts_us,
                     (seen IS NOT NULL AND ts_us < seen - 30000000) AS late
              FROM s)
        SELECT CAST(ts_us - ((ts_us % 60000000) + 60000000) % 60000000
                    AS BIGINT) AS window_start_us,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
               CAST(SUM(CASE WHEN late THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
        FROM f GROUP BY 1
    """,
    }
)




def _q_search_qlm(spark, sf_dir):
    """Engine addition: Dirichlet query-likelihood ranking (search.py:
    search_qlm) — the probabilistic-LM ranker family next to tf-idf and
    BM25; OR semantics, rank-equivalent form, built-in length prior.
    Score rounded to 9dp (ln + float sum are the non-exact ops)."""
    from see_spark.operators.search import search_qlm

    docs = _documents(spark, sf_dir)
    res = search_qlm(
        spark,
        " ".join(_SEARCH_WORDS),
        _doc_postings(spark, sf_dir),
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("source").alias("title"),
        ),
        mu=2000.0,
    )
    return res.select(F.col("url").alias("doc_id"), "score")


def _q_search_rocchio(spark, sf_dir):
    """Engine addition: Rocchio pseudo-relevance feedback (search.py:
    search_rocchio) — conjunctive round-1 top-10 assumed relevant,
    feedback weights rounded to 9dp BEFORE the top-5 expansion cut,
    weighted disjunctive re-rank."""
    from see_spark.operators.search import search_rocchio

    docs = _documents(spark, sf_dir)
    return search_rocchio(
        spark,
        " ".join(_SEARCH_WORDS),
        _doc_postings(spark, sf_dir),
        page_count=docs.count(),
        fb_k=10,
        n_exp=5,
        alpha=1.0,
        beta=0.5,
    )


QUERIES_EXTRA.update(
    {"search_qlm": _q_search_qlm, "search_rocchio": _q_search_rocchio}
)


ORACLES_EXTRA.update(
    {
        # Rank-equivalent Dirichlet QL, term-for-term search_qlm's
        # expression; C and Qtot are corpus scalars (exact integers).
        "search_qlm": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        c AS (SELECT CAST(SUM(doc_len) AS DOUBLE) AS c
              FROM (SELECT DISTINCT doc_id, doc_len FROM postings)),
        q AS (SELECT unnest(['table','join','query']) AS word, 1 AS qcount),
        cf AS (SELECT word, CAST(SUM(term_count) AS BIGINT) AS cf
               FROM postings JOIN q USING (word) GROUP BY word),
        qt AS (SELECT CAST(SUM(q.qcount) AS DOUBLE) AS qtot
               FROM q JOIN cf USING (word) WHERE cf.cf > 0),
        matched AS (
          SELECT p.doc_id, p.term_count, p.doc_len, q.qcount, cf.cf
          FROM postings p JOIN q USING (word) JOIN cf USING (word)
          WHERE cf.cf > 0),
        scored AS (
          SELECT doc_id,
                 SUM(qcount * ln(1.0 + (term_count * (SELECT c FROM c))
                                       / (2000.0 * cf))) AS s,
                 MIN(doc_len) AS dl
          FROM matched GROUP BY doc_id)
        SELECT doc_id,
               ROUND(s - (SELECT qtot FROM qt) * ln(dl + 2000.0), 9) AS score
        FROM scored
        ORDER BY (s - (SELECT qtot FROM qt) * ln(dl + 2000.0)) DESC,
                 doc_id ASC
        LIMIT 100
    """,
        # Two-round Rocchio: round-1 conjunctive tf-idf, feedback weights
        # rounded to 9dp before the expansion cut, weighted OR re-rank.
        "search_rocchio": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
        q AS (SELECT unnest(['table','join','query']) AS word, 1 AS qcount),
        df_q AS (SELECT word, COUNT(DISTINCT doc_id) AS df
                 FROM postings JOIN q USING (word) GROUP BY word),
        m1 AS (
          SELECT p.doc_id, q.qcount, p.term_count, p.doc_len, d.df
          FROM postings p JOIN q USING (word) JOIN df_q d USING (word)),
        fb AS (
          SELECT doc_id FROM (
            SELECT doc_id, COUNT(*) AS n_words,
                   SUM(qcount * (term_count / doc_len)
                       * ln((SELECT n FROM n) / (1.0 + df))) AS score
            FROM m1 GROUP BY doc_id)
          WHERE n_words = 3
          ORDER BY score DESC, doc_id ASC LIMIT 10),
        fbp AS (
          SELECT p.doc_id, p.word, p.term_count, p.doc_len
          FROM postings p JOIN fb USING (doc_id)
          WHERE p.word NOT IN (SELECT word FROM q)),
        df_c AS (SELECT word, COUNT(DISTINCT doc_id) AS df
                 FROM postings WHERE word IN (SELECT word FROM fbp)
                 GROUP BY word),
        wfb AS (
          SELECT f.word,
                 ROUND(SUM((f.term_count / f.doc_len)
                           * ln((SELECT n FROM n) / (1.0 + d.df))), 9)
                   AS w_fb,
                 MIN(d.df) AS df
          FROM fbp f JOIN df_c d USING (word) GROUP BY f.word),
        exp AS (SELECT word, 0.5 * w_fb / 10.0 AS weight, df
                FROM wfb ORDER BY w_fb DESC, word ASC LIMIT 5),
        qw AS (SELECT q.word, 1.0 * q.qcount AS weight, d.df
               FROM q JOIN df_q d USING (word)),
        weights AS (SELECT * FROM qw UNION ALL SELECT * FROM exp),
        m2 AS (
          SELECT p.doc_id, w.weight, p.term_count, p.doc_len, w.df
          FROM postings p JOIN weights w USING (word)),
        scored AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
                 SUM(weight * (term_count / doc_len)
                     * ln((SELECT n FROM n) / (1.0 + df))) AS score
          FROM m2 GROUP BY doc_id)
        SELECT doc_id, ROUND(score, 9) AS score, n_words
        FROM scored
        ORDER BY score DESC, doc_id ASC LIMIT 100
    """,
    }
)




def _q_sorted_neighborhood(spark, sf_dir):
    """Engine addition: sorted-neighborhood dedup blocking (dedup.py:
    sorted_neighborhood_pairs, Hernandez-Stolfo merge/purge) over the
    dup-injected corpus — blocking key = first 16 chars of lowered text
    (exact dups sort adjacent), window 3, exact distinct-token Jaccard
    verification on in-window candidates only."""
    from see_spark.operators.dedup import sorted_neighborhood_pairs

    docs = _dup_corpus(spark, sf_dir).withColumn(
        "snm_key", F.lower(F.substring(F.col("text"), 1, 16))
    )
    return sorted_neighborhood_pairs(docs, key_col="snm_key", window=3)


QUERIES_EXTRA.update({"sorted_neighborhood": _q_sorted_neighborhood})


ORACLES_EXTRA.update(
    {
        "sorted_neighborhood": f"""
        WITH corpus AS ({_DUP_CORPUS_SQL}),
        keyed AS (SELECT doc_id AS id,
                         lower(substr(text, 1, 16)) AS key, text
                  FROM corpus),
        ranked AS (SELECT id, key, text,
                          ROW_NUMBER() OVER (ORDER BY key, id) - 1 AS rn
                   FROM keyed),
        pairs AS (
          SELECT l.id AS a, r.id AS b, l.key AS key_a, r.key AS key_b
          FROM ranked l JOIN ranked r
            ON r.rn BETWEEN l.rn + 1 AND l.rn + 2),
        toks AS (SELECT DISTINCT id,
                        unnest(string_split(text, ' ')) AS word
                 FROM keyed),
        sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS sz
                  FROM toks GROUP BY id),
        inter AS (SELECT p.a, p.b, CAST(COUNT(*) AS BIGINT) AS inter
                  FROM pairs p
                  JOIN toks ta ON ta.id = p.a
                  JOIN toks tb ON tb.id = p.b AND tb.word = ta.word
                  GROUP BY p.a, p.b)
        SELECT p.a, p.b, p.key_a, p.key_b,
               CAST(COALESCE(i.inter, 0) AS BIGINT) AS inter,
               sa.sz AS size_a, sb.sz AS size_b,
               CAST(COALESCE(i.inter, 0) * 1000
                    // (sa.sz + sb.sz - COALESCE(i.inter, 0)) AS BIGINT)
                 AS jaccard_milli
        FROM pairs p
        LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
        JOIN sizes sa ON sa.id = p.a
        JOIN sizes sb ON sb.id = p.b
    """,
    }
)




def _q_classifier_calibration(spark, sf_dir):
    """Engine addition: reliability-diagram calibration audit
    (evaluation.py:calibration_bins) over the trained quality
    classifier's fixed-point probabilities — all-BIGINT bins, observed
    vs predicted rate per decile, unnormalized ECE gap."""
    from see_spark.operators.evaluation import calibration_bins

    scored = _q_quality_classifier(spark, sf_dir)
    return calibration_bins(scored, p_col="p_fp", label_col="y")


def _q_feature_hashing(spark, sf_dir):
    """Engine addition: signed feature hashing (classifier.py:
    featurize_hashing, Weinberger 2009) — token counts folded to 64
    signed dimensions, sparse non-zero rows, exact integers."""
    from see_spark.operators.classifier import featurize_hashing

    return featurize_hashing(_documents(spark, sf_dir), n_buckets=64)


QUERIES_EXTRA.update(
    {
        "classifier_calibration": _q_classifier_calibration,
        "feature_hashing": _q_feature_hashing,
    }
)


ORACLES_EXTRA.update(
    {
        # wraps the full unrolled classifier-training oracle as a CTE
        "classifier_calibration": f"""
        WITH scored AS ({_classifier_oracle_sql(8)}),
        binned AS (
          SELECT LEAST(p_fp * 10 // 1048576, 9) AS bin, p_fp, y
          FROM scored)
        SELECT CAST(bin AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(SUM(p_fp) AS BIGINT) AS sum_p,
               CAST(SUM(y) * 1000 // COUNT(*) AS BIGINT) AS obs_milli,
               CAST(SUM(p_fp) * 1000 // (COUNT(*) * 1048576) AS BIGINT)
                 AS pred_milli,
               CAST(abs(SUM(y) * 1048576 - SUM(p_fp)) AS BIGINT) AS gap_fp
        FROM binned GROUP BY bin
    """,
        "feature_hashing": """
        WITH toks AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 unnest(string_split(text, ' ')) AS tok
          FROM documents),
        h AS (
          SELECT doc_id,
                 ('0x' || substr(md5(tok), 1, 4))::BIGINT % 64 AS bucket,
                 CASE WHEN ('0x' || substr(md5('s:' || tok), 1, 1))::BIGINT
                           % 2 = 0
                      THEN 1 ELSE -1 END AS s
          FROM toks)
        SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
               CAST(SUM(s) AS BIGINT) AS value
        FROM h GROUP BY doc_id, bucket
        HAVING SUM(s) <> 0
    """,
    }
)




def _q_pmi_collocations(spark, sf_dir):
    """Engine addition: top-50 PMI collocations (textfilters.py:
    pmi_collocations, Church & Hanks 1990) — association-ranked bigrams
    with the min-count guard; k-cut ordered by ROUNDED pmi."""
    from see_spark.operators.textfilters import pmi_collocations

    return pmi_collocations(_documents(spark, sf_dir), k=50, min_count=5)


QUERIES_EXTRA.update({"pmi_collocations": _q_pmi_collocations})


ORACLES_EXTRA.update(
    {
        "pmi_collocations": """
        WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        uni AS (SELECT unnest(t) AS w FROM toks),
        uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY w),
        tt AS (SELECT CAST(COALESCE(SUM(len(t)), 0) AS DOUBLE) AS t_tot,
                      CAST(COALESCE(SUM(GREATEST(len(t) - 1, 0)), 0)
                           AS DOUBLE) AS b_tot
               FROM toks),
        bg AS (
          SELECT t[i] || ' ' || t[i + 1] AS bigram
          FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
          WHERE len(t) >= 2),
        bc AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_ab
               FROM bg GROUP BY bigram HAVING COUNT(*) >= 5),
        sp AS (SELECT bigram, c_ab,
                      string_split(bigram, ' ')[1] AS w1,
                      string_split(bigram, ' ')[2] AS w2
               FROM bc)
        SELECT sp.bigram, sp.c_ab, a.c AS c_a, b.c AS c_b,
               ROUND(ln((sp.c_ab * (SELECT t_tot FROM tt)
                         * (SELECT t_tot FROM tt))
                        / ((SELECT b_tot FROM tt) * a.c * b.c)), 9) AS pmi
        FROM sp JOIN uc a ON a.w = sp.w1 JOIN uc b ON b.w = sp.w2
        ORDER BY pmi DESC, sp.bigram ASC LIMIT 50
    """,
    }
)




def _q_dedup_quality_b3(spark, sf_dir):
    """Engine addition: B-cubed clustering evaluation (evaluation.py:
    b3_cluster_quality) of the MinHash-LSH dedup clusters against exact
    text-duplicate ground truth over the dup-injected corpus — the
    glue-vs-shatter quality audit on the dedup pipeline itself."""
    from see_spark.operators.evaluation import b3_cluster_quality

    clusters = _q_dedup_clusters(spark, sf_dir).select(
        "doc_id", F.col("cluster_id").alias("cluster")
    )
    truth = _dup_corpus(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(F.col("text")).alias("truth"),
    )
    assign = clusters.join(truth, "doc_id").select(
        F.col("doc_id").alias("id"), "cluster", "truth"
    )
    return b3_cluster_quality(assign)


QUERIES_EXTRA.update({"dedup_quality_b3": _q_dedup_quality_b3})


ORACLES_EXTRA.update(
    {
        # composes the full recursive dedup_clusters oracle as a
        # derived table, then the B3 contingency fold on top
        "dedup_quality_b3": f"""
        WITH clusters AS ({ORACLES_EXTRA["dedup_clusters"]}),
        corpus AS ({_DUP_CORPUS_SQL}),
        assign AS (
          SELECT c.doc_id AS id, c.cluster_id AS cluster,
                 md5(k.text) AS truth
          FROM clusters c JOIN corpus k USING (doc_id)),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM assign),
        csz AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
                FROM assign GROUP BY cluster),
        tsz AS (SELECT truth, CAST(COUNT(*) AS BIGINT) AS truth_size
                FROM assign GROUP BY truth),
        blocks AS (SELECT cluster, truth, CAST(COUNT(*) AS BIGINT) AS inter
                   FROM assign GROUP BY cluster, truth),
        sums AS (
          SELECT SUM((b.inter * b.inter) / c.cluster_size) AS sp,
                 SUM((b.inter * b.inter) / t.truth_size) AS sr
          FROM blocks b JOIN csz c USING (cluster) JOIN tsz t USING (truth)),
        pr AS (
          SELECT ROUND(sp / (SELECT n FROM nn), 9) AS p,
                 ROUND(sr / (SELECT n FROM nn), 9) AS r
          FROM sums)
        SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n_items,
               p AS b3_precision, r AS b3_recall,
               CASE WHEN p + r = 0.0 THEN 0.0
                    ELSE ROUND(2.0 * p * r / (p + r), 9) END AS b3_f1
        FROM pr
    """,
    }
)




def _q_media_ahash(spark, sf_dir):
    """Engine addition: perceptual average-hash (multimodal.py:ahash) —
    60-bit mean-threshold fingerprint over the deterministic media
    payload buffer, pure-Catalyst HOF expressions, integer-exact."""
    from see_spark.operators.multimodal import ahash, media_from_documents

    return ahash(media_from_documents(_documents(spark, sf_dir)))


def _q_media_phash_pairs(spark, sf_dir):
    """Engine addition: media near-dup pairs by perceptual-hash Hamming
    distance (multimodal.py:ahash_near_dup_pairs) over the dup-injected
    corpus as media payloads — pigeonhole banding (4x15 bits), exact
    bit_count verify, Hamming <= 3."""
    from see_spark.operators.multimodal import ahash_near_dup_pairs

    media = _dup_corpus(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    return ahash_near_dup_pairs(media, max_hamming=3)


QUERIES_EXTRA.update(
    {"media_ahash": _q_media_ahash, "media_phash_pairs": _q_media_phash_pairs}
)


_AHASH_SQL = """
          SELECT media_id, n AS n_bytes,
                 CAST(COALESCE(list_sum(list_transform(range(0, 60), j ->
                        CASE WHEN COALESCE(list_sum(
                                    b[(j*n//60 + 1):((j+1)*n//60)]), 0) * n
                                  > total * ((j+1)*n//60 - j*n//60)
                             THEN (CAST(1 AS BIGINT) << (59 - j))
                             ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT)
                   AS ahash
          FROM (SELECT media_id, b, n, COALESCE(list_sum(b), 0) AS total
                FROM (SELECT media_id,
                             list_transform(string_split(text, ''),
                                            c -> CAST(ascii(c) AS BIGINT))
                               AS b,
                             CAST(length(text) AS BIGINT) AS n
                      FROM __MEDIA__))
"""


ORACLES_EXTRA.update(
    {
        "media_ahash": _AHASH_SQL.replace(
            "__MEDIA__",
            "(SELECT CAST(doc_id AS VARCHAR) AS media_id, text"
            " FROM documents)",
        ),
        "media_phash_pairs": f"""
        WITH corpus AS ({_DUP_CORPUS_SQL}),
        h AS ({_AHASH_SQL.replace(
            "__MEDIA__",
            "(SELECT CAST(doc_id AS VARCHAR) AS media_id, text FROM corpus)",
        )}),
        banded AS (
          SELECT media_id, ahash, j AS band,
                 (ahash >> (j * 15)) & 32767 AS band_key
          FROM h, LATERAL (SELECT unnest(range(0, 4)) AS j)),
        cands AS (
          SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
                          a.ahash AS ha, b.ahash AS hb
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.band_key = b.band_key
           AND a.media_id < b.media_id)
        SELECT media_a, media_b,
               CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        FROM cands
        WHERE bit_count(xor(ha, hb)) <= 3
    """,
    }
)




_ZBOXES = {"ysel": (1, 1 << 40, 1, 3), "xysel": (1, 50, 1, 25)}


def _q_zorder_audit(spark, sf_dir):
    """Engine addition: Z-order file-layout data-skipping audit
    (layout.py:zorder_prune_audit — the OPTIMIZE ZORDER BY story) over
    lineitem (x=l_partkey, y=l_suppkey), 32 chunks, 16-bit Morton grid:
    per (box, layout) chunks scanned / rows scanned / prune rate, all
    exact BIGINT. The y-selective box is the case a single-column sort
    cannot prune at all."""
    from see_spark.operators.layout import zorder_prune_audit

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = None
    for label, box in _ZBOXES.items():
        a = zorder_prune_audit(
            li,
            "l_partkey",
            "l_suppkey",
            ["l_orderkey", "l_linenumber"],
            box,
            n_chunks=32,
            bits=16,
        ).select(F.lit(label).alias("box"), "*")
        out = a if out is None else out.unionByName(a)
    return out


QUERIES_EXTRA.update({"zorder_audit": _q_zorder_audit})


def _zorder_oracle_sql() -> str:
    """Mirror of zorder_prune_audit: normalized 16-bit Morton interleave,
    rank-chunking at 32, per-chunk min/max, box-overlap scan audit for
    both boxes under both layouts."""
    top = 65535
    ctes = ["""base AS (
          SELECT CAST(l_partkey AS BIGINT) AS x, CAST(l_suppkey AS BIGINT) AS y,
                 CAST(l_orderkey AS BIGINT) AS ok,
                 CAST(l_linenumber AS BIGINT) AS ln
          FROM lineitem),
        mm AS (SELECT MIN(x) AS lox, MAX(x) AS hix,
                      MIN(y) AS loy, MAX(y) AS hiy FROM base),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
        normd AS (
          SELECT x, y, ok, ln,
                 CASE WHEN (SELECT hix FROM mm) = (SELECT lox FROM mm) THEN 0
                      ELSE (x - (SELECT lox FROM mm)) * """ + str(top) + """
                           // ((SELECT hix FROM mm) - (SELECT lox FROM mm))
                 END AS nx,
                 CASE WHEN (SELECT hiy FROM mm) = (SELECT loy FROM mm) THEN 0
                      ELSE (y - (SELECT loy FROM mm)) * """ + str(top) + """
                           // ((SELECT hiy FROM mm) - (SELECT loy FROM mm))
                 END AS ny
          FROM base),
        z AS (
          SELECT x, y, ok, ln,
                 CAST(COALESCE(list_sum(list_transform(range(0, 16), j ->
                        (((nx >> j) & 1) << (2*j))
                      + (((ny >> j) & 1) << (2*j + 1)))), 0) AS BIGINT)
                   AS zval
          FROM normd)"""]
    selects = []
    for layout, order in (("zorder", "zval, ok, ln"), ("xsort", "x, ok, ln")):
        ctes.append(f"""r_{layout} AS (
          SELECT x, y,
                 (ROW_NUMBER() OVER (ORDER BY {order}) - 1) * 32
                   // (SELECT n FROM nn) AS chunk
          FROM z)""")
        ctes.append(f"""i_{layout} AS (
          SELECT chunk, CAST(COUNT(*) AS BIGINT) AS n_rows,
                 MIN(x) AS min_x, MAX(x) AS max_x,
                 MIN(y) AS min_y, MAX(y) AS max_y
          FROM r_{layout} GROUP BY chunk)""")
    for label, (xl, xh, yl, yh) in _ZBOXES.items():
        ctes.append(f"""m_{label} AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS matched FROM z
          WHERE x >= {xl} AND x <= {xh} AND y >= {yl} AND y <= {yh})""")
        for layout in ("zorder", "xsort"):
            selects.append(f"""
        SELECT '{label}' AS box, '{layout}' AS layout,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(h) AS BIGINT) AS chunks_scanned,
               CAST(SUM(h * n_rows) AS BIGINT) AS rows_scanned,
               (SELECT matched FROM m_{label}) AS rows_matched,
               CAST((COUNT(*) - SUM(h)) * 1000 // COUNT(*) AS BIGINT)
                 AS prune_milli
        FROM (SELECT n_rows,
                     CASE WHEN max_x >= {xl} AND min_x <= {xh}
                               AND max_y >= {yl} AND min_y <= {yh}
                          THEN 1 ELSE 0 END AS h
              FROM i_{layout})""")
    return "WITH " + ",\n        ".join(ctes) + "\n" + "\n        UNION ALL\n".join(selects)


ORACLES_EXTRA.update({"zorder_audit": _zorder_oracle_sql()})




_SA_DOCS_SQL = """
        SELECT CAST(doc_id AS BIGINT) AS doc_id, substr(text, 1, 200) AS t
        FROM documents WHERE doc_id % 25 = 0
"""


def _sa_docs(spark, sf_dir):
    return _documents(spark, sf_dir).where(F.col("doc_id") % 25 == 0)


def _q_suffix_array(spark, sf_dir):
    """Engine addition: distributed suffix array by prefix doubling
    (suffix.py:suffix_array, Manber-Myers/Larsson-Sadakane) on a doc
    slice truncated to 200 chars — every round exact integer dense
    ranks; the oracle sorts the suffix STRINGS directly, proving the
    doubling scheme against ground truth."""
    from see_spark.operators.suffix import suffix_array

    return suffix_array(_sa_docs(spark, sf_dir), max_len=200)


def _q_suffix_lcp(spark, sf_dir):
    """Engine addition: adjacent-suffix LCP audit (suffix.py:
    lcp_intervals) over the built suffix array — within-document
    repeated substrings of length >= 5 via the classic adjacent-pair
    reduction."""
    from see_spark.operators.suffix import lcp_intervals, suffix_array

    docs = _sa_docs(spark, sf_dir)
    return lcp_intervals(
        suffix_array(docs, max_len=200), docs, min_lcp=5, max_len=200
    )


QUERIES_EXTRA.update(
    {"suffix_array": _q_suffix_array, "suffix_lcp": _q_suffix_lcp}
)


ORACLES_EXTRA.update(
    {
        "suffix_array": f"""
        WITH d AS ({_SA_DOCS_SQL}),
        p AS (SELECT doc_id, t, unnest(range(0, length(t))) AS pos FROM d)
        SELECT doc_id, CAST(pos AS BIGINT) AS pos,
               CAST(ROW_NUMBER() OVER (
                      PARTITION BY doc_id ORDER BY substr(t, pos + 1))
                    AS BIGINT) AS sa_rank
        FROM p
    """,
        "suffix_lcp": f"""
        WITH d AS ({_SA_DOCS_SQL}),
        p AS (SELECT doc_id, t, unnest(range(0, length(t))) AS pos FROM d),
        sa AS (SELECT doc_id, t, pos,
                      ROW_NUMBER() OVER (
                        PARTITION BY doc_id ORDER BY substr(t, pos + 1))
                        AS sa_rank
               FROM p),
        adj AS (
          SELECT a.doc_id, a.t, a.pos AS pos_a, b.pos AS pos_b
          FROM sa a JOIN sa b
            ON a.doc_id = b.doc_id AND b.sa_rank = a.sa_rank + 1),
        scan AS (
          SELECT doc_id, pos_a, pos_b,
                 LEAST(length(t) - pos_a, length(t) - pos_b) AS minlen,
                 list_filter(range(1, LEAST(length(t) - pos_a,
                                            length(t) - pos_b) + 1),
                             i -> substr(t, pos_a + i, 1)
                                  <> substr(t, pos_b + i, 1)) AS mis
          FROM adj)
        SELECT doc_id, CAST(pos_a AS BIGINT) AS pos_a,
               CAST(pos_b AS BIGINT) AS pos_b,
               CAST(CASE WHEN len(mis) = 0 THEN minlen
                         ELSE mis[1] - 1 END AS BIGINT) AS lcp
        FROM scan
        WHERE (CASE WHEN len(mis) = 0 THEN minlen ELSE mis[1] - 1 END) >= 5
    """,
    }
)




def _q_textrank(spark, sf_dir):
    """Engine addition: corpus-level TextRank keywords (textfilters.py:
    textrank_keywords) — PageRank over the adjacent-word co-occurrence
    graph, length-4 candidate filter, top-30 with pinned tie-break."""
    from see_spark.operators.textfilters import textrank_keywords

    return textrank_keywords(_documents(spark, sf_dir), k=30, n_iter=5)


QUERIES_EXTRA.update({"textrank_keywords": _q_textrank})


def _textrank_oracle_sql(n_iter: int = 5, d: float = 0.85, k: int = 30) -> str:
    """Word co-occurrence graph + the same unrolled power method as
    _pagerank_oracle_sql (no dangling nodes: the graph is undirected,
    so the dangling term is identically zero on both sides)."""
    graph = """toks AS (
          SELECT list_filter(string_split(text, ' '),
                             w -> length(w) >= 4) AS t
          FROM documents),
        pr AS (SELECT t[i] AS a, t[i + 1] AS b
               FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
               WHERE len(t) >= 2),
        und AS (SELECT DISTINCT LEAST(a, b) AS wa, GREATEST(a, b) AS wb
                FROM pr WHERE a <> b),
        words AS (SELECT DISTINCT w FROM
                  (SELECT wa AS w FROM und UNION ALL SELECT wb FROM und)),
        ids AS (SELECT w AS word,
                       ROW_NUMBER() OVER (ORDER BY w) - 1 AS node
                FROM words),
        edges AS (
          SELECT ia.node AS src, ib.node AS dst
          FROM und JOIN ids ia ON ia.word = und.wa
                   JOIN ids ib ON ib.word = und.wb
          UNION ALL
          SELECT ib.node AS src, ia.node AS dst
          FROM und JOIN ids ia ON ia.word = und.wa
                   JOIN ids ib ON ib.word = und.wb),
        nn AS (SELECT COUNT(*) AS n FROM ids),
        nodes AS (SELECT node FROM ids),
        outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)"""
    ctes = [
        graph,
        "r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        p = f"r{i-1}"
        ctes.append(
            f"d{i} AS (SELECT COALESCE(SUM(r.rank), 0.0) AS dang FROM {p} r"
            f" LEFT JOIN outdeg o ON o.src = r.node WHERE o.src IS NULL)"
        )
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node, SUM(r.rank / o.deg) AS contrib"
            f" FROM edges e JOIN {p} r ON e.src = r.node"
            f" JOIN outdeg o ON o.src = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i} AS (SELECT b.node,"
            f" (1.0 - {d})/(SELECT n FROM nn)"
            f" + {d} * (COALESCE(c.contrib, 0.0)"
            f" + (SELECT dang FROM d{i})/(SELECT n FROM nn)) AS rank"
            f" FROM nodes b LEFT JOIN c{i} c ON c.node = b.node)"
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT i.word, ROUND(r.rank, 9) AS rank"
        f" FROM r{n_iter} r JOIN ids i USING (node)"
        f" ORDER BY ROUND(r.rank, 9) DESC, i.word ASC LIMIT {k}"
    )


ORACLES_EXTRA.update({"textrank_keywords": _textrank_oracle_sql()})




def _q_hrw_routing(spark, sf_dir):
    """Engine addition: rendezvous-hash routing resize audit
    (sharding.py:hrw_assign/hrw_rebalance_audit, Thaler-Ravishankar
    HRW) — 8 -> 10 shards over document keys; minimal disruption shows
    as no key moving between surviving shards."""
    from see_spark.operators.sharding import hrw_rebalance_audit

    keys = _documents(spark, sf_dir).select(
        F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("key")
    )
    return hrw_rebalance_audit(keys, n_before=8, n_after=10)


QUERIES_EXTRA.update({"hrw_routing": _q_hrw_routing})


def _hrw_oracle_sql(n_before: int = 8, n_after: int = 10) -> str:
    def pick(n, alias):
        return f"""
        (SELECT key, CAST(s AS BIGINT) AS {alias} FROM (
           SELECT key, s, ROW_NUMBER() OVER (
                    PARTITION BY key ORDER BY w DESC, s ASC) AS rn
           FROM (SELECT key, s,
                        ('0x' || substr(md5('hrw:' || s || ':' || key),
                                        1, 15))::BIGINT AS w
                 FROM k, LATERAL (SELECT unnest(range(0, {n})) AS s)))
         WHERE rn = 1)"""

    return f"""
        WITH k AS (SELECT 'doc' || CAST(doc_id AS VARCHAR) AS key
                   FROM documents),
        a AS {pick(n_before, "shard_before")},
        b AS {pick(n_after, "shard_after")}
        SELECT a.shard_before, b.shard_after,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(CASE WHEN a.shard_before <> b.shard_after
                         THEN 1 ELSE 0 END AS BIGINT) AS moved
        FROM a JOIN b USING (key)
        GROUP BY a.shard_before, b.shard_after
    """


ORACLES_EXTRA.update({"hrw_routing": _hrw_oracle_sql()})




_FUNNEL_H_US = 72 * 3600 * 1_000_000


def _q_event_funnel(spark, sf_dir):
    """Engine addition: strict-order greedy funnel (analytics.py:
    event_funnel) signup -> click -> purchase within 72h of signup —
    each step's conversion time is the earliest event strictly after
    the previous step's."""
    from see_spark.operators.analytics import event_funnel

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return event_funnel(
        ev, ["signup", "click", "purchase"], horizon_us=_FUNNEL_H_US
    )


def _q_cohort_retention(spark, sf_dir):
    """Engine addition: cohort retention triangle (analytics.py:
    cohort_retention) — 2-day periods, k <= 6, exact integer milli
    retention."""
    from see_spark.operators.analytics import cohort_retention

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return cohort_retention(
        ev, period_us=2 * 24 * 3600 * 1_000_000, max_periods=6
    )


QUERIES_EXTRA.update(
    {"event_funnel": _q_event_funnel, "cohort_retention": _q_cohort_retention}
)


ORACLES_EXTRA.update(
    {
        "event_funnel": f"""
        WITH ev AS (SELECT CAST(user_id AS BIGINT) AS u, event_type AS t,
                           epoch_us(ts) AS us FROM events),
        s1 AS (SELECT u, MIN(us) AS t1 FROM ev
               WHERE t = 'signup' GROUP BY u),
        s2 AS (SELECT e.u, MIN(e.us) AS prev, MIN(s1.t1) AS t1
               FROM ev e JOIN s1 ON s1.u = e.u
               WHERE e.t = 'click' AND e.us > s1.t1
                 AND e.us <= s1.t1 + {_FUNNEL_H_US}
               GROUP BY e.u),
        s3 AS (SELECT e.u, MIN(e.us) AS prev, MIN(s2.t1) AS t1
               FROM ev e JOIN s2 ON s2.u = e.u
               WHERE e.t = 'purchase' AND e.us > s2.prev
                 AND e.us <= s2.t1 + {_FUNNEL_H_US}
               GROUP BY e.u),
        base AS (SELECT COUNT(*) AS b FROM s1)
        SELECT CAST(1 AS BIGINT) AS step, 'signup' AS name,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(COUNT(*) * 1000 // (SELECT b FROM base) AS BIGINT)
                 AS conv_milli
        FROM s1
        UNION ALL
        SELECT 2, 'click', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) * 1000 // (SELECT b FROM base) AS BIGINT)
        FROM s2
        UNION ALL
        SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) * 1000 // (SELECT b FROM base) AS BIGINT)
        FROM s3
    """,
        "cohort_retention": """
        WITH ev AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS u,
                           epoch_us(ts) // 172800000000 AS per
                    FROM events),
        first AS (SELECT u, MIN(per) AS cohort FROM ev GROUP BY u),
        sizes AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_cohort
                  FROM first GROUP BY cohort),
        active AS (
          SELECT f.cohort, e.per - f.cohort AS k,
                 CAST(COUNT(*) AS BIGINT) AS n_active
          FROM ev e JOIN first f ON f.u = e.u
          WHERE e.per - f.cohort <= 6
          GROUP BY f.cohort, e.per - f.cohort)
        SELECT a.cohort AS cohort_period, CAST(a.k AS BIGINT) AS k,
               a.n_active, s.n_cohort,
               CAST(a.n_active * 1000 // s.n_cohort AS BIGINT)
                 AS retained_milli
        FROM active a JOIN sizes s ON s.cohort = a.cohort
    """,
    }
)




def _q_interval_join(spark, sf_dir):
    """Engine addition: bucketized interval-overlap join (asof.py:
    interval_point_join) — per-user%3==0 6-hour windows from first
    activity, matched against ALL events by equi-join on the time
    bucket + exact bounds filter; never an inequality-join plan."""
    from see_spark.operators.asof import interval_point_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    intervals = (
        base.where(F.col("user_id") % 3 == 0)
        .groupBy(F.col("user_id").alias("interval_id"))
        .agg(F.min("ts_us").alias("start_us"))
        .withColumn(
            "end_us", F.col("start_us") + F.lit(6 * 3600 * 1_000_000)
        )
    )
    return interval_point_join(
        intervals,
        base.select(F.col("event_id").alias("point_id"), "ts_us"),
        bucket_us=3_600_000_000,
    )


QUERIES_EXTRA.update({"interval_join": _q_interval_join})


ORACLES_EXTRA.update(
    {
        # ground truth is the plain range join (fine at oracle scale)
        "interval_join": """
        WITH base AS (SELECT CAST(user_id AS BIGINT) AS user_id,
                             CAST(event_id AS BIGINT) AS event_id,
                             epoch_us(ts) AS ts_us FROM events),
        iv AS (SELECT user_id AS interval_id, MIN(ts_us) AS start_us,
                      MIN(ts_us) + 21600000000 AS end_us
               FROM base WHERE user_id % 3 = 0 GROUP BY user_id)
        SELECT iv.interval_id, b.event_id AS point_id,
               iv.start_us, iv.end_us, b.ts_us
        FROM iv JOIN base b
          ON b.ts_us >= iv.start_us AND b.ts_us <= iv.end_us
    """,
    }
)




def _q_mutual_nn(spark, sf_dir):
    """Engine addition: mutual nearest neighbors between label-0 and
    label-1 embedding sets (similarity.py:mutual_nearest_neighbors) —
    the bitext/cross-modal alignment primitive; integer-quantized
    vectors make every cosine bit-exact cross-engine."""
    from see_spark.operators.similarity import mutual_nearest_neighbors

    return mutual_nearest_neighbors(_qvecs(spark, sf_dir), 0, 1)


def _q_lsh_recall_curve(spark, sf_dir):
    """Engine addition: MinHash-LSH banding planner (dedup.py:
    lsh_recall_curve) — the s-curve P(detect) per (bands, rows) config
    evaluated on the dup corpus's OWN exact 3-gram Jaccard distribution
    (pairs >= 0.1); explicit multiplication chains, never pow()."""
    from see_spark.operators.dedup import lsh_recall_curve, word_shingles

    sh = word_shingles(_dup_corpus(spark, sf_dir), 3)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    common = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    pairs = (
        common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("sa")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("sb")),
            "doc_b",
        )
        .select(
            F.expr("n_common * 1000 div (sa + sb - n_common)")
            .cast("long")
            .alias("jaccard_milli")
        )
        .where(F.col("jaccard_milli") >= 100)
    )
    return lsh_recall_curve(pairs, num_hashes=16)


QUERIES_EXTRA.update(
    {"mutual_nn": _q_mutual_nn, "lsh_recall_curve": _q_lsh_recall_curve}
)


def _lsh_curve_oracle_sql() -> str:
    from see_spark.operators.dedup import lsh_p_expr

    selects = []
    for b in (1, 2, 4, 8, 16):
        r = 16 // b
        selects.append(
            f"""
        SELECT CAST({b} AS BIGINT) AS bands,
               CAST({r} AS BIGINT) AS rows_per_band,
               jaccard_milli, n_pairs,
               ROUND({lsh_p_expr(b, r, "jaccard_milli")}, 9) AS p_detect
        FROM g"""
        )
    return (
        """
        WITH corpus AS ("""
        + _DUP_CORPUS_SQL
        + """),
        toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
        sh AS (SELECT DISTINCT doc_id,
                      unnest(list_transform(
                        range(1, greatest(len(t) - 3, 0) + 2),
                        i -> array_to_string(t[i:i+2], ' '))) AS shingle
               FROM toks),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                          COUNT(*) AS n_common
                   FROM sh a JOIN sh b
                     ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
        p AS (SELECT CAST(n_common * 1000
                          // (sa.n_sh + sb.n_sh - n_common) AS BIGINT)
                       AS jaccard_milli
              FROM common c
              JOIN sizes sa ON sa.doc_id = c.doc_a
              JOIN sizes sb ON sb.doc_id = c.doc_b),
        g AS (SELECT jaccard_milli, CAST(COUNT(*) AS BIGINT) AS n_pairs
              FROM p WHERE jaccard_milli >= 100 GROUP BY jaccard_milli)
        """
        + "\n        UNION ALL\n".join(selects)
    )


ORACLES_EXTRA.update(
    {
        "mutual_nn": f"""
        WITH q AS ({_QVEC_SQL}),
        n AS (SELECT vec_id, v, label,
                     sqrt(CAST(list_sum(list_transform(v,
                            x -> CAST(x * x AS DOUBLE))) AS DOUBLE)) AS norm
              FROM q),
        l AS (SELECT vec_id AS a, v AS va, norm AS na FROM n WHERE label = 0),
        r AS (SELECT vec_id AS b, v AS vb, norm AS nb FROM n WHERE label = 1),
        s AS (SELECT a, b,
                     CAST(list_sum(list_transform(range(1, len(va) + 1),
                            i -> CAST(va[i] * vb[i] AS DOUBLE))) AS DOUBLE)
                       / (na * nb) AS cosine
              FROM r, l),
        pa AS (SELECT a, b, cosine, ROW_NUMBER() OVER (
                 PARTITION BY a ORDER BY cosine DESC, b ASC) AS rn FROM s),
        pb AS (SELECT a, b, ROW_NUMBER() OVER (
                 PARTITION BY b ORDER BY cosine DESC, a ASC) AS rn FROM s)
        SELECT pa.a AS vec_a, pa.b AS vec_b, pa.cosine
        FROM pa JOIN pb ON pa.a = pb.a AND pa.b = pb.b AND pb.rn = 1
        WHERE pa.rn = 1
    """,
        "lsh_recall_curve": _lsh_curve_oracle_sql(),
    }
)




def _q_cdc_chunks(spark, sf_dir):
    """Engine addition: content-defined chunking (cdc.py:
    cdc_chunk_table, LBFS shape — parallel boundaries, no sequential
    clamps) over the dup-injected corpus; window 8, ~32-byte chunks."""
    from see_spark.operators.cdc import cdc_chunk_table

    return cdc_chunk_table(_dup_corpus(spark, sf_dir), window=8, mask_bits=5)


def _q_cdc_audit(spark, sf_dir):
    """Engine addition: CDC content-addressed-store audit (cdc.py:
    cdc_dedup_audit) — bytes a chunk store holds vs the raw corpus."""
    from see_spark.operators.cdc import cdc_chunk_table, cdc_dedup_audit

    return cdc_dedup_audit(
        cdc_chunk_table(_dup_corpus(spark, sf_dir), window=8, mask_bits=5)
    )


def _q_term_drift(spark, sf_dir):
    """Engine addition: corpus term-drift monitor (textstats.py:
    term_drift) — top-20 per-term KL contributions between the even-
    and odd-doc_id halves (synthetic crawl rounds)."""
    from see_spark.operators.textstats import term_drift

    docs = _documents(spark, sf_dir)
    return term_drift(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        k=20,
    )


QUERIES_EXTRA.update(
    {
        "cdc_chunks": _q_cdc_chunks,
        "cdc_audit": _q_cdc_audit,
        "term_drift": _q_term_drift,
    }
)


_CDC_CHUNKS_SQL = f"""
        WITH corpus AS ({_DUP_CORPUS_SQL}),
        d AS (SELECT doc_id, text AS t, CAST(length(text) AS BIGINT) AS n
              FROM corpus),
        cut AS (
          SELECT doc_id, t, n,
                 CASE WHEN n <= 8 THEN [CAST(0 AS BIGINT), n]
                      ELSE flatten([[CAST(0 AS BIGINT)],
                        list_filter(list_transform(range(8, CAST(greatest(n, 8) AS BIGINT) + 1),
                          i -> CASE WHEN ('0x' || substr(md5(substr(t, CAST(i - 7 AS INT), 8)),
                                          1, 15))::BIGINT % 32 = 0
                                    THEN CAST(i AS BIGINT) ELSE CAST(-1 AS BIGINT) END),
                          p -> p > 0 AND p < n),
                        [n]])
                 END AS cuts
          FROM d),
        spans AS (
          SELECT doc_id, t,
                 unnest(list_transform(range(1, len(cuts)),
                   k -> struct_pack(s := cuts[k], l := cuts[k + 1] - cuts[k])))
                   AS c
          FROM cut)
        SELECT doc_id, CAST(c.s AS BIGINT) AS start,
               CAST(c.l AS BIGINT) AS length,
               md5(substr(t, CAST(c.s + 1 AS INT), CAST(c.l AS INT)))
                 AS chunk_hash
        FROM spans WHERE c.l > 0
"""


ORACLES_EXTRA.update(
    {
        "cdc_chunks": _CDC_CHUNKS_SQL,
        "cdc_audit": f"""
        WITH chunks AS ({_CDC_CHUNKS_SQL}),
        per AS (SELECT chunk_hash, CAST(COUNT(*) AS BIGINT) AS copies,
                       MIN(length) AS length
                FROM chunks GROUP BY chunk_hash),
        s AS (SELECT CAST(SUM(copies) AS BIGINT) AS n_chunks,
                     CAST(COUNT(*) AS BIGINT) AS n_unique,
                     CAST(SUM(copies * length) AS BIGINT) AS total_bytes,
                     CAST(SUM(length) AS BIGINT) AS unique_bytes
              FROM per)
        SELECT n_chunks, n_unique, total_bytes, unique_bytes,
               CAST((total_bytes - unique_bytes) * 1000 // total_bytes
                    AS BIGINT) AS saved_milli
        FROM s
    """,
        "term_drift": """
        WITH a AS (SELECT unnest(string_split(text, ' ')) AS term
                   FROM documents WHERE doc_id % 2 = 0),
        b AS (SELECT unnest(string_split(text, ' ')) AS term
              FROM documents WHERE doc_id % 2 = 1),
        ca AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c_a FROM a GROUP BY term),
        cb AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c_b FROM b GROUP BY term),
        j AS (SELECT COALESCE(ca.term, cb.term) AS term,
                     CAST(COALESCE(c_a, 0) AS BIGINT) AS c_a,
                     CAST(COALESCE(c_b, 0) AS BIGINT) AS c_b
              FROM ca FULL OUTER JOIN cb ON ca.term = cb.term),
        t AS (SELECT CAST(SUM(c_a) AS DOUBLE) AS ta,
                     CAST(SUM(c_b) AS DOUBLE) AS tb,
                     CAST(COUNT(*) AS DOUBLE) AS v
              FROM j)
        SELECT term, c_a, c_b,
               ROUND(((c_a + 1.0) / ((SELECT ta FROM t) + (SELECT v FROM t)))
                     * ln(((c_a + 1.0) / ((SELECT ta FROM t) + (SELECT v FROM t)))
                          / ((c_b + 1.0) / ((SELECT tb FROM t) + (SELECT v FROM t)))),
                     9) AS contrib
        FROM j
        ORDER BY contrib DESC, term ASC LIMIT 20
    """,
    }
)




def _q_bellman_ford(spark, sf_dir):
    """Engine addition: weighted single-source shortest paths by
    distributed Bellman-Ford (linkgraph.py:bellman_ford) over the
    synthetic expander with weights (src*3+dst*5)%9+1, source 0, 12
    min-plus rounds — exact BIGINT; INF sentinel for unreachable."""
    from see_spark.operators.linkgraph import bellman_ford, synthetic_edges

    docs = _documents(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    edges = synthetic_edges(docs).withColumn(
        "w", (F.col("src") * 3 + F.col("dst") * 5) % 9 + 1
    )
    return bellman_ford(nodes, edges, source=0, n_iter=12)


def _q_naive_bayes(spark, sf_dir):
    """Engine addition: multinomial Naive Bayes filter (classifier.py:
    train_and_score_nb) on the marker-token corpus — micro-nat
    quantized log-probs make every score an exact BIGINT dot product."""
    from see_spark.operators.classifier import train_and_score_nb

    docs = _documents(spark, sf_dir)
    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" xqza xqzb xqzc xqzd")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        (F.col("doc_id") % 3 == 0).cast("long").alias("label"),
    )
    return train_and_score_nb(d, n_buckets=64)


QUERIES_EXTRA.update(
    {"bellman_ford": _q_bellman_ford, "naive_bayes": _q_naive_bayes}
)


def _bf_oracle_sql(n_iter: int = 12) -> str:
    inf = 1 << 40
    # MATERIALIZED: 12 unrolled rounds reference the graph repeatedly —
    # without it DuckDB re-expands (re-opening the parquet) per reference
    # and trips the open-file limit
    ctes = [
        _LINKGRAPH_SQL,
        "we AS MATERIALIZED ("
        "SELECT src, dst, (src*3 + dst*5) % 9 + 1 AS w FROM edges)",
        "mn AS MATERIALIZED (SELECT node FROM nodes)",
        f"d0 AS (SELECT node, CAST(CASE WHEN node = 0 THEN 0"
        f" ELSE {inf} END AS BIGINT) AS dist FROM mn)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node,"
            f" CAST(MIN(d.dist + e.w) AS BIGINT) AS cand"
            f" FROM we e JOIN d{i-1} d ON d.node = e.src"
            f" WHERE d.dist < {inf} GROUP BY e.dst)"
        )
        ctes.append(
            f"d{i} AS (SELECT n.node,"
            f" CAST(LEAST(d.dist, COALESCE(c.cand, {inf})) AS BIGINT) AS dist"
            f" FROM mn n JOIN d{i-1} d ON d.node = n.node"
            f" LEFT JOIN c{i} c ON c.node = n.node)"
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT node, dist FROM d{n_iter}"
    )


ORACLES_EXTRA.update(
    {
        "bellman_ford": _bf_oracle_sql(),
        "naive_bayes": """
        WITH docs AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 CASE WHEN doc_id % 3 = 0
                      THEN text || ' xqza xqzb xqzc xqzd' ELSE text END AS text,
                 CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS y
          FROM documents),
        toks AS (
          SELECT doc_id, y,
                 ('0x' || substr(md5(tok), 1, 4))::BIGINT % 64 AS bucket
          FROM (SELECT doc_id, y, unnest(string_split(text, ' ')) AS tok
                FROM docs)),
        cb AS (SELECT y, bucket, CAST(COUNT(*) AS BIGINT) AS c
               FROM toks GROUP BY y, bucket),
        tot AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS t
                FROM toks GROUP BY y),
        grid AS (
          SELECT tot.y, g.bucket,
                 CAST(round(ln((COALESCE(cb.c, 0) + 1.0) / (tot.t + 64.0))
                            * 1000000.0) AS BIGINT) AS q
          FROM tot
          CROSS JOIN (SELECT unnest(range(0, 64)) AS bucket) g
          LEFT JOIN cb ON cb.y = tot.y AND cb.bucket = g.bucket),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM docs),
        priors AS (
          SELECT y, CAST(round(ln(COUNT(*) / (SELECT n FROM nn))
                               * 1000000.0) AS BIGINT) AS qp
          FROM docs GROUP BY y),
        dc AS (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS tc
               FROM toks GROUP BY doc_id, bucket),
        contrib AS (
          SELECT dc.doc_id, g.y AS cls,
                 CAST(SUM(dc.tc * g.q) AS BIGINT) + MIN(p.qp) AS score
          FROM dc JOIN grid g ON g.bucket = dc.bucket
          JOIN priors p ON p.y = g.y
          GROUP BY dc.doc_id, g.y),
        piv AS (
          SELECT doc_id,
                 MAX(CASE WHEN cls = 0 THEN score END) AS score_0,
                 MAX(CASE WHEN cls = 1 THEN score END) AS score_1
          FROM contrib GROUP BY doc_id)
        SELECT p.doc_id, d.y,
               CAST(p.score_0 AS BIGINT) AS score_0,
               CAST(p.score_1 AS BIGINT) AS score_1,
               CAST(CASE WHEN p.score_1 > p.score_0 THEN 1 ELSE 0 END
                    AS BIGINT) AS predicted
        FROM piv p JOIN docs d USING (doc_id)
    """,
    }
)




def _q_fellegi_sunter(spark, sf_dir):
    """Engine addition: Fellegi-Sunter record-linkage scoring
    (linkage.py) over sorted-neighborhood candidate pairs of the
    field-carrying dup corpus — per-field m/u weights learned from
    exact-dup truth, quantized to micro-nats, exact BIGINT scores."""
    from see_spark.operators.dedup import sorted_neighborhood_pairs
    from see_spark.operators.linkage import fellegi_sunter_scores

    docs = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
        "lang",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    corpus = docs.unionByName(
        docs.where(F.col("doc_id") % 10 == 0).withColumn(
            "doc_id", F.col("doc_id") + 100000
        )
    ).withColumn("snm_key", F.lower(F.substring(F.col("text"), 1, 16)))
    snm = sorted_neighborhood_pairs(corpus, key_col="snm_key", window=3)
    fields = corpus.select(
        "doc_id",
        "lang",
        "source",
        F.expr("n_chars div 50").cast("long").alias("band"),
        F.md5("text").alias("th"),
    )
    fa = fields.select(
        F.col("doc_id").alias("a"), F.col("lang").alias("la"),
        F.col("source").alias("sa"), F.col("band").alias("ba"),
        F.col("th").alias("ha"),
    )
    fb = fields.select(
        F.col("doc_id").alias("b"), F.col("lang").alias("lb"),
        F.col("source").alias("sb"), F.col("band").alias("bb"),
        F.col("th").alias("hb"),
    )
    pairs = (
        snm.join(fa, "a")
        .join(fb, "b")
        .select(
            "a",
            "b",
            (F.col("la") == F.col("lb")).alias("agree_lang"),
            (F.col("sa") == F.col("sb")).alias("agree_source"),
            (F.col("ba") == F.col("bb")).alias("agree_band"),
            (F.col("jaccard_milli") >= 500).alias("agree_tokens"),
            (F.col("ha") == F.col("hb")).alias("is_match"),
        )
    )
    scored = fellegi_sunter_scores(
        pairs, ["agree_lang", "agree_source", "agree_band", "agree_tokens"]
    )
    return scored.select(
        "a",
        "b",
        F.col("agree_lang").cast("long").alias("agree_lang"),
        F.col("agree_source").cast("long").alias("agree_source"),
        F.col("agree_band").cast("long").alias("agree_band"),
        F.col("agree_tokens").cast("long").alias("agree_tokens"),
        F.col("is_match").cast("long").alias("is_match"),
        "score",
        "fs_match",
    )


QUERIES_EXTRA.update({"fellegi_sunter": _q_fellegi_sunter})


ORACLES_EXTRA.update(
    {
        "fellegi_sunter": """
        WITH corpus AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source,
                 CAST(n_chars AS BIGINT) AS n_chars FROM documents
          UNION ALL
          SELECT CAST(doc_id + 100000 AS BIGINT), text, lang, source,
                 CAST(n_chars AS BIGINT) FROM documents WHERE doc_id % 10 = 0),
        keyed AS (SELECT doc_id AS id, lower(substr(text, 1, 16)) AS key,
                         text FROM corpus),
        ranked AS (SELECT id, key, text,
                          ROW_NUMBER() OVER (ORDER BY key, id) - 1 AS rn
                   FROM keyed),
        prs AS (SELECT l.id AS a, r.id AS b
                FROM ranked l JOIN ranked r
                  ON r.rn BETWEEN l.rn + 1 AND l.rn + 2),
        toks AS (SELECT DISTINCT id,
                        unnest(string_split(text, ' ')) AS word FROM keyed),
        sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS sz
                  FROM toks GROUP BY id),
        -- per-doc token lists + list_intersect: per-pair LINEAR work.
        -- (The previous toks-join formulation let DuckDB join word-first
        -- across all docs — quadratic in document frequency, >79 GB of
        -- temp spill at sf0.1.)
        tokl AS (SELECT id, list(word) AS words FROM toks GROUP BY id),
        inter AS (SELECT p.a, p.b,
                         CAST(len(list_intersect(la.words, lb.words))
                              AS BIGINT) AS i
                  FROM prs p
                  JOIN tokl la ON la.id = p.a
                  JOIN tokl lb ON lb.id = p.b),
        fields AS (SELECT doc_id, lang, source, n_chars // 50 AS band,
                          md5(text) AS th FROM corpus),
        pairs AS (
          SELECT p.a, p.b,
                 (fa.lang = fb.lang) AS agree_lang,
                 (fa.source = fb.source) AS agree_source,
                 (fa.band = fb.band) AS agree_band,
                 (COALESCE(i.i, 0) * 1000
                  // (sa.sz + sb.sz - COALESCE(i.i, 0)) >= 500)
                   AS agree_tokens,
                 (fa.th = fb.th) AS is_match
          FROM prs p
          LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
          JOIN sizes sa ON sa.id = p.a JOIN sizes sb ON sb.id = p.b
          JOIN fields fa ON fa.doc_id = p.a
          JOIN fields fb ON fb.doc_id = p.b),
        c AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT)
                   AS nm,
                 CAST(SUM(CASE WHEN is_match AND agree_lang THEN 1 ELSE 0 END) AS BIGINT) AS ma_lang,
                 CAST(SUM(CASE WHEN NOT is_match AND agree_lang THEN 1 ELSE 0 END) AS BIGINT) AS ua_lang,
                 CAST(SUM(CASE WHEN is_match AND agree_source THEN 1 ELSE 0 END) AS BIGINT) AS ma_source,
                 CAST(SUM(CASE WHEN NOT is_match AND agree_source THEN 1 ELSE 0 END) AS BIGINT) AS ua_source,
                 CAST(SUM(CASE WHEN is_match AND agree_band THEN 1 ELSE 0 END) AS BIGINT) AS ma_band,
                 CAST(SUM(CASE WHEN NOT is_match AND agree_band THEN 1 ELSE 0 END) AS BIGINT) AS ua_band,
                 CAST(SUM(CASE WHEN is_match AND agree_tokens THEN 1 ELSE 0 END) AS BIGINT) AS ma_tokens,
                 CAST(SUM(CASE WHEN NOT is_match AND agree_tokens THEN 1 ELSE 0 END) AS BIGINT) AS ua_tokens
          FROM pairs),
        w AS (
          SELECT
            CAST(round(ln(((CAST(ma_lang AS DOUBLE) + 0.5) / (CAST(nm AS DOUBLE) + 1.0))
                 / ((CAST(ua_lang AS DOUBLE) + 0.5) / (CAST(n - nm AS DOUBLE) + 1.0))) * 1000000.0) AS BIGINT) AS w_lang,
            CAST(round(ln((1.0 - ((CAST(ma_lang AS DOUBLE) + 0.5) / (CAST(nm AS DOUBLE) + 1.0)))
                 / (1.0 - ((CAST(ua_lang AS DOUBLE) + 0.5) / (CAST(n - nm AS DOUBLE) + 1.0)))) * 1000000.0) AS BIGINT) AS wb_lang,
            CAST(round(ln(((CAST(ma_source AS DOUBLE) + 0.5) / (CAST(nm AS DOUBLE) + 1.0))
                 / ((CAST(ua_source AS DOUBLE) + 0.5) / (CAST(n - nm AS DOUBLE) + 1.0))) * 1000000.0) AS BIGINT) AS w_source,
            CAST(round(ln((1.0 - ((CAST(ma_source AS DOUBLE) + 0.5) / (CAST(nm AS DOUBLE) + 1.0)))
                 / (1.0 - ((CAST(ua_source AS DOUBLE) + 0.5) / (CAST(n - nm AS DOUBLE) + 1.0)))) * 1000000.0) AS BIGINT) AS wb_source,
            CAST(round(ln(((CAST(ma_band AS DOUBLE) + 0.5) / (CAST(nm AS DOUBLE) + 1.0))
                 / ((CAST(ua_band AS DOUBLE) + 0.5) / (CAST(n - nm AS DOUBLE) + 1.0))) * 1000000.0) AS BIGINT) AS w_band,
            CAST(round(ln((1.0 - ((CAST(ma_band AS DOUBLE) + 0.5) / (CAST(nm AS DOUBLE) + 1.0)))
                 / (1.0 - ((CAST(ua_band AS DOUBLE) + 0.5) / (CAST(n - nm AS DOUBLE) + 1.0)))) * 1000000.0) AS BIGINT) AS wb_band,
            CAST(round(ln(((CAST(ma_tokens AS DOUBLE) + 0.5) / (CAST(nm AS DOUBLE) + 1.0))
                 / ((CAST(ua_tokens AS DOUBLE) + 0.5) / (CAST(n - nm AS DOUBLE) + 1.0))) * 1000000.0) AS BIGINT) AS w_tokens,
            CAST(round(ln((1.0 - ((CAST(ma_tokens AS DOUBLE) + 0.5) / (CAST(nm AS DOUBLE) + 1.0)))
                 / (1.0 - ((CAST(ua_tokens AS DOUBLE) + 0.5) / (CAST(n - nm AS DOUBLE) + 1.0)))) * 1000000.0) AS BIGINT) AS wb_tokens
          FROM c)
        SELECT p.a, p.b,
               CAST(CASE WHEN agree_lang THEN 1 ELSE 0 END AS BIGINT) AS agree_lang,
               CAST(CASE WHEN agree_source THEN 1 ELSE 0 END AS BIGINT) AS agree_source,
               CAST(CASE WHEN agree_band THEN 1 ELSE 0 END AS BIGINT) AS agree_band,
               CAST(CASE WHEN agree_tokens THEN 1 ELSE 0 END AS BIGINT) AS agree_tokens,
               CAST(CASE WHEN is_match THEN 1 ELSE 0 END AS BIGINT) AS is_match,
               CAST((CASE WHEN agree_lang THEN (SELECT w_lang FROM w) ELSE (SELECT wb_lang FROM w) END)
                  + (CASE WHEN agree_source THEN (SELECT w_source FROM w) ELSE (SELECT wb_source FROM w) END)
                  + (CASE WHEN agree_band THEN (SELECT w_band FROM w) ELSE (SELECT wb_band FROM w) END)
                  + (CASE WHEN agree_tokens THEN (SELECT w_tokens FROM w) ELSE (SELECT wb_tokens FROM w) END)
                    AS BIGINT) AS score,
               CAST(CASE WHEN (CASE WHEN agree_lang THEN (SELECT w_lang FROM w) ELSE (SELECT wb_lang FROM w) END)
                  + (CASE WHEN agree_source THEN (SELECT w_source FROM w) ELSE (SELECT wb_source FROM w) END)
                  + (CASE WHEN agree_band THEN (SELECT w_band FROM w) ELSE (SELECT wb_band FROM w) END)
                  + (CASE WHEN agree_tokens THEN (SELECT w_tokens FROM w) ELSE (SELECT wb_tokens FROM w) END)
                  > 0 THEN 1 ELSE 0 END AS BIGINT) AS fs_match
        FROM pairs p
    """,
    }
)




def _q_bwt_transform(spark, sf_dir):
    """Engine addition: Burrows-Wheeler transform from the distributed
    suffix array (suffix.py:bwt_transform) on the doc slice truncated
    to 120 chars, with the run-clustering audit (bwt_runs vs
    orig_runs); oracle sorts suffixes directly."""
    from see_spark.operators.suffix import bwt_transform

    return bwt_transform(_sa_docs(spark, sf_dir), max_len=120)


QUERIES_EXTRA.update({"bwt_transform": _q_bwt_transform})


ORACLES_EXTRA.update(
    {
        "bwt_transform": """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          substr(text, 1, 120) || chr(9) AS t
                   FROM documents WHERE doc_id % 25 = 0),
        p AS (SELECT doc_id, t, unnest(range(0, length(t))) AS pos FROM d),
        sa AS (SELECT doc_id, t, pos,
                      ROW_NUMBER() OVER (PARTITION BY doc_id
                        ORDER BY substr(t, pos + 1)) AS r
               FROM p),
        b AS (SELECT doc_id,
                     string_agg(CASE WHEN pos = 0
                                     THEN substr(t, length(t), 1)
                                     ELSE substr(t, pos, 1) END,
                                '' ORDER BY r) AS bwt,
                     MIN(t) AS t
              FROM sa GROUP BY doc_id)
        SELECT doc_id, bwt,
               CAST(1 + len(list_filter(range(2, length(bwt) + 1),
                      i -> substr(bwt, i, 1) <> substr(bwt, i - 1, 1)))
                    AS BIGINT) AS bwt_runs,
               CAST(1 + len(list_filter(range(2, length(t) + 1),
                      i -> substr(t, i, 1) <> substr(t, i - 1, 1)))
                    AS BIGINT) AS orig_runs
        FROM b
    """,
    }
)




_STATS_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _q_table_stats(spark, sf_dir):
    """Engine addition: ANALYZE-style per-column statistics
    (tablestats.py:table_stats) over documents — the CBO feed (row
    count, nulls, exact NDV, min/max) in ONE scan, stack-unpivoted."""
    from see_spark.operators.tablestats import table_stats

    return table_stats(_documents(spark, sf_dir), _STATS_COLS)


def _q_decayed_counts(spark, sf_dir):
    """Engine addition: exponentially-decayed counters (tablestats.py:
    decayed_counts) per event_type, 3-day half-life — EXACT fixed-point
    aging (2^20 >> halflives), no float decay drift."""
    from see_spark.operators.tablestats import decayed_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return decayed_counts(ev, halflife_us=3 * 24 * 3_600_000_000)


QUERIES_EXTRA.update(
    {"table_stats": _q_table_stats, "decayed_counts": _q_decayed_counts}
)


def _table_stats_oracle_sql() -> str:
    parts = []
    for c in _STATS_COLS:
        parts.append(f"""
        SELECT '{c}' AS column,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
               CAST(MIN({c}) AS VARCHAR) AS min_val,
               CAST(MAX({c}) AS VARCHAR) AS max_val
        FROM documents""")
    return "\n        UNION ALL\n".join(parts)


ORACLES_EXTRA.update(
    {
        "table_stats": _table_stats_oracle_sql(),
        "decayed_counts": """
        WITH m AS (SELECT MAX(epoch_us(ts)) AS now FROM events),
        w AS (SELECT event_type AS key,
                     CASE WHEN ((SELECT now FROM m) - epoch_us(ts))
                               // 259200000000 >= 20
                          THEN CAST(0 AS BIGINT)
                          ELSE CAST(1048576 AS BIGINT)
                               >> CAST(((SELECT now FROM m) - epoch_us(ts))
                                       // 259200000000 AS INT)
                     END AS wt
              FROM events)
        SELECT key, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(wt) AS BIGINT) AS decayed_fp
        FROM w GROUP BY key
    """,
    }
)




def _q_range_router(spark, sf_dir):
    """Engine addition: range-partition balance audit (sharding.py:
    range_router_audit) — exact equi-depth boundaries vs naive
    fixed-width ranges on a quadratically skewed key ((l_orderkey%100)^2
    over lineitem), 16 buckets; fixed-width shows the skew a static
    range shuffle inherits."""
    from see_spark.operators.sharding import range_router_audit

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        ((F.col("l_orderkey") % 100) * (F.col("l_orderkey") % 100))
        .cast("long")
        .alias("skewed_key")
    )
    return range_router_audit(li, "skewed_key", n_buckets=16)


QUERIES_EXTRA.update({"range_router": _q_range_router})


ORACLES_EXTRA.update(
    {
        "range_router": """
        WITH base AS (
          SELECT CAST((l_orderkey % 100) * (l_orderkey % 100) AS BIGINT)
                   AS k
          FROM lineitem),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      MIN(k) AS lo, MAX(k) AS hi FROM base),
        ranked AS (SELECT k, ROW_NUMBER() OVER (ORDER BY k) - 1 AS r
                   FROM base),
        marks AS (SELECT (i * (SELECT n FROM nn)) // 16 AS m
                  FROM (SELECT unnest(range(1, 16)) AS i)),
        bounds AS (SELECT DISTINCT m, (SELECT k FROM ranked WHERE r = m) AS v
                   FROM marks),
        eq AS (
          SELECT 'equidepth' AS scheme,
                 CAST((SELECT COUNT(*) FROM bounds WHERE base.k > bounds.v)
                      AS BIGINT) AS bucket
          FROM base),
        fw AS (
          SELECT 'fixedwidth' AS scheme,
                 CAST(CASE WHEN (SELECT hi FROM nn) = (SELECT lo FROM nn)
                           THEN 0
                           ELSE LEAST((k - (SELECT lo FROM nn)) * 16
                                // ((SELECT hi FROM nn)
                                    - (SELECT lo FROM nn) + 1), 15)
                      END AS BIGINT) AS bucket
          FROM base)
        SELECT scheme, bucket, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM (SELECT * FROM eq UNION ALL SELECT * FROM fw)
        GROUP BY scheme, bucket
    """,
    }
)




def _q_compression_audit(spark, sf_dir):
    """Engine addition: exact Rice / Elias-Fano posting-list costing
    (indexstats.py:compression_size_audit) over the corpus postings —
    integer floor-log2 via bin(), no float path; per-word best codec."""
    from see_spark.operators.indexstats import compression_size_audit

    return compression_size_audit(_doc_postings(spark, sf_dir), min_docs=2)


QUERIES_EXTRA.update({"compression_audit": _q_compression_audit})


ORACLES_EXTRA.update(
    {
        "compression_audit": f"""
        WITH postings AS ({_POSTINGS_SQL}),
        g AS (SELECT word, doc_id,
                     doc_id - LAG(doc_id, 1, -1) OVER (
                       PARTITION BY word ORDER BY doc_id) AS gap
              FROM (SELECT word, CAST(doc_id AS BIGINT) AS doc_id
                    FROM postings)),
        pw AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(MAX(doc_id) + 1 AS BIGINT) AS universe
               FROM g GROUP BY word HAVING COUNT(*) >= 2),
        par AS (SELECT word, n_docs, universe,
                       CAST(length(bin(GREATEST(universe // n_docs, 1))) - 1
                            AS BIGINT) AS k
                FROM pw),
        rs AS (SELECT g.word,
                      CAST(SUM((g.gap >> CAST(p.k AS INT)) + 1 + p.k)
                           AS BIGINT) AS rice_bits
               FROM g JOIN par p USING (word) GROUP BY g.word)
        SELECT p.word, p.n_docs, p.universe,
               CAST(p.n_docs * 64 AS BIGINT) AS raw_bits,
               p.k AS rice_k, r.rice_bits, p.k AS ef_l,
               CAST(p.n_docs * p.k + p.n_docs
                    + (p.universe >> CAST(p.k AS INT)) AS BIGINT) AS ef_bits,
               CASE WHEN r.rice_bits <= (p.n_docs * p.k + p.n_docs
                         + (p.universe >> CAST(p.k AS INT)))
                         AND r.rice_bits <= p.n_docs * 64 THEN 'rice'
                    WHEN (p.n_docs * p.k + p.n_docs
                          + (p.universe >> CAST(p.k AS INT)))
                         <= p.n_docs * 64 THEN 'ef'
                    ELSE 'raw' END AS best
        FROM par p JOIN rs r USING (word)
    """,
    }
)




def _q_skyline(spark, sf_dir):
    """Engine addition: Pareto-frontier skyline (skyline.py:skyline2d,
    Borzsonyi 2001) over documents maximizing (n_chars%97, doc_id%89) —
    grid pre-pruning bounds the exact dominance test to the staircase
    band."""
    from see_spark.operators.skyline import skyline2d

    docs = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.col("n_chars") % 97).cast("long").alias("qx"),
        (F.col("doc_id") % 89).cast("long").alias("qy"),
    )
    return skyline2d(docs, "qx", "qy", "doc_id")


QUERIES_EXTRA.update({"skyline": _q_skyline})


ORACLES_EXTRA.update(
    {
        # ground truth: direct NOT EXISTS dominance
        "skyline": """
        WITH p AS (SELECT CAST(doc_id AS BIGINT) AS id,
                          CAST(n_chars % 97 AS BIGINT) AS x,
                          CAST(doc_id % 89 AS BIGINT) AS y
                   FROM documents)
        SELECT id, x, y FROM p a
        WHERE NOT EXISTS (
          SELECT 1 FROM p b
          WHERE b.x >= a.x AND b.y >= a.y
            AND (b.x > a.x OR b.y > a.y))
    """,
    }
)




def _q_merkle_tree(spark, sf_dir):
    """Engine addition: Merkle hash tree over documents (merkle.py:
    merkle_levels) — rows in doc_id order, fanout 16; level 0 leaves up
    to the root, all deterministic md5 (the snapshot-integrity /
    replica-diff primitive)."""
    from see_spark.operators.merkle import merkle_levels

    docs = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return merkle_levels(docs, ["doc_id"], ["doc_id", "text"], fanout=16)


QUERIES_EXTRA.update({"merkle_tree": _q_merkle_tree})


ORACLES_EXTRA.update(
    {
        # Unrolled levels, each guarded by "previous level still has >1
        # node" so the unroll is corpus-size-independent up to 16^6 docs
        # (the engine stops when one root remains; an unguarded extra
        # level would re-hash the lone root into a spurious row — the
        # exact off-by-one the sf0.1 run caught in round 4).
        "merkle_tree": """
        WITH l0 AS (
          SELECT 0 AS level,
                 ROW_NUMBER() OVER (ORDER BY CAST(doc_id AS BIGINT)) - 1
                   AS pos,
                 md5(CAST(doc_id AS BIGINT) || chr(31) || text) AS node_hash
          FROM documents),
        l1 AS (SELECT 1 AS level, pos // 16 AS pos,
                      md5(string_agg(node_hash, '' ORDER BY pos)) AS node_hash
               FROM l0 WHERE (SELECT COUNT(*) FROM l0) > 1
               GROUP BY pos // 16),
        l2 AS (SELECT 2 AS level, pos // 16 AS pos,
                      md5(string_agg(node_hash, '' ORDER BY pos)) AS node_hash
               FROM l1 WHERE (SELECT COUNT(*) FROM l1) > 1
               GROUP BY pos // 16),
        l3 AS (SELECT 3 AS level, pos // 16 AS pos,
                      md5(string_agg(node_hash, '' ORDER BY pos)) AS node_hash
               FROM l2 WHERE (SELECT COUNT(*) FROM l2) > 1
               GROUP BY pos // 16),
        l4 AS (SELECT 4 AS level, pos // 16 AS pos,
                      md5(string_agg(node_hash, '' ORDER BY pos)) AS node_hash
               FROM l3 WHERE (SELECT COUNT(*) FROM l3) > 1
               GROUP BY pos // 16),
        l5 AS (SELECT 5 AS level, pos // 16 AS pos,
                      md5(string_agg(node_hash, '' ORDER BY pos)) AS node_hash
               FROM l4 WHERE (SELECT COUNT(*) FROM l4) > 1
               GROUP BY pos // 16),
        l6 AS (SELECT 6 AS level, pos // 16 AS pos,
                      md5(string_agg(node_hash, '' ORDER BY pos)) AS node_hash
               FROM l5 WHERE (SELECT COUNT(*) FROM l5) > 1
               GROUP BY pos // 16)
        SELECT CAST(level AS BIGINT) AS level, CAST(pos AS BIGINT) AS pos,
               node_hash
        FROM (SELECT * FROM l0 UNION ALL SELECT * FROM l1
              UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3
              UNION ALL SELECT * FROM l4 UNION ALL SELECT * FROM l5
              UNION ALL SELECT * FROM l6)
    """,
    }
)




def _q_edit_join(spark, sf_dir):
    """Engine addition: q-gram edit-distance similarity join
    (simjoin.py:edit_distance_join, Gravano VLDB'01) on the 24-char
    text-prefix field of the dup corpus — count-filtered candidates,
    built-in levenshtein verify, dist <= 2."""
    from see_spark.operators.simjoin import edit_distance_join

    return edit_distance_join(
        _dup_corpus(spark, sf_dir), max_dist=2, q=2, field_len=24
    )


QUERIES_EXTRA.update({"edit_join": _q_edit_join})


ORACLES_EXTRA.update(
    {
        # Ground-truth all-pairs oracle (NOT the q-gram method): the
        # engine's count-filtered + short-regime candidate generation
        # must reproduce the exact Levenshtein join for every length,
        # including fields too short to share any q-gram.
        "edit_join": f"""
        WITH corpus AS ({_DUP_CORPUS_SQL}),
        fields AS (SELECT doc_id AS id, substr(text, 1, 24) AS f
                   FROM corpus)
        SELECT fa.id AS a, fb.id AS b,
               CAST(levenshtein(fa.f, fb.f) AS BIGINT) AS dist
        FROM fields fa JOIN fields fb ON fa.id < fb.id
        WHERE levenshtein(fa.f, fb.f) <= 2
    """,
    }
)




def _q_ab_test(spark, sf_dir):
    """Engine addition: two-proportion A/B conversion test
    (analytics.py:ab_test) — variant by user parity, conversion =
    purchase within 24h of first signup; exact counts, guarded pooled
    z."""
    from see_spark.operators.analytics import ab_test

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ab_test(ev, horizon_us=24 * 3600 * 1_000_000)


def _q_kaplan_meier(spark, sf_dir):
    """Engine addition: Kaplan-Meier survival curve (analytics.py:
    kaplan_meier) for time from first signup to purchase, censoring
    non-converters at the corpus horizon; windowed product over the
    pinned time order."""
    from see_spark.operators.analytics import kaplan_meier

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return kaplan_meier(ev)


def _q_gini_hosts(spark, sf_dir):
    """Engine addition: Gini concentration of frontier pages per host
    (analytics.py:gini_concentration) — exact integer micro-units via
    the rank formula."""
    from see_spark.operators.analytics import gini_concentration

    counts = (
        _orders_frontier(spark, sf_dir)
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("n"))
    )
    return gini_concentration(counts, value_col="n")


QUERIES_EXTRA.update(
    {
        "ab_test": _q_ab_test,
        "kaplan_meier": _q_kaplan_meier,
        "gini_hosts": _q_gini_hosts,
    }
)


ORACLES_EXTRA.update(
    {
        "ab_test": """
        WITH ev AS (SELECT CAST(user_id AS BIGINT) AS u, event_type AS t,
                           epoch_us(ts) AS us, (user_id % 2 = 0) AS va
                    FROM events),
        st AS (SELECT u, MIN(us) AS t0, MIN(CASE WHEN va THEN 1 ELSE 0 END)
                        AS va
               FROM ev WHERE t = 'signup' GROUP BY u),
        cv AS (SELECT DISTINCT e.u FROM ev e JOIN st ON st.u = e.u
               WHERE e.t = 'purchase' AND e.us > st.t0
                 AND e.us <= st.t0 + 86400000000),
        per AS (SELECT st.va, CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(CASE WHEN cv.u IS NOT NULL THEN 1 ELSE 0 END)
                            AS BIGINT) AS c
                FROM st LEFT JOIN cv ON cv.u = st.u GROUP BY st.va),
        one AS (SELECT
                  MAX(CASE WHEN va = 1 THEN n END) AS n_a,
                  MAX(CASE WHEN va = 1 THEN c END) AS c_a,
                  MAX(CASE WHEN va = 0 THEN n END) AS n_b,
                  MAX(CASE WHEN va = 0 THEN c END) AS c_b
                FROM per)
        SELECT n_a, c_a, n_b, c_b,
               CAST(c_a * 1000 // n_a AS BIGINT) AS rate_a_milli,
               CAST(c_b * 1000 // n_b AS BIGINT) AS rate_b_milli,
               ROUND(CASE WHEN (c_a + c_b) / (n_a + n_b) <= 0.0
                            OR (c_a + c_b) / (n_a + n_b) >= 1.0 THEN 0.0
                     ELSE (c_a / n_a - c_b / n_b)
                          / sqrt(((c_a + c_b) / (n_a + n_b))
                                 * (1.0 - (c_a + c_b) / (n_a + n_b))
                                 * (1.0 / n_a + 1.0 / n_b))
                     END, 9) AS z_stat
        FROM one
    """,
        "kaplan_meier": """
        WITH ev AS (SELECT CAST(user_id AS BIGINT) AS u, event_type AS t,
                           epoch_us(ts) AS us FROM events),
        h AS (SELECT MAX(us) AS horizon FROM ev),
        st AS (SELECT u, MIN(us) AS t0 FROM ev
               WHERE t = 'signup' GROUP BY u),
        g AS (SELECT e.u, MIN(e.us) AS tg
              FROM ev e JOIN st ON st.u = e.u
              WHERE e.t = 'purchase' AND e.us > st.t0 GROUP BY e.u),
        durs AS (SELECT st.u,
                        COALESCE(g.tg - st.t0,
                                 (SELECT horizon FROM h) - st.t0) AS dur,
                        CASE WHEN g.tg IS NOT NULL THEN 1 ELSE 0 END
                          AS event
                 FROM st LEFT JOIN g ON g.u = st.u),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM durs),
        per_t AS (SELECT dur AS t_us, CAST(COUNT(*) AS BIGINT) AS m,
                         CAST(SUM(event) AS BIGINT) AS d
                  FROM durs GROUP BY dur),
        risk AS (SELECT t_us, m, d,
                        CAST((SELECT n FROM nn)
                             - COALESCE(SUM(m) OVER (ORDER BY t_us
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
                 FROM per_t),
        curve AS (SELECT t_us, d, n_risk,
                         product(1.0 - d / n_risk) OVER (ORDER BY t_us
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS s
                  FROM risk WHERE d > 0)
        SELECT t_us, d, n_risk, ROUND(s, 9) AS survival FROM curve
    """,
        "gini_hosts": f"""
        WITH frontier AS ({_FRONTIER_SQL}),
        counts AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n
                   FROM frontier GROUP BY host),
        ranked AS (SELECT n AS x,
                          ROW_NUMBER() OVER (ORDER BY n, host) AS i
                   FROM counts),
        agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS ng,
                       CAST(SUM(x) AS BIGINT) AS s,
                       CAST(SUM(i * x) AS BIGINT) AS ix
                FROM ranked)
        SELECT ng AS n_groups, s AS total,
               CAST((2 * ix * 1000000) // (ng * s)
                    - ((ng + 1) * 1000000) // ng AS BIGINT) AS gini_micro
        FROM agg
    """,
    }
)




def _q_lang_confusion(spark, sf_dir):
    """Engine addition: confusion matrix (evaluation.py:
    classification_confusion) of the stopword language-ID predictions
    against the documents.lang labels — diagonal cell_milli = per-class
    recall."""
    from see_spark.operators.evaluation import classification_confusion

    preds = _q_lang_id(spark, sf_dir).select(
        F.col("doc_id").alias("id"), F.col("predicted_lang").alias("pred")
    )
    truth = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("id"), F.col("lang").alias("truth")
    )
    return classification_confusion(preds, truth)


QUERIES_EXTRA.update({"lang_confusion": _q_lang_confusion})


ORACLES_EXTRA.update(
    {
        "lang_confusion": f"""
        WITH preds AS ({ORACLES_BATCH2["lang_id"]}),
        j AS (SELECT d.lang AS truth, p.predicted_lang AS pred
              FROM preds p JOIN documents d
                ON CAST(d.doc_id AS BIGINT) = p.doc_id),
        cells AS (SELECT truth, pred, CAST(COUNT(*) AS BIGINT) AS n
                  FROM j GROUP BY truth, pred),
        totals AS (SELECT truth, CAST(COUNT(*) AS BIGINT) AS n_truth
                   FROM j GROUP BY truth)
        SELECT c.truth, c.pred, c.n, t.n_truth,
               CAST(c.n * 1000 // t.n_truth AS BIGINT) AS cell_milli
        FROM cells c JOIN totals t USING (truth)
    """,
    }
)




def _q_containment(spark, sf_dir):
    """Engine addition: Broder containment (dedup.py:containment_pairs)
    — the dup-injected copies (new side) vs the original corpus (old
    side): c(new, old) = |S∩|/|S(new)|; the asymmetric novelty test."""
    from see_spark.operators.dedup import containment_pairs

    corpus = _dup_corpus(spark, sf_dir)
    new = corpus.where(F.col("doc_id") >= 100000)
    old = corpus.where(F.col("doc_id") < 100000)
    return containment_pairs(new, old, n=3, threshold_milli=500)


QUERIES_EXTRA.update({"containment": _q_containment})


ORACLES_EXTRA.update(
    {
        "containment": f"""
        WITH corpus AS ({_DUP_CORPUS_SQL}),
        toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
        sh AS (SELECT DISTINCT doc_id,
                      unnest(list_transform(range(1, greatest(len(t)-2, 1)+1),
                             i -> array_to_string(t[i:i+2], ' '))) AS shingle
               FROM toks),
        sn AS (SELECT doc_id AS new_id, shingle FROM sh
               WHERE doc_id >= 100000),
        so AS (SELECT doc_id AS old_id, shingle FROM sh
               WHERE doc_id < 100000),
        sizes AS (SELECT new_id, CAST(COUNT(*) AS BIGINT) AS size_new
                  FROM sn GROUP BY new_id),
        inter AS (SELECT sn.new_id, so.old_id,
                         CAST(COUNT(*) AS BIGINT) AS inter
                  FROM sn JOIN so USING (shingle)
                  GROUP BY sn.new_id, so.old_id)
        SELECT i.new_id, i.old_id, i.inter, s.size_new,
               CAST(i.inter * 1000 // s.size_new AS BIGINT)
                 AS containment_milli
        FROM inter i JOIN sizes s USING (new_id)
        WHERE i.inter * 1000 // s.size_new >= 500
    """,
    }
)




def _q_table_diff(spark, sf_dir):
    """Engine addition: semantic snapshot diff (merkle.py:table_diff) —
    documents vs a deterministically mutated copy (drop doc_id%31==0,
    rewrite text of %17==0, add shifted ids): added/removed/changed/
    unchanged counts from one full-outer hash join."""
    from see_spark.operators.merkle import table_diff

    docs = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    mutated = (
        docs.where(F.col("doc_id") % 31 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 17 == 0, F.concat(F.col("text"), F.lit(" v2"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.where(F.col("doc_id") % 13 == 0).select(
                (F.col("doc_id") + 200000).alias("doc_id"), "text"
            )
        )
    )
    return table_diff(docs, mutated, ["doc_id"], ["text"])


QUERIES_EXTRA.update({"table_diff": _q_table_diff})


ORACLES_EXTRA.update(
    {
        "table_diff": """
        WITH docs AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text
                      FROM documents),
        mut AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 17 = 0 THEN text || ' v2'
                      ELSE text END AS text
          FROM docs WHERE doc_id % 31 <> 0
          UNION ALL
          SELECT doc_id + 200000, text FROM docs WHERE doc_id % 13 = 0),
        a AS (SELECT doc_id, md5(text) AS ha FROM docs),
        b AS (SELECT doc_id, md5(text) AS hb FROM mut),
        j AS (SELECT CASE WHEN a.ha IS NULL THEN 'added'
                          WHEN b.hb IS NULL THEN 'removed'
                          WHEN a.ha <> b.hb THEN 'changed'
                          ELSE 'unchanged' END AS status
              FROM a FULL OUTER JOIN b USING (doc_id))
        SELECT status, CAST(COUNT(*) AS BIGINT) AS n_keys
        FROM j GROUP BY status
    """,
    }
)




def _q_class_tfidf(spark, sf_dir):
    """Engine addition: c-TF-IDF class labeling (textfilters.py:
    class_tfidf) — top-5 distinguishing terms per language class; the
    cluster-naming step of BERTopic-style pipelines."""
    from see_spark.operators.textfilters import class_tfidf

    return class_tfidf(_documents(spark, sf_dir), class_col="lang", k=5)


QUERIES_EXTRA.update({"class_tfidf": _q_class_tfidf})


ORACLES_EXTRA.update(
    {
        "class_tfidf": """
        WITH toks AS (SELECT lang AS cls,
                             unnest(string_split(text, ' ')) AS term
                      FROM documents),
        tf AS (SELECT cls, term, CAST(COUNT(*) AS BIGINT) AS tf
               FROM toks GROUP BY cls, term),
        wc AS (SELECT cls, CAST(COUNT(*) AS BIGINT) AS w
               FROM toks GROUP BY cls),
        cf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cf
               FROM tf GROUP BY term),
        nc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM wc),
        scored AS (
          SELECT tf.cls, tf.term, tf.tf,
                 ROUND((tf.tf / wc.w)
                       * ln((SELECT c FROM nc) / (1.0 + cf.cf)), 9)
                   AS score
          FROM tf JOIN wc USING (cls) JOIN cf USING (term)),
        ranked AS (
          SELECT cls, term, tf, score,
                 ROW_NUMBER() OVER (PARTITION BY cls
                   ORDER BY score DESC, term ASC) AS r
          FROM scored)
        SELECT cls, CAST(r AS BIGINT) AS rank, term, tf, score
        FROM ranked WHERE r <= 5
    """,
    }
)




_SEL_PREDS = [
    ("qty_eq_25", "l_quantity", 25),
    ("partkey_eq_7", "l_partkey", 7),
    ("skew_eq_100", "skewed", 100),
    ("skew_eq_9801", "skewed", 9801),
]


def _q_selectivity_audit(spark, sf_dir):
    """Engine addition: CBO selectivity reality check (tablestats.py:
    selectivity_audit) — uniform-NDV estimates vs actual rows with
    q-error, over lineitem plus the quadratically skewed derived key;
    the skewed predicates show where uniformity lies."""
    from see_spark.operators.tablestats import selectivity_audit

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "skewed",
        ((F.col("l_orderkey") % 100) * (F.col("l_orderkey") % 100)).cast("long"),
    )
    return selectivity_audit(li, _SEL_PREDS)


QUERIES_EXTRA.update({"selectivity_audit": _q_selectivity_audit})


def _selectivity_oracle_sql() -> str:
    parts = []
    for label, col, value in _SEL_PREDS:
        parts.append(f"""
        SELECT '{label}' AS predicate,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM li) AS n_rows,
               (SELECT CAST(COUNT(DISTINCT {col}) AS BIGINT) FROM li) AS ndv,
               (SELECT CAST(COUNT(*) // COUNT(DISTINCT {col}) AS BIGINT)
                FROM li) AS est_rows,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM li
                WHERE {col} = {value}) AS actual_rows,
               (SELECT CAST(1000 * GREATEST(
                         (SELECT COUNT(*) // COUNT(DISTINCT {col}) FROM li),
                         (SELECT COUNT(*) FROM li WHERE {col} = {value}))
                       // GREATEST(LEAST(
                         (SELECT COUNT(*) // COUNT(DISTINCT {col}) FROM li),
                         (SELECT COUNT(*) FROM li WHERE {col} = {value})), 1)
                       AS BIGINT)) AS q_error_milli""")
    return (
        """
        WITH li AS (SELECT *,
               CAST((l_orderkey % 100) * (l_orderkey % 100) AS BIGINT)
                 AS skewed
             FROM lineitem)"""
        + "\n        UNION ALL\n".join(parts)
    )


ORACLES_EXTRA.update({"selectivity_audit": _selectivity_oracle_sql()})




def _q_topic_pagerank(spark, sf_dir):
    """Engine addition: topic-sensitive PageRank (linkgraph.py:
    topic_pagerank, Haveliwala 2002) over the synthetic expander —
    topic 0 teleports to lang='en' docs, topic 1 to lang='de'; both
    vectors in ONE pipeline, 4 iterations, unrolled per-topic oracle."""
    from see_spark.operators.linkgraph import synthetic_edges, topic_pagerank

    docs = _documents(spark, sf_dir)
    base = docs.select(
        F.col("doc_id").cast("long").alias("node"), "lang"
    )
    nt = None
    for t, lang in ((0, "en"), (1, "de")):
        part = base.select(
            "node",
            F.lit(t).cast("long").alias("topic"),
            (F.col("lang") == lang).cast("long").alias("is_seed"),
        )
        nt = part if nt is None else nt.unionByName(part)
    return topic_pagerank(nt, synthetic_edges(docs), n_iter=4)


QUERIES_EXTRA.update({"topic_pagerank": _q_topic_pagerank})


def _tspr_oracle_sql(n_iter: int = 4, d: float = 0.85) -> str:
    """Per-topic unrolled TSPR; teleport + dangling both to the seed
    set; literals repr'd so IEEE op order matches topic_pagerank."""
    one_minus_d = 1.0 - d
    ctes = [
        _LINKGRAPH_SQL,
        """nt AS MATERIALIZED (
          SELECT CAST(doc_id AS BIGINT) AS node, t.topic,
                 CAST(CASE WHEN (t.topic = 0 AND lang = 'en')
                             OR (t.topic = 1 AND lang = 'de')
                      THEN 1 ELSE 0 END AS BIGINT) AS is_seed
          FROM documents,
               LATERAL (SELECT unnest([CAST(0 AS BIGINT),
                                       CAST(1 AS BIGINT)]) AS topic) t)""",
        """ns AS (SELECT topic, CAST(SUM(is_seed) AS BIGINT) AS n_seeds
               FROM nt GROUP BY topic)""",
        """od AS MATERIALIZED (
          SELECT n.node, CAST(COALESCE(o.deg, 0) AS BIGINT) AS out_deg
          FROM nodes n LEFT JOIN outdeg o ON o.src = n.node)""",
        """r0 AS (SELECT nt.node, nt.topic, nt.is_seed, ns.n_seeds,
                      CASE WHEN nt.is_seed = 1 THEN 1.0 / ns.n_seeds
                           ELSE 0.0 END AS rank
               FROM nt JOIN ns USING (topic))""",
    ]
    for i in range(1, n_iter + 1):
        p = f"r{i-1}"
        ctes.append(
            f"""dt{i} AS (SELECT r.topic,
                 COALESCE(SUM(r.rank), 0.0) AS dang
               FROM {p} r JOIN od ON od.node = r.node
               WHERE od.out_deg = 0 GROUP BY r.topic)"""
        )
        ctes.append(
            f"""c{i} AS (SELECT e.dst AS node, r.topic,
                 SUM(r.rank / od.deg) AS contrib
               FROM edges e
               JOIN (SELECT node, topic, rank FROM {p}) r
                 ON e.src = r.node
               JOIN (SELECT src AS node, deg FROM outdeg) od
                 ON od.node = e.src
               GROUP BY e.dst, r.topic)"""
        )
        ctes.append(
            f"""r{i} AS (SELECT b.node, b.topic, b.is_seed, b.n_seeds,
                 {d!r} * (COALESCE(c.contrib, 0.0)
                          + COALESCE(dt.dang, 0.0) * b.is_seed / b.n_seeds)
                 + {one_minus_d!r} * b.is_seed / b.n_seeds AS rank
               FROM r0 b
               LEFT JOIN c{i} c ON c.node = b.node AND c.topic = b.topic
               LEFT JOIN dt{i} dt ON dt.topic = b.topic)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, topic, ROUND(rank, 9) AS rank FROM r{n_iter}"
    )


ORACLES_EXTRA.update({"topic_pagerank": _tspr_oracle_sql()})




def _q_ktruss(spark, sf_dir):
    """Engine addition: k-truss subgraph (linkgraph.py:ktruss, k=3 —
    every surviving edge sits in >= 1 triangle) of the undirected
    synthetic expander; 6 peel rounds pinned on both sides (idempotent
    past convergence)."""
    from see_spark.operators.linkgraph import ktruss, synthetic_edges

    docs = _documents(spark, sf_dir)
    # the expander alone peels to an empty 3-truss; union a deterministic
    # K10 clique over nodes 0..9 so the gate exercises a real truss core
    # (clique edges survive, expander tendrils peel away)
    clique = (
        spark.range(10)
        .select(F.col("id").alias("src"))
        .crossJoin(spark.range(10).select(F.col("id").alias("dst")))
        .where(F.col("src") < F.col("dst"))
    )
    g = synthetic_edges(docs).unionByName(clique)
    return ktruss(g, k=4, n_rounds=6)


QUERIES_EXTRA.update({"ktruss": _q_ktruss})


def _ktruss_oracle_sql(k: int = 4, n_rounds: int = 6) -> str:
    need = k - 2
    ctes = [
        _LINKGRAPH_SQL,
        """e0 AS MATERIALIZED (
          SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM (SELECT src, dst FROM edges
                UNION ALL
                SELECT l.i AS src, r.i AS dst
                FROM (SELECT unnest(range(10)) AS i) l,
                     (SELECT unnest(range(10)) AS i) r
                WHERE l.i < r.i)
          WHERE src <> dst)""",
    ]
    for i in range(1, n_rounds + 1):
        p = f"e{i-1}"
        ctes.append(
            f"""s{i} AS (
          SELECT c.a, c.b, CAST(COUNT(*) AS BIGINT) AS support
          FROM {p} c
          JOIN (SELECT a AS u, b AS w FROM {p}
                UNION ALL SELECT b, a FROM {p}) wa
            ON wa.u = c.a
          JOIN (SELECT a AS u, b AS w FROM {p}
                UNION ALL SELECT b, a FROM {p}) wb
            ON wb.u = c.b AND wb.w = wa.w
          GROUP BY c.a, c.b)"""
        )
        ctes.append(
            f"""e{i} AS MATERIALIZED (
          SELECT c.a, c.b FROM {p} c JOIN s{i} s
            ON s.a = c.a AND s.b = c.b
          WHERE s.support >= {need})"""
        )
    last = f"e{n_rounds}"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT c.a, c.b,
           CAST(COALESCE(s.support, 0) AS BIGINT) AS support
    FROM {last} c
    LEFT JOIN (
      SELECT c.a, c.b, COUNT(*) AS support
      FROM {last} c
      JOIN (SELECT a AS u, b AS w FROM {last}
            UNION ALL SELECT b, a FROM {last}) wa ON wa.u = c.a
      JOIN (SELECT a AS u, b AS w FROM {last}
            UNION ALL SELECT b, a FROM {last}) wb
        ON wb.u = c.b AND wb.w = wa.w
      GROUP BY c.a, c.b) s
      ON s.a = c.a AND s.b = c.b"""
    )


ORACLES_EXTRA.update({"ktruss": _ktruss_oracle_sql()})




def _q_merge_intervals(spark, sf_dir):
    """Engine addition: overlapping-interval coalescing (history.py:
    merge_intervals, gaps-and-islands) — per-user 30-minute activity
    windows around each event merged into spans."""
    from see_spark.operators.history import merge_intervals

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    iv = ev.select(
        F.col("user_id").cast("long").alias("key"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("start_us"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.lit(30 * 60 * 1_000_000)
        ).alias("end_us"),
        F.col("event_id").cast("long").alias("eid"),
    )
    return merge_intervals(iv, tiebreak_col="eid")


QUERIES_EXTRA.update({"merge_intervals": _q_merge_intervals})


ORACLES_EXTRA.update(
    {
        "merge_intervals": """
        WITH iv AS (SELECT CAST(user_id AS BIGINT) AS key,
                           epoch_us(ts) AS s,
                           epoch_us(ts) + 1800000000 AS e,
                           CAST(event_id AS BIGINT) AS eid
                    FROM events),
        marked AS (
          SELECT key, s, e, eid,
                 CASE WHEN MAX(e) OVER w IS NULL THEN 1
                      WHEN s > MAX(e) OVER w THEN 1 ELSE 0 END AS nw
          FROM iv
          WINDOW w AS (PARTITION BY key ORDER BY s, e, eid
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        isl AS (
          SELECT key, s, e,
                 SUM(nw) OVER (PARTITION BY key ORDER BY s, e, eid
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
          FROM marked)
        SELECT key, CAST(island AS BIGINT) AS island,
               CAST(MIN(s) AS BIGINT) AS start,
               CAST(MAX(e) AS BIGINT) AS "end",
               CAST(COUNT(*) AS BIGINT) AS n_merged
        FROM isl GROUP BY key, island
    """,
    }
)




_LM_LANDMARKS = [0, 7, 13, 29]
_LM_PAIRS = [(1, 100), (1, 350), (2, 200), (2, 450)]


def _q_landmark_distances(spark, sf_dir):
    """Engine addition: landmark distance-estimation audit
    (linkgraph.py:landmark_distance_audit) on the undirected expander —
    ONE multi-source BFS over landmarks+pair-sources supplies both
    est = min_L d(u,L)+d(L,v) and the exact distances; stretch >= 1000
    by the triangle inequality."""
    from see_spark.operators.linkgraph import landmark_distance_audit

    docs = _documents(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    from see_spark.operators.linkgraph import synthetic_edges

    return landmark_distance_audit(
        nodes, synthetic_edges(docs), _LM_LANDMARKS, _LM_PAIRS, n_iter=8
    )


QUERIES_EXTRA.update({"landmark_distances": _q_landmark_distances})


def _landmark_oracle_sql(n_iter: int = 8) -> str:
    inf = 1 << 40
    srcs = sorted(set(_LM_LANDMARKS) | {u for u, _ in _LM_PAIRS})
    src_vals = ", ".join(f"({s})" for s in srcs)
    lm_vals = ", ".join(str(x) for x in _LM_LANDMARKS)
    ctes = [
        _LINKGRAPH_SQL,
        """ue AS MATERIALIZED (
          SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM edges
            UNION ALL SELECT dst AS src, src AS dst FROM edges))""",
        "mn AS MATERIALIZED (SELECT node FROM nodes)",
        f"""sv AS (SELECT CAST(col0 AS BIGINT) AS lm
               FROM (VALUES {src_vals}))""",
        f"""d0 AS (SELECT n.node, s.lm,
                 CAST(CASE WHEN n.node = s.lm THEN 0 ELSE {inf} END
                      AS BIGINT) AS dist
               FROM mn n CROSS JOIN sv s)""",
    ]
    for i in range(1, n_iter + 1):
        p = f"d{i-1}"
        ctes.append(
            f"""c{i} AS (SELECT e.dst AS node, d.lm,
                 CAST(MIN(d.dist) + 1 AS BIGINT) AS cand
               FROM ue e JOIN {p} d ON d.node = e.src
               WHERE d.dist < {inf} GROUP BY e.dst, d.lm)"""
        )
        ctes.append(
            f"""d{i} AS (SELECT d.node, d.lm,
                 CAST(LEAST(d.dist, COALESCE(c.cand, {inf})) AS BIGINT)
                   AS dist
               FROM {p} d LEFT JOIN c{i} c
                 ON c.node = d.node AND c.lm = d.lm)"""
        )
    last = f"d{n_iter}"
    selects = []
    for u, v in _LM_PAIRS:
        selects.append(
            f"""
        SELECT CAST({u} AS BIGINT) AS u, CAST({v} AS BIGINT) AS v,
               (SELECT dist FROM {last} WHERE lm = {u} AND node = {v})
                 AS exact,
               (SELECT CAST(COALESCE(MIN(CASE WHEN du.dist < {inf}
                                               AND dv.dist < {inf}
                                          THEN du.dist + dv.dist
                                          ELSE {inf} END), {inf}) AS BIGINT)
                FROM (SELECT lm, dist FROM {last}
                      WHERE node = {u} AND lm IN ({lm_vals})) du
                JOIN (SELECT lm, dist FROM {last}
                      WHERE node = {v} AND lm IN ({lm_vals})) dv
                  USING (lm)) AS est,
               CAST((SELECT CAST(COALESCE(MIN(CASE WHEN du.dist < {inf}
                                               AND dv.dist < {inf}
                                          THEN du.dist + dv.dist
                                          ELSE {inf} END), {inf}) AS BIGINT)
                FROM (SELECT lm, dist FROM {last}
                      WHERE node = {u} AND lm IN ({lm_vals})) du
                JOIN (SELECT lm, dist FROM {last}
                      WHERE node = {v} AND lm IN ({lm_vals})) dv
                  USING (lm)) * 1000
                // GREATEST((SELECT dist FROM {last}
                             WHERE lm = {u} AND node = {v}), 1) AS BIGINT)
                 AS stretch_milli"""
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + "\n        UNION ALL\n".join(selects)
    )


ORACLES_EXTRA.update({"landmark_distances": _landmark_oracle_sql()})




def _q_pseudo_walks(spark, sf_dir):
    """Engine addition: deterministic hash-driven graph walks
    (linkgraph.py:pseudo_random_walks) — 6 steps from every doc_id%50
    seed over the expander; reproducible sampling, exact oracle."""
    from see_spark.operators.linkgraph import (
        pseudo_random_walks,
        synthetic_edges,
    )

    docs = _documents(spark, sf_dir)
    seeds = docs.where(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").cast("long").alias("walker")
    )
    return pseudo_random_walks(synthetic_edges(docs), seeds, n_steps=6)


QUERIES_EXTRA.update({"pseudo_walks": _q_pseudo_walks})


def _walks_oracle_sql(n_steps: int = 6) -> str:
    ctes = [
        _LINKGRAPH_SQL,
        """rk AS MATERIALIZED (
          SELECT src, dst,
                 ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rank
          FROM (SELECT DISTINCT src, dst FROM edges))""",
        """dg AS MATERIALIZED (
          SELECT src, CAST(MAX(rank) AS BIGINT) AS deg
          FROM rk GROUP BY src)""",
        """s0 AS (SELECT CAST(doc_id AS BIGINT) AS walker,
                      CAST(doc_id AS BIGINT) AS node
               FROM documents WHERE doc_id % 50 = 0)""",
    ]
    for t in range(1, n_steps + 1):
        p = f"s{t-1}"
        ctes.append(
            f"""s{t} AS (
          SELECT s.walker,
                 CAST(COALESCE(r.dst, s.node) AS BIGINT) AS node
          FROM {p} s
          LEFT JOIN dg ON dg.src = s.node
          LEFT JOIN rk r
            ON r.src = s.node
           AND r.rank = ('0x' || substr(md5('walk:' || s.walker
                                            || ':{t}'), 1, 15))::BIGINT
                        % dg.deg + 1)"""
        )
    selects = [
        f"SELECT walker, CAST({t} AS BIGINT) AS step, node FROM s{t}"
        for t in range(0, n_steps + 1)
    ]
    return (
        "WITH " + ",\n    ".join(ctes)
        + "\n        " + "\n        UNION ALL ".join(selects)
    )


ORACLES_EXTRA.update({"pseudo_walks": _walks_oracle_sql()})




def _q_rich_club(spark, sf_dir):
    """Engine addition: rich-club coefficient (linkgraph.py:rich_club)
    over the undirected expander at degree thresholds 1..16 — exact
    per-level density among high-degree nodes."""
    from see_spark.operators.linkgraph import rich_club, synthetic_edges

    return rich_club(synthetic_edges(_documents(spark, sf_dir)))


def _q_homophily(spark, sf_dir):
    """Engine addition: language homophily on the link graph
    (linkgraph.py:homophily_audit) — observed same-lang edge fraction
    vs the chance expectation from endpoint frequencies."""
    from see_spark.operators.linkgraph import homophily_audit, synthetic_edges

    docs = _documents(spark, sf_dir)
    attrs = docs.select(
        F.col("doc_id").cast("long").alias("node"), F.col("lang").alias("attr")
    )
    return homophily_audit(synthetic_edges(docs), attrs)


QUERIES_EXTRA.update(
    {"rich_club": _q_rich_club, "homophily_audit": _q_homophily}
)


def _rich_club_oracle_sql() -> str:
    selects = []
    for k in (1, 2, 4, 8, 16):
        selects.append(f"""
        SELECT CAST({k} AS BIGINT) AS k,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM deg WHERE deg > {k})
                 AS n_nodes,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM und u
                 WHERE u.a IN (SELECT node FROM deg WHERE deg > {k})
                   AND u.b IN (SELECT node FROM deg WHERE deg > {k}))
                 AS n_edges,
               CAST(CASE WHEN (SELECT COUNT(*) FROM deg WHERE deg > {k}) > 1
                 THEN (2 * (SELECT COUNT(*) FROM und u
                            WHERE u.a IN (SELECT node FROM deg
                                          WHERE deg > {k})
                              AND u.b IN (SELECT node FROM deg
                                          WHERE deg > {k})) * 1000)
                      // ((SELECT COUNT(*) FROM deg WHERE deg > {k})
                          * ((SELECT COUNT(*) FROM deg WHERE deg > {k}) - 1))
                 ELSE 0 END AS BIGINT) AS phi_milli""")
    return (
        f"""
        WITH {_LINKGRAPH_SQL},
        und AS MATERIALIZED (
          SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM edges WHERE src <> dst),
        deg AS MATERIALIZED (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
          FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
          GROUP BY node)"""
        + "\n        UNION ALL\n".join(selects)
    )


ORACLES_EXTRA.update(
    {
        "rich_club": _rich_club_oracle_sql(),
        "homophily_audit": f"""
        WITH {_LINKGRAPH_SQL},
        und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
                FROM edges WHERE src <> dst),
        at AS (SELECT CAST(doc_id AS BIGINT) AS node, lang FROM documents),
        j AS MATERIALIZED (
          SELECT aa.lang AS ca, bb.lang AS cb
          FROM und JOIN at aa ON aa.node = und.a
          JOIN at bb ON bb.node = und.b),
        base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
                        CAST(SUM(CASE WHEN ca = cb THEN 1 ELSE 0 END)
                             AS BIGINT) AS same
                 FROM j),
        ends AS (SELECT ca AS c FROM j UNION ALL SELECT cb FROM j),
        freq AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS m
                 FROM ends GROUP BY c),
        tot AS (SELECT CAST(SUM(m) AS BIGINT) AS t,
                       CAST(SUM(m * m) AS BIGINT) AS sq FROM freq)
        SELECT b.n_edges, b.same,
               CAST(b.same * 1000 // b.n_edges AS BIGINT) AS same_milli,
               CAST(t.sq * 1000 // (t.t * t.t) AS BIGINT) AS expected_milli
        FROM base b CROSS JOIN tot t
    """,
    }
)




def _q_fagin_ta(spark, sf_dir):
    """Engine addition: Fagin Threshold-Algorithm depth audit
    (search.py:fagin_ta_depth, PODS'01) — top-10 by s1+s2 over the
    skyline score pair (n_chars%97, doc_id%89); exact minimal stopping
    depth + scan savings."""
    from see_spark.operators.search import fagin_ta_depth

    docs = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("id"),
        (F.col("n_chars") % 97).cast("long").alias("s1"),
        (F.col("doc_id") % 89).cast("long").alias("s2"),
    )
    return fagin_ta_depth(docs, k=10)


QUERIES_EXTRA.update({"fagin_ta": _q_fagin_ta})


ORACLES_EXTRA.update(
    {
        "fagin_ta": """
        WITH base AS (SELECT CAST(doc_id AS BIGINT) AS id,
                             CAST(n_chars % 97 AS BIGINT) AS s1,
                             CAST(doc_id % 89 AS BIGINT) AS s2
                      FROM documents),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
        kth AS (SELECT CAST(MIN(tot) AS BIGINT) AS kth FROM (
                  SELECT s1 + s2 AS tot FROM base
                  ORDER BY tot DESC LIMIT 10)),
        r1 AS (SELECT s1 AS s1_at,
                      ROW_NUMBER() OVER (ORDER BY s1 DESC, id ASC) - 1 AS d
               FROM base),
        r2 AS (SELECT s2 AS s2_at,
                      ROW_NUMBER() OVER (ORDER BY s2 DESC, id ASC) - 1 AS d
               FROM base),
        tau AS (SELECT r1.d, r1.s1_at + r2.s2_at AS tau
                FROM r1 JOIN r2 USING (d)),
        dm AS (SELECT MIN(d) AS dmin FROM tau
               WHERE tau < (SELECT kth FROM kth)),
        dep AS (SELECT CAST(COALESCE((SELECT dmin FROM dm) + 1,
                                     (SELECT n FROM nn)) AS BIGINT)
                  AS depth)
        SELECT CAST(10 AS BIGINT) AS k,
               (SELECT n FROM nn) AS n,
               (SELECT kth FROM kth) AS kth_total,
               (SELECT depth FROM dep) AS depth_needed,
               CAST(COALESCE((SELECT tau FROM tau
                              WHERE d = (SELECT depth FROM dep) - 1), -1)
                    AS BIGINT) AS tau_at_depth,
               CAST(((SELECT n FROM nn) - (SELECT depth FROM dep)) * 1000
                    // GREATEST((SELECT n FROM nn), 1) AS BIGINT)
                 AS scan_saved_milli
    """,
    }
)




def _q_skyline_layers(spark, sf_dir):
    """Engine addition: onion peeling / 3-level skylines (skyline.py:
    skyline_layers) over the same score pair as the skyline gate — the
    multi-criteria "next-best page" ranking."""
    from see_spark.operators.skyline import skyline_layers

    docs = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.col("n_chars") % 97).cast("long").alias("qx"),
        (F.col("doc_id") % 89).cast("long").alias("qy"),
    )
    return skyline_layers(docs, "qx", "qy", "doc_id", n_layers=3)


QUERIES_EXTRA.update({"skyline_layers": _q_skyline_layers})


def _skyline_layers_oracle_sql(n_layers: int = 3) -> str:
    ctes = [
        """p0 AS (SELECT CAST(doc_id AS BIGINT) AS id,
                      CAST(n_chars % 97 AS BIGINT) AS x,
                      CAST(doc_id % 89 AS BIGINT) AS y
               FROM documents)"""
    ]
    for i in range(1, n_layers + 1):
        p = f"p{i-1}"
        ctes.append(
            f"""l{i} AS (SELECT id, x, y FROM {p} a
               WHERE NOT EXISTS (
                 SELECT 1 FROM {p} b
                 WHERE b.x >= a.x AND b.y >= a.y
                   AND (b.x > a.x OR b.y > a.y)))"""
        )
        ctes.append(
            f"""p{i} AS (SELECT p.id, p.x, p.y FROM {p} p
               WHERE p.id NOT IN (SELECT id FROM l{i}))"""
        )
    selects = [
        f"SELECT id, x, y, CAST({i} AS BIGINT) AS layer FROM l{i}"
        for i in range(1, n_layers + 1)
    ]
    return (
        "WITH " + ",\n    ".join(ctes)
        + "\n        " + "\n        UNION ALL ".join(selects)
    )


ORACLES_EXTRA.update({"skyline_layers": _skyline_layers_oracle_sql()})




def _q_gains_table(spark, sf_dir):
    """Engine addition: cumulative-gains / lift table (evaluation.py:
    gains_table) over the Naive Bayes margin (score_1 - score_0) vs the
    marker labels — the top-decile capture number a filtering threshold
    is chosen from."""
    from see_spark.operators.evaluation import gains_table

    nb = _q_naive_bayes(spark, sf_dir).select(
        "doc_id", "y", (F.col("score_1") - F.col("score_0")).alias("score")
    )
    return gains_table(nb, score_col="score", label_col="y")


QUERIES_EXTRA.update({"gains_table": _q_gains_table})


ORACLES_EXTRA.update(
    {
        "gains_table": f"""
        WITH nb AS ({ORACLES_EXTRA["naive_bayes"]}),
        base AS (SELECT doc_id AS id, y,
                        score_1 - score_0 AS s FROM nb),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(y) AS BIGINT) AS tot FROM base),
        ranked AS (SELECT y,
                          ROW_NUMBER() OVER (ORDER BY s DESC, id ASC) - 1
                            AS r
                   FROM base),
        binned AS (SELECT r * 10 // (SELECT n FROM nn) AS bin,
                          CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(y) AS BIGINT) AS n_pos
                   FROM ranked GROUP BY 1)
        SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
               CAST(SUM(n_pos) OVER (ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_pos,
               CAST(SUM(n_pos) OVER (ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    * 1000 // GREATEST((SELECT tot FROM nn), 1) AS BIGINT)
                 AS capture_milli,
               CAST((n_pos * (SELECT n FROM nn) * 1000)
                    // (n * GREATEST((SELECT tot FROM nn), 1)) AS BIGINT)
                 AS lift_milli
        FROM binned
    """,
    }
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {**QUERIES_BATCH1, **QUERIES_BATCH2, **QUERIES_BATCH3}


def oracle_sql() -> dict[str, str]:
    return {**ORACLES_BATCH1, **ORACLES_BATCH2, **ORACLES_BATCH3}


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Oracle-checked locally (scripts/check_correctness.py) but held out of
    the driver's 50-entry window; see QUERIES_EXTRA comment."""
    return dict(QUERIES_EXTRA)


def extra_oracle_sql() -> dict[str, str]:
    return dict(ORACLES_EXTRA)
