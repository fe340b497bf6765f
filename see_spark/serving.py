"""Serving surface shared by the CLI (scripts/search.py) and the HTTP
listener (scripts/serve.py).

Mirrors the reference's web contracts (/root/reference/apps/db/src/
see_web.erl:36-45 `GET /search`, :47-59 `POST /add`; client
apps/db/priv/html/js/see.js): search returns ``{"results": [{"url", "title"},
...]}`` (url + title, the reference's wire shape — the CLI additionally
includes the score as diagnostic detail) and add returns the three-way
``{"result": ok | filter_mismatch | url_error}`` queue status.

One SparkSession serves all requests; each request re-reads the catalog's
current snapshot, so results pick up new crawl commits without restarts
(snapshot isolation, the Iceberg read model).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from .core.queryparse import parse_query
from .operators.search import search, search_query
from .sources.catalog import SnapshotCatalog


def _title_postings(docs):
    """Title-field postings from the docs table's real titles (tf within
    the title field), tokenized by the same Catalyst kernel as indexing.
    Null titles contribute no rows (explode of null)."""
    from .functions.udfs import tokenize_expr

    toks = docs.select(
        "doc_id", F.explode(tokenize_expr(F.col("title"))).alias("word")
    )
    counts = toks.groupBy("doc_id", "word").agg(
        F.count("*").alias("term_count")
    )
    return counts.withColumn(
        "tf",
        F.col("term_count")
        / F.sum("term_count").over(Window.partitionBy("doc_id")),
    )


def search_results(
    spark: SparkSession,
    catalog: SnapshotCatalog,
    query: str,
    k: int = 100,
    with_score: bool = False,
    rank: str = "tfidf",
) -> list:
    """Top-k results for a query over the catalog's current snapshot.

    Plain word queries take the reference's exact AND path (wire-parity
    with see_web.erl). A query using the structured grammar
    (core/queryparse.py: phrases, -exclusions, title: boosts, ~fuzzy)
    routes to operators/search.search_query, with the title field from
    the crawled titles and phrase positions from the indexed span text —
    the same kernels the index was built with.

    ``rank="bm25"`` scores plain-word queries with BM25 instead of the
    reference's tf-idf; avgdl comes from the materialized corpus_stats
    delta table run_round maintains (read path never aggregates
    postings for corpus scalars — see indexer.corpus_stats_increment).

    Postings I/O: plain-word and bm25 queries open ONLY the query words'
    bucket directories (run_round commits postings partitioned on
    word_bucket; ``catalog.read_parts`` prunes driver-side from the
    manifest) — at corpus scale a 5-word query reads ~5/N_BUCKETS of the
    index. Grammar queries fall back to the full read: ~fuzzy terms must
    scan the vocabulary, so their buckets are not knowable up front."""
    from .core.text import extract_words
    from .functions.udfs import word_bucket_values
    from .sources.tables import N_POSTINGS_BUCKETS

    parsed = parse_query(query)
    grammar = (
        parsed["phrases"] or parsed["title"]
        or parsed["exclude"] or parsed["fuzzy"]
    )
    bm25 = rank == "bm25" and not grammar
    corpus_stats = (
        catalog.read("corpus_stats")
        if bm25 and catalog.current_snapshot("corpus_stats") is not None
        else None
    )
    bucket_hash = F.pmod(
        F.xxhash64("word"), F.lit(N_POSTINGS_BUCKETS)
    ).cast("int")
    pruned = not (grammar or (bm25 and corpus_stats is None))
    if pruned:
        buckets = word_bucket_values(spark, extract_words(query))
        postings = catalog.read_parts(
            "postings", "word_bucket", buckets, compute_col=bucket_hash
        )
    else:
        # fuzzy terms must scan the vocabulary; and BM25 WITHOUT a
        # corpus_stats table falls back to an avgdl aggregate over the
        # postings relation it is given — over a bucket-pruned relation
        # that average would be biased to the query words' docs, so the
        # legacy-catalog case reads the full table
        postings = catalog.read("postings")
    docs = catalog.read("docs")
    word_stats = None
    if catalog.current_snapshot("word_stats") is not None:
        # the df semi-join cannot prune files by itself, so the
        # vocabulary table takes the same bucket-dir pruning as postings
        # whenever the query's words are known up front
        word_stats = (
            catalog.read_parts(
                "word_stats", "word_bucket", buckets, compute_col=bucket_hash
            )
            if pruned
            else catalog.read("word_stats")
        )
    page_count = catalog.read("frontier").count()
    if bm25:
        from .operators.search import search_bm25

        rows = search_bm25(
            spark, query,
            postings,
            docs.select("doc_id", "title"),
            page_count, k=k, corpus_stats=corpus_stats,
        ).collect()
    elif grammar:
        from .functions.udfs import tokens_from_spans

        rows = search_query(
            spark, query, postings, docs, page_count, k=k,
            word_stats=word_stats,
            title_postings=_title_postings(docs),
            text_docs=docs.select(
                "doc_id", tokens_from_spans(F.col("spans")).alias("text")
            ),
        ).collect()
    else:
        rows = search(
            spark, query, postings, docs, page_count, k=k,
            word_stats=word_stats,
        ).collect()
    if with_score:
        return [
            {"url": r["url"], "title": r["title"], "score": r["score"]}
            for r in rows
        ]
    return [{"url": r["url"], "title": r["title"]} for r in rows]


def add_url(
    spark: SparkSession,
    catalog: SnapshotCatalog,
    url: str,
    domain_filter: Optional[str] = None,
) -> str:
    """Queue a URL; returns ok | filter_mismatch | url_error
    (see_db_srv:queue's three-way contract, see_db_srv.erl + SURVEY §3.3)."""
    from .operators.crawl import CrawlConfig, ingest_seeds

    config = CrawlConfig(domain_filter=domain_filter)
    status = ingest_seeds(spark, catalog, [url], config).collect()
    return status[0]["ingest_status"] if status else "url_error"
