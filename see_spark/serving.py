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

from .operators.search import search
from .sources.catalog import SnapshotCatalog


def search_results(
    spark: SparkSession,
    catalog: SnapshotCatalog,
    query: str,
    k: int = 100,
    with_score: bool = False,
) -> list:
    """Top-k results for a query over the catalog's current snapshot."""
    postings = catalog.read("postings")
    docs = catalog.read("docs")
    word_stats = (
        catalog.read("word_stats")
        if catalog.current_snapshot("word_stats") is not None
        else None
    )
    page_count = catalog.read("frontier").count()
    rows = search(
        spark, query, postings, docs, page_count, k=k, word_stats=word_stats
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
