"""Search CLI over a crawled snapshot catalog — the user-facing read path.

Mirrors the reference's serving surface (/root/reference/apps/db/src/
see_web.erl:36-45 `GET /search` and :47-59 `POST /add`, client
apps/db/priv/html/js/see.js:30-44): a query returns
``{"results": [{"url": ..., "title": ..., "score": ...}, ...]}`` (the
reference emits url+title; score is additive detail), top-100 by
descending TF-IDF with the pinned url tie-break. ``--add`` queues a URL
and prints the three-way ``{"result": ok|filter_mismatch|url_error}``
status contract.

Usage:
    python scripts/search.py --warehouse /data/crawl "alan turing"
    python scripts/search.py --warehouse /data/crawl --add http://x.test/
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Query a see_spark crawl catalog")
    p.add_argument("--warehouse", required=True, help="snapshot-catalog directory")
    p.add_argument("query", nargs="?", help="search query (words, AND semantics)")
    p.add_argument("--add", metavar="URL", help="queue a URL instead of searching")
    p.add_argument("--k", type=int, default=100, help="max results (default 100)")
    p.add_argument("--domain-filter", default=None,
                   help="host regexp for --add ingestion filtering")
    p.add_argument("--cores", type=int, default=0,
                   help="local[N] cores; 0 = let spark-submit/master decide")
    args = p.parse_args(argv)
    if not args.add and not args.query:
        p.error("either a query or --add URL is required")

    from see_spark.session import get_spark
    from see_spark.sources.catalog import SnapshotCatalog

    spark = get_spark(cores=args.cores or None, app_name="see_search")
    spark.sparkContext.setLogLevel("ERROR")
    catalog = SnapshotCatalog(args.warehouse, spark)

    if args.add:
        from see_spark.serving import add_url

        result = add_url(spark, catalog, args.add, args.domain_filter)
        print(json.dumps({"result": "ok" if result == "ok" else result}))
        return 0

    from see_spark.serving import search_results

    print(json.dumps({
        "results": search_results(
            spark, catalog, args.query, k=args.k, with_score=True
        )
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
