"""End-to-end crawl over live HTTP: the production RequestsFetcher drives a
full run_crawl against the fixture site served by a local HTTP proxy, and
every committed table must match the deterministic FixtureFetcher crawl of
the same site byte-for-byte (frontier states/order, doc span sequences,
postings). This closes the gap between the per-request http_get tests and
the crawl loop: routing, charset handling (the Polish text/plain page has
no charset header — the UTF-8 default path), relative-Location redirects,
and robots/politeness all run over real sockets. Skip-marked when local
sockets are unavailable.
"""

from __future__ import annotations

import threading
import urllib.parse

import pytest

requests = pytest.importorskip("requests")


def _start_fixture_proxy(site: dict):
    """HTTP proxy serving the fixture-site dict: proxied GETs carry the
    absolute URI in the request line, so lookups hit the same canonical
    keys the FixtureFetcher uses (percent-escapes compared decoded —
    requests requotes them uppercase)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    by_decoded = {urllib.parse.unquote(k): v for k, v in site.items()}

    class ProxyHandler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def do_GET(self):
            entry = by_decoded.get(urllib.parse.unquote(self.path))
            if entry is None:
                body = b"unknown fixture url"
                self.send_response(502)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            body = (entry["body"] or "").encode("utf-8")
            self.send_response(entry["status"])
            if entry["content_type"] is not None:
                self.send_header("Content-Type", entry["content_type"])
            if entry["redirect_to"] is not None:
                self.send_header("Location", entry["redirect_to"])
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    try:
        server = ThreadingHTTPServer(("127.0.0.1", 0), ProxyHandler)
    except OSError:
        pytest.skip("local sockets unavailable in this sandbox")
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_live_crawl_matches_fixture_crawl(spark, crawl_result, tmp_path):
    from see_spark.operators.crawl import CrawlConfig, run_crawl
    from see_spark.sources.catalog import SnapshotCatalog
    from see_spark.sources.fetcher import RequestsFetcher
    from see_spark.sources.fixtures import (
        DOMAIN_FILTER,
        SEED_URLS,
        fixture_robots,
        fixture_site,
    )

    fixture_catalog, _, _ = crawl_result  # the FixtureFetcher crawl
    server = _start_fixture_proxy(fixture_site())
    try:
        proxy = f"http://127.0.0.1:{server.server_address[1]}"
        live_catalog = SnapshotCatalog(str(tmp_path / "live"), spark)
        config = CrawlConfig(
            domain_filter=DOMAIN_FILTER, host_budget=2, max_rounds=30
        )
        run_crawl(
            spark, live_catalog,
            RequestsFetcher(timeout=10, proxies={"http": proxy}),
            config, seeds=SEED_URLS, robots=fixture_robots(),
        )

        # frontier parity: same URLs, states, depths, crawl order
        cols = ["url", "state", "depth", "seq", "fetch_order", "detail"]
        assert _rows(live_catalog.read("frontier"), *cols) == _rows(
            fixture_catalog.read("frontier"), *cols
        )
        # north-rule invariant: per-row span-sequence equality
        live_docs = {
            r["doc_id"]: (r["title"], [tuple(s) for s in (r["spans"] or [])])
            for r in live_catalog.read("docs").collect()
        }
        fixture_docs = {
            r["doc_id"]: (r["title"], [tuple(s) for s in (r["spans"] or [])])
            for r in fixture_catalog.read("docs").collect()
        }
        assert live_docs == fixture_docs
        # index parity (covers tokenization of the charset-default page)
        pcols = ["word", "doc_id", "term_count", "doc_len"]
        assert _rows(live_catalog.read("postings"), *pcols) == _rows(
            fixture_catalog.read("postings"), *pcols
        )
    finally:
        server.shutdown()
