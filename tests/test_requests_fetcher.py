"""Production HTTP fetcher (RequestsFetcher / http_get) against a local
socket server — no external network. Semantics under test mirror the
reference fetcher (/root/reference/apps/crawler/src/see_http.erl):
UA header sent, redirects not followed, body read only for text MIMEs,
10 MB cap, connection failure -> error outcome. Skip-marked when local
sockets are unavailable.
"""

from __future__ import annotations

import threading

import pytest

requests = pytest.importorskip("requests")


def _make_server():
    from http.server import BaseHTTPRequestHandler, HTTPServer

    seen_headers = {}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            seen_headers[self.path] = dict(self.headers)
            if self.path == "/text":
                body = b"<html><title>t</title><body>hello</body></html>"
                self.send_response(200)
                self.send_header("content-type", "text/html; charset=utf-8")
                self.send_header("content-length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/plain":
                self.send_response(200)
                self.send_header("content-type", "text/plain")
                self.send_header("content-length", "5")
                self.end_headers()
                self.wfile.write(b"plain")
            elif self.path == "/big":
                body = b"x" * 200_000
                self.send_response(200)
                self.send_header("content-type", "text/html")
                self.send_header("content-length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/binary":
                body = b"\x89PNG....binary"
                self.send_response(200)
                self.send_header("content-type", "application/octet-stream")
                self.send_header("content-length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/conditional":
                # RFC 9110 conditional GET: matching If-None-Match -> 304
                if self.headers.get("if-none-match") == "etag-match":
                    self.send_response(304)
                    self.send_header("content-length", "0")
                    self.end_headers()
                else:
                    body = b"fresh body"
                    self.send_response(200)
                    self.send_header("content-type", "text/plain")
                    self.send_header("content-length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
            elif self.path == "/redirect":
                self.send_response(301)
                self.send_header("location", "/moved")
                self.send_header("content-length", "0")
                self.end_headers()
            elif self.path == "/redirect-no-location":
                self.send_response(301)
                self.send_header("content-length", "0")
                self.end_headers()
            else:
                self.send_response(404)
                self.send_header("content-length", "0")
                self.end_headers()

    try:
        server = HTTPServer(("127.0.0.1", 0), Handler)
    except OSError:
        pytest.skip("local sockets unavailable in this sandbox")
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, seen_headers


@pytest.fixture(scope="module")
def http_server():
    server, seen = _make_server()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, seen
    server.shutdown()


def test_text_page_fetched_with_ua(http_server):
    from see_spark.sources.fetcher import USER_AGENT, http_get

    base, seen = http_server
    with requests.Session() as s:
        status, ctype, body, loc = http_get(s, base + "/text")
    assert status == 200
    assert ctype.startswith("text/html")
    assert "hello" in body and loc is None
    assert seen["/text"]["user-agent"] == USER_AGENT


def test_plain_text_mime_gets_body(http_server):
    from see_spark.sources.fetcher import http_get

    base, _ = http_server
    with requests.Session() as s:
        status, _, body, _ = http_get(s, base + "/plain")
    assert status == 200 and body == "plain"


def test_binary_mime_body_never_read(http_server):
    from see_spark.sources.fetcher import http_get

    base, _ = http_server
    with requests.Session() as s:
        status, ctype, body, _ = http_get(s, base + "/binary")
    assert status == 200
    assert ctype == "application/octet-stream"
    assert body is None  # reference never pulls non-text bodies


def test_body_capped(http_server, monkeypatch):
    import see_spark.sources.fetcher as fmod

    base, _ = http_server
    monkeypatch.setattr(fmod, "MAX_LENGTH", 1000)
    with requests.Session() as s:
        status, _, body, _ = fmod.http_get(s, base + "/big")
    assert status == 200 and len(body) == 1000


def test_redirect_not_followed(http_server):
    from see_spark.sources.fetcher import http_get

    base, _ = http_server
    with requests.Session() as s:
        status, _, body, loc = http_get(s, base + "/redirect")
    assert status == 301 and loc == "/moved" and body is None


def test_redirect_without_location_routes_to_error(http_server):
    from see_spark.core.fetch import route_response
    from see_spark.sources.fetcher import http_get

    base, _ = http_server
    with requests.Session() as s:
        out = route_response(*http_get(s, base + "/redirect-no-location")[:2],
                             None, None)
    assert out.kind == "error"


def test_http_error_status(http_server):
    from see_spark.core.fetch import route_response
    from see_spark.sources.fetcher import http_get

    base, _ = http_server
    with requests.Session() as s:
        status, ctype, body, loc = http_get(s, base + "/nope")
    assert status == 404
    assert route_response(status, ctype, body, loc).kind == "error"


def test_connection_refused_is_error_outcome():
    from see_spark.core.fetch import route_response
    from see_spark.sources.fetcher import http_get

    with requests.Session() as s:
        out = http_get(s, "http://127.0.0.1:1/never", timeout=2)
    assert out == (None, None, None, None)
    assert route_response(*out).kind == "error"


def test_mapinpandas_fetch_roundtrip(spark, http_server):
    """Full Spark path: RequestsFetcher over a host-partitioned batch feeds
    the same routing matrix as the deterministic fetchers."""
    from pyspark.sql import functions as F

    from see_spark.functions.udfs import route_response_udf
    from see_spark.sources.fetcher import RequestsFetcher

    base, _ = http_server
    batch = spark.createDataFrame(
        [
            (base + "/text", "127.0.0.1", 0),
            (base + "/binary", "127.0.0.1", 1),
            (base + "/redirect", "127.0.0.1", 2),
            (base + "/nope", "127.0.0.1", 3),
        ],
        "url string, host string, seq long",
    ).repartition("host")
    fetched = RequestsFetcher(timeout=5).fetch(batch)
    routed = fetched.withColumn(
        "kind",
        route_response_udf(
            F.col("status"), F.col("content_type"), F.col("body"),
            F.col("redirect_to"),
        )["kind"],
    )
    kinds = {r["url"].rsplit("/", 1)[-1]: r["kind"] for r in routed.collect()}
    assert kinds == {
        "text": "text", "binary": "binary", "redirect": "redirect",
        "nope": "error",
    }


def test_conditional_get_304(http_server):
    from see_spark.core.fetch import KIND_UNCHANGED, route_response
    from see_spark.sources.fetcher import http_get

    base, seen = http_server
    with requests.Session() as s:
        # matching validator -> 304, no body pulled
        status, _, body, _ = http_get(s, base + "/conditional", etag="etag-match")
        assert (status, body) == (304, None)
        assert seen["/conditional"]["if-none-match"] == "etag-match"
        assert route_response(status, None, body, None).kind == KIND_UNCHANGED
        # stale validator -> full 200
        status, _, body, _ = http_get(s, base + "/conditional", etag="stale")
        assert (status, body) == (200, "fresh body")
        # no validator -> header not sent at all
        status, _, _, _ = http_get(s, base + "/conditional")
        assert status == 200
        assert "if-none-match" not in seen["/conditional"]
