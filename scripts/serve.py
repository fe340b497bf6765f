"""HTTP search server over a crawled snapshot catalog.

The reference serves its UI + JSON API over mochiweb
(/root/reference/apps/db/src/see_web.erl:33-66): `GET /search?query=...`
-> {"results": [{"url", "title"}, ...]}, `POST /add` (form-encoded url=...)
-> {"result": ok|filter_mismatch|url_error|error}, `/` -> a static search
page, anything failing -> 500 "Internal Server Error". This is the same
surface on the stdlib ThreadingHTTPServer: Spark is the query engine, so
request handling is a thin JSON shim over see_spark.serving; a lock
serializes query execution on the shared SparkSession (the driver is the
reference's single gen_server analogue — see_db_srv.erl:25-44).

Usage:
    python scripts/serve.py --warehouse /data/crawl [--port 8888]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>see_spark search</title></head>
<body>
<h1>see_spark</h1>
<form onsubmit="run(); return false">
  <input id="q" placeholder="search words"> <button>Search</button>
</form>
<form onsubmit="add(); return false">
  <input id="u" placeholder="http://url.to/add"> <button>Add URL</button>
</form>
<ul id="results"></ul>
<script>
async function run() {
  const q = document.getElementById('q').value;
  const r = await (await fetch('/search?query=' + encodeURIComponent(q))).json();
  const ul = document.getElementById('results');
  ul.innerHTML = '';
  for (const hit of r.results) {
    const li = document.createElement('li');
    const a = document.createElement('a');
    a.href = hit.url; a.textContent = hit.title || hit.url;
    li.appendChild(a); ul.appendChild(li);
  }
}
async function add() {
  const u = document.getElementById('u').value;
  const r = await (await fetch('/add', {method: 'POST',
    headers: {'Content-Type': 'application/x-www-form-urlencoded'},
    body: 'url=' + encodeURIComponent(u)})).json();
  alert(r.result);
}
</script>
</body></html>
"""


def make_handler(spark, catalog, domain_filter=None, k=100):
    from see_spark.serving import add_url, search_results

    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        server_version = "see_spark"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, payload, status=200):
            body = json.dumps(payload).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _html(self, text):
            body = text.encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            try:
                parsed = urlparse(self.path)
                if parsed.path in ("/", "/index.html"):
                    return self._html(INDEX_HTML)
                if parsed.path == "/search":
                    qs = parse_qs(parsed.query)
                    query = qs.get("query", [None])[0]
                    # no query param -> empty results (see_web.erl:39-40)
                    if query is None:
                        return self._json({"results": []})
                    with lock:
                        results = search_results(spark, catalog, query, k=k)
                    return self._json({"results": results})
                self.send_error(404, "Not Found")
            except Exception:  # see_web.erl:24-30
                self.send_error(500, "Internal Server Error")

        def do_POST(self):
            try:
                if urlparse(self.path).path != "/add":
                    return self.send_error(404, "Not Found")
                length = int(self.headers.get("Content-Length") or 0)
                form = parse_qs(self.rfile.read(length).decode("utf-8"))
                url = form.get("url", [None])[0]
                # missing url field -> {"result": "error"} (see_web.erl:50-51)
                if url is None:
                    return self._json({"result": "error"})
                with lock:
                    result = add_url(
                        spark, catalog, url, domain_filter=domain_filter
                    )
                return self._json({"result": result})
            except Exception:
                self.send_error(500, "Internal Server Error")

    return Handler


def serve(warehouse, port=8888, host="127.0.0.1", cores=None,
          domain_filter=None, started_evt=None):
    from see_spark.session import get_spark
    from see_spark.sources.catalog import SnapshotCatalog

    spark = get_spark(cores=cores, app_name="see_serve")
    spark.sparkContext.setLogLevel("ERROR")
    catalog = SnapshotCatalog(warehouse, spark)
    httpd = ThreadingHTTPServer(
        (host, port), make_handler(spark, catalog, domain_filter)
    )
    if started_evt is not None:
        started_evt.set()
    print(f"serving on http://{host}:{httpd.server_address[1]}/", file=sys.stderr)
    httpd.serve_forever()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Serve a see_spark crawl catalog")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--port", type=int, default=8888)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--cores", type=int, default=0)
    p.add_argument("--domain-filter", default=None)
    args = p.parse_args(argv)
    serve(args.warehouse, port=args.port, host=args.host,
          cores=args.cores or None, domain_filter=args.domain_filter)
    return 0


if __name__ == "__main__":
    sys.exit(main())
