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

# Functional analogue of the reference's search page
# (apps/db/priv/html/index.html + js/see.js): centered page header, large
# search input with Search + More buttons, a collapsible "More" panel with
# an Add-URL field, a dismissible alert box (success on ok, error on
# filter_mismatch / failure), a result list rendering title-or-url as the
# link with the URL shown below truncated at 100 chars, a "No results"
# info alert, Enter-key submits, and #search/<query> hash routing so
# results are linkable. Self-contained vanilla JS/CSS — this sandbox has
# no network for CDN assets, and the wire contracts are what matter.
INDEX_HTML = """<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>see_spark search</title>
<style>
  body { font-family: system-ui, sans-serif; background: #fff; color: #333;
         margin: 0; }
  .container { max-width: 860px; margin: 0 auto; padding: 0 15px; }
  .page-header { text-align: center; border-bottom: 1px solid #eee;
                 margin: 40px 0 30px; padding-bottom: 9px; }
  .input-group { display: flex; }
  .input-group input { flex: 1; font-size: 18px; padding: 10px 16px;
    border: 1px solid #ccc; border-radius: 6px 0 0 6px; }
  .input-group button { font-size: 18px; padding: 10px 16px;
    border: 1px solid #ccc; border-left: none; background: #f5f5f5;
    cursor: pointer; }
  .input-group button:last-child { border-radius: 0 6px 6px 0; }
  .panel { border: 1px solid #ddd; border-radius: 4px; margin-top: 15px; }
  .panel-heading { background: #f5f5f5; padding: 10px 15px;
                   border-bottom: 1px solid #ddd; }
  .panel-body { padding: 15px; }
  .collapse { display: none; }
  .collapse.in { display: block; }
  .alert { padding: 12px 15px; border: 1px solid transparent;
           border-radius: 4px; margin-top: 15px; position: relative; }
  .alert-success { color: #3c763d; background: #dff0d8; }
  .alert-danger  { color: #a94442; background: #f2dede; }
  .alert-info    { color: #31708f; background: #d9edf7; }
  .alert .close { position: absolute; right: 10px; top: 8px; border: none;
                  background: none; font-size: 18px; cursor: pointer; }
  .list-group { margin-top: 20px; }
  .result-item { border: 1px solid #ddd; padding: 10px 15px;
                 margin-bottom: -1px; }
  .result-item h4 { margin: 0 0 4px; }
  .result-item span { color: #777; font-size: 13px; }
</style></head>
<body>
<div class="container">
  <div class="page-header"><h1>see_spark search</h1></div>
  <div id="search-box">
    <div class="input-group">
      <input type="text" autofocus placeholder="Search for..." id="search-input">
      <button type="button" id="search-button">Search</button>
      <button type="button" id="more-button">More</button>
    </div>
  </div>
  <div id="alert-box"></div>
  <div class="collapse" id="more-panel">
    <div class="panel">
      <div class="panel-heading">More</div>
      <div class="panel-body">
        <label for="url">Add URL</label>
        <div class="input-group">
          <input type="text" id="url" placeholder="URL...">
          <button type="button" id="add-url">Add</button>
        </div>
        <label for="rank" style="margin-top:10px;display:block">Ranking</label>
        <select id="rank">
          <option value="tfidf" selected>tf-idf (reference parity)</option>
          <option value="bm25">BM25</option>
        </select>
      </div>
    </div>
  </div>
  <div id="search-results"></div>
</div>
<script>
"use strict";
function el(id) { return document.getElementById(id); }
function showAlert(type, msg) {
  var box = el('alert-box');
  var div = document.createElement('div');
  div.className = 'alert alert-' + (type === 'success' ? 'success' : 'danger');
  div.textContent = msg;
  var close = document.createElement('button');
  close.className = 'close'; close.textContent = '\\u00d7';
  close.onclick = function() { div.remove(); };
  div.appendChild(close);
  box.appendChild(div);
}
function renderResults(results, error) {
  var out = el('search-results');
  out.innerHTML = '';
  if (error) {
    var e = document.createElement('div');
    e.className = 'alert alert-danger'; e.textContent = error;
    out.appendChild(e); return;
  }
  if (!results.length) {
    var n = document.createElement('div');
    n.className = 'alert alert-info'; n.textContent = 'No results';
    out.appendChild(n); return;
  }
  var group = document.createElement('div');
  group.className = 'list-group';
  results.forEach(function(hit) {
    var item = document.createElement('div');
    item.className = 'result-item';
    var a = document.createElement('a');
    a.href = hit.url;
    var h = document.createElement('h4');
    h.textContent = hit.title && hit.title.length > 0 ? hit.title : hit.url;
    a.appendChild(h); item.appendChild(a);
    var span = document.createElement('span');
    span.title = hit.url;
    span.textContent = hit.url.length > 100
      ? hit.url.substring(0, 100) + '...' : hit.url;
    item.appendChild(span);
    group.appendChild(item);
  });
  out.appendChild(group);
}
function runSearch(query) {
  var rank = el('rank') ? el('rank').value : 'tfidf';
  fetch('/search?query=' + encodeURIComponent(query)
        + (rank !== 'tfidf' ? '&rank=' + encodeURIComponent(rank) : ''))
    .then(function(r) { return r.json(); })
    .then(function(resp) { renderResults(resp.results, ''); })
    .catch(function() { renderResults([], 'Error'); });
}
function triggerSearch() {
  var target = 'search/' + encodeURIComponent(el('search-input').value);
  if (location.hash === '#' + target) {
    runSearch(el('search-input').value);  // re-submit: hashchange won't fire
  } else {
    location.hash = target;
  }
}
function addURL() {
  var url = el('url').value;
  fetch('/add', {method: 'POST',
      headers: {'Content-Type': 'application/x-www-form-urlencoded'},
      body: 'url=' + encodeURIComponent(url)})
    .then(function(r) { return r.json(); })
    .then(function(resp) {
      if (resp.result === 'ok') showAlert('success', 'Added: ' + url);
      else if (resp.result === 'filter_mismatch')
        showAlert('error', 'Error: ' + url + ' does not match filter');
      else showAlert('error', 'Unknown error');
    })
    .catch(function() { showAlert('error', 'Unknown error'); });
}
function route() {
  var h = location.hash || '';
  if (h.indexOf('#search/') === 0) {
    var q = h.slice('#search/'.length);
    try { q = decodeURIComponent(q); } catch (e) { /* keep raw */ }
    el('search-input').value = q;
    runSearch(q);
  }
}
el('search-button').onclick = triggerSearch;
el('search-input').onkeydown = function(e) {
  if (e.key === 'Enter') triggerSearch();
};
el('more-button').onclick = function() {
  el('more-panel').classList.toggle('in');
};
el('add-url').onclick = addURL;
el('url').onkeydown = function(e) { if (e.key === 'Enter') addURL(); };
window.onhashchange = route;
route();
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
                    # ?rank=bm25 opts into BM25 scoring (avgdl from the
                    # materialized corpus_stats table); default stays the
                    # reference's tf-idf wire behavior
                    rank = qs.get("rank", ["tfidf"])[0]
                    with lock:
                        results = search_results(
                            spark, catalog, query, k=k, rank=rank
                        )
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
