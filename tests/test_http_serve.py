"""HTTP serving parity: the stdlib listener speaks the reference's web
contracts (see_web.erl:36-59) — golden result sets over GET /search, the
three-way POST /add status, empty-query and missing-field shapes."""

import json
import threading
import urllib.parse
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

from see_spark.sources.fixtures import GOLDEN_QUERIES


@pytest.fixture(scope="module")
def serve_catalog(spark, crawl_result):
    """COPY of the session crawl catalog: POST /add commits new frontier
    rows, and mutating the shared ``crawl_result`` fixture would corrupt
    every later test that compares against it (the resume-parity test
    reads it as the uninterrupted-run reference)."""
    import shutil
    import tempfile

    from see_spark.sources.catalog import SnapshotCatalog

    catalog, _, _ = crawl_result
    root = tempfile.mkdtemp(prefix="see_serve_")
    shutil.rmtree(root)
    shutil.copytree(catalog.root, root)
    return SnapshotCatalog(root, spark)


@pytest.fixture(scope="module")
def server_url(spark, serve_catalog):
    from scripts.serve import make_handler

    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(spark, serve_catalog, domain_filter=r".*\.test"),
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as resp:
        return resp.status, json.loads(resp.read())


def _post(url, data):
    body = urllib.parse.urlencode(data).encode()
    req = urllib.request.Request(
        url, data=body,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, json.loads(resp.read())


@pytest.mark.parametrize("query", sorted(GOLDEN_QUERIES))
def test_golden_queries_over_http(server_url, query):
    status, payload = _get(
        f"{server_url}/search?query={urllib.parse.quote(query)}"
    )
    assert status == 200
    assert {hit["url"] for hit in payload["results"]} == GOLDEN_QUERIES[query]
    for hit in payload["results"]:  # wire shape: url + title only
        assert set(hit) == {"url", "title"}


def test_search_without_query_param_is_empty(server_url):
    status, payload = _get(f"{server_url}/search")
    assert status == 200
    assert payload == {"results": []}


def test_index_page_served(server_url):
    with urllib.request.urlopen(f"{server_url}/", timeout=30) as resp:
        assert resp.status == 200
        assert b"/search?query=" in resp.read()


def test_index_page_has_reference_ui_surface(server_url):
    """GET / renders the reference UI's functional surface
    (apps/db/priv/html/index.html + js/see.js): search box with Search +
    More buttons, collapsible add-URL panel, alert box, result container,
    #search/<q> hash routing, title-or-url rendering with 100-char URL
    truncation, and the three-way add alert handling."""
    with urllib.request.urlopen(f"{server_url}/", timeout=30) as resp:
        html = resp.read().decode("utf-8")
    for el_id in [
        'id="search-input"', 'id="search-button"', 'id="more-button"',
        'id="more-panel"', 'id="alert-box"', 'id="search-results"',
        'id="url"', 'id="add-url"',
    ]:
        assert el_id in html, f"missing UI element {el_id}"
    # wiring: the page drives the same JSON endpoints the API tests pin
    assert "/search?query=" in html and "'/add'" in html
    # reference behaviors re-expressed: hash route, truncation, alerts
    assert "#search/" in html
    assert "substring(0, 100)" in html
    assert "No results" in html
    assert "filter_mismatch" in html and "does not match filter" in html
    # self-contained: no external asset fetches (sandboxed browsers and
    # air-gapped deploys render it fully)
    assert "https://" not in html and "src=" not in html.replace(
        "<script>", ""
    )


def test_add_url_three_way_contract(server_url):
    # filter mismatch: host outside the fixture domain filter
    status, payload = _post(f"{server_url}/add", {"url": "http://other.org/x"})
    assert (status, payload) == (200, {"result": "filter_mismatch"})
    # url error: empty host is unparseable (schemeless strings like
    # "not a url" instead get http:// prefixed and fail the domain filter)
    status, payload = _post(f"{server_url}/add", {"url": "http://"})
    assert (status, payload) == (200, {"result": "url_error"})
    # missing field -> the reference's {"result": "error"} shape
    status, payload = _post(f"{server_url}/add", {"other": "x"})
    assert (status, payload) == (200, {"result": "error"})


def test_add_ok_and_searchable_state(server_url, serve_catalog):
    """A fresh in-filter URL queues ok and lands in the frontier unvisited."""
    from pyspark.sql import functions as F

    catalog = serve_catalog
    before = catalog.read("frontier").count()
    status, payload = _post(
        f"{server_url}/add", {"url": "http://brand-new.test/added-via-http"}
    )
    assert (status, payload) == (200, {"result": "ok"})
    frontier = catalog.read("frontier")
    assert frontier.count() == before + 1
    row = frontier.filter(
        F.col("url") == "http://brand-new.test/added-via-http"
    ).collect()
    assert len(row) == 1 and row[0]["state"] == "unvisited"


def test_unknown_path_404(server_url):
    with pytest.raises(urllib.error.HTTPError) as err:
        _get(f"{server_url}/nope")
    assert err.value.code == 404


def test_structured_grammar_over_http(server_url):
    """The query language reaches the HTTP surface: exclusion, phrase and
    fuzzy modifiers compose against the crawled fixture corpus."""
    def results(q):
        status, body = _get(
            f"{server_url}/search?query={urllib.parse.quote(q)}"
        )
        assert status == 200
        return [r["url"] for r in body["results"]]

    # plain: both composer biographies match
    assert set(results("composer")) == {
        "http://site-a.test/articles/chopin.html",
        "http://site-a.test/articles/liszt.html",
    }
    # exclusion: the Hungarian one drops
    assert results("composer -hungarian") == [
        "http://site-a.test/articles/chopin.html"
    ]
    # phrase gate: adjacency in the indexed span text
    assert results('"imitation game"') == [
        "http://site-a.test/articles/turing.html"
    ]
    assert results('"game imitation"') == []
    # fuzzy: misspelling within one edit still finds the composers
    assert set(results("composr~")) == {
        "http://site-a.test/articles/chopin.html",
        "http://site-a.test/articles/liszt.html",
    }
    # title boost: real crawled titles feed the title field
    boosted = results("alan title:wikipedia")
    assert boosted[0] == "http://site-a.test/articles/turing.html"
