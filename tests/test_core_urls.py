"""URL canonicalization + relative-link goldens.

1:1 ports of apps/db/test/see_db_srv_test.erl:78-136 (queue path) and
apps/crawler/test/see_crawler_worker_test.erl:68-79,101-159 (absolute_link).
"""

import pytest

from see_spark.core.urls import (
    absolute_link,
    canonicalize,
    host_matches,
    simplify_path,
    try_canonicalize,
)


# --- queue()/parse_url goldens (see_db_srv_test.erl) ----------------------

def test_no_schema_defaults_to_http():
    assert canonicalize("www.url.com/") == "http://www.url.com/"


def test_invalid_url_returns_error():
    assert try_canonicalize("www:wrong:url") is None


def test_no_path_root_path_added():
    assert canonicalize("http://www.url.com") == "http://www.url.com/"


def test_fragment_discarded_query_kept():
    assert (
        canonicalize("http://www.url.com/foo?query#fragment")
        == "http://www.url.com/foo?query"
    )


def test_nonsimple_path_simplified():
    assert (
        canonicalize("http://www.url.com/foo/bar/bar/../../bar/../baz/")
        == "http://www.url.com/foo/baz/"
    )
    assert (
        canonicalize("http://www.url.com/bar/../baz/page.html")
        == "http://www.url.com/baz/page.html"
    )


def test_domain_filter():
    # see_db_srv_test.erl:122-130 with domain_filter "foo"
    assert host_matches("http://www.foo.com/", "foo")
    assert host_matches("http://www.foo.bar.com/", "foo")
    assert not host_matches("http://www.bar.com/foo", "foo")


def test_unicode_percent_encoding_lowercase_hex():
    # see_db_srv_test.erl:131-136
    assert (
        canonicalize("https://pl.wikipedia.org/wiki/Wikipedia:Strona_główna")
        == "https://pl.wikipedia.org/wiki/Wikipedia:Strona_g%c5%82%c3%b3wna"
    )


def test_encoded_input_is_decoded_then_renormalized():
    # urldecode happens first (see_db_srv.erl:127): pre-encoded input
    # canonicalizes to the same bytes, idempotently.
    url = "https://pl.wikipedia.org/wiki/Wikipedia:Strona_g%c5%82%c3%b3wna"
    assert canonicalize(url) == url
    assert canonicalize(canonicalize(url)) == canonicalize(url)


def test_host_lowercased_default_port_dropped():
    assert canonicalize("HTTP://WWW.Url.COM:80/A") == "http://www.url.com/A"
    assert canonicalize("https://h.com:443/") == "https://h.com/"
    assert canonicalize("http://h.com:8080/") == "http://h.com:8080/"


# --- simplify_path state machine (see_db_srv.erl:137-165) -----------------

@pytest.mark.parametrize(
    "raw,expected",
    [
        ("/foo/bar/bar/../../bar/../baz/", "/foo/baz/"),
        ("/bar/../baz/page.html", "/baz/page.html"),
        ("//foo///bar", "/foo/bar"),          # duplicate-slash collapse
        ("/..", "/"),                          # above root
        ("/../..", "/"),
        ("/foo/..", "/"),
        ("/", "/"),
        ("/foo/bar", "/foo/bar"),
    ],
)
def test_simplify_path(raw, expected):
    assert simplify_path(raw) == expected


# --- absolute_link goldens (see_crawler_worker_test.erl) ------------------

def test_absolute_links_pass_through():
    assert absolute_link("http://url.com/", "http://redirected.url") == (
        "http://redirected.url"
    )


def test_relative_redirect_resolved_against_root():
    # see_crawler_worker_test.erl:68-79
    assert (
        absolute_link("http://url.com/", "/redirected/url")
        == "http://url.com/redirected/url"
    )


def test_internal_links_resolved_against_dirname():
    # see_crawler_worker_test.erl:101-123 — base has a DOUBLE slash; Erlang
    # filename:dirname collapses it.
    base = "http://url.com//bar/sub.html"
    assert absolute_link(base, "relative/link") == "http://url.com/bar/relative/link"
    assert absolute_link(base, "/absolute/link") == "http://url.com/absolute/link"
    assert absolute_link(base, "/absolute/dir/") == "http://url.com/absolute/dir/"


def test_base_query_string_dropped():
    # see_crawler_worker_test.erl:125-145
    base = "http://url.com/?query"
    assert absolute_link(base, "relative/link") == "http://url.com/relative/link"
    assert absolute_link(base, "/absolute/link") == "http://url.com/absolute/link"


def test_root_base():
    # see_crawler_worker_test.erl:147-159
    base = "http://url.com/"
    assert absolute_link(base, "relative/link") == "http://url.com/relative/link"
    assert absolute_link(base, "/absolute/link") == "http://url.com/absolute/link"
