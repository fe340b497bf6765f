"""Deterministic synthetic web for crawl tests (FIXTURES.md F2).

Stand-in for the reference's mock webserver + fixture corpus
(/root/reference/ct/see/webserver_mock.erl:26-32, ct/see/see_SUITE_data/):
a host-labeled link graph exercising every crawl behavior —
duplicate links (URL-seen dedup, O2), relative links incl. ``..`` and
double-slash (O15/O22), cross-host links cut by the domain filter (O16),
a redirect chain incl. a relative Location (see_http.erl:34-50 +
see_crawler_worker.erl:78-83), media/binary URLs (see_http.erl:26-32),
404/500 errors, a query-string URL, fragment links, a Unicode path
(see_db_srv_test.erl:131-136), and a robots-blocked path (north rule).

Pure Python, zero pyspark imports: the same dict backs the Spark synthetic
fetcher, the pure-Python oracle, and pytest assertions.
"""

from __future__ import annotations

from typing import Dict, Optional

DOMAIN_FILTER = r"\.test"
SEED_URLS = ["site-a.test"]  # raw: no scheme, no path — exercises defaults

HTML = "text/html; charset=utf-8"
PLAIN = "text/plain"
BINARY = "application/octet-stream"


def page(
    body: str = "",
    status: int = 200,
    content_type: Optional[str] = HTML,
    redirect_to: Optional[str] = None,
) -> dict:
    return {
        "status": status,
        "content_type": content_type,
        "body": body,
        "redirect_to": redirect_to,
    }


INDEX_BODY = """<html><head><title>Site A index</title></head><body>
Welcome to site A about classical music and computing pioneers.
<a href="articles/chopin.html">Chopin biography</a>
<a href="/articles/liszt.html">Liszt biography</a>
<a href="articles/../articles/chopin.html#birth">Chopin again (dup)</a>
<a href="/old/turing">Turing (old URL)</a>
<a href="/moved">Moved page</a>
<a href="http://site-b.test/banach.txt">Banach notes</a>
<a href="http://site-b.test/private/secret.txt">Secret</a>
<a href="http://external.example/nope">External</a>
<a href="/img/logo.png">Logo</a>
<a href="/search?q=erlang">Search erlang</a>
<a href="/wiki/Strona_g%c5%82%c3%b3wna">Strona</a>
<a href="/missing.html">Missing</a>
<a href="/boom">Boom</a>
<a href>valueless</a> <a>no href</a>
</body></html>"""

CHOPIN_BODY = """<html><head><title>Frederic Chopin</title></head><body>
Frederic Chopin was a Polish composer born in Zelazowa Wola.
Chopin wrote nocturnes and mazurkas.
<a href="liszt.html">his friend Liszt</a>
<a href="/">home</a>
</body></html>"""

LISZT_BODY = """<html><head><title>Franz Liszt</title></head><body>
Franz Liszt was a Hungarian composer and a friend of Chopin.
<a href="/articles/chopin.html">Chopin</a>
</body></html>"""

TURING_BODY = """<html><head><title>Wikipedia - Alan Turing</title></head><body>
Alan Turing broke the enigma machine and founded computer science.
Turing proposed the imitation game.
</body></html>"""

BANACH_BODY = (
    "Stefan Banach was a Polish mathematician who founded functional "
    "analysis and studied Banach spaces."
)

ERLANG_BODY = "Erlang is a programming language built for concurrency."

STRONA_BODY = "ZAŻÓŁĆ GĘŚLĄ JAŹŃ strona główna po polsku"


def fixture_site() -> Dict[str, dict]:
    """canonical URL -> synthetic HTTP response."""
    return {
        "http://site-a.test/": page(INDEX_BODY),
        "http://site-a.test/articles/chopin.html": page(CHOPIN_BODY),
        "http://site-a.test/articles/liszt.html": page(LISZT_BODY),
        "http://site-a.test/articles/turing.html": page(TURING_BODY),
        # 301 with RELATIVE Location — worker absolutizes it
        "http://site-a.test/old/turing": page(
            "", status=301, content_type=None,
            redirect_to="/articles/turing.html",
        ),
        # 302 chain hop
        "http://site-a.test/moved": page(
            "", status=302, content_type=None,
            redirect_to="http://site-a.test/articles/liszt.html",
        ),
        "http://site-b.test/banach.txt": page(BANACH_BODY, content_type=PLAIN),
        "http://site-b.test/private/secret.txt": page(
            "top secret", content_type=PLAIN
        ),
        "http://site-a.test/img/logo.png": page(
            "\x89PNG...", content_type=BINARY
        ),
        "http://site-a.test/search?q=erlang": page(ERLANG_BODY, content_type=PLAIN),
        "http://site-a.test/wiki/Strona_g%c5%82%c3%b3wna": page(
            STRONA_BODY, content_type=PLAIN
        ),
        "http://site-a.test/missing.html": page("not found", status=404),
        "http://site-a.test/boom": page("oops", status=500),
        # never linked; for direct-fetch unit tests
        "http://media.test/clip.mp4": page("", content_type="video/mp4"),
    }


def fixture_robots() -> Dict[str, list]:
    """host -> disallowed path prefixes (north-rule robots cache)."""
    return {"site-b.test": ["/private"]}


def fixture_site_rfc() -> Dict[str, dict]:
    """fixture_site + served robots.txt bodies for the RFC 9309 mode
    (CrawlConfig.robots_rfc): group selection (a decoy group for another
    agent), anchored wildcard (*.png$), and allow-beats-disallow longest
    match (the erlang search page survives the /search disallow)."""
    site = fixture_site()
    site["http://site-a.test/robots.txt"] = page(
        "User-agent: other-crawler\nDisallow: /\n\n"
        "User-agent: see-spark\n"
        "Disallow: /*.png$\n"
        "Disallow: /search\n"
        "Allow: /search?q=erlang$\n"
        "Sitemap: http://site-a.test/sitemap.xml\n",
        content_type=PLAIN,
    )
    site["http://site-b.test/robots.txt"] = page(
        "User-agent: *\nDisallow: /private\n", content_type=PLAIN
    )
    return site


def fixture_site_sitemaps() -> Dict[str, dict]:
    """fixture_site_rfc + served sitemaps for CrawlConfig.use_sitemaps:
    a <sitemapindex> fan-out (wave nesting), a 404 nested sitemap (failed
    fetch recorded, no retry), locs that duplicate link-discovered pages
    (URL-seen dedup), a robots-blocked loc, an off-domain loc (filter),
    an entity-escaped loc, pages reachable ONLY via sitemap (which then
    contribute links of their own), and a NEW host entering the crawl via
    a sitemap loc — whose own robots declares a further sitemap."""
    sm = "</loc></url><url><loc>"
    site = fixture_site_rfc()
    site["http://site-a.test/sitemap.xml"] = page(
        "<sitemapindex><sitemap><loc>http://site-a.test/sm-pages.xml</loc>"
        "</sitemap><sitemap><loc>http://site-a.test/sm-broken.xml</loc>"
        "</sitemap></sitemapindex>",
        content_type=PLAIN,
    )
    site["http://site-a.test/sm-pages.xml"] = page(
        "<urlset><url><loc>"
        + sm.join(
            [
                "http://site-a.test/articles/chopin.html",  # dup of a link
                "http://site-a.test/sitemap-only/hidden.html",
                "http://site-a.test/img/extra.png",  # robots: /*.png$
                "http://external.example/nope",  # domain filter
                "http://site-a.test/q?a=1&amp;b=2",  # entity escape
                "http://site-c.test/start.html",  # new host via sitemap
            ]
        )
        + "</loc></url></urlset>",
        content_type=PLAIN,
    )
    site["http://site-a.test/sm-broken.xml"] = page("gone", status=404)
    site["http://site-a.test/sitemap-only/hidden.html"] = page(
        '<html><head><title>Hidden</title></head><body>Only sitemaps list '
        'this hidden page. <a href="/from-hidden.html">onward</a>'
        "</body></html>"
    )
    site["http://site-a.test/from-hidden.html"] = page(
        "<html><head><title>From hidden</title></head><body>Linked from "
        "the hidden sitemap page.</body></html>"
    )
    site["http://site-a.test/img/extra.png"] = page(
        "\x89PNG...", content_type=BINARY
    )
    site["http://site-a.test/q?a=1&b=2"] = page(
        "escaped query page", content_type=PLAIN
    )
    site["http://site-c.test/robots.txt"] = page(
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: http://site-c.test/sitemap.xml\n",
        content_type=PLAIN,
    )
    site["http://site-c.test/start.html"] = page(
        "<html><head><title>Site C</title></head><body>Site C start."
        "</body></html>"
    )
    site["http://site-c.test/sitemap.xml"] = page(
        "<urlset><url><loc>http://site-c.test/deep.html</loc></url>"
        "<url><loc>http://site-c.test/private/x.html</loc></url></urlset>",
        content_type=PLAIN,
    )
    site["http://site-c.test/deep.html"] = page(
        "<html><head><title>Deep C</title></head><body>Deep page on C."
        "</body></html>"
    )
    site["http://site-c.test/private/x.html"] = page(
        "private", content_type=PLAIN
    )
    return site


def fixture_site_crawl_delay() -> Dict[str, dict]:
    """fixture_site_rfc with a Crawl-delay: 3 in site-a's see-spark group
    (site-b keeps none) — site-a checkouts must then be >= 3 rounds apart
    while site-b proceeds every round (CrawlConfig.honor_crawl_delay)."""
    site = fixture_site_rfc()
    site["http://site-a.test/robots.txt"] = page(
        "User-agent: other-crawler\nDisallow: /\n\n"
        "User-agent: see-spark\n"
        "Crawl-delay: 3\n"
        "Disallow: /*.png$\n"
        "Disallow: /search\n"
        "Allow: /search?q=erlang$\n"
        "Sitemap: http://site-a.test/sitemap.xml\n",
        content_type=PLAIN,
    )
    return site


def fixture_site_blocked_with_sitemap() -> Dict[str, dict]:
    """Degenerate case for the zero-checkout round: site-z's robots
    disallow EVERYTHING but declare a sitemap pointing at another host —
    the crawl's first round checks out nothing yet must still enqueue the
    sitemap discoveries and continue."""
    return {
        "http://site-z.test/robots.txt": page(
            "User-agent: *\nDisallow: /\n"
            "Sitemap: http://site-z.test/sitemap.xml\n",
            content_type=PLAIN,
        ),
        "http://site-z.test/": page("<html><body>blocked</body></html>"),
        "http://site-z.test/sitemap.xml": page(
            "<urlset><url><loc>http://site-y.test/open.html</loc></url>"
            "</urlset>",
            content_type=PLAIN,
        ),
        "http://site-y.test/open.html": page(
            "<html><head><title>Open Y</title></head><body>Reached via a "
            "blocked host's sitemap.</body></html>"
        ),
    }


# Queries mirroring the integration suite's exact result-set assertions
# (/root/reference/ct/see/see_SUITE.erl:55-66), adapted to this corpus.
GOLDEN_QUERIES = {
    # anchor text is document text, so the index page matches "Chopin" too —
    # same shape as the reference suite's {index, Chopin, Liszt} assertion
    "Chopin": {
        "http://site-a.test/",
        "http://site-a.test/articles/chopin.html",
        "http://site-a.test/articles/liszt.html",
    },
    "Zelazowa Wola": {"http://site-a.test/articles/chopin.html"},
    "Alan Turing enigma": {"http://site-a.test/articles/turing.html"},
    "Alan Turing": {"http://site-a.test/articles/turing.html"},
    "composer": {
        "http://site-a.test/articles/chopin.html",
        "http://site-a.test/articles/liszt.html",
    },
    "zażółć": {"http://site-a.test/wiki/Strona_g%c5%82%c3%b3wna"},
    "banach functional analysis": {"http://site-b.test/banach.txt"},
    "nosuchword": set(),
    "": set(),
}
