"""robots.txt RFC 9309 kernel goldens + Spark robots pipeline."""

import pytest

from see_spark.core.robotstxt import (
    parse_robots,
    parse_sitemap,
    robots_allowed,
)

BODY = """
# comments ignored
User-agent: googlebot
Disallow: /google-only/

User-agent: see-spark
User-agent: other-bot
Allow: /shared/public/
Disallow: /shared/
Crawl-delay: 2.5
Sitemap: http://h.example/sitemap.xml

User-agent: *
Disallow: /private/
Sitemap: http://h.example/fallback.xml
"""


def test_group_selection_longest_agent_match():
    p = parse_robots(BODY, agent="see-spark")
    assert p["disallow"] == ["/shared/"]
    assert p["allow"] == ["/shared/public/"]
    assert p["crawl_delay"] == 2.5
    # sitemaps are host-wide, collected regardless of group
    assert p["sitemaps"] == [
        "http://h.example/sitemap.xml", "http://h.example/fallback.xml"
    ]
    # unknown agent falls back to *
    q = parse_robots(BODY, agent="nobody")
    assert q["disallow"] == ["/private/"] and q["allow"] == []
    # prefix agent-token match: "see" group would match "see-spark" too
    r = parse_robots("User-agent: see\nDisallow: /a/\n", agent="see-spark")
    assert r["disallow"] == ["/a/"]


def test_stacked_user_agents_share_group():
    p = parse_robots(BODY, agent="other-bot")
    assert p["disallow"] == ["/shared/"]


def test_precedence_longest_match_wins_and_tie_allows():
    allow, dis = ["/p/public/"], ["/p/"]
    assert robots_allowed("/p/public/x.html", allow, dis) is True
    assert robots_allowed("/p/secret.html", allow, dis) is False
    assert robots_allowed("/other", allow, dis) is True
    # equal-length tie -> allow (RFC 9309 §2.2.2)
    assert robots_allowed("/dir/", ["/dir/"], ["/dir/"]) is True


def test_wildcard_and_anchor_patterns():
    assert robots_allowed("/a/x.pdf", [], ["/*.pdf$"]) is False
    assert robots_allowed("/a/x.pdf?y", [], ["/*.pdf$"]) is True
    assert robots_allowed("/a/b/c", [], ["/a/*/c"]) is False
    assert robots_allowed("/fish.html", [], ["/fish"]) is False


def test_empty_disallow_is_allow_all():
    p = parse_robots("User-agent: *\nDisallow:\n", agent="x")
    assert p["disallow"] == []


def test_parse_sitemap_urlset_and_index():
    us = parse_sitemap(
        "<urlset><url><loc> http://a/1 </loc></url>"
        "<url><loc>http://a/2?x=1&amp;y=2</loc></url></urlset>"
    )
    assert us == {"urls": ["http://a/1", "http://a/2?x=1&y=2"], "sitemaps": []}
    idx = parse_sitemap(
        "<sitemapindex><sitemap><loc>http://a/s1.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    assert idx == {"urls": [], "sitemaps": ["http://a/s1.xml"]}


# ---------------------------------------------------------------- spark

@pytest.fixture(scope="module")
def robots_fetches(spark):
    rows = [
        ("h1.example", 200,
         "User-agent: see-spark\nAllow: /pub/\nDisallow: /\n"
         "Sitemap: http://h1.example/sm.xml\n"),
        ("h2.example", 200, "User-agent: *\nDisallow: /*.zip$\n"),
        ("h3.example", 404, None),   # allow-all
        ("h4.example", 200, "User-agent: other\nDisallow: /\n"),  # not our group
    ]
    return spark.createDataFrame(rows, "host string, status int, body string")


def test_robots_dimension_and_rfc_gate(spark, robots_fetches):
    from see_spark.operators.robots import robots_dimension, robots_gate_rfc
    from see_spark.operators.frontier import STATE_ROBOTS, STATE_UNVISITED

    dim = robots_dimension(robots_fetches, agent="see-spark", round_no=3)
    rows = {r.host: r for r in dim.collect()}
    assert rows["h1.example"].disallow == ["/"]
    assert rows["h1.example"].sitemaps == ["http://h1.example/sm.xml"]
    assert rows["h3.example"].rules == []
    assert rows["h4.example"].rules == []  # * group absent, ours absent

    urls = [
        ("http://h1.example/pub/a.html", "h1.example"),   # allow beats /
        ("http://h1.example/secret.html", "h1.example"),  # blocked by /
        ("http://h2.example/file.zip", "h2.example"),     # anchored wildcard
        ("http://h2.example/file.zip.html", "h2.example"),  # anchor miss
        ("http://h3.example/x", "h3.example"),            # 404 robots
        ("http://h5.example/y", "h5.example"),            # no robots row
    ]
    frontier = spark.createDataFrame(
        [(u, h, STATE_UNVISITED, None) for u, h in urls],
        "url string, host string, state string, detail string",
    )
    gated = robots_gate_rfc(frontier, dim)
    state = {r.url: r.state for r in gated.collect()}
    assert state["http://h1.example/pub/a.html"] == STATE_UNVISITED
    assert state["http://h1.example/secret.html"] == STATE_ROBOTS
    assert state["http://h2.example/file.zip"] == STATE_ROBOTS
    assert state["http://h2.example/file.zip.html"] == STATE_UNVISITED
    assert state["http://h3.example/x"] == STATE_UNVISITED
    assert state["http://h5.example/y"] == STATE_UNVISITED


def test_gate_matches_kernel_on_random_paths(spark):
    """Spark-side longest-match resolution == pure-Python oracle."""
    from see_spark.operators.robots import robots_dimension, robots_gate_rfc
    from see_spark.operators.frontier import STATE_UNVISITED

    body = (
        "User-agent: *\nAllow: /a/b/\nDisallow: /a/\nDisallow: /c*/d\n"
        "Allow: /c/\nDisallow: /*.png$\n"
    )
    parsed_rules = {"allow": ["/a/b/", "/c/"],
                    "disallow": ["/a/", "/c*/d", "/*.png$"]}
    paths = [
        "/a/", "/a/b/", "/a/b/c.html", "/a/x", "/c/d", "/cc/d", "/c/e",
        "/x.png", "/x.png?q", "/", "/a", "/a/b", "/c*/d",
    ]
    fetched = spark.createDataFrame(
        [("h.example", 200, body)], "host string, status int, body string"
    )
    frontier = spark.createDataFrame(
        [(f"http://h.example{p}", "h.example", STATE_UNVISITED, None)
         for p in paths],
        "url string, host string, state string, detail string",
    )
    gated = robots_gate_rfc(
        frontier, robots_dimension(fetched, agent="see-spark")
    )
    got = {
        r.url.replace("http://h.example", ""): r.state != "robots_blocked"
        for r in gated.collect()
    }
    want = {
        p: robots_allowed(p, parsed_rules["allow"], parsed_rules["disallow"])
        for p in paths
    }
    assert got == want


def test_sitemap_seed_urls_spark(spark):
    from see_spark.operators.robots import sitemap_seed_urls

    fetched = spark.createDataFrame(
        [
            ("http://a/sm.xml",
             "<urlset><url><loc>http://a/p1</loc></url>"
             "<url><loc>http://a/p2</loc></url></urlset>"),
            ("http://a/idx.xml",
             "<sitemapindex><sitemap><loc>http://a/sm2.xml</loc>"
             "</sitemap></sitemapindex>"),
        ],
        "url string, body string",
    )
    rows = {(r.url, r.is_nested_sitemap) for r in
            sitemap_seed_urls(fetched).collect()}
    assert rows == {
        ("http://a/p1", False), ("http://a/p2", False),
        ("http://a/sm2.xml", True),
    }
