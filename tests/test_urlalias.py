"""DUST URL-alias mining (operators/urlalias.py): rule semantics on a
hand-built page set, rewrite edge cases (no qs, full strip, order
preservation), mirror detection with the per-signature fan-out cap."""

from __future__ import annotations

from see_spark.operators.urlalias import (
    apply_param_rules,
    mine_param_rules,
    mirror_hosts,
    split_url,
)

# h.test: sid is a session id (same content with or without it);
# page selects content (different fp). x.test has its own sid rule
# space — rules are per-host, so h.test evidence must not leak there.
PAGES = [
    ("http://h.test/a?id=1", 100),
    ("http://h.test/a?id=1&sid=111", 100),
    ("http://h.test/a?id=1&sid=222", 100),
    ("http://h.test/b?id=2", 200),
    ("http://h.test/b?id=2&sid=333", 200),
    ("http://h.test/b?id=2&page=1", 201),   # counterexample for page
    ("http://h.test/b?id=2&page=0", 200),   # evidence for page (same fp)
    ("http://x.test/a?id=1", 900),
    ("http://x.test/a?id=1&sid=5", 901),    # sid CHANGES content on x.test
]


def _mine(spark, min_support=2):
    df = spark.createDataFrame(PAGES, ["url", "fp"])
    rows = mine_param_rules(df, min_support=min_support).collect()
    return {(r["host"], r["param"]): r for r in rows}


def test_split_url_parts(spark):
    df = spark.createDataFrame(
        [("https://a.test/p/q?x=1&y=2",), ("http://b.test/plain",)], ["url"]
    )
    got = {r["url"]: r for r in split_url(df).collect()}
    r = got["https://a.test/p/q?x=1&y=2"]
    assert (r["scheme"], r["host"], r["path"], r["qs"]) == (
        "https", "a.test", "/p/q", "x=1&y=2",
    )
    r = got["http://b.test/plain"]
    assert (r["scheme"], r["host"], r["path"], r["qs"]) == (
        "http", "b.test", "/plain", "",
    )


def test_mine_param_rules(spark):
    rules = _mine(spark)
    sid = rules[("h.test", "sid")]
    # three sid occurrences, each residual exists with the same fp
    assert (sid["support"], sid["counterexamples"], sid["strippable"]) == (
        3, 0, 1,
    )
    page = rules[("h.test", "page")]
    # page=0 matches the stripped variant's fp, page=1 conflicts
    assert (page["support"], page["counterexamples"], page["strippable"]) == (
        1, 1, 0,
    )
    # one conflicting observation on x.test kills sid there
    xsid = rules[("x.test", "sid")]
    assert (xsid["support"], xsid["counterexamples"], xsid["strippable"]) == (
        0, 1, 0,
    )
    # id: residual (qs='') never exists in the corpus -> no rule row
    # ever reaches support (inner join drops it entirely)
    assert ("h.test", "id") not in rules


def test_min_support_threshold(spark):
    rules = _mine(spark, min_support=4)
    assert rules[("h.test", "sid")]["strippable"] == 0  # support 3 < 4


def test_apply_param_rules(spark):
    pages = spark.createDataFrame(
        [
            ("http://h.test/a?id=1&sid=111",),
            ("http://h.test/a?sid=9",),          # full strip -> no '?'
            ("http://h.test/c",),                # no qs -> unchanged
            ("http://h.test/a?sid=1&id=7&sid=2",),  # order of survivors kept
            ("http://x.test/a?id=1&sid=5",),     # x.test rule not strippable
        ],
        ["url"],
    )
    rules = mine_param_rules(
        spark.createDataFrame(PAGES, ["url", "fp"]), min_support=2
    )
    got = {r["url"]: r["alias_url"] for r in apply_param_rules(pages, rules).collect()}
    assert got["http://h.test/a?id=1&sid=111"] == "http://h.test/a?id=1"
    assert got["http://h.test/a?sid=9"] == "http://h.test/a"
    assert got["http://h.test/c"] == "http://h.test/c"
    assert got["http://h.test/a?sid=1&id=7&sid=2"] == "http://h.test/a?id=7"
    assert got["http://x.test/a?id=1&sid=5"] == "http://x.test/a?id=1&sid=5"


MIRROR_PAGES = (
    # m1/m2 mirror each other on 3 of 4 signatures; m3 is disjoint
    [(f"http://m1.test/p/{i}", i) for i in range(4)]
    + [(f"http://m2.test/p/{i}", i) for i in range(3)]
    + [(f"http://m3.test/p/{i}", 1000 + i) for i in range(4)]
)


def test_mirror_hosts(spark):
    df = spark.createDataFrame(MIRROR_PAGES, ["url", "fp"])
    rows = mirror_hosts(df, min_shared=2, min_resemblance_milli=500).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["host_a"], r["host_b"]) == ("m1.test", "m2.test")
    assert (r["shared"], r["size_a"], r["size_b"]) == (3, 4, 3)
    assert r["resemblance_milli"] == (1000 * 3) // (4 + 3 - 3)  # 750


def test_mirror_hosts_sig_cap(spark):
    # a boilerplate signature on ALL hosts would pair everyone; the cap
    # drops it before the join
    boiler = [(f"http://m{h}.test/index", 7) for h in (1, 2, 3)]
    df = spark.createDataFrame(MIRROR_PAGES + boiler, ["url", "fp"])
    uncapped = mirror_hosts(df, min_shared=1, min_resemblance_milli=0)
    assert uncapped.count() == 3  # boilerplate links m3 to both
    capped = mirror_hosts(
        df, min_shared=1, min_resemblance_milli=0, max_hosts_per_sig=2
    ).collect()
    # cap also removes the signature from size counts (sizes revert)
    assert len(capped) == 1
    assert (capped[0]["host_a"], capped[0]["host_b"]) == ("m1.test", "m2.test")
    assert (capped[0]["size_a"], capped[0]["size_b"]) == (4, 3)


def test_mine_then_apply_reduces_frontier(spark):
    # composition: the aliases collapse — distinct alias count < urls
    df = spark.createDataFrame(PAGES, ["url", "fp"])
    rules = mine_param_rules(df, min_support=2)
    aliased = apply_param_rules(df, rules)
    n_urls = aliased.select("url").distinct().count()
    n_alias = aliased.select("alias_url").distinct().count()
    assert n_urls == len(PAGES)
    assert n_alias == 6  # h.test/{a?id=1, b?id=2, b?id=2&page={0,1}} + x.test pair


def test_apply_passes_unparseable_urls_through(spark):
    pages = spark.createDataFrame([("not-a-url",), ("http://h.test/a?sid=1",)], ["url"])
    rules = mine_param_rules(
        spark.createDataFrame(PAGES, ["url", "fp"]), min_support=2
    )
    got = {r["url"]: r["alias_url"] for r in apply_param_rules(pages, rules).collect()}
    assert got["not-a-url"] == "not-a-url"
    assert got["http://h.test/a?sid=1"] == "http://h.test/a"


def test_rel_canonical_extraction_edges(spark):
    from see_spark.operators.urlalias import rel_canonical_edges

    page = "http://a.test/p/x"
    cases = [
        # attribute order A / B, double + single quotes
        ('<link rel="canonical" href="http://c.test/1">', "http://c.test/1"),
        ('<link href="http://c.test/2" rel="canonical">', "http://c.test/2"),
        ("<link rel='canonical' href='http://c.test/3'>", "http://c.test/3"),
        # root-relative -> page origin
        ('<link rel="canonical" href="/y/z">', "http://a.test/y/z"),
        # protocol-relative is NOT root-relative: unresolved
        ('<link rel="canonical" href="//cdn.test/z">', None),
        # bare-relative: unresolved
        ('<link rel="canonical" href="sub/page">', None),
        # self-canonical
        (f'<link rel="canonical" href="{page}">', page),
    ]
    raw = spark.createDataFrame(
        [(page, f"<html><head>{tag}</head><body>hi</body></html>")
         for tag, _ in cases],
        "url string, body string",
    )
    got = [r["canonical_url"] for r in rel_canonical_edges(raw).collect()]
    assert got == [want for _, want in cases]

    rows = rel_canonical_edges(raw).collect()
    assert rows[3]["is_cross_host"] is False
    assert rows[4]["href_unresolved"] is True and rows[4]["is_self"] is None
    assert rows[6]["is_self"] is True

    # no tag -> no row; other <link> rels ignored
    none = spark.createDataFrame(
        [(page, '<html><head><link rel="stylesheet" href="/s.css">'
                "</head><body>hi</body></html>")],
        "url string, body string",
    )
    assert rel_canonical_edges(none).count() == 0
    # plan stays JVM-side
    plan = (rel_canonical_edges(raw)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
