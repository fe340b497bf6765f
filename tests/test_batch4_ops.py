"""Unit tests for batch-4 operators: lexicon (fuzzy expansion, trigram
substring search), disjunctive / fielded ranking, posting gap stats, and
priority (in-degree) checkout. Cross-engine exact parity for all of these
is separately asserted by the DuckDB gate (scripts/check_correctness.py);
these tests pin semantics on hand-built corpora."""

import pytest
from pyspark.sql import functions as F


# --- lexicon: fuzzy expansion ------------------------------------------------


def _vocab(spark, words):
    return spark.createDataFrame([(w, 1) for w in words], "word string, df int")


def test_fuzzy_expand_multi_match(spark):
    from see_spark.operators.lexicon import fuzzy_expand

    vocab = _vocab(spark, ["slow", "row", "sort", "query"])
    out = {
        (r["term"], r["word"]): r["dist"]
        for r in fuzzy_expand(spark, ["sow"], vocab).collect()
    }
    # 'sow' reaches BOTH slow (insert 'l') and row (substitute s->r)
    assert out == {("sow", "slow"): 1, ("sow", "row"): 1}


def test_fuzzy_expand_exact_hit_is_dist_zero(spark):
    from see_spark.operators.lexicon import fuzzy_expand

    vocab = _vocab(spark, ["table", "tables"])
    out = {
        (r["term"], r["word"]): r["dist"]
        for r in fuzzy_expand(spark, ["table"], vocab).collect()
    }
    assert out == {("table", "table"): 0, ("table", "tables"): 1}


def test_fuzzy_expand_respects_max_dist(spark):
    from see_spark.operators.lexicon import fuzzy_expand

    vocab = _vocab(spark, ["table"])
    assert fuzzy_expand(spark, ["tbl"], vocab, max_dist=1).count() == 0
    out = fuzzy_expand(spark, ["tbl"], vocab, max_dist=2).collect()
    assert [(r["word"], r["dist"]) for r in out] == [("table", 2)]


def test_fuzzy_expand_empty_terms(spark):
    from see_spark.operators.lexicon import fuzzy_expand

    vocab = _vocab(spark, ["x1"])
    assert fuzzy_expand(spark, [], vocab).count() == 0


# --- lexicon: trigram substring ----------------------------------------------


def test_trigram_index_shape(spark):
    from see_spark.operators.lexicon import trigram_index

    vocab = _vocab(spark, ["abcd", "ab", "aaa"])
    rows = {(r["trigram"], r["word"]) for r in trigram_index(vocab).collect()}
    # 'ab' is below the trigram floor; 'aaa' collapses to one distinct row
    assert rows == {("abc", "abcd"), ("bcd", "abcd"), ("aaa", "aaa")}


def test_substring_match_verifies_contains(spark):
    """A word can contain every trigram of the pattern WITHOUT containing
    the pattern ('abcab' has 'cab' and 'abc' but not 'cabc') — the
    contains verification must drop it; true matches survive."""
    from see_spark.operators.lexicon import substring_match, trigram_index

    vocab = _vocab(spark, ["abcab", "xcabcx", "cabc", "zzz"])
    idx = trigram_index(vocab)
    got = {r["word"] for r in substring_match(idx, "cabc").collect()}
    assert got == {"xcabcx", "cabc"}


def test_substring_match_equals_contains_scan(spark):
    from see_spark.operators.lexicon import substring_match, trigram_index

    words = ["spark", "part", "partition", "sparse", "apart", "par", "pr"]
    vocab = _vocab(spark, words)
    got = {r["word"] for r in substring_match(trigram_index(vocab), "par").collect()}
    assert got == {w for w in words if "par" in w}


def test_substring_match_rejects_short_pattern(spark):
    from see_spark.operators.lexicon import substring_match, trigram_index

    idx = trigram_index(_vocab(spark, ["abc"]))
    with pytest.raises(ValueError):
        substring_match(idx, "ab")


def test_substring_search_ranks_by_hits(spark):
    from see_spark.operators.lexicon import substring_search, trigram_index

    vocab = _vocab(spark, ["spark", "part", "row"])
    idx = trigram_index(vocab)
    postings = spark.createDataFrame(
        [  # doc 1: spark x3; doc 2: spark x1 + part x1; doc 3: row only
            (1, "spark", 3),
            (2, "spark", 1),
            (2, "part", 1),
            (3, "row", 9),
        ],
        "doc_id long, word string, term_count long",
    )
    out = substring_search(postings, idx, "par", k=10).collect()
    assert [(r["doc_id"], r["n_words"], r["hits"]) for r in out] == [
        (1, 1, 3),
        (2, 2, 2),
    ]


# --- disjunctive + fielded ranking -------------------------------------------


def _mini_corpus(spark):
    """3 docs over a 3-word vocab; postings carry tf = term_count/doc_len."""
    rows = [  # (doc_id, word, term_count, doc_len)
        (1, "cat", 2, 4),
        (1, "dog", 2, 4),
        (2, "cat", 1, 2),
        (2, "fox", 1, 2),
        (3, "fox", 3, 3),
    ]
    postings = spark.createDataFrame(
        rows, "doc_id long, word string, term_count long, doc_len long"
    ).withColumn("tf", F.col("term_count") / F.col("doc_len"))
    docs = spark.createDataFrame(
        [(1, "t1"), (2, "t2"), (3, "t3")], "doc_id long, title string"
    )
    return postings, docs


def test_search_or_superset_of_and(spark):
    from see_spark.operators.search import search, search_or

    postings, docs = _mini_corpus(spark)
    and_urls = {
        r["url"] for r in search(spark, "cat dog", postings, docs, 3).collect()
    }
    or_urls = {
        r["url"] for r in search_or(spark, "cat dog", postings, docs, 3).collect()
    }
    assert and_urls == {1}          # only doc 1 has both
    assert or_urls == {1, 2}        # doc 2 matches 'cat' alone
    assert and_urls <= or_urls


def test_search_or_single_word_equals_and(spark):
    import math

    from see_spark.operators.search import search, search_or

    postings, docs = _mini_corpus(spark)
    a = {
        r["url"]: r["score"]
        for r in search(spark, "fox", postings, docs, 3).collect()
    }
    o = {
        r["url"]: r["score"]
        for r in search_or(spark, "fox", postings, docs, 3).collect()
    }
    assert set(a) == set(o)
    for u in a:
        assert o[u] == pytest.approx(a[u], abs=1e-6)
    # hand value: doc 3 tf=1.0, df(fox)=2, idf=ln(3/3)=0 -> score 0
    assert o[3] == pytest.approx(0.0)
    # doc 2: tf=0.5, score = 0.5*ln(1.0) = 0
    assert o[2] == pytest.approx(0.0)
    # sanity on a negative-idf-free word with df=1
    s = {
        r["url"]: r["score"]
        for r in search_or(spark, "dog", postings, docs, 3).collect()
    }
    assert s[1] == pytest.approx(0.5 * math.log(3 / 2.0), abs=1e-6)


def test_search_fielded_title_only_word_uses_df_zero(spark):
    import math

    from see_spark.operators.search import search_fielded

    body, docs = _mini_corpus(spark)
    # title postings: doc 2's title contains 'owl' (absent from all bodies)
    title = spark.createDataFrame(
        [(2, "owl", 1, 1)],
        "doc_id long, word string, term_count long, doc_len long",
    ).withColumn("tf", F.col("term_count") / F.col("doc_len"))
    out = {
        r["url"]: r["score"]
        for r in search_fielded(
            spark, "owl", body, title, docs, 3, title_weight=2.0
        ).collect()
    }
    # df(owl)=0 in the body field -> idf = ln(3/1); tf_title=1, weight 2
    assert set(out) == {2}
    assert out[2] == pytest.approx(2.0 * math.log(3.0), abs=1e-6)


def test_search_fielded_boost_reorders(spark):
    from see_spark.operators.search import search_fielded, search_or

    body, docs = _mini_corpus(spark)
    # both doc 1 and doc 2 match 'cat' in body (doc1 tf=0.5 > doc2 tf=0.5?
    # doc1: 2/4=0.5, doc2: 1/2=0.5 — tie); title hit on doc 2 breaks it
    title = spark.createDataFrame(
        [(2, "cat", 1, 1)],
        "doc_id long, word string, term_count long, doc_len long",
    ).withColumn("tf", F.col("term_count") / F.col("doc_len"))
    # page_count=10 (N counts ALL frontier rows, legitimately > indexed
    # docs) keeps idf(cat)=ln(10/3) positive so the boost is visible
    plain = search_or(spark, "cat", body, docs, 10).collect()
    boosted = search_fielded(spark, "cat", body, title, docs, 10).collect()
    # same candidates, doc 2 strictly above doc 1 after the boost
    b = {r["url"]: r["score"] for r in boosted}
    p = {r["url"]: r["score"] for r in plain}
    assert set(b) == set(p) == {1, 2}
    assert b[2] > b[1]


# --- posting gap stats -------------------------------------------------------


def test_posting_gap_stats_hand_values(spark):
    from see_spark.operators.indexstats import posting_gap_stats

    postings = spark.createDataFrame(
        [("w", 1), ("w", 3), ("w", 11), ("solo", 42)],
        "word string, doc_id long",
    )
    out = {r["word"]: r for r in posting_gap_stats(postings).collect()}
    w = out["w"]
    # gaps: 3-1=2, 11-3=8 -> avg 5.0, max 8, bits = len('10')+len('1000')=6
    assert (w["n_docs"], w["avg_gap"], w["max_gap"], w["gap_bits"]) == (
        3,
        5.0,
        8,
        6,
    )
    s = out["solo"]
    assert s["n_docs"] == 1
    assert s["avg_gap"] is None and s["max_gap"] is None and s["gap_bits"] is None


# --- priority checkout -------------------------------------------------------


def _priority_frontier(spark):
    rows = []
    for i in range(40):
        host = f"h{i % 4}"
        rows.append(
            (f"http://{host}/p{i}", host, i % 3, i, "unvisited" if i % 5 else "visited")
        )
    f = spark.createDataFrame(
        rows, "url string, host string, depth long, seq long, state string"
    ).withColumn("url_hash", F.xxhash64("url"))
    ind = spark.createDataFrame(
        [(f"http://h{i % 4}/p{i}", (i * 7) % 13) for i in range(0, 40, 2)],
        "url string, indegree long",
    )
    return f, ind


def test_checkout_prioritized_semantics(spark):
    from see_spark.operators.frontier import checkout_prioritized

    f, ind = _priority_frontier(spark)
    batch = checkout_prioritized(f, ind, host_budget=2).collect()
    # reference computation in plain Python
    fr = {r["url"]: r for r in f.collect() if r["state"] == "unvisited"}
    deg = {r["url"]: r["indegree"] for r in ind.collect()}
    by_host: dict = {}
    for url, r in fr.items():
        by_host.setdefault(r["host"], []).append(
            (-deg.get(url, 0), r["depth"], r["seq"], url)
        )
    expect = []
    for host, lst in by_host.items():
        expect += sorted(lst)[:2]
    expect.sort()
    got = sorted(
        (-r["priority"], r["depth"], r["seq"], r["url"]) for r in batch
    )
    assert got == expect
    # fetch_order is dense over the same total order
    order = {r["fetch_order"]: (-r["priority"], r["depth"], r["seq"]) for r in batch}
    assert sorted(order) == list(range(len(batch)))
    assert [order[i] for i in sorted(order)] == sorted(order.values())


def test_checkout_prioritized_deterministic_across_partitioning(spark):
    from see_spark.operators.frontier import checkout_prioritized

    f, ind = _priority_frontier(spark)
    a = checkout_prioritized(f.repartition(1), ind, host_budget=3).collect()
    b = checkout_prioritized(f.repartition(7, "host"), ind, host_budget=3).collect()
    key = lambda rows: sorted((r["url"], r["fetch_order"], r["priority"]) for r in rows)
    assert key(a) == key(b)


def test_error_backoff_gap_values_and_checkout_composition(spark):
    from see_spark.operators.frontier import checkout, error_backoff_gap

    rows = []
    # host e1: 1 error -> gap 2; e3: 3 errors -> gap 8 capped to 6;
    # clean: no errors -> absent from the gap dim (defaults to min_gap)
    for host, n_err in (("e1.test", 1), ("e3.test", 3), ("clean.test", 0)):
        for i in range(n_err):
            rows.append((f"http://{host}/err{i}", host, 0, len(rows), "error"))
        rows.append((f"http://{host}/next", host, 0, len(rows), "unvisited"))
    f = spark.createDataFrame(
        rows, "url string, host string, depth long, seq long, state string"
    ).withColumn("url_hash", F.xxhash64("url"))

    gaps = {r["host"]: r["gap_rounds"]
            for r in error_backoff_gap(f, base_gap=1, cap_rounds=6).collect()}
    assert gaps == {"e1.test": 2, "e3.test": 6}

    hoststats = spark.createDataFrame(
        [(h, 4, 0) for h in ("e1.test", "e3.test", "clean.test")],
        "host string, last_fetch_round int, fetched_total long",
    )
    # round 7: last=4 -> waited 3 rounds; e1 (gap 2) and clean (gap 1)
    # eligible, e3 (gap 6) still backing off
    batch = checkout(
        f, hoststats, round_no=7, host_budget=1, min_gap_rounds=1,
        host_gap=error_backoff_gap(f, base_gap=1, cap_rounds=6),
    ).collect()
    assert sorted(r["host"] for r in batch) == ["clean.test", "e1.test"]


def test_zipf_fit_recovers_known_slope(spark):
    """A synthetic corpus built with freq(rank) = C * rank^-1 must fit
    slope ≈ -1000 milli; partitioning must not move a single milli."""
    from pyspark.sql import functions as F

    from see_spark.operators.indexstats import zipf_fit

    rows = [(f"w{r:04d}", 1, int(100000 / r)) for r in range(1, 201)]
    postings = spark.createDataFrame(
        rows, "word string, doc_id long, term_count long"
    )
    out = zipf_fit(postings, top_n=200).collect()[0]
    assert out["n_words"] == 200
    assert out["top_freq"] == 100000
    assert -1010 <= out["slope_milli"] <= -990
    again = zipf_fit(postings.repartition(16), top_n=200).collect()[0]
    assert tuple(again) == tuple(out)


def test_hot_term_cache_plan_boundary_rules(spark):
    """The hot set is the smallest prefix covering the mass threshold;
    the top term is hot even when it alone exceeds the threshold."""
    from see_spark.operators.indexstats import hot_term_cache_plan

    access = spark.createDataFrame(
        [("a", 70), ("b", 20), ("c", 9), ("d", 1)],
        "word string, n_queries long",
    )
    rows = {r["word"]: r for r in
            hot_term_cache_plan(access, hot_mass_milli=800).collect()}
    # cum milli: a=700, b=900, c=990, d=1000
    assert rows["a"]["is_hot"] is True and rows["a"]["cum_milli"] == 700
    assert rows["b"]["is_hot"] is False
    assert rows["d"]["cum_rank"] == 4
    # threshold below the top term's own mass: first term still hot
    only_top = {r["word"]: r["is_hot"] for r in
                hot_term_cache_plan(access, hot_mass_milli=100).collect()}
    assert only_top == {"a": True, "b": False, "c": False, "d": False}


def test_sitemap_coverage_three_ratio_arms(spark):
    from see_spark.operators.robots import sitemap_coverage

    declared = spark.createDataFrame(
        [("h.test", "http://h.test/1"), ("h.test", "http://h.test/2"),
         ("h.test", "http://h.test/3"), ("h.test", "http://h.test/ghost")],
        "host string, url string",
    )
    frontier = spark.createDataFrame(
        [("http://h.test/1", "h.test", "visited"),
         ("http://h.test/2", "h.test", "unvisited"),
         ("http://h.test/3", "h.test", "visited")],
        "url string, host string, state string",
    )
    r = sitemap_coverage(declared, frontier).collect()[0]
    assert (r["n_declared"], r["n_discovered"], r["n_fetched"]) == (4, 3, 2)
    assert r["discovered_milli"] == 750 and r["fetched_milli"] == 500


def test_search_bm25f_saturates_after_field_combination(spark):
    """The CIKM'04 headline property: occurrences in a SECOND field keep
    counting because saturation applies to the combined tfn — plus the
    hand-computed score and cross-field conjunctive matching."""
    import math

    from see_spark.operators.search import search_bm25f

    body, docs = _mini_corpus(spark)
    # identical bodies for docs 1 and 2 on 'cat'; doc 2 also titles it
    title = spark.createDataFrame(
        [(2, "cat", 1, 2), (2, "owl", 1, 2)],
        "doc_id long, word string, term_count long, title_len long",
    )
    out = {
        r["url"]: r["score"]
        for r in search_bm25f(
            spark, "cat", body, title, docs, 3,
            k1=1.2, b_body=0.75, b_title=0.6, w_body=1.0, w_title=3.0,
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[2] > out[1]
    # hand computation for doc 2: avg body len = (4+2+3)/3 = 3, avg title
    # len = 2; body wtf = 1*1/(0.25 + 0.75*2/3), title wtf = 3*1/(0.4 +
    # 0.6*2/2); df(cat) = 2 (docs 1, 2 in either field), N = 3
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    tfn2 = 1.0 / (0.25 + 0.75 * 2 / 3) + 3.0 / (0.4 + 0.6)
    tfn1 = 2.0 / (0.25 + 0.75 * 4 / 3)
    assert out[2] == pytest.approx(idf * tfn2 / (1.2 + tfn2), abs=1e-6)
    assert out[1] == pytest.approx(idf * tfn1 / (1.2 + tfn1), abs=1e-6)


def test_search_bm25f_conjunctive_across_fields(spark):
    """A doc matching one query word only in its TITLE still satisfies
    the conjunctive gate; docs missing a word in both fields drop."""
    from see_spark.operators.search import search_bm25f

    body, docs = _mini_corpus(spark)
    title = spark.createDataFrame(
        [(1, "fox", 1, 1)],
        "doc_id long, word string, term_count long, title_len long",
    )
    got = {
        r["url"]
        for r in search_bm25f(spark, "cat fox", body, title, docs, 3).collect()
    }
    # doc 1: cat in body + fox in title; doc 2: both in body; doc 3: fox only
    assert got == {1, 2}
