"""Search parity: golden result sets (the integration suite analogue,
ct/see/see_SUITE.erl:55-66) + TF-IDF score parity vs the oracle math."""

import math

import pytest

from see_spark.core import rank as rank_kernel
from see_spark.operators.search import search
from see_spark.sources.fixtures import GOLDEN_QUERIES


@pytest.fixture(scope="module")
def search_env(spark, crawl_result):
    catalog, _, oracle = crawl_result
    postings = catalog.read("postings").cache()
    docs = catalog.read("docs").cache()
    page_count = catalog.read("frontier").count()
    return spark, postings, docs, page_count, oracle


@pytest.mark.parametrize("query", sorted(GOLDEN_QUERIES))
def test_golden_result_sets(search_env, query):
    spark, postings, docs, page_count, _ = search_env
    got = {r["url"] for r in search(spark, query, postings, docs, page_count).collect()}
    assert got == GOLDEN_QUERIES[query]


def test_scores_match_oracle_math(search_env):
    """Engine scores == pure-kernel recomputation (tf·idf over query
    multiset, N = ALL frontier rows, 1+df smoothing, natural log)."""
    spark, postings, docs, page_count, oracle = search_env
    from see_spark.core.text import extract_words

    for query in ("Chopin", "Alan Turing", "composer", "chopin chopin liszt"):
        words = extract_words(query)
        results = search(spark, query, postings, docs, page_count).collect()
        for row in results:
            url = row["url"]
            page_words = []
            for word, by_doc in oracle.postings.items():
                page_words.extend([word] * by_doc.get(url, 0))
            df_by_word = {w: len(oracle.postings.get(w, {})) for w in words}
            expected = rank_kernel.rank(words, page_words, page_count, df_by_word)
            assert row["score"] == pytest.approx(expected), (query, url)


def test_duplicate_query_words_multiply(search_env):
    spark, postings, docs, page_count, _ = search_env
    single = {r["url"]: r["score"] for r in search(spark, "enigma", postings, docs, page_count).collect()}
    triple = {r["url"]: r["score"] for r in search(spark, "enigma enigma enigma", postings, docs, page_count).collect()}
    assert set(single) == set(triple)
    for url in single:
        assert triple[url] == pytest.approx(3 * single[url])


def test_empty_and_missing_queries(search_env):
    spark, postings, docs, page_count, _ = search_env
    assert search(spark, "", postings, docs, page_count).count() == 0
    assert search(spark, "nosuchword", postings, docs, page_count).count() == 0
    # AND semantics: present word + missing word -> empty
    assert search(spark, "chopin nosuchword", postings, docs, page_count).count() == 0


def test_results_ordered_desc_score_url_tiebreak(search_env):
    spark, postings, docs, page_count, _ = search_env
    rows = search(spark, "chopin", postings, docs, page_count).collect()
    keys = [(-r["score"], r["url"]) for r in rows]
    assert keys == sorted(keys)


def test_search_with_word_stats_matches_derived(spark, crawl_result):
    """Reading df from the materialized word_stats table must produce
    byte-identical results to deriving df from postings per query."""
    from pyspark.sql import functions as F

    from see_spark.operators.indexer import document_frequencies

    catalog, _, _ = crawl_result
    postings = catalog.read("postings")
    docs = catalog.read("docs")
    page_count = catalog.read("frontier").count()
    word_stats = catalog.read("word_stats")

    # increments sum to the exact postings-derived df for every word
    summed = {
        r["word"]: r["df"]
        for r in word_stats.groupBy("word").agg(F.sum("df").alias("df")).collect()
    }
    derived = {
        r["word"]: r["df"] for r in document_frequencies(postings).collect()
    }
    assert summed == derived

    for query in ("chopin", "Alan Turing", "chopin chopin liszt"):
        via_table = search(
            spark, query, postings, docs, page_count, word_stats=word_stats
        ).collect()
        via_postings = search(spark, query, postings, docs, page_count).collect()
        assert [tuple(r) for r in via_table] == [tuple(r) for r in via_postings]


def test_negative_idf_ranks_common_words_low(search_env):
    """A word on >half the indexed corpus gets negative IDF (ln(N/(1+df)))
    only if df+1 > N — with unvisited rows in N this is rare; assert the
    formula end-to-end instead via a known df."""
    spark, postings, docs, page_count, oracle = search_env
    rows = search(spark, "chopin", postings, docs, page_count).collect()
    df = len(oracle.postings["chopin"])
    for row in rows:
        tf = oracle.postings["chopin"].get(row["url"], 0) / oracle.doc_len[row["url"]]
        assert row["score"] == pytest.approx(tf * math.log(page_count / (1 + df)))


def test_diversify_by_host_caps_and_cuts(spark):
    """Host collapse: a host flooding the top scores is capped at
    per_host; the freed slots go to the next-best other-host results;
    the plan keeps the TakeOrderedAndProject k-cut."""
    from see_spark.operators.search import diversify_by_host

    rows = (
        # big.test would fill the whole top-4 without the cap
        [(f"b{i}", "big.test", 100.0 - i) for i in range(4)]
        + [("o1", "other.test", 50.0), ("o2", "two.test", 40.0)]
    )
    r = spark.createDataFrame(rows, ["url", "host", "score"])
    got = [
        (x["url"], x["host_rank"])
        for x in diversify_by_host(r, k=4, per_host=2).collect()
    ]
    assert got == [("b0", 1), ("b1", 2), ("o1", 1), ("o2", 1)]
    plan = (
        diversify_by_host(r, k=4, per_host=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_collapse_duplicates_keeps_best_per_cluster(spark):
    from pyspark.sql import functions as F

    from see_spark.operators.search import collapse_duplicates

    results = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0), (4, 6.0), (5, 6.0)],
        "url long, score double",
    )
    # {1,3} one cluster (1 canonical), {2} alone, {4,5} tie cluster
    dmap = spark.createDataFrame(
        [(1, 1), (3, 1), (4, 4), (5, 4)], "doc_id long, canonical_id long"
    )
    rows = [
        (r["url"], r["canonical_id"], r["score"])
        for r in collapse_duplicates(results, dmap, k=10)
        .orderBy(F.desc("score"), F.asc("canonical_id")).collect()
    ]
    # 3 collapses under 1; the 4/5 score tie resolves to the lower url;
    # unmapped 2 is its own canonical
    assert rows == [(1, 1, 9.0), (2, 2, 8.0), (4, 4, 6.0)]


def test_percolate_conjunctive_semantics(spark):
    from see_spark.operators.search import percolate

    postings = spark.createDataFrame(
        [(1, "apple"), (1, "banana"), (2, "apple"), (3, "banana"),
         (3, "cherry"), (3, "apple")],
        "doc_id long, word string",
    )
    standing = spark.createDataFrame(
        [(10, "apple"), (11, "apple"), (11, "banana"),
         (12, "apple"), (12, "banana"), (12, "cherry"),
         (13, "durian")],
        "query_id long, word string",
    )
    got = {(r["doc_id"], r["query_id"]): r["n_matched"]
           for r in percolate(postings, standing).collect()}
    assert got == {
        (1, 10): 1, (2, 10): 1, (3, 10): 1,   # single-word query: all
        (1, 11): 2, (3, 11): 2,               # two-word AND: docs 1 and 3
        (3, 12): 3,                           # three-word AND: doc 3 only
    }                                         # query 13 matches nothing
    # duplicated subscription words don't change semantics
    dup = standing.unionByName(standing)
    assert sorted(map(tuple, percolate(postings, dup).collect())) == sorted(
        (d, q, n) for (d, q), n in got.items()
    )


def test_more_like_this_excludes_source_and_ranks_shared_vocab(spark):
    from see_spark.operators.search import more_like_this
    from pyspark.sql import functions as F

    docs = [
        # source repeats its distinctive vocabulary so tf (not the
        # alphabetical tie-break) decides the keyword cut
        (1, "photovoltaic photovoltaic wafer wafer inverter inverter "
            "electricity grid"),
        (2, "photovoltaic wafer inverter homes cheap"),
        (3, "electricity grid maintenance schedule report"),
        (4, "pasta basil recipe cooking tonight"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).groupBy("doc_id", "word").count().withColumnRenamed("count", "term_count")
    postings = toks.withColumn(
        "doc_len",
        F.sum("term_count").over(__import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy("doc_id")),
    ).withColumn("tf", F.col("term_count") / F.col("doc_len"))
    res = more_like_this(postings, source_id=1, page_count=4, m=4, k=3).collect()
    ids = [r["doc_id"] for r in res]
    assert 1 not in ids                    # source never returned
    assert ids[0] == 2                     # the near-duplicate ranks first
    assert 4 not in ids or res[-1]["doc_id"] == 4


def test_facet_counts_hand_fixture(spark):
    """Counts per facet value restricted to the result page; facets
    stacked as (facet, value, n)."""
    from pyspark.sql import functions as F

    from see_spark.operators.search import facet_counts

    docs = spark.createDataFrame(
        [(1, "en", "web"), (2, "en", "news"), (3, "de", "web"),
         (4, "de", "web")],
        "doc_id long, lang string, source string",
    )
    results = spark.createDataFrame([(1,), (3,), (4,)], "doc_id long")
    got = {
        (r["facet"], r["value"]): r["n"]
        for r in facet_counts(results, docs, ["lang", "source"]).collect()
    }
    assert got == {
        ("lang", "en"): 1, ("lang", "de"): 2, ("source", "web"): 3,
    }
