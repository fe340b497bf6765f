"""Winnowing fingerprints: closed-form selection == the paper's scan."""

import random

from pyspark.sql import functions as F


def _brute_select(hashes, w):
    """Schleimer et al. 2003 definition: for each length-w window record
    the rightmost minimal hash position; dedupe. n < w => one window."""
    n = len(hashes)
    if n == 0:
        return set()
    picked = set()
    if n < w:
        windows = [(0, n)]
    else:
        windows = [(s, s + w) for s in range(0, n - w + 1)]
    for lo, hi in windows:
        best = min(range(lo, hi), key=lambda i: (hashes[i], -i))
        picked.add(best)
    return picked


def _spark_select(spark, hashes, w):
    from see_spark.operators.winnow import winnow_select

    rows = [(1, i, h) for i, h in enumerate(hashes)]
    df = spark.createDataFrame(rows, "doc_id long, pos long, khash long")
    out = winnow_select(df, w=w).collect()
    return {r["pos"] for r in out if r["selected"]}


def test_winnow_closed_form_matches_sequential_scan(spark):
    rng = random.Random(7)
    for trial in range(12):
        n = rng.choice([1, 2, 3, 4, 5, 9, 20, 40])
        w = rng.choice([2, 3, 4, 6])
        # small hash range forces plenty of ties -> exercises tie-break
        hashes = [rng.randrange(8) for _ in range(n)]
        assert _spark_select(spark, hashes, w) == _brute_select(hashes, w), (
            n, w, hashes)


def test_winnow_guarantee_shared_passage_yields_shared_fingerprint(spark):
    """Any shared token run of length >= w + k - 1 must share a selected
    fingerprint (the paper's coverage guarantee)."""
    from see_spark.operators.positional import positional_postings
    from see_spark.operators.winnow import winnow_matches

    passage = "alpha bravo charlie delta echo foxtrot golf hotel india"
    docs = spark.createDataFrame(
        [
            (1, "unrelated words before " + passage + " tail one"),
            (2, passage + " completely different ending here now"),
            (3, "totally disjoint vocabulary nothing matches at all ok"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in winnow_matches(
            positional_postings(docs), k=3, w=4, min_shared=1
        ).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnow_density_near_expected(spark):
    from see_spark.operators.positional import positional_postings
    from see_spark.operators.winnow import winnow_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = winnow_stats(positional_postings(docs), k=3, w=4)
    agg = stats.agg(
        F.sum("n_selected").alias("s"), F.sum("n_kgrams").alias("n")
    ).collect()[0]
    density = agg["s"] / agg["n"]
    # expected 2/(w+1) = 0.4 on random-ish text; generous band
    assert 0.25 < density < 0.6, density


def test_winnow_max_df_cap_drops_ubiquitous_fingerprints(spark):
    from see_spark.operators.positional import positional_postings
    from see_spark.operators.winnow import winnow_matches

    shared = "common header text repeated on every single page here"
    docs = spark.createDataFrame(
        [(i, shared) for i in range(1, 7)], "doc_id long, text string"
    )
    pp = positional_postings(docs)
    # cap below the 6-doc ubiquity -> no pairs at all
    assert winnow_matches(pp, max_df=3, min_shared=1).count() == 0
    # cap above -> all 15 pairs
    assert winnow_matches(pp, max_df=10, min_shared=1).count() == 15


def test_template_mass_flags_host_boilerplate(spark):
    from see_spark.operators.positional import positional_postings
    from see_spark.operators.winnow import fingerprints, template_mass

    nav = "navigation home about contact products categories sitemap legal "
    bodies = [
        "unique article alpha discusses rivers and mountains today",
        "another piece beta about oceans skies and weather patterns",
        "third story gamma covering forests deserts and canyons well",
        "fourth entry delta regarding cities towns and villages here",
    ]
    docs = spark.createDataFrame(
        [(i, nav + b) for i, b in enumerate(bodies)]
        + [(99, "lone page on its own single host " * 3)],
        "doc_id long, text string",
    )
    hosts = spark.createDataFrame(
        [(i, "big.test") for i in range(4)] + [(99, "solo.test")],
        "doc_id long, host string",
    )
    fps = fingerprints(positional_postings(docs)).select("doc_id", "khash")
    rows = {r["doc_id"]: r for r in
            template_mass(fps, hosts, share_milli=500, min_docs=3).collect()}
    # every big.test doc carries some template fingerprints, none is 100%
    for i in range(4):
        assert rows[i]["n_template"] > 0, rows[i]
        assert 0 < rows[i]["template_milli"] < 1000, rows[i]
    # single-doc host: below min_docs evidence -> nothing is template
    assert rows[99]["n_template"] == 0


def test_best_window_snippets_picks_densest_window(spark):
    from see_spark.operators.positional import (
        best_window_snippets, positional_postings,
    )
    from see_spark.functions.udfs import tokenize_expr
    from pyspark.sql import functions as F

    text = ("query appears here alone filler filler filler filler filler "
            "filler then query join query cluster sits here at the end")
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    toks = docs.select("doc_id", tokenize_expr(F.col("text")).alias("toks"))
    out = best_window_snippets(
        positional_postings(docs), toks, ["query", "join"], width=5
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["density"] == 3                      # query join query
    assert r["snippet"].startswith("query join query")
