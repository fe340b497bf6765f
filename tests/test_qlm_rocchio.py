"""Dirichlet query-likelihood vs hand-computed scores (incl. the length
prior and unseen-term drop), and Rocchio PRF behavior: expansion terms
come from feedback docs only, original query words are never expansion
terms, and OR re-ranking surfaces docs that miss a query word."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from see_spark.operators.search import search_qlm, search_rocchio

# postings contract: (doc_id, word, term_count, doc_len)
POSTINGS = [
    (1, "cat", 2, 4), (1, "dog", 1, 4), (1, "fish", 1, 4),
    # doc 2: same tf for cat but twice the length -> QL length prior
    (2, "cat", 2, 8), (2, "bird", 6, 8),
    (3, "dog", 3, 3),
]


def _pdf(spark, rows=POSTINGS):
    return spark.createDataFrame(
        rows, "doc_id long, word string, term_count long, doc_len long"
    )


def _docs(spark):
    return spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 4)], "doc_id long, title string"
    )


def _qlm_ref(query_words, postings, mu):
    by_doc, cf, dls = {}, {}, {}
    for d, w, tc, dl in postings:
        by_doc.setdefault(d, {})[w] = tc
        cf[w] = cf.get(w, 0) + tc
        dls[d] = dl
    c = float(sum(dls[d] for d in dls for _ in [0]))  # sum over distinct docs
    c = float(sum(dls.values()))
    seen = [w for w in query_words if cf.get(w, 0) > 0]
    qtot = float(len(seen))
    out = {}
    for d, words in by_doc.items():
        s = 0.0
        hit = False
        for w in seen:
            if w in words:
                hit = True
                s += math.log(1.0 + (words[w] * c) / (mu * cf[w]))
        if hit:
            out[d] = round(s - qtot * math.log(dls[d] + mu), 9)
    return out


def test_qlm_matches_hand_scores(spark):
    got = {
        r["url"]: r["score"]
        for r in search_qlm(
            spark, "cat dog", _pdf(spark), _docs(spark), mu=100.0
        ).collect()
    }
    want = _qlm_ref(["cat", "dog"], POSTINGS, 100.0)
    assert got.keys() == want.keys()
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9)


def test_qlm_length_prior_penalizes_long_doc(spark):
    # docs 1 and 2 have identical cat tf; doc 2 is twice as long ->
    # strictly lower QL score on query "cat"
    got = {
        r["url"]: r["score"]
        for r in search_qlm(
            spark, "cat", _pdf(spark), _docs(spark), mu=100.0
        ).collect()
    }
    assert got[1] > got[2]


def test_qlm_drops_unseen_terms(spark):
    # "cat zebra": zebra has cf=0 -> dropped; scores equal plain "cat"
    a = {
        r["url"]: r["score"]
        for r in search_qlm(
            spark, "cat zebra", _pdf(spark), _docs(spark), mu=100.0
        ).collect()
    }
    b = {
        r["url"]: r["score"]
        for r in search_qlm(
            spark, "cat", _pdf(spark), _docs(spark), mu=100.0
        ).collect()
    }
    assert a == b
    # all-unseen query -> empty result, stable schema
    empty = search_qlm(spark, "zebra yak", _pdf(spark), _docs(spark))
    assert empty.count() == 0
    assert empty.columns == ["url", "title", "score"]


# Rocchio corpus: docs 1-2 match both query words and share the topic
# term "neural"; doc 4 has "neural" but NOT both query words — only the
# expanded OR re-rank can surface it.
R_POSTINGS = [
    (1, "deep", 2, 6), (1, "learning", 2, 6), (1, "neural", 2, 6),
    (2, "deep", 1, 6), (2, "learning", 3, 6), (2, "neural", 2, 6),
    (3, "deep", 1, 2), (3, "cooking", 1, 2),
    (4, "neural", 5, 6), (4, "network", 1, 6),
]


def test_rocchio_expands_and_surfaces_or_matches(spark):
    res = search_rocchio(
        spark,
        "deep learning",
        _pdf(spark, R_POSTINGS),
        page_count=4,
        fb_k=2,
        n_exp=2,
        alpha=1.0,
        beta=0.5,
    ).collect()
    ids = [r["doc_id"] for r in res]
    # doc 4 matches only the expansion term "neural" yet is ranked
    assert 4 in ids
    # conjunctive round-1 docs still present
    assert 1 in ids and 2 in ids
    by_id = {r["doc_id"]: r for r in res}
    # doc 3 matches only "deep" (one original word), scored via OR
    assert by_id[3]["n_words"] == 1


def test_rocchio_never_expands_query_words(spark):
    # degenerate corpus where query words dominate the fb docs: the
    # expansion set must still exclude them — doc 5 contains ONLY query
    # words, so if they were expandable its score would change with beta
    rows = R_POSTINGS + [(5, "deep", 4, 4)]
    a = search_rocchio(
        spark, "deep learning", _pdf(spark, rows), page_count=5,
        fb_k=2, n_exp=2, alpha=1.0, beta=0.0,
    ).collect()
    b = search_rocchio(
        spark, "deep learning", _pdf(spark, rows), page_count=5,
        fb_k=2, n_exp=2, alpha=1.0, beta=1000.0,
    ).collect()
    sa = {r["doc_id"]: r["score"] for r in a}
    sb = {r["doc_id"]: r["score"] for r in b}
    # doc 5's score is driven by query words only -> identical under any
    # beta iff no query word leaked into the expansion set
    assert sa[5] == pytest.approx(sb[5], abs=1e-9)
    # but the expansion DID change other docs' scores
    assert sa[4] != pytest.approx(sb[4], abs=1e-9)


def test_rocchio_partitioning_invariant(spark):
    pdf = _pdf(spark, R_POSTINGS)
    a = [tuple(r) for r in search_rocchio(
        spark, "deep learning", pdf, page_count=4, fb_k=2, n_exp=2
    ).collect()]
    b = [tuple(r) for r in search_rocchio(
        spark, "deep learning", pdf.repartition(7), page_count=4,
        fb_k=2, n_exp=2,
    ).collect()]
    assert a == b
