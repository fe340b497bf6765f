"""Impact-index pruned top-k (operators/search.py:search_or_pruned):
prefix construction, certificate-gated exactness vs the flat path across
adversarial distributions (negative idf, heavy ties), and the
fallback-vs-pruned arm taken."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import see_spark.operators.search as search_mod
from see_spark.operators.search import (
    build_impact_index,
    search_or,
    search_or_pruned,
)

N_DOCS = 200


@pytest.fixture(scope="module")
def corpus(spark):
    """(postings, docs): 'common' in every doc (idf < 0 at page_count =
    N_DOCS), 'mid' in 50, 'rare' in 5; tf a deterministic function of
    doc_id with many exact cross-doc ties."""
    rows = []
    for d in range(N_DOCS):
        rows.append(("common", d, ((d * 7) % 13 + 1) / 100.0))
        if d % 4 == 0:
            rows.append(("mid", d, ((d * 11) % 17 + 1) / 100.0))
        if d % 40 == 0:
            rows.append(("rare", d, ((d * 3) % 5 + 1) / 100.0))
    postings = spark.createDataFrame(rows, ["word", "doc_id", "tf"])
    docs = spark.createDataFrame(
        [(d, f"title-{d}") for d in range(N_DOCS)], ["doc_id", "title"]
    )
    return postings, docs


def _rows(df):
    return [(r["url"], r["title"], r["score"]) for r in df.collect()]


def test_impact_prefix_pinned(spark):
    postings = spark.createDataFrame(
        [("w", 1, 0.5), ("w", 2, 0.5), ("w", 3, 0.9), ("w", 4, 0.1)],
        ["word", "doc_id", "tf"],
    )
    impact, stats = build_impact_index(postings, c=2)
    got = sorted((r["doc_id"], r["tf"]) for r in impact.collect())
    # top-2 by tf desc, doc_id asc tie-break: doc 3 (0.9), doc 1 (0.5)
    assert got == [(1, 0.5), (3, 0.9)]
    s = stats.collect()[0]
    assert s["n_postings"] == 4 and s["cth_tf"] == 0.5


def test_impact_prefix_short_word_null_cth(spark):
    postings = spark.createDataFrame([("w", 1, 0.5)], ["word", "doc_id", "tf"])
    _, stats = build_impact_index(postings, c=2)
    assert stats.collect()[0]["cth_tf"] is None


@pytest.mark.parametrize("k,c", [(10, 60), (5, 2), (25, 100), (100, 4)])
def test_pruned_equals_flat(spark, corpus, k, c):
    postings, docs = corpus
    q = "common mid rare mid"  # qcount: mid=2 — multiplicity exercised
    flat = search_or(spark, q, postings, docs, N_DOCS, k=k)
    pruned = search_or_pruned(spark, q, postings, docs, N_DOCS, k=k, c=c)
    assert _rows(pruned) == _rows(flat)


def test_certified_path_skips_flat(spark, corpus, monkeypatch):
    """With a generous prefix the certificate holds and search_or must
    NOT be invoked — proves the pruned arm actually served the result."""
    postings, docs = corpus

    def boom(*a, **kw):  # pragma: no cover - failure signal only
        raise AssertionError("fallback taken despite certificate")

    monkeypatch.setattr(search_mod, "search_or", boom)
    res = search_or_pruned(
        spark, "common mid rare", postings, docs, N_DOCS, k=10, c=60
    )
    assert len(_rows(res)) == 10


def test_tiny_prefix_falls_back(spark, corpus, monkeypatch):
    """c=1 cannot certify k=10 — the fallback arm must run (and the
    result, served by the flat path, stays exact)."""
    postings, docs = corpus
    calls = {"n": 0}
    real = search_mod.search_or

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(search_mod, "search_or", counting)
    res = search_or_pruned(
        spark, "common mid rare", postings, docs, N_DOCS, k=10, c=1
    )
    assert calls["n"] == 1
    flat = real(spark, "common mid rare", postings, docs, N_DOCS, k=10)
    assert _rows(res) == _rows(flat)


def test_materialized_impact_pair(spark, corpus):
    """Passing a prebuilt (impact, stats) pair — the index-time path —
    gives the same answer as the on-the-fly build."""
    postings, docs = corpus
    impact, stats = build_impact_index(postings, c=60)
    a = search_or_pruned(
        spark, "common mid", postings, docs, N_DOCS, k=10, c=60,
        impact=impact, impact_stats=stats,
    )
    b = search_or_pruned(spark, "common mid", postings, docs, N_DOCS, k=10, c=60)
    assert _rows(a) == _rows(b)


def test_empty_query(spark, corpus):
    postings, docs = corpus
    assert search_or_pruned(spark, "  ", postings, docs, N_DOCS).count() == 0
