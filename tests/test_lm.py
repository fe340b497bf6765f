"""Bigram-LM perplexity scoring (operators/lm.py): hand-computed NLL
parity, quality-ordering semantics (reference-like text scores lower),
OOV uniform-prior fallback, short-doc edges, and partitioning
invariance."""

from __future__ import annotations

import math
from collections import Counter

from see_spark.operators.lm import NLL_SCALE, doc_nll

REF = [
    (0, "the cat sat on the mat"),
    (5, "the dog sat on the rug"),
    (10, "the cat ran to the dog"),
]
SCORE = REF + [
    (1, "the cat sat on the mat"),      # exactly reference-like
    (2, "mat the on sat cat the"),      # same unigrams, scrambled order
    (3, "zz qq zz qq zz"),              # fully OOV
    (4, "single"),                      # < 2 tokens
    (6, ""),                            # empty
]


def _replica():
    bg = Counter()
    for _, t in REF:
        toks = [w for w in t.split(" ") if w]
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
    ctx = Counter()
    for (a, _), c in bg.items():
        ctx[a] += c
    vocab = {w for _, t in REF for w in t.split(" ") if w}
    v = len(vocab)
    out = {}
    for doc_id, t in SCORE:
        toks = [w for w in t.split(" ") if w]
        pairs = list(zip(toks, toks[1:]))
        q = sum(
            round(-math.log((bg[(a, b)] + 1) / (ctx[a] + v)) * NLL_SCALE)
            for a, b in pairs
        )
        out[doc_id] = (len(pairs), q)
    return out


def _df(spark, rows, parts=2):
    return spark.createDataFrame(rows, ["doc_id", "text"]).repartition(parts)


def test_matches_replica(spark):
    got = {
        r.doc_id: (r.n_bigrams, r.nll_q)
        for r in doc_nll(_df(spark, SCORE), _df(spark, REF)).collect()
    }
    assert got == _replica()


def test_quality_ordering(spark):
    got = {
        r.doc_id: r
        for r in doc_nll(_df(spark, SCORE), _df(spark, REF)).collect()
    }
    # reference-like text must score strictly below scrambled and OOV text
    # per bigram
    like = got[1].nll_q / got[1].n_bigrams
    scrambled = got[2].nll_q / got[2].n_bigrams
    oov = got[3].nll_q / got[3].n_bigrams
    assert like < scrambled
    assert like < oov


def test_oov_uniform_prior(spark):
    # every OOV bigram scores exactly -ln(1/V) (c12 = c1 = 0)
    got = {r.doc_id: r for r in doc_nll(_df(spark, SCORE), _df(spark, REF)).collect()}
    v = len({w for _, t in REF for w in t.split(" ") if w})
    per = round(-math.log(1 / v) * NLL_SCALE)
    assert got[3].nll_q == got[3].n_bigrams * per


def test_short_docs(spark):
    got = {r.doc_id: r for r in doc_nll(_df(spark, SCORE), _df(spark, REF)).collect()}
    assert (got[4].n_bigrams, got[4].nll_q) == (0, 0)
    assert (got[6].n_bigrams, got[6].nll_q) == (0, 0)


def test_partitioning_invariance(spark):
    base = sorted(
        map(tuple, doc_nll(_df(spark, SCORE, 1), _df(spark, REF, 1)).collect())
    )
    got = sorted(
        map(tuple, doc_nll(_df(spark, SCORE, 5), _df(spark, REF, 3)).collect())
    )
    assert got == base


def test_nll_buckets(spark):
    from see_spark.operators.lm import nll_buckets

    got = {
        r.doc_id: r
        for r in nll_buckets(_df(spark, SCORE), _df(spark, REF)).collect()
    }
    # reference-like text lands in head, OOV text in tail, no-bigram docs
    # pinned to tail
    assert got[1].bucket == "head"
    assert got[3].bucket == "tail"
    assert got[4].bucket == "tail" and got[4].avg_q is None
    assert got[6].bucket == "tail" and got[6].avg_q is None
    # terciles partition the scored docs roughly evenly
    from collections import Counter

    scored = [r for r in got.values() if r.n_bigrams > 0]
    mix = Counter(r.bucket for r in scored)
    assert set(mix) == {"head", "middle", "tail"}
    # avg_q is the exact integer division
    for r in scored:
        assert r.avg_q == (r.nll_q * 1000) // r.n_bigrams


def test_nll_buckets_partitioning_invariance(spark):
    from see_spark.operators.lm import nll_buckets

    base = sorted(
        map(tuple, nll_buckets(_df(spark, SCORE, 1), _df(spark, REF, 1)).collect())
    )
    got = sorted(
        map(tuple, nll_buckets(_df(spark, SCORE, 5), _df(spark, REF, 3)).collect())
    )
    assert got == base


def _kn_ref(texts, d=0.75):
    """Driver-side interpolated KN bigram reference, the exact formula."""
    from collections import Counter

    bg = Counter()
    for t in texts:
        toks = [w for w in t.split(" ") if w]
        bg.update(zip(toks, toks[1:]))
    c1, n1l, n1r = Counter(), Counter(), Counter()
    for (w1, w2), c in bg.items():
        c1[w1] += c
        n1l[w1] += 1
        n1r[w2] += 1
    t = len(bg)
    return {
        (w1, w2): round(
            max(c - d, 0.0) / c1[w1] + (d * n1l[w1] / c1[w1]) * (n1r[w2] / t),
            9,
        )
        for (w1, w2), c in bg.items()
    }


def test_kneser_ney_matches_reference(spark):
    from see_spark.operators.lm import kneser_ney_bigram

    texts = [
        "a b a b c", "b c a a", "c a b b a", "a  b", "", "c c c b",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["w1"], r["w2"]): r["p_kn"]
        for r in kneser_ney_bigram(docs).collect()
    }
    assert got == _kn_ref(texts)


def test_kneser_ney_sums_to_one_per_context(spark):
    """Over the FULL vocab (observed pairs + factorized backoff), each
    context's distribution sums to exactly 1."""
    from see_spark.operators.lm import kneser_ney_bigram

    texts = ["a b a b c", "b c a a", "c a b b a"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = kneser_ney_bigram(docs, discount=0.5).collect()
    ref = _kn_ref(texts, d=0.5)
    # rebuild the aggregates to extend observed rows with backoff-only pairs
    from collections import Counter

    bg = Counter()
    for t in texts:
        toks = t.split(" ")
        bg.update(zip(toks, toks[1:]))
    c1, n1l, n1r = Counter(), Counter(), Counter()
    for (w1, w2), c in bg.items():
        c1[w1] += c; n1l[w1] += 1; n1r[w2] += 1
    tot = len(bg)
    for w1 in c1:
        s = sum(
            max(bg.get((w1, w2), 0) - 0.5, 0.0) / c1[w1]
            + (0.5 * n1l[w1] / c1[w1]) * (n1r[w2] / tot)
            for w2 in n1r
        )
        assert abs(s - 1.0) < 1e-12, (w1, s)
    # and the Spark rows agree with the reference on the observed part
    got = {(r["w1"], r["w2"]): r["p_kn"] for r in rows}
    assert got == ref
