"""PMI collocations vs a pure-Python reference: association beats raw
frequency, the min-count guard, and partitioning invariance."""

from __future__ import annotations

import math

import pytest

from see_spark.operators.textfilters import pmi_collocations

# "rare pair" always co-occurs (strong association, low frequency);
# "the of" is frequent but both words are everywhere (low PMI)
DOCS = [
    (1, "the of the of the of rare pair"),
    (2, "the of the of rare pair"),
    (3, "the of the of the of the of rare pair"),
    (4, "the of rare pair the of"),
    (5, "the of rare pair"),
]


def _ref(docs, min_count, k):
    uni, big = {}, {}
    t_tot = b_tot = 0
    for _, text in docs:
        t = text.split(" ")
        t_tot += len(t)
        b_tot += max(len(t) - 1, 0)
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    out = []
    for (a, b), c in big.items():
        if c < min_count:
            continue
        pmi = round(
            math.log((c * float(t_tot) * float(t_tot)) / (float(b_tot) * uni[a] * uni[b])),
            9,
        )
        out.append((f"{a} {b}", c, uni[a], uni[b], pmi))
    out.sort(key=lambda r: (-r[4], r[0]))
    return out[:k]


def test_pmi_matches_reference_and_ranks_association_first(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [tuple(r) for r in pmi_collocations(df, k=10, min_count=2).collect()]
    want = _ref(DOCS, 2, 10)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:4] == w[:4]
        assert g[4] == pytest.approx(w[4], abs=1e-9)
    # the rare-but-always-together pair outranks the frequent pair
    assert got[0][0] == "rare pair"
    assert got[0][4] > dict((g[0], g[4]) for g in got)["the of"]


def test_pmi_min_count_guard(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = pmi_collocations(df, k=50, min_count=6).collect()
    # only "the of" (12x) and "of the" (7x) survive min_count=6
    assert {r["bigram"] for r in rows} == {"the of", "of the"}


def test_pmi_partitioning_invariant(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = [tuple(r) for r in pmi_collocations(df, k=10, min_count=2).collect()]
    b = [
        tuple(r)
        for r in pmi_collocations(
            df.repartition(7), k=10, min_count=2
        ).collect()
    ]
    assert a == b
