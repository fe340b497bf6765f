"""Suffix array by prefix doubling vs Python suffix sort (classic
stress strings), LCP adjacency audit vs brute force, truncation, and
partitioning invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from see_spark.operators.suffix import lcp_intervals, suffix_array

STRINGS = [
    (1, "banana"),
    (2, "mississippi"),
    (3, "abcabcabc"),      # periodic — the prefix-doubling stress case
    (4, "aaaaaaaa"),       # unary — every pair of suffixes nested
    (5, "z"),              # single char
    (6, "abab abab abab"), # repeats with separators
]


def _sa_ref(text):
    order = sorted(range(len(text)), key=lambda i: text[i:])
    return {pos: rank + 1 for rank, pos in enumerate(order)}


def test_suffix_array_matches_python_sort(spark):
    df = spark.createDataFrame(STRINGS, "doc_id long, text string")
    got = {}
    for r in suffix_array(df).collect():
        got.setdefault(r["doc_id"], {})[r["pos"]] = r["sa_rank"]
    for d, text in STRINGS:
        assert got[d] == _sa_ref(text), f"doc {d}"


def test_suffix_array_truncation(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], "doc_id long, text string")
    got = {
        r["pos"]: r["sa_rank"]
        for r in suffix_array(df, max_len=4).collect()
    }
    assert got == _sa_ref("abcd")


def _lcp_ref(text, min_lcp):
    order = sorted(range(len(text)), key=lambda i: text[i:])
    out = {}
    for a, b in zip(order, order[1:]):
        sa_, sb_ = text[a:], text[b:]
        n = 0
        while n < min(len(sa_), len(sb_)) and sa_[n] == sb_[n]:
            n += 1
        if n >= min_lcp:
            out[(a, b)] = n
    return out


def test_lcp_matches_bruteforce(spark):
    df = spark.createDataFrame(STRINGS, "doc_id long, text string")
    sa = suffix_array(df)
    got = {}
    for r in lcp_intervals(sa, df, min_lcp=2).collect():
        got.setdefault(r["doc_id"], {})[(r["pos_a"], r["pos_b"])] = r["lcp"]
    for d, text in STRINGS:
        assert got.get(d, {}) == _lcp_ref(text, 2), f"doc {d}"


def test_partitioning_invariant(spark):
    df = spark.createDataFrame(STRINGS, "doc_id long, text string")
    a = sorted(map(tuple, suffix_array(df).collect()))
    b = sorted(map(tuple, suffix_array(df.repartition(7)).collect()))
    assert a == b
