"""Exact-substring duplication audit (dedup.py:exact_substring_stats):
python-replica parity on a corpus that forces every case — cross-doc
duplication, self-repetition within one doc, overlapping-window merge,
adjacent-range merge, sub-window docs — plus partitioning invariance."""

from __future__ import annotations

import pytest

from see_spark.operators.dedup import exact_substring_stats

W = 10


def _replica(rows, w=W):
    from collections import Counter

    wins = []  # (doc_id, pos, window_text)
    for doc_id, text in rows:
        tk = text.split(" ")
        for p in range(1, len(tk) - w + 2):
            wins.append((doc_id, p, " ".join(tk[p - 1 : p - 1 + w])))
    counts = Counter(wtext for _, _, wtext in wins)
    out = {}
    for doc_id, text in rows:
        tk = text.split(" ")
        ps = sorted(p for d, p, t in wins if d == doc_id and counts[t] > 1)
        ranges = []
        for p in ps:
            if ranges and p <= ranges[-1][1] + w:
                ranges[-1] = (ranges[-1][0], p)
            else:
                ranges.append((p, p))
        dup_tokens = sum(lp - fp + w for fp, lp in ranges)
        out[doc_id] = (len(tk), dup_tokens, len(ranges))
    return out


@pytest.fixture(scope="module")
def corpus():
    a = [f"a{i}" for i in range(30)]
    shared = a[5:21]  # 16 tokens of A reappear in B -> 7 dup windows each
    b = shared + [f"b{i}" for i in range(12)]
    block = [f"c{i}" for i in range(10)]
    c = block + ["u1", "u2", "u3"] + block  # self-repetition, two ranges
    d = ["short", "doc"]  # below window -> zero windows
    e = [f"e{i}" for i in range(15)]  # unique -> no dups
    return [
        (1, " ".join(a)),
        (2, " ".join(b)),
        (3, " ".join(c)),
        (4, " ".join(d)),
        (5, " ".join(e)),
    ]


def _run(spark, rows, parts=1):
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(parts)
    got = exact_substring_stats(df, window=W).collect()
    return {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["n_dup_ranges"])
        for r in got
    }


def test_matches_python_replica(spark, corpus):
    assert _run(spark, corpus) == _replica(corpus)


def test_case_coverage(spark, corpus):
    got = _run(spark, corpus)
    # cross-doc: A's tokens 6..21 duplicated (16 tokens, one merged range)
    assert got[1] == (30, 16, 1)
    assert got[2][1] == 16 and got[2][2] == 1
    # self-repetition: both 10-token blocks flagged as separate ranges
    assert got[3] == (23, 20, 2)
    # sub-window doc and unique doc: present with zeros
    assert got[4] == (2, 0, 0)
    assert got[5] == (15, 0, 0)


def test_partitioning_invariance(spark, corpus):
    assert _run(spark, corpus, parts=1) == _run(spark, corpus, parts=5)


def test_prescreen_output_identical(spark, corpus):
    """prescreen_bits is a pure scale knob: 4-bit narrow keys force heavy
    false-positive collisions, yet the exact second pass must remove them
    all — output identical to the unscreened run."""
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    plain = exact_substring_stats(df, window=W).collect()
    screened = exact_substring_stats(df, window=W, prescreen_bits=4).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, screened))
