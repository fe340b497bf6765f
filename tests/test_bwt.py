"""BWT vs the rotation-matrix definition, invertibility via LF-mapping
(proving the transform is the real thing), and run clustering on
repetitive input."""

from __future__ import annotations

from see_spark.operators.suffix import BWT_TERM, bwt_transform


def _ref_bwt(s):
    s = s + BWT_TERM
    rot = sorted(s[i:] + s[:i] for i in range(len(s)))
    return "".join(r[-1] for r in rot)


def _inverse_bwt(bwt):
    """Standard LF-mapping inversion."""
    n = len(bwt)
    order = sorted(range(n), key=lambda i: (bwt[i], i))
    out = []
    i = order[0]  # row starting after the sentinel rotation
    # find the row whose char is the sentinel: start from it
    start = bwt.index(BWT_TERM)
    i = order[start]
    for _ in range(n):
        out.append(bwt[i])
        i = order[i]
    s = "".join(out)
    return s.rstrip(BWT_TERM) if s.endswith(BWT_TERM) else s


STRINGS = [
    (1, "banana"),
    (2, "mississippi"),
    (3, "aaaaabbbbb"),
    (4, "abcabcabcabcabc"),
]


def test_bwt_matches_rotation_matrix(spark):
    df = spark.createDataFrame(STRINGS, "doc_id long, text string")
    got = {r["doc_id"]: r["bwt"] for r in bwt_transform(df).collect()}
    for d, s in STRINGS:
        assert got[d] == _ref_bwt(s), d


def test_bwt_is_invertible(spark):
    df = spark.createDataFrame(STRINGS, "doc_id long, text string")
    got = {r["doc_id"]: r["bwt"] for r in bwt_transform(df).collect()}
    for d, s in STRINGS:
        recovered = _inverse_bwt(got[d])
        assert recovered == s, (d, recovered)


def test_bwt_clusters_runs_on_repetitive_text(spark):
    df = spark.createDataFrame(
        [(1, "ab" * 30)], "doc_id long, text string"
    )
    r = bwt_transform(df).collect()[0]
    # original alternates every char (59 transitions); BWT groups all
    # a's and all b's into a handful of runs
    assert r["orig_runs"] >= 60
    assert r["bwt_runs"] <= 5
