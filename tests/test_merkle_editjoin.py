"""Merkle tree: root stability, single-row change flips exactly the
root-to-leaf path, diff read-set is O(log n); edit join: recall equals
brute-force levenshtein (incl. repeat-heavy strings that break the
distinct-gram bound), and the q-gram filter actually prunes."""

from __future__ import annotations

from pyspark.sql import functions as F

from see_spark.operators.merkle import (
    merkle_diff_paths,
    merkle_levels,
    merkle_root,
)
from see_spark.operators.simjoin import edit_distance_join


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_merkle_root_deterministic_and_content_sensitive(spark):
    rows = [(i, f"text {i}") for i in range(100)]
    df = _docs(spark, rows)
    r1 = merkle_root(df, ["doc_id"], ["doc_id", "text"], fanout=8)
    r2 = merkle_root(
        df.repartition(7), ["doc_id"], ["doc_id", "text"], fanout=8
    )
    assert r1 == r2
    changed = _docs(spark, rows[:50] + [(50, "TAMPERED")] + rows[51:])
    assert merkle_root(changed, ["doc_id"], ["doc_id", "text"], fanout=8) != r1


def test_merkle_diff_is_single_path(spark):
    rows = [(i, f"text {i}") for i in range(64)]
    a = merkle_levels(_docs(spark, rows), ["doc_id"], ["doc_id", "text"], 8)
    rows_b = rows[:13] + [(13, "changed")] + rows[14:]
    b = merkle_levels(_docs(spark, rows_b), ["doc_id"], ["doc_id", "text"], 8)
    diff = merkle_diff_paths(a, b).collect()
    # 64 leaves, fanout 8 -> levels 0,1,2; one changed leaf = 3 nodes
    assert len(diff) == 3
    assert sorted(r["level"] for r in diff) == [0, 1, 2]
    assert {r["pos"] for r in diff if r["level"] == 0} == {13}


def _brute_pairs(rows, k, field_len):
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    out = {}
    for (i, ta), (j, tb) in itertools.combinations(rows, 2):
        a, b = min(i, j), max(i, j)
        fa, fb = ta[:field_len], tb[:field_len]
        d = lev(fa, fb)
        if d <= k:
            out[(a, b)] = d
    return out


def test_edit_join_recall_equals_bruteforce(spark):
    rows = [
        (1, "abcdefgh"), (2, "abcdefgx"), (3, "abcdexgx"),
        (4, "zzzzzzzz"), (5, "abXdefgh"),
        (6, "aaaaaaa"), (7, "aaaaaab"),   # repeat-heavy: distinct-gram
        (8, "totally different"),          # bound would miss these
    ]
    got = {
        (r["a"], r["b"]): r["dist"]
        for r in edit_distance_join(
            _docs(spark, rows), max_dist=2, q=2, field_len=24
        ).collect()
    }
    assert got == _brute_pairs(rows, 2, 24)


def test_edit_join_filter_prunes(spark):
    # many dissimilar strings: candidate count far below all-pairs
    rows = [(i, f"doc {i} unique words {i * 7}") for i in range(60)]
    rows += [(100, "identical prefix here"), (101, "identical prefix herX")]
    got = edit_distance_join(_docs(spark, rows), max_dist=2).collect()
    pairs = {(r["a"], r["b"]) for r in got}
    assert (100, 101) in pairs
    # the 60 unique docs produce only few (short-prefix collisions <=2)
    assert len(pairs) == len(_brute_pairs(rows, 2, 24))
