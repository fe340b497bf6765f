"""Sorted-neighborhood blocking: window pairs vs a brute-force
reference, guaranteed recall of exact duplicates with adjacent keys,
partition-boundary pairs, and partitioning invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from see_spark.operators.dedup import sorted_neighborhood_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "key", F.lower(F.substring(F.col("text"), 1, 8))
    )


def _ref_pairs(rows, window=3):
    keyed = sorted(
        ((t[:8].lower(), i), (i, t)) for i, t in rows
    )
    order = [doc for _, doc in keyed]
    out = {}
    for x in range(len(order)):
        for j in range(1, window):
            if x + j >= len(order):
                continue
            (ia, ta), (ib, tb) = order[x], order[x + j]
            sa, sb = set(ta.split(" ")), set(tb.split(" "))
            inter = len(sa & sb)
            out[(ia, ib)] = (
                inter,
                len(sa),
                len(sb),
                inter * 1000 // (len(sa) + len(sb) - inter),
            )
    return out


ROWS = [
    (1, "alpha beta gamma"),
    (2, "alpha beta gamma"),        # exact dup of 1 -> adjacent keys
    (3, "alpha beta delta epsilon"),
    (4, "zeta eta theta"),
    (5, "zeta eta theta iota"),
    (6, "completely different words here"),
]


def test_pairs_match_bruteforce(spark):
    got = {
        (r["a"], r["b"]): (
            r["inter"],
            r["size_a"],
            r["size_b"],
            r["jaccard_milli"],
        )
        for r in sorted_neighborhood_pairs(
            _docs(spark, ROWS), key_col="key", window=3
        ).collect()
    }
    assert got == _ref_pairs(ROWS, window=3)


def test_exact_dups_always_compared(spark):
    # exact duplicates share the key, so they sort adjacently and the
    # window always compares them with jaccard 1000
    rows = sorted_neighborhood_pairs(
        _docs(spark, ROWS), key_col="key", window=2
    ).collect()
    dup = [r for r in rows if {r["a"], r["b"]} == {1, 2}]
    assert len(dup) == 1 and dup[0]["jaccard_milli"] == 1000


def test_boundary_pairs_found_across_partitions(spark):
    # 40 docs, many range partitions: every consecutive pair must appear
    # exactly once even when the sort is split across partitions
    rows = [(i, f"w{i // 2} common") for i in range(40)]
    df = _docs(spark, rows).repartition(8)
    got = sorted_neighborhood_pairs(df, key_col="key", window=2).collect()
    assert len(got) == 39  # n-1 consecutive pairs, none lost at boundaries


def test_partitioning_invariant(spark):
    df = _docs(spark, ROWS)
    a = sorted(
        map(
            tuple,
            sorted_neighborhood_pairs(df, key_col="key", window=3).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            sorted_neighborhood_pairs(
                df.repartition(7), key_col="key", window=3
            ).collect(),
        )
    )
    assert a == b
