"""Mutual-NN alignment (hand-built geometry: mutual pairs kept, hub
mismatches dropped) and the LSH s-curve planner (values vs math.pow
reference, monotonicity in similarity, config trade-off shape)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from see_spark.operators.dedup import lsh_recall_curve
from see_spark.operators.similarity import mutual_nearest_neighbors


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<long>, label long"
    )


def test_mutual_pairs_found_and_hubs_filtered(spark):
    # left: a1=(10,0), a2=(0,10), a3=(7,7)
    # right: b1=(9,1)->pairs with a1; b2=(1,9)->pairs with a2;
    # a3's NN is b1 (cos ~.79 vs b2 same by symmetry tie->b1), but b1's
    # NN is a1 -> a3 keeps NO mutual partner
    rows = [
        (1, [10, 0], 0), (2, [0, 10], 0), (3, [7, 7], 0),
        (11, [9, 1], 1), (12, [1, 9], 1),
    ]
    got = {
        (r["vec_a"], r["vec_b"])
        for r in mutual_nearest_neighbors(_vecs(spark, rows), 0, 1).collect()
    }
    assert got == {(1, 11), (2, 12)}


def test_mutual_nn_is_one_to_one(spark):
    rows = [(i, [i * 3 + 1, 50 - i], 0) for i in range(10)] + [
        (100 + i, [i * 3 + 2, 50 - i], 1) for i in range(10)
    ]
    pairs = mutual_nearest_neighbors(_vecs(spark, rows), 0, 1).collect()
    a_side = [r["vec_a"] for r in pairs]
    b_side = [r["vec_b"] for r in pairs]
    assert len(a_side) == len(set(a_side))
    assert len(b_side) == len(set(b_side))


def test_lsh_curve_matches_math(spark):
    df = spark.createDataFrame(
        [(500,), (500,), (900,), (250,)], "jaccard_milli long"
    )
    got = {
        (r["bands"], r["rows_per_band"], r["jaccard_milli"]): (
            r["n_pairs"],
            r["p_detect"],
        )
        for r in lsh_recall_curve(df, num_hashes=16).collect()
    }
    for (b, r, jm), (n, p) in got.items():
        s = jm / 1000.0
        want = 1.0 - (1.0 - s**r) ** b
        assert p == pytest.approx(want, abs=1e-8), (b, r, jm)
        assert n == (2 if jm == 500 else 1)
    # 5 configs x 3 sim levels
    assert len(got) == 15


def test_lsh_curve_monotone_in_similarity(spark):
    df = spark.createDataFrame(
        [(m,) for m in range(100, 1001, 100)], "jaccard_milli long"
    )
    rows = lsh_recall_curve(df, num_hashes=16).collect()
    by_cfg = {}
    for r in rows:
        by_cfg.setdefault((r["bands"], r["rows_per_band"]), []).append(
            (r["jaccard_milli"], r["p_detect"])
        )
    for cfg, pts in by_cfg.items():
        pts.sort()
        ps = [p for _, p in pts]
        assert ps == sorted(ps), cfg  # p rises with similarity
    # banding trade-off: at s=0.5, more bands with shorter rows detects
    # more than one long band
    p16 = dict(by_cfg[(16, 1)])[500]
    p1 = dict(by_cfg[(1, 16)])[500]
    assert p16 > p1
