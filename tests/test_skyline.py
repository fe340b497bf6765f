"""Skyline vs brute-force dominance on staircases, duplicates (equal
maximal points both stay), anti-diagonal (everything on the frontier),
and partitioning invariance — the grid pre-filter must never drop a
frontier point."""

from __future__ import annotations

import random

from see_spark.operators.skyline import skyline2d


def _brute(points):
    out = []
    for i, (px, py) in points.items():
        dominated = any(
            (qx >= px and qy >= py and (qx > px or qy > py))
            for j, (qx, qy) in points.items()
            if j != i
        )
        if not dominated:
            out.append((i, px, py))
    return sorted(out)


def _run(spark, points, grid=16):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in points.items()], "id long, x long, y long"
    )
    return sorted(map(tuple, skyline2d(df, "x", "y", "id", grid=grid).collect()))


def test_staircase(spark):
    # frontier is the staircase; interior points dominated
    pts = {1: (10, 1), 2: (8, 5), 3: (5, 8), 4: (1, 10),
           5: (4, 4), 6: (7, 2), 7: (2, 7)}
    assert _run(spark, pts) == _brute(pts)
    assert len(_run(spark, pts)) == 4


def test_duplicates_both_kept(spark):
    pts = {1: (9, 9), 2: (9, 9), 3: (1, 1)}
    got = _run(spark, pts)
    assert got == [(1, 9, 9), (2, 9, 9)]


def test_anti_diagonal_all_frontier(spark):
    pts = {i: (i, 50 - i) for i in range(50)}
    assert len(_run(spark, pts)) == 50


def test_random_matches_bruteforce_multiple_grids(spark):
    rng = random.Random(5)
    pts = {i: (rng.randrange(200), rng.randrange(200)) for i in range(300)}
    want = _brute(pts)
    for grid in (4, 16, 64):
        assert _run(spark, pts, grid=grid) == want, grid


def test_partitioning_invariant(spark):
    rng = random.Random(9)
    pts = {i: (rng.randrange(100), rng.randrange(100)) for i in range(200)}
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pts.items()], "id long, x long, y long"
    )
    a = sorted(map(tuple, skyline2d(df, "x", "y", "id").collect()))
    b = sorted(
        map(tuple, skyline2d(df.repartition(13), "x", "y", "id").collect())
    )
    assert a == b
