"""Onion layers: nested anti-diagonals peel one per layer, layers
partition (no id in two layers), and brute-force equality."""

from __future__ import annotations

from see_spark.operators.skyline import skyline_layers


def _peel_ref(points, n_layers):
    remaining = dict(points)
    out = {}
    for layer in range(1, n_layers + 1):
        sky = []
        for i, (px, py) in remaining.items():
            if not any(
                qx >= px and qy >= py and (qx > px or qy > py)
                for j, (qx, qy) in remaining.items()
                if j != i
            ):
                sky.append(i)
        for i in sky:
            out[i] = layer
            del remaining[i]
    return out


def test_nested_diagonals(spark):
    # three concentric anti-diagonals -> exactly one layer each
    pts = {}
    for lvl, base in enumerate((20, 10, 0)):
        for i in range(5):
            pts[lvl * 10 + i] = (base + i, base + (4 - i))
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pts.items()], "id long, x long, y long"
    )
    got = {
        r["id"]: r["layer"]
        for r in skyline_layers(df, "x", "y", "id", n_layers=3).collect()
    }
    assert got == _peel_ref(pts, 3)
    assert all(got[i] == 1 for i in range(5))
    assert all(got[10 + i] == 2 for i in range(5))
    assert all(got[20 + i] == 3 for i in range(5))


def test_layers_partition_ids(spark):
    import random

    rng = random.Random(4)
    pts = {i: (rng.randrange(50), rng.randrange(50)) for i in range(120)}
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pts.items()], "id long, x long, y long"
    )
    rows = skyline_layers(df, "x", "y", "id", n_layers=3).collect()
    ids = [r["id"] for r in rows]
    assert len(ids) == len(set(ids))
    got = {r["id"]: r["layer"] for r in rows}
    want = _peel_ref(pts, 3)
    assert got == want
