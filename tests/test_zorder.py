"""Z-order layout: Morton interleave vs a pure-Python reference, chunk
min/max envelopes, the pruning advantage on single-dimension-selective
boxes, and partitioning invariance of the whole audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from see_spark.operators.layout import chunked_minmax, zorder_prune_audit, zvalue


def _interleave(nx, ny, bits=16):
    z = 0
    for j in range(bits):
        z += ((nx >> j) & 1) << (2 * j)
        z += ((ny >> j) & 1) << (2 * j + 1)
    return z


def test_zvalue_matches_reference(spark):
    rows = [(i, i % 7, (i * 3) % 11) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    lox, hix, loy, hiy = 0, 6, 0, 10
    top = (1 << 16) - 1
    want = {
        i: _interleave((x - lox) * top // (hix - lox), (y - loy) * top // (hiy - loy))
        for i, x, y in rows
    }
    got = {r["id"]: r["zval"] for r in zvalue(df, "x", "y").collect()}
    assert got == want


def test_zvalue_constant_dimension_collapses(spark):
    df = spark.createDataFrame(
        [(i, 5, i) for i in range(10)], "id long, x long, y long"
    )
    got = zvalue(df, "x", "y").collect()
    # x constant -> nx = 0 -> z has only odd bits
    for r in got:
        assert r["zval"] & 0x5555555555555555 == 0


def test_chunk_minmax_envelopes_cover_rows(spark):
    rows = [(i, (i * 17) % 101, (i * 29) % 97) for i in range(200)]
    df = zvalue(
        spark.createDataFrame(rows, "id long, x long, y long"), "x", "y"
    )
    idx = chunked_minmax(df, ["zval", "id"], 8, "x", "y").collect()
    assert sum(r["n_rows"] for r in idx) == 200
    assert len(idx) == 8
    for r in idx:
        assert r["min_x"] <= r["max_x"] and r["min_y"] <= r["max_y"]


def test_zorder_beats_xsort_on_y_selective_box(spark):
    rows = [(i, (i * 17) % 256, (i * 29) % 256) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    out = {
        r["layout"]: r
        for r in zorder_prune_audit(
            df, "x", "y", ["id"], (0, 1 << 40, 0, 15), n_chunks=16, bits=8
        ).collect()
    }
    # x unbounded: the x-sorted layout can only prune via accidental
    # x↔y correlation; the z-order layout bounds y by construction
    assert out["zorder"]["chunks_scanned"] < out["xsort"]["chunks_scanned"]
    assert out["zorder"]["rows_scanned"] < out["xsort"]["rows_scanned"]
    # matched rows are layout-independent
    assert out["zorder"]["rows_matched"] == out["xsort"]["rows_matched"]


def test_audit_partitioning_invariant(spark):
    rows = [(i, (i * 17) % 64, (i * 29) % 64) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    args = ("x", "y", ["id"], (0, 20, 0, 20))
    a = sorted(map(tuple, zorder_prune_audit(df, *args, n_chunks=8, bits=8).collect()))
    b = sorted(
        map(
            tuple,
            zorder_prune_audit(
                df.repartition(13), *args, n_chunks=8, bits=8
            ).collect(),
        )
    )
    assert a == b
