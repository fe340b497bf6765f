"""Equi-depth range router: exact boundary picks, balance vs
fixed-width on skewed keys, duplicate-heavy keys, and partitioning
invariance of the whole audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from see_spark.operators.sharding import (
    equidepth_boundaries,
    range_router_audit,
)


def test_boundaries_are_exact_rank_values(spark):
    # keys 0..99: boundaries at ranks 25, 50, 75 -> values 25, 50, 75
    df = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    assert equidepth_boundaries(df, "k", 4) == [25, 50, 75]


def test_equidepth_flat_fixedwidth_skewed(spark):
    # quadratic skew: values i*i for i in 0..99 pile up in low ranges
    df = spark.createDataFrame([(i * i,) for i in range(400)], ["k"])
    got = {
        (r["scheme"], r["bucket"]): r["n_rows"]
        for r in range_router_audit(df, "k", n_buckets=8).collect()
    }
    eq = [got.get(("equidepth", b), 0) for b in range(8)]
    fw = [got.get(("fixedwidth", b), 0) for b in range(8)]
    assert sum(eq) == sum(fw) == 400
    # equi-depth near-flat; fixed-width heavily skewed toward bucket 0
    assert max(eq) - min(eq) <= 2
    assert max(fw) > 2 * (400 // 8)
    assert fw[0] == max(fw)


def test_duplicate_keys_share_bucket(spark):
    # one value dominates: all its copies must land in ONE bucket
    rows = [(5,)] * 90 + [(i,) for i in range(10)]
    df = spark.createDataFrame(rows, ["k"])
    got = {
        (r["scheme"], r["bucket"]): r["n_rows"]
        for r in range_router_audit(df, "k", n_buckets=4).collect()
    }
    eq = {b: n for (s, b), n in got.items() if s == "equidepth"}
    assert max(eq.values()) >= 90  # the dup value's bucket holds them all


def test_audit_partitioning_invariant(spark):
    df = spark.createDataFrame([((i * 13) % 57,) for i in range(300)], ["k"])
    a = sorted(map(tuple, range_router_audit(df, "k", 8).collect()))
    b = sorted(
        map(tuple, range_router_audit(df.repartition(11), "k", 8).collect())
    )
    assert a == b
