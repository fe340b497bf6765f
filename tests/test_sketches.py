"""HyperLogLog sketch: rank math vs a Python reference, accuracy bounds,
mergeability, plan quality."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _py_rank(value: str, p: int = 10):
    """Independent Python reference for (bucket, rank)."""
    s = hashlib.md5(value.encode()).hexdigest()
    m = 1 << p
    bucket = int(s[0:3], 16) % m
    v = int(s[3:18], 16)
    if v == 0:
        return bucket, 61
    # leading zeros within 60 bits
    rank = 60 - v.bit_length() + 1
    return bucket, rank


def test_rank_cols_match_python_reference(spark):
    from see_spark.functions.sketches import hll_rank_cols

    vals = [f"http://host{i}.test/page/{i*i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "url string")
    got = {
        r.url: (r.hll_bucket, r.hll_rank)
        for r in df.select("url", *hll_rank_cols("url", p=10)).collect()
    }
    for v in vals:
        assert got[v] == _py_rank(v), v


def test_estimate_within_hll_error_bound(spark):
    from see_spark.functions.sketches import hll_distinct

    n = 20000
    df = spark.createDataFrame(
        [(f"u{i}",) for i in range(n)], "url string"
    ).withColumn("k", F.lit("all"))
    est = hll_distinct(df, ["k"], "url", p=10).collect()[0].hll_estimate
    # p=10 -> rsd = 1.04/sqrt(1024) ~ 3.25%; allow 4 sigma
    assert abs(est - n) / n < 0.13


def test_small_range_linear_counting(spark):
    from see_spark.functions.sketches import hll_distinct

    df = spark.createDataFrame(
        [(f"v{i}",) for i in range(30)], "url string"
    ).withColumn("k", F.lit("x"))
    est = hll_distinct(df, ["k"], "url", p=10).collect()[0].hll_estimate
    assert abs(est - 30) < 5


def test_sketch_merge_equals_union_sketch(spark):
    from see_spark.functions.sketches import hll_estimate, hll_sketch

    a = spark.createDataFrame([(f"a{i}",) for i in range(3000)], "url string")
    b = spark.createDataFrame(
        [(f"a{i}",) for i in range(1500, 4500)], "url string"
    )
    ka = a.withColumn("k", F.lit("g"))
    kb = b.withColumn("k", F.lit("g"))
    direct = hll_sketch(ka.union(kb), ["k"], "url")
    merged = (
        hll_sketch(ka, ["k"], "url")
        .union(hll_sketch(kb, ["k"], "url"))
        .groupBy("k", "hll_bucket")
        .agg(F.max("register").alias("register"))
    )
    e1 = hll_estimate(direct, ["k"]).collect()[0].hll_estimate
    e2 = hll_estimate(merged, ["k"]).collect()[0].hll_estimate
    assert e1 == e2


def test_per_key_sketches_are_independent(spark):
    from see_spark.functions.sketches import hll_distinct

    rows = [(f"h{i % 5}", f"u{i}") for i in range(5000)]
    df = spark.createDataFrame(rows, "host string, url string")
    got = {r.host: r.hll_estimate
           for r in hll_distinct(df, ["host"], "url").collect()}
    for h in got:
        assert abs(got[h] - 1000) / 1000 < 0.15, (h, got[h])


def test_plan_is_jvm_only_single_partial_agg(spark):
    from see_spark.functions.sketches import hll_distinct

    df = spark.createDataFrame([("h", "u")], "host string, url string")
    plan = (
        hll_distinct(df, ["host"], "url")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # map-side combine: partial then final aggregate on the sketch build
    assert plan.count("HashAggregate") >= 2


# ---------------------------------------------------------------- count-min


def _py_cms_bucket(value: str, row: int, width: int = 256) -> int:
    s = hashlib.md5(f"cms{row}:{value}".encode()).hexdigest()
    return int(s[:15], 16) % width


def _cms_corpus(spark):
    # zipf-ish host skew: host h appears (20 - h) times
    rows = [(f"host{h}.test",) for h in range(20) for _ in range(20 - h)]
    return spark.createDataFrame(rows, ["host"])


def test_cms_bucket_matches_python_reference(spark):
    from see_spark.functions.sketches import cms_bucket

    df = spark.createDataFrame(
        [("host0.test",), ("héllo",), ("",)], ["v"]
    ).select("v", *[cms_bucket("v", i, 256).alias(f"b{i}") for i in range(4)])
    for r in df.collect():
        for i in range(4):
            assert r[f"b{i}"] == _py_cms_bucket(r["v"], i)


def test_cms_never_underestimates_and_is_exact_when_wide(spark):
    from see_spark.functions.sketches import cms_build, cms_estimate

    df = _cms_corpus(spark)
    truth = df.groupBy("host").agg(F.count("*").cast("long").alias("true_count"))
    for width, exact_expected in ((256, True), (8, False)):
        counters = cms_build(df, "host", depth=4, width=width)
        est = cms_estimate(counters, truth, "host", depth=4, width=width)
        rows = est.collect()
        assert all(r["cms_count"] >= r["true_count"] for r in rows)
        if exact_expected:
            # 20 keys into 4x256 cells: collisions in all 4 rows are
            # (deterministically, for this fixed corpus) absent
            assert all(r["cms_count"] == r["true_count"] for r in rows)
        else:
            assert any(r["cms_count"] > r["true_count"] for r in rows)


def test_cms_counters_merge_by_sum(spark):
    from see_spark.functions.sketches import cms_build, cms_estimate

    df = _cms_corpus(spark)
    a, b = df.randomSplit([0.5, 0.5], seed=7)
    merged = (
        cms_build(a, "host").unionByName(cms_build(b, "host"))
        .groupBy("row", "bucket").agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    whole = cms_build(df, "host")
    keys = df.select("host").distinct()
    got_m = {r["host"]: r["cms_count"]
             for r in cms_estimate(merged, keys, "host").collect()}
    got_w = {r["host"]: r["cms_count"]
             for r in cms_estimate(whole, keys, "host").collect()}
    assert got_m == got_w


def test_cms_estimate_plan_broadcasts_counters(spark):
    from see_spark.functions.sketches import cms_build, cms_estimate

    df = _cms_corpus(spark)
    plan = (
        cms_estimate(cms_build(df, "host"), df.select("host").distinct(), "host")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
