"""Registrable-domain extraction (operators/pld.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from see_spark.operators.pld import DEFAULT_SUFFIXES, pld_expr, pld_rollup


@pytest.mark.parametrize(
    "host,expected",
    [
        ("example.com", "example.com"),
        ("www.example.com", "example.com"),
        ("a.b.c.example.com", "example.com"),
        # two-label suffix beats the one-label 'uk' would-be match
        ("shop.example.co.uk", "example.co.uk"),
        ("example.co.uk", "example.co.uk"),
        # host IS a suffix -> its own group
        ("co.uk", "co.uk"),
        ("com", "com"),
        # unknown TLD: pinned two-label fallback
        ("x.y.z.weird", "z.weird"),
        ("single", "single"),
        ("host3.test", "host3.test"),
        ("cdn.host3.test", "host3.test"),
    ],
)
def test_pld_semantics(spark, host, expected):
    got = (
        spark.range(1)
        .select(pld_expr(F.lit(host), DEFAULT_SUFFIXES))
        .collect()[0][0]
    )
    assert got == expected


def test_pld_rollup_groups_subdomain_farm(spark):
    """A subdomain farm collapses to ONE budget group; weights sum."""
    hosts = spark.createDataFrame(
        [(f"s{i}.farm.test", 10) for i in range(8)]
        + [("other.test", 5), ("www.other.test", 5)],
        "host string, w long",
    )
    rows = {r["pld"]: (r["n_hosts"], r["weight"]) for r in
            pld_rollup(hosts, weight_col="w").collect()}
    assert rows["farm.test"] == (8, 80)
    assert rows["other.test"] == (2, 10)
    plan = (
        pld_rollup(hosts)._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
