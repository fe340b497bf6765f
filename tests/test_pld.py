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


def test_two_level_budget_conserves_total_and_collapses_farms(spark):
    from see_spark.operators.pld import allocate_budget_by_pld

    hw = spark.createDataFrame(
        # farm.test mints 50 subdomains with weight 2 each (total 100);
        # org.test has ONE host with weight 100 -> equal org-level shares
        [(f"s{i}.farm.test", 2) for i in range(50)]
        + [("www.org.test", 100)],
        "host string, weight long",
    )
    out = allocate_budget_by_pld(hw, total_budget=1001).collect()
    assert sum(r["budget"] for r in out) == 1001  # exact conservation
    by_pld = {}
    for r in out:
        by_pld[r["pld"]] = by_pld.get(r["pld"], 0) + r["budget"]
    # equal weights -> the farm's 50 hosts SHARE one org budget
    assert abs(by_pld["farm.test"] - by_pld["org.test"]) <= 1
    # within the farm, equal weights split evenly (within one slot)
    farm = [r["budget"] for r in out if r["pld"] == "farm.test"]
    assert max(farm) - min(farm) <= 1


def test_two_level_budget_partitioning_invariant(spark):
    from see_spark.operators.pld import allocate_budget_by_pld

    hw = spark.createDataFrame(
        [(f"h{i}.d{i % 5}.com", (i * 7) % 13 + 1) for i in range(40)],
        "host string, weight long",
    )
    a = sorted(map(tuple, allocate_budget_by_pld(hw, 777).collect()))
    b = sorted(map(tuple,
                   allocate_budget_by_pld(hw.repartition(16), 777).collect()))
    assert a == b
    assert sum(r[3] for r in a) == 777
