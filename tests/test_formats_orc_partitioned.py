"""ORC round-trip parity with parquet, and the hive-partitioned layout:
directory structure, exact content parity, and a PLAN guard that a
partition-column filter reaches PartitionFilters (directory-level
pruning) rather than being applied post-scan."""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

from see_spark.sources.formats import (
    read_documents_orc,
    read_documents_partitioned,
    write_documents_orc,
    write_documents_partitioned,
)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_orc_roundtrip_exact(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "orc")
    write_documents_orc(docs, p)
    back = read_documents_orc(spark, p)
    assert set(back.columns) == set(docs.columns)
    a = sorted(map(tuple, docs.select(sorted(docs.columns)).collect()))
    b = sorted(map(tuple, back.select(sorted(docs.columns)).collect()))
    assert a == b


def test_partitioned_layout_and_content(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "part")
    write_documents_partitioned(docs, p, "lang")
    dirs = {d for d in os.listdir(p) if d.startswith("lang=")}
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert dirs == {f"lang={l}" for l in langs}
    back = read_documents_partitioned(spark, p)
    assert back.count() == docs.count()
    # per-partition content parity (partition col comes back as string)
    a = sorted(
        (r["doc_id"], r["lang"]) for r in docs.select("doc_id", "lang").collect()
    )
    b = sorted(
        (r["doc_id"], r["lang"]) for r in back.select("doc_id", "lang").collect()
    )
    assert a == b


def test_partition_filter_reaches_scan(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "part2")
    write_documents_partitioned(docs, p, "lang")
    rd = read_documents_partitioned(spark, p).where(F.col("lang") == "en")
    plan = rd._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "lang" in m.group(1) and "= en" in m.group(1), plan
    assert rd.count() == docs.where(F.col("lang") == "en").count()
