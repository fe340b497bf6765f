"""Per-host quota sampling (textfilters.py:host_quota_sample): cap
enforcement, deterministic salted-hash selection, partitioning and rerun
invariance, and fairness across salt values."""

from __future__ import annotations

from collections import Counter

from see_spark.operators.textfilters import host_quota_sample


def _df(spark, n_hosts=4, per_host=20, parts=3):
    rows = [
        (h * 1000 + i, f"h{h}")
        for h in range(n_hosts)
        for i in range(per_host)
    ]
    return spark.createDataFrame(rows, "doc_id long, host string").repartition(parts)


def test_cap_enforced(spark):
    out = host_quota_sample(_df(spark), cap=5, id_col="doc_id").collect()
    by_host = Counter(r.host for r in out)
    assert by_host == {"h0": 5, "h1": 5, "h2": 5, "h3": 5}
    assert all(1 <= r.host_rank <= 5 for r in out)


def test_under_cap_hosts_keep_everything(spark):
    out = host_quota_sample(_df(spark, per_host=3), cap=5, id_col="doc_id")
    assert out.count() == 4 * 3


def test_deterministic_across_partitionings_and_reruns(spark):
    base = sorted(
        (r.doc_id, r.host_rank)
        for r in host_quota_sample(_df(spark, parts=1), cap=5, id_col="doc_id").collect()
    )
    for parts in (2, 7):
        got = sorted(
            (r.doc_id, r.host_rank)
            for r in host_quota_sample(
                _df(spark, parts=parts), cap=5, id_col="doc_id"
            ).collect()
        )
        assert got == base


def test_salt_changes_selection(spark):
    a = {r.doc_id for r in host_quota_sample(_df(spark), 5, id_col="doc_id", salt="a").collect()}
    b = {r.doc_id for r in host_quota_sample(_df(spark), 5, id_col="doc_id", salt="b").collect()}
    assert a != b  # different fair samples
    assert len(a) == len(b) == 20
