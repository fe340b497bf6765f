"""DSIR importance-resampling selection (operators/selection.py):
hand-computed weight parity on a tiny corpus, determinism across
partitionings, and structural invariants of the k-cut."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from see_spark.operators.selection import dsir_topk

N_BUCKETS = 8
SCALE = 1_000_000


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % N_BUCKETS


def _expected_weights(rows):
    """Pure-Python replica: add-1 smoothed integer likelihood-ratio scores
    per bucket, summed over raw-doc token occurrences."""
    ct = [0] * N_BUCKETS
    cr = [0] * N_BUCKETS
    for _, text, is_target in rows:
        for tok in text.split(" "):
            b = _bucket(tok)
            if is_target:
                ct[b] += 1
            else:
                cr[b] += 1
    score = [((ct[b] + 1) * SCALE) // (cr[b] + 1) for b in range(N_BUCKETS)]
    out = {}
    for doc_id, text, is_target in rows:
        if is_target:
            continue
        out[doc_id] = sum(score[_bucket(t)] for t in text.split(" "))
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # target docs: heavy in 'alpha beta'; raw docs: a gradient from
    # target-like to dissimilar, so weights must strictly separate them
    rows.append((0, "alpha beta alpha beta gamma", 1))
    rows.append((1, "alpha alpha beta beta beta", 1))
    rows.append((2, "alpha beta alpha beta alpha", 0))   # most target-like
    rows.append((3, "alpha beta delta epsilon zeta", 0))
    rows.append((4, "delta epsilon zeta eta theta", 0))  # least target-like
    rows.append((5, "gamma gamma gamma gamma gamma", 0))
    rows.append((6, "", 0))  # empty text -> single '' token, still scored
    return rows


def _df(spark, rows, parts=1):
    return spark.createDataFrame(
        rows, ["doc_id", "text", "is_target"]
    ).repartition(parts)


def test_weights_match_python_replica(spark, corpus):
    out = dsir_topk(_df(spark, corpus), k=100, n_buckets=N_BUCKETS, scale=SCALE)
    got = {r["doc_id"]: r["weight"] for r in out.collect()}
    assert got == _expected_weights(corpus)


def test_target_docs_never_returned(spark, corpus):
    out = dsir_topk(_df(spark, corpus), k=100, n_buckets=N_BUCKETS, scale=SCALE)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {2, 3, 4, 5, 6}


def test_k_cut_order_and_tiebreak(spark, corpus):
    rows = dsir_topk(
        _df(spark, corpus), k=3, n_buckets=N_BUCKETS, scale=SCALE
    ).collect()
    assert len(rows) == 3
    exp = _expected_weights(corpus)
    want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r["doc_id"], r["weight"]) for r in rows] == want


def test_partitioning_invariance(spark, corpus):
    a = dsir_topk(_df(spark, corpus, 1), k=100, n_buckets=N_BUCKETS, scale=SCALE)
    b = dsir_topk(_df(spark, corpus, 7), k=100, n_buckets=N_BUCKETS, scale=SCALE)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_broadcast_and_kcut_plan_shape(spark, corpus):
    """Scale guards: the bucket-score join must be broadcast (64 rows) and
    the k-cut must be TakeOrderedAndProject, not a global sort."""
    plan = dsir_topk(
        _df(spark, corpus), k=3, n_buckets=N_BUCKETS, scale=SCALE
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_budget_select_prefix_cut_and_tiebreak(spark):
    """Greedy fill in (score desc, doc_id asc) order: the cut is a prefix
    — the doc that crosses the budget and everything after it is out,
    even if a later cheaper doc would have fit."""
    from see_spark.operators.selection import budget_select

    rows = [
        # (doc_id, score, n_tokens)
        (1, 50, 400), (2, 90, 300), (3, 70, 300), (4, 70, 200),
        (5, 10, 50),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, score long, n_tokens long")
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in budget_select(docs, token_budget=800).collect()
    }
    # order: 2(300) -> 4(500, ties 3/4 broken by doc_id? score 70 tie ->
    # doc 3 first by id) => 2(300), 3(600), 4(800), then 1 would hit 1200
    # and 5 would be 1250 — both out despite 5 alone fitting.
    assert got == {2: 300, 3: 600, 4: 800}


def test_budget_select_matches_sql_window(spark):
    """Same cut as the single-window SQL form on a bigger frame."""
    from pyspark.sql import functions as F

    from see_spark.operators.selection import budget_select

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37) % 101).alias("score"),
        ((F.col("id") * 13) % 29 + 1).alias("n_tokens"),
    )
    got = sorted(
        r["doc_id"] for r in budget_select(docs, token_budget=2000).collect()
    )
    docs.createOrReplaceTempView("sel_docs")
    want = sorted(
        r["doc_id"]
        for r in spark.sql(
            """
            SELECT doc_id FROM (
              SELECT doc_id, SUM(n_tokens) OVER (
                ORDER BY score DESC, doc_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
              FROM sel_docs) WHERE c <= 2000
            """
        ).collect()
    )
    assert got == want and len(got) > 0
