"""Product-quantization ANN (similarity.py knn_pq/pq_encode): exactness of
the integer ADC against a plain-Python reference, encode determinism, the
self-query sanity property, and plan quality (the corpus scoring path must
be shuffle-free, pure codegen)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from see_spark.operators.similarity import knn_pq, pq_codebooks, pq_encode

DIM = 8
M = 2
N_CODES = 4


def _mkvecs(rng, n):
    return [(i, [int(x) for x in rng.integers(-50, 51, DIM)]) for i in range(n)]


@pytest.fixture(scope="module")
def pq_corpus(spark):
    rng = np.random.default_rng(7)
    rows = _mkvecs(rng, 40)
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<long>"
    )


def _py_codebooks(rows):
    dsub = DIM // M
    return [
        [rows[j][1][s * dsub : (s + 1) * dsub] for j in range(N_CODES)]
        for s in range(M)
    ]


def _py_encode(vec, cbs):
    dsub = DIM // M
    codes = []
    for s, cb in enumerate(cbs):
        sv = vec[s * dsub : (s + 1) * dsub]
        dists = [sum((a - b) ** 2 for a, b in zip(sv, c)) for c in cb]
        codes.append(dists.index(min(dists)))  # first min = lowest code
    return codes


def test_pq_encode_matches_python_reference(pq_corpus):
    rows, df = pq_corpus
    cbs = pq_codebooks(
        df.select(F.col("vec_id"), F.col("embedding").alias("vec")),
        m=M, n_codes=N_CODES, dim=DIM,
    )
    assert cbs == _py_codebooks(rows)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(
            df.select("vec_id", F.col("embedding").alias("vec")), cbs, dim=DIM
        ).collect()
    }
    for vid, vec in rows:
        assert got[vid] == _py_encode(vec, cbs), vid


def test_knn_pq_matches_python_adc(pq_corpus):
    rows, df = pq_corpus
    cbs = _py_codebooks(rows)
    dsub = DIM // M
    queries = [(100, rows[3][1]), (101, rows[17][1])]
    qdf = df.sparkSession.createDataFrame(
        queries, "query_id long, query_vec array<long>"
    )
    got = knn_pq(df, qdf, k=5, m=M, n_codes=N_CODES, dim=DIM).collect()
    for qid, qvec in queries:
        expected = []
        for vid, vec in rows:
            codes = _py_encode(vec, cbs)
            adc = sum(
                sum(
                    (q - c) ** 2
                    for q, c in zip(
                        qvec[s * dsub : (s + 1) * dsub], cbs[s][codes[s]]
                    )
                )
                for s in range(M)
            )
            expected.append((adc, vid))
        expected.sort()
        mine = [
            (r["adc_dist"], r["vec_id"])
            for r in sorted(
                (r for r in got if r["query_id"] == qid),
                key=lambda r: r["rank"],
            )
        ]
        assert mine == expected[:5], qid


def test_pq_self_query_ranks_exact_code_matches_first(pq_corpus):
    """A query equal to a codebook seed vector has adc_dist 0 to itself
    (its codes reconstruct it exactly), so it must rank itself first."""
    rows, df = pq_corpus
    qdf = df.sparkSession.createDataFrame(
        [(0, rows[0][1])], "query_id long, query_vec array<long>"
    )
    top = knn_pq(df, qdf, k=1, m=M, n_codes=N_CODES, dim=DIM).collect()[0]
    assert top["vec_id"] == 0 and top["adc_dist"] == 0


def test_pq_partitioning_invariance(pq_corpus):
    _, df = pq_corpus
    qdf = df.sparkSession.createDataFrame(
        [(0, [1] * DIM)], "query_id long, query_vec array<long>"
    )
    a = knn_pq(df.repartition(1), qdf, k=7, m=M, n_codes=N_CODES, dim=DIM)
    b = knn_pq(
        df.repartition(5, "vec_id"), qdf, k=7, m=M, n_codes=N_CODES, dim=DIM
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pq_scoring_path_is_shuffle_free(pq_corpus):
    """Up to the top-k window, the corpus side must see NO exchange and no
    Python eval — encoding and ADC scoring are codegen projections over a
    broadcast nested loop."""
    _, df = pq_corpus
    qdf = df.sparkSession.createDataFrame(
        [(0, [1] * DIM)], "query_id long, query_vec array<long>"
    )
    cbs = pq_codebooks(
        df.select("vec_id", F.col("embedding").alias("vec")),
        m=M, n_codes=N_CODES, dim=DIM,
    )
    codes = pq_encode(
        df.select("vec_id", F.col("embedding").alias("vec")), cbs, dim=DIM
    )
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    full = knn_pq(df, qdf, k=3, m=M, n_codes=N_CODES, dim=DIM)
    fplan = full._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in fplan


def test_ivfpq_full_probe_equals_pq(pq_corpus):
    """nprobe = n_centroids touches every list, so IVF-PQ must reproduce
    plain PQ exactly (same codes, same ADC, same ranks)."""
    from see_spark.operators.similarity import knn_ivfpq

    _, df = pq_corpus
    qdf = df.sparkSession.createDataFrame(
        [(0, [3] * DIM), (1, [-9] * DIM)], "query_id long, query_vec array<long>"
    )
    full = knn_ivfpq(
        df, qdf, k=6, n_centroids=3, nprobe=3, m=M, n_codes=N_CODES, dim=DIM
    ).collect()
    plain = knn_pq(df, qdf, k=6, m=M, n_codes=N_CODES, dim=DIM).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, plain))


def test_ivfpq_probe_restricts_candidates(pq_corpus):
    """nprobe=1 results are a subset of the full-probe candidate set and
    every returned vec shares a probed list with its query."""
    from see_spark.operators.similarity import knn_ivfpq

    _, df = pq_corpus
    qdf = df.sparkSession.createDataFrame(
        [(0, [3] * DIM)], "query_id long, query_vec array<long>"
    )
    narrow = knn_ivfpq(
        df, qdf, k=40, n_centroids=3, nprobe=1, m=M, n_codes=N_CODES, dim=DIM
    ).collect()
    wide = knn_ivfpq(
        df, qdf, k=40, n_centroids=3, nprobe=3, m=M, n_codes=N_CODES, dim=DIM
    ).collect()
    assert 0 < len(narrow) < len(wide)  # probing genuinely restricts
    assert {r["vec_id"] for r in narrow} <= {r["vec_id"] for r in wide}
    # ADC distances agree on the shared candidates
    wd = {r["vec_id"]: r["adc_dist"] for r in wide}
    assert all(wd[r["vec_id"]] == r["adc_dist"] for r in narrow)

