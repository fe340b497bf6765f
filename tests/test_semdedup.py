"""SemDeDup (operators/dedup.py:semdedup): pure-Python replica parity on a
hand-built corpus, within-cluster-only comparison semantics, threshold
edges, and partitioning invariance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from see_spark.operators.dedup import semdedup

# two well-separated direction groups; vec_id 0 and 1 seed the two
# clusters (first-N init), remaining vectors are near one of them
VECS = {
    0: [1000, 10, 0, 0],
    1: [0, 0, 1000, 10],
    2: [990, 20, 5, 0],     # ~dup of 0
    3: [500, 400, 0, 0],    # group A, not a dup at high threshold
    4: [0, 5, 995, 15],     # ~dup of 1
    5: [10, 0, 400, 500],   # group B, not a dup at high threshold
}
K = 2
ITERS = 1


def _cos(a, b):
    d = sum(float(x) * float(y) for x, y in zip(a, b))
    na = math.sqrt(sum(float(x) * float(x) for x in a))
    nb = math.sqrt(sum(float(x) * float(x) for x in b))
    return d / (na * nb)


def _replica(threshold):
    """Pure-Python semdedup: first-K init, one Lloyd iteration with exact
    sum/count means, nearest-centroid assign (cosine desc, id asc), then
    min-id keep rule within each cluster."""
    cents = [list(map(float, VECS[i])) for i in range(K)]
    for _ in range(ITERS):
        members = {c: [] for c in range(K)}
        for vid in sorted(VECS):
            best = min(range(K), key=lambda c: (-_cos(VECS[vid], cents[c]), c))
            members[best].append(vid)
        for c in range(K):
            if members[c]:
                n = len(members[c])
                cents[c] = [
                    sum(VECS[m][i] for m in members[c]) / n
                    for i in range(len(cents[c]))
                ]
    assign = {
        vid: min(range(K), key=lambda c: (-_cos(VECS[vid], cents[c]), c))
        for vid in VECS
    }
    keep = {}
    for vid in sorted(VECS):
        dup = any(
            assign[o] == assign[vid]
            and o < vid
            and _cos(VECS[o], VECS[vid]) >= threshold
            for o in VECS
        )
        keep[vid] = 0 if dup else 1
    return assign, keep


def _df(spark, parts=2):
    rows = [(vid, vec) for vid, vec in sorted(VECS.items())]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(parts)


def _run(spark, threshold, parts=2):
    out = semdedup(
        _df(spark, parts), n_clusters=K, threshold=threshold, train_iters=ITERS
    ).collect()
    return (
        {r.vec_id: r.centroid_id for r in out},
        {r.vec_id: r.keep for r in out},
    )


def test_matches_python_replica(spark):
    for threshold in (0.99, 0.9, 0.5):
        assign, keep = _replica(threshold)
        s_assign, s_keep = _run(spark, threshold)
        assert s_assign == assign, f"threshold={threshold}"
        assert s_keep == keep, f"threshold={threshold}"


def test_cross_cluster_dups_not_compared(spark):
    # threshold so low every same-cluster pair is a "dup": exactly one
    # survivor (the min id) per cluster, and both clusters keep one --
    # proof that comparison never crosses cluster boundaries
    _, keep = _run(spark, threshold=-1.0)
    kept = sorted(vid for vid, k in keep.items() if k == 1)
    assign, _ = _replica(-1.0)
    expected = sorted(
        min(v for v in VECS if assign[v] == c) for c in set(assign.values())
    )
    assert kept == expected
    assert len(kept) == K


def test_threshold_above_any_pair_keeps_all(spark):
    _, keep = _run(spark, threshold=1.0000001)
    assert all(k == 1 for k in keep.values())


def test_partitioning_invariance(spark):
    base = _run(spark, 0.9, parts=1)
    for parts in (3, 6):
        assert _run(spark, 0.9, parts=parts) == base


def test_lsh_eval_invariants(spark):
    """found ⊆ exact (verification guarantees precision), found ⊆
    candidates, and the milli ratios are the exact integer divisions."""
    from see_spark.operators.dedup import (
        lsh_candidates, lsh_eval, minhash_lsh_pairs, ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),   # near-dup of 1
            (3, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
            (4, "one two three four five six seven"),
            (5, "totally different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    kw = dict(num_hashes=16, bands=4, n=3)
    row = lsh_eval(docs, threshold=0.2, **kw).collect()[0]
    exact = {(r["doc_a"], r["doc_b"]) for r in
             ngram_jaccard_pairs(docs, n=3, threshold=0.2).collect()}
    cands = {(r["doc_a"], r["doc_b"]) for r in
             lsh_candidates(docs, **kw).collect()}
    found = {(r["doc_a"], r["doc_b"]) for r in
             minhash_lsh_pairs(docs, threshold=0.2, **kw).collect()}
    assert found <= exact and found <= cands
    assert row["n_exact"] == len(exact)
    assert row["n_candidates"] == len(cands)
    assert row["n_found"] == len(found)
    assert row["recall_milli"] == len(found) * 1000 // len(exact)
    assert row["candidate_precision_milli"] == len(found) * 1000 // len(cands)
    # the exact dup pair must be both exact and found (identical signature)
    assert (1, 3) in exact and (1, 3) in found


def test_embedding_audit_arms(spark):
    from see_spark.operators.similarity import embedding_audit

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 0.0]),            # zero norm
            (3, [float("nan"), 1.0, 1.0]),   # nonfinite, excluded from norms
            (4, [0.0, 2.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    r = embedding_audit(emb).collect()[0]
    assert r["n_vectors"] == 4
    assert r["dim_min"] == 3 and r["dim_max"] == 3
    assert r["n_nonfinite"] == 1
    assert r["n_zero_norm"] == 1
    # mean over finite rows: (1e6 + 0 + 4e6) div 3
    assert r["mean_norm2_micro"] == (1_000_000 + 0 + 4_000_000) // 3
