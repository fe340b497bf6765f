"""Document chunking (packing.py:chunk_documents): tiling replica,
full-coverage + exact-overlap invariants, edge sizes, zero-shuffle plan,
and partitioning invariance."""

from __future__ import annotations

import pytest

from see_spark.operators.packing import chunk_documents


def _replica(texts, chunk, overlap):
    stride = chunk - overlap
    out = []
    for doc_id, text in texts:
        toks = [w for w in text.split(" ") if w]
        n = len(toks)
        if n == 0:
            continue
        n_chunks = 1 + max(0, -(-(n - chunk) // stride)) if n > chunk else 1
        for i in range(n_chunks):
            sl = toks[i * stride:i * stride + chunk]
            out.append((doc_id, i, i * stride + 1, len(sl), " ".join(sl)))
    return sorted(out)


def _docs(k_tokens):
    return [(i, " ".join(f"t{i}w{j}" for j in range(k)))
            for i, k in enumerate(k_tokens)]


def _run(spark, texts, chunk, overlap, parts=3):
    df = spark.createDataFrame(texts, ["doc_id", "text"]).repartition(parts)
    return sorted(
        map(tuple, chunk_documents(df, chunk, overlap).collect())
    )


def test_matches_replica(spark):
    texts = _docs([1, 7, 8, 9, 16, 17, 40, 100]) + [(99, "")]
    for chunk, overlap in ((8, 2), (8, 0), (5, 4)):
        assert _run(spark, texts, chunk, overlap) == _replica(
            texts, chunk, overlap
        ), (chunk, overlap)


def test_coverage_and_overlap(spark):
    texts = _docs([53])
    rows = _run(spark, texts, 16, 4)
    toks = texts[0][1].split(" ")
    covered = set()
    for _, cid, start, n_tok, body in rows:
        words = body.split(" ")
        assert words == toks[start - 1:start - 1 + n_tok]
        covered.update(range(start, start + n_tok))
    assert covered == set(range(1, 54))  # every token in >= 1 chunk
    # consecutive chunks overlap by exactly `overlap` positions
    starts = [r[2] for r in rows]
    assert all(b - a == 12 for a, b in zip(starts, starts[1:]))
    # final chunk reaches the last token
    last = rows[-1]
    assert last[2] + last[3] - 1 == 53


def test_doc_shorter_than_chunk(spark):
    rows = _run(spark, _docs([5]), 16, 4)
    assert rows == [(0, 0, 1, 5, " ".join(f"t0w{j}" for j in range(5)))]


def test_invalid_overlap_rejected(spark):
    df = None
    with pytest.raises(ValueError):
        chunk_documents("unused", chunk_tokens=8, overlap=8)


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame(_docs([40]), ["doc_id", "text"])
    plan = (
        chunk_documents(df, 8, 2)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_partitioning_invariance(spark):
    texts = _docs([1, 40, 100])
    assert _run(spark, texts, 16, 4, parts=1) == _run(
        spark, texts, 16, 4, parts=7
    )
