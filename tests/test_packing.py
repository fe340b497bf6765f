"""Sequence packing (packing.py) + decontamination (textfilters.py):
structural invariants on hand-built corpora and partitioning invariance
(both are pure value-derived plans — results may never depend on how the
input happens to be split across tasks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from see_spark.operators.packing import pack_sequences
from see_spark.operators.textfilters import decontaminate

CTX = 16


@pytest.fixture(scope="module")
def pack_corpus(spark):
    # token counts chosen to force every packing case: doc shorter than a
    # sequence, doc exactly one sequence, doc spanning 3+ sequences
    rows = []
    for i, n in enumerate([5, 16, 40, 3, 20, 1, 33, 16, 7, 50]):
        rows.append((i, " ".join(f"t{i}_{j}" for j in range(n))))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pack_covers_every_token_exactly_once(pack_corpus):
    out = pack_sequences(pack_corpus, ctx_len=CTX, n_buckets=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    n_tokens = {
        r["doc_id"]: len(r["text"].split(" "))
        for r in pack_corpus.collect()
    }
    assert set(by_doc) == set(n_tokens)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["tok_start"])
        # slices tile [0, n_tokens) contiguously, no overlap, no gap
        assert rows[0]["tok_start"] == 0
        assert rows[-1]["tok_end"] == n_tokens[doc_id]
        for a, b in zip(rows, rows[1:]):
            assert a["tok_end"] == b["tok_start"]
        assert all(r["n_tokens"] == n_tokens[doc_id] for r in rows)


def test_pack_sequences_are_full_except_bucket_tail(pack_corpus):
    out = pack_sequences(pack_corpus, ctx_len=CTX, n_buckets=3).collect()
    fill = {}
    for r in out:
        fill[r["seq_id"]] = fill.get(r["seq_id"], 0) + (
            r["tok_end"] - r["tok_start"]
        )
        assert 0 <= r["seq_off"] < CTX
    last_per_bucket = {}
    for sid in fill:
        b = sid >> 40
        last_per_bucket[b] = max(last_per_bucket.get(b, -1), sid)
    for sid, n in fill.items():
        if sid == last_per_bucket[sid >> 40]:
            assert 1 <= n <= CTX  # ragged tail allowed
        else:
            assert n == CTX


def test_pack_partitioning_invariance(spark, pack_corpus):
    a = pack_sequences(pack_corpus.repartition(1), ctx_len=CTX, n_buckets=3)
    b = pack_sequences(
        pack_corpus.repartition(7, "text"), ctx_len=CTX, n_buckets=3
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_seq_off_consistent_with_doc_order(pack_corpus):
    """Within one sequence, slices from different docs are disjoint in
    [seq_off, seq_off + slice_len) and ordered by in-bucket doc order."""
    out = pack_sequences(pack_corpus, ctx_len=CTX, n_buckets=2).collect()
    by_seq = {}
    for r in out:
        by_seq.setdefault(r["seq_id"], []).append(r)
    for rows in by_seq.values():
        rows.sort(key=lambda r: r["seq_off"])
        cur = rows[0]["seq_off"]
        for r in rows:
            assert r["seq_off"] == cur
            cur += r["tok_end"] - r["tok_start"]
        assert cur <= CTX


@pytest.fixture(scope="module")
def decon_corpus(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text about spark shuffles and joins"),
            (3, "quick brown fox jumps over nothing else here at all"),
            (4, "tiny doc"),  # < n tokens
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [("b1", "the quick brown fox jumps over the lazy dog")],
        ["bench_id", "text"],
    )
    return train, bench


def test_decontaminate_flags_overlap(decon_corpus):
    train, bench = decon_corpus
    out = {r["doc_id"]: r for r in decontaminate(train, bench, n=5).collect()}
    # doc 1 contains the full benchmark passage -> many 5-gram hits
    assert out[1]["contaminated"] == 1 and out[1]["n_contaminated"] >= 5
    # doc 3 shares "quick brown fox jumps over" = exactly one 5-gram
    assert out[3]["contaminated"] == 1 and out[3]["n_contaminated"] == 1
    # doc 2 shares nothing
    assert out[2]["contaminated"] == 0 and out[2]["n_contaminated"] == 0
    # sub-n doc: zero n-grams, never flagged
    assert out[4]["n_ngrams"] == 0 and out[4]["contaminated"] == 0


def test_decontaminate_min_hits_threshold(decon_corpus):
    train, bench = decon_corpus
    out = {
        r["doc_id"]: r
        for r in decontaminate(train, bench, n=5, min_hits=2).collect()
    }
    assert out[1]["contaminated"] == 1
    assert out[3]["contaminated"] == 0  # one hit < threshold


def test_decontaminate_counts_distinct_ngrams_once(spark):
    train = spark.createDataFrame(
        [(1, "a b c d e a b c d e a b c d e")], ["doc_id", "text"]
    )
    bench = spark.createDataFrame([("b", "a b c d e")], ["bench_id", "text"])
    row = decontaminate(train, bench, n=5).collect()[0]
    # repeated occurrences of the same 5-gram count once (distinct set):
    # 11 positional 5-grams cycle through exactly 5 distinct rotations,
    # of which exactly one ("a b c d e") is in the benchmark
    assert row["n_ngrams"] == 5
    assert row["n_contaminated"] == 1


def test_epoch_mix_copy_counts_and_determinism(spark):
    from see_spark.operators.packing import epoch_mix

    docs = spark.createDataFrame(
        [(i, "up" if i < 200 else ("down" if i < 400 else "flat"))
         for i in range(600)],
        ["doc_id", "source"],
    )
    out = epoch_mix(
        docs, weights={"up": 2300, "down": 400}, default_weight=1000
    ).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["copy"])
    # integer part: every 'up' doc >= 2 copies, numbered 0..n-1
    ups = [len(per_doc.get(i, [])) for i in range(200)]
    assert all(n in (2, 3) for n in ups)
    # fractional part ~30% of 200 (hash-bucketed, not exact): wide bounds
    assert 30 <= sum(1 for n in ups if n == 3) <= 90
    downs = [len(per_doc.get(i, [])) for i in range(200, 400)]
    assert all(n in (0, 1) for n in downs)
    assert 40 <= sum(downs) <= 120  # ~40% of 200
    flats = [len(per_doc.get(i, [])) for i in range(400, 600)]
    assert flats == [1] * 200  # default weight 1000 = exactly once
    for copies in per_doc.values():
        assert sorted(copies) == list(range(len(copies)))
    # deterministic across partitionings
    again = epoch_mix(
        docs.repartition(7, "source"), weights={"up": 2300, "down": 400},
        default_weight=1000,
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_epoch_mix_plan_has_no_shuffle(spark):
    from see_spark.operators.packing import epoch_mix

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    plan = (
        epoch_mix(docs, weights={"a": 1500})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan
