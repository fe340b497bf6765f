"""Rice/Elias-Fano costing vs a pure-Python bit-accounting reference:
dense lists favor EF, sparse geometric gaps favor Rice, raw wins only
for singletons-ish lists; exact integer parity throughout."""

from __future__ import annotations

from see_spark.operators.indexstats import compression_size_audit


def _ref(postings, min_docs=2):
    by_word = {}
    for w, d in postings:
        by_word.setdefault(w, []).append(d)
    out = {}
    for w, ids in by_word.items():
        ids.sort()
        if len(ids) < min_docs:
            continue
        n = len(ids)
        u = ids[-1] + 1
        gaps = [ids[0] + 1] + [b - a for a, b in zip(ids, ids[1:])]
        k = max(u // n, 1).bit_length() - 1
        rice = sum((g >> k) + 1 + k for g in gaps)
        ef = n * k + n + (u >> k)
        raw = 64 * n
        best = "rice" if rice <= ef and rice <= raw else ("ef" if ef <= raw else "raw")
        out[w] = (n, u, raw, k, rice, k, ef, best)
    return out


def test_matches_bit_accounting(spark):
    postings = (
        [("dense", i) for i in range(0, 100)]            # gap 1 everywhere
        + [("sparse", i * 997) for i in range(20)]        # big uniform gaps
        + [("mixed", x) for x in [0, 1, 2, 500, 501, 10_000]]
        + [("single", 42)]                                # below min_docs
    )
    df = spark.createDataFrame(postings, "word string, doc_id long")
    got = {
        r["word"]: (
            r["n_docs"], r["universe"], r["raw_bits"], r["rice_k"],
            r["rice_bits"], r["ef_l"], r["ef_bits"], r["best"],
        )
        for r in compression_size_audit(df).collect()
    }
    assert got == _ref(postings)
    assert "single" not in got


def test_dense_list_compresses_far_below_raw(spark):
    postings = [("w", i) for i in range(1000)]
    df = spark.createDataFrame(postings, "word string, doc_id long")
    r = compression_size_audit(df).collect()[0]
    # gap-1 list: ~2 bits/doc under Rice (k=0 -> 2n), 64 under raw
    assert r["rice_bits"] <= 2 * r["n_docs"]
    assert r["best"] in ("rice", "ef")
    assert r["ef_bits"] < r["raw_bits"] // 10


def test_partitioning_invariant(spark):
    postings = [(f"w{i % 7}", (i * 13) % 500) for i in range(300)]
    postings = list({(w, d) for w, d in postings})
    df = spark.createDataFrame(postings, "word string, doc_id long")
    a = sorted(map(tuple, compression_size_audit(df).collect()))
    b = sorted(
        map(tuple, compression_size_audit(df.repartition(9)).collect())
    )
    assert a == b
