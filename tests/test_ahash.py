"""Perceptual average-hash: bit semantics vs a numpy reference, exact
duplicates at Hamming 0, single-byte edits within small Hamming, banding
recall equals brute force, and pure-Catalyst plan (no Python UDF)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from see_spark.operators.multimodal import ahash, ahash_near_dup_pairs


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id string, text string").select(
        "media_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )


def _ref_ahash(data: bytes, nb=60):
    b = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    n = len(b)
    total = int(b.sum())
    h = 0
    for j in range(nb):
        lo, hi = j * n // nb, (j + 1) * n // nb
        s = int(b[lo:hi].sum())
        if s * n > total * (hi - lo):
            h |= 1 << (nb - 1 - j)
    return h


def test_ahash_matches_numpy_reference(spark):
    rows = [
        ("a", "hello world this is a longer test payload with text"),
        ("b", "x"),
        ("c", "aaaa bbbb cccc dddd eeee ffff gggg hhhh " * 4),
    ]
    got = {
        r["media_id"]: (r["n_bytes"], r["ahash"])
        for r in ahash(_media(spark, rows)).collect()
    }
    for mid, text in rows:
        data = text.encode()
        assert got[mid] == (len(data), _ref_ahash(data)), mid


def test_ahash_short_and_empty_payloads(spark):
    rows = [("e", ""), ("s", "ab")]
    got = {
        r["media_id"]: (r["n_bytes"], r["ahash"])
        for r in ahash(_media(spark, rows)).collect()
    }
    assert got["e"] == (0, 0)
    assert got["s"] == (2, _ref_ahash(b"ab"))


def test_exact_dup_pairs_at_hamming_zero(spark):
    base = "the quick brown fox jumps over the lazy dog " * 3
    rows = [("1", base), ("2", base), ("3", "completely different " * 8)]
    pairs = ahash_near_dup_pairs(_media(spark, rows), max_hamming=3).collect()
    got = {(r["media_a"], r["media_b"]): r["hamming"] for r in pairs}
    assert got.get(("1", "2")) == 0


def test_banding_recall_equals_bruteforce(spark):
    # payloads forming a gradient of closeness; banding must find every
    # pair that brute-force Hamming <= 3 finds
    base = bytearray((b"abcdefgh" * 16))
    rows = [("0", base.decode())]
    for i in range(1, 8):
        mod = bytearray(base)
        for k in range(i):
            mod[k * 16] = ord("z")  # progressively more edits
        rows.append((str(i), mod.decode()))
    hashes = {m: _ref_ahash(t.encode()) for m, t in rows}
    want = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for a in hashes
        for b in hashes
        if a < b and bin(hashes[a] ^ hashes[b]).count("1") <= 3
    }
    got = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in ahash_near_dup_pairs(_media(spark, rows), max_hamming=3).collect()
    }
    assert got == want


def test_ahash_is_pure_catalyst(spark):
    df = ahash(_media(spark, [("a", "some text")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
