"""BPE training/encoding (operators/bpe.py): pure-Python replica parity,
the greedy within-word merge-order edge ("l l l l" -> "ll ll"), tie-break
pinning, early stop, encode==training-state consistency, and partitioning
invariance."""

from __future__ import annotations

from collections import Counter

import pytest

from see_spark.operators.bpe import bpe_encode, bpe_train


def _replica(texts, n_merges):
    """Pure-Python BPE with the same representation: each symbol wrapped
    in its own spaces, merges applied with str.replace (left-to-right,
    non-overlapping — greedy BPE order)."""
    hist = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                hist[" " + "  ".join(w) + " "] += 1
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for ws, c in hist.items():
            syms = ws.strip().split("  ")
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, c))
        nxt = Counter()
        for ws, cnt in hist.items():
            nxt[ws.replace(f" {l}  {r} ", f" {l}{r} ")] += cnt
        hist = nxt
    return merges, hist


def _replica_tokens(texts, merges):
    out = []
    for doc_id, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]
        n_tokens = 0
        for w in words:
            ws = " " + "  ".join(w) + " "
            for _, l, r, _ in merges:
                ws = ws.replace(f" {l}  {r} ", f" {l}{r} ")
            n_tokens += len(ws.strip().split("  "))
        out.append((doc_id, len(words), n_tokens))
    return out


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
    "aaaa aa a baaab",
]


def _df(spark, texts, parts=2):
    rows = [(i, t) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, ["doc_id", "text"]).repartition(parts)


def test_merge_table_matches_replica(spark):
    for n in (1, 4, 10):
        expected = _replica(CORPUS, n)[0]
        got = [
            (r.rank, r.left, r.right, r.pair_count)
            for r in sorted(bpe_train(_df(spark, CORPUS), n).collect())
        ]
        assert got == expected, f"n_merges={n}"


def test_greedy_within_word_order(spark):
    # "l l l l" must become "ll ll" (two merges of the SAME pair in one
    # pass), not "ll l l" — the double-space wrapping edge
    texts = ["llll llll llll"]
    merges = bpe_train(_df(spark, texts), 1).collect()
    assert (merges[0].left, merges[0].right) == ("l", "l")
    # after one merge each word is ll+ll -> encode yields 2 tokens/word
    enc = bpe_encode(_df(spark, texts), merges).collect()
    assert enc[0].n_tokens == 6  # 3 words x 2 symbols


def test_tiebreak_lexicographic(spark):
    # 'ab' and 'cd' pairs occur equally often -> (a,b) must win
    texts = ["ab cd ab cd"]
    m = bpe_train(_df(spark, texts), 1).collect()[0]
    assert (m.left, m.right) == ("a", "b")


def test_early_stop_single_char_words(spark):
    assert bpe_train(_df(spark, ["a b c d", "e f"]), 5).count() == 0


def test_encode_matches_replica(spark):
    merges_rows = bpe_train(_df(spark, CORPUS), 6).collect()
    merges = [(r.rank, r.left, r.right, r.pair_count) for r in sorted(merges_rows)]
    expected = sorted(_replica_tokens(CORPUS, merges))
    got = sorted(
        (r.doc_id, r.n_words, r.n_tokens)
        for r in bpe_encode(_df(spark, CORPUS), merges_rows).collect()
    )
    assert got == expected


def test_partitioning_invariance(spark):
    base = sorted(map(tuple, bpe_train(_df(spark, CORPUS, parts=1), 4).collect()))
    for parts in (3, 5):
        got = sorted(
            map(tuple, bpe_train(_df(spark, CORPUS, parts=parts), 4).collect())
        )
        assert got == base
