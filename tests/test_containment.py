"""Containment: quote-page inside a long article scores ~1000 where
Jaccard stays low (the case containment exists for), exact values vs
brute force, threshold, and the df cap."""

from __future__ import annotations

from see_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs


def _shingles(text, n=3):
    t = text.split(" ")
    if len(t) <= n:
        return {" ".join(t)}
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


def test_quote_page_high_containment_low_jaccard(spark):
    article = " ".join(f"w{i}" for i in range(100))
    quote = " ".join(f"w{i}" for i in range(40, 52))  # verbatim slice
    new = spark.createDataFrame([(1, quote)], "doc_id long, text string")
    old = spark.createDataFrame([(2, article)], "doc_id long, text string")
    got = containment_pairs(new, old, threshold_milli=500).collect()
    assert len(got) == 1
    r = got[0]
    sa, sb = _shingles(quote), _shingles(article)
    want = len(sa & sb) * 1000 // len(sa)
    assert (r["new_id"], r["old_id"]) == (1, 2)
    assert r["containment_milli"] == want and want == 1000
    # the symmetric Jaccard on the union corpus would NOT flag this pair
    both = spark.createDataFrame(
        [(1, quote), (2, article)], "doc_id long, text string"
    )
    jac = ngram_jaccard_pairs(both, n=3, threshold=0.5).collect()
    assert jac == []


def test_threshold_and_exact_values(spark):
    new = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y z q r s")], "doc_id long, text string"
    )
    old = spark.createDataFrame(
        [(10, "a b c d e f g h"), (11, "completely other words here now")],
        "doc_id long, text string",
    )
    got = {
        (r["new_id"], r["old_id"]): r["containment_milli"]
        for r in containment_pairs(new, old, threshold_milli=100).collect()
    }
    s1, s10 = _shingles("a b c d e f"), _shingles("a b c d e f g h")
    assert got == {(1, 10): len(s1 & s10) * 1000 // len(s1)}
