"""simjoin: prefix-filter completeness vs brute force, KMV estimator laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from see_spark.operators.simjoin import (
    kmv_jaccard_pairs,
    kmv_sketches,
    ppjoin_pairs,
    token_sets,
)

DOCS = [
    # two exact duplicates
    (1, "alpha beta gamma delta epsilon zeta"),
    (2, "alpha beta gamma delta epsilon zeta"),
    # a near-duplicate (one token swapped)
    (3, "alpha beta gamma delta epsilon theta"),
    # heavy stopword overlap but different content words
    (4, "the quick brown fox jumps over the lazy dog"),
    (5, "the slow white cat sleeps under the lazy sun"),
    # unrelated
    (6, "completely different words entirely here"),
    # short docs
    (7, "alpha beta"),
    (8, "alpha beta"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _brute_pairs(spark, docs, t_milli):
    """Brute-force token-set Jaccard join: the completeness referee."""
    toks = token_sets(docs)
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    ta = toks.select(F.col("doc_id").alias("doc_a"), "word")
    tb = toks.select(F.col("doc_id").alias("doc_b"), "word")
    common = (
        ta.join(tb, "word")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("size_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("size_b")),
            "doc_b",
        )
        .where(
            F.lit(1000) * F.col("inter")
            >= F.lit(t_milli) * (F.col("size_a") + F.col("size_b") - F.col("inter"))
        )
        .select(
            "doc_a", "doc_b",
            F.col("inter").cast("long").alias("inter"),
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
            F.expr("(1000 * inter) div (size_a + size_b - inter)")
            .cast("long").alias("jac_milli"),
        )
    )
    return sorted(tuple(r) for r in out.collect())


def test_ppjoin_matches_brute_force_at_multiple_thresholds(spark):
    docs = _docs_df(spark)
    for t in (300, 500, 800, 1000):
        got = sorted(tuple(r) for r in ppjoin_pairs(docs, t).collect())
        want = _brute_pairs(spark, docs, t)
        assert got == want, f"threshold {t}: {got} != {want}"
    # sanity: the low threshold actually exercises pruning with survivors
    assert len(_brute_pairs(spark, docs, 300)) >= 3


def test_ppjoin_exact_dup_pair_scores_1000(spark):
    rows = {(r.doc_a, r.doc_b): r for r in ppjoin_pairs(_docs_df(spark), 500).collect()}
    assert rows[(1, 2)].jac_milli == 1000
    assert rows[(7, 8)].jac_milli == 1000
    # near-dup 1-3: 5 shared of 7 union -> 714, above 500 but below 800
    assert rows[(1, 3)].jac_milli == 714
    assert (1, 3) not in {
        (r.doc_a, r.doc_b) for r in ppjoin_pairs(_docs_df(spark), 800).collect()
    }


def test_ppjoin_threshold_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        ppjoin_pairs(_docs_df(spark), 0)
    with pytest.raises(ValueError):
        ppjoin_pairs(_docs_df(spark), 1001)


def test_kmv_sketch_is_bottom_k(spark):
    docs = _docs_df(spark)
    k = 4
    sk = kmv_sketches(docs, k=k, n=2)
    per_doc = sk.groupBy("doc_id").agg(
        F.count("*").alias("cnt"), F.max("khash").alias("mx")
    )
    from see_spark.operators.dedup import hash60, word_shingles

    all_h = (
        word_shingles(docs, 2)
        .select(F.col("doc_id").cast("long").alias("doc_id"),
                hash60(F.col("shingle")).alias("khash"))
    )
    n_sh = all_h.groupBy("doc_id").agg(F.count("*").alias("n"))
    for r in per_doc.join(n_sh, "doc_id").collect():
        assert r.cnt == min(k, r.n)
    # every sketch hash really is among the doc's k smallest
    joined = sk.join(all_h.withColumnRenamed("khash", "h2"), "doc_id")
    bigger = (
        joined.groupBy("doc_id", "khash")
        .agg(F.sum((F.col("h2") < F.col("khash")).cast("int")).alias("smaller"))
        .where(F.col("smaller") >= k)
        .count()
    )
    assert bigger == 0


def test_kmv_estimate_exact_for_identical_docs(spark):
    est = {
        (r.doc_a, r.doc_b): r
        for r in kmv_jaccard_pairs(_docs_df(spark), k=8, n=2).collect()
    }
    assert est[(1, 2)].est_milli == 1000
    assert est[(1, 2)].true_milli == 1000
    assert est[(7, 8)].est_milli == 1000


def test_kmv_estimator_bounds_and_truth_positive(spark):
    rows = kmv_jaccard_pairs(_docs_df(spark), k=8, n=2).collect()
    assert rows
    for r in rows:
        assert 1 <= r.k_used <= 8
        assert 0 <= r.matching <= r.k_used
        assert 0 <= r.est_milli <= 1000
        # candidates share a sketch hash = share a shingle, so truth > 0
        assert r.true_milli >= 1
