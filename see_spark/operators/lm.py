"""N-gram language-model perplexity scoring for corpus quality filtering.

CCNet (Wenzek et al. 2020, arXiv:1911.00359) filters web text by the
perplexity of a language model trained on a trusted reference corpus
(they use a KenLM 5-gram on Wikipedia); documents are kept by perplexity
bucket. This is the Spark-first equivalent at bigram order:

- **Training is two map-side-combinable aggregates** over the reference
  slice: bigram counts keyed by (w1, w2) and context counts keyed by w1.
  Both tables are vocab-sized, orders of magnitude below the corpus.
- **Scoring is one join of document bigrams against the LM.** Per bigram,
  add-1 smoothed conditional probability P(w2|w1) = (c(w1,w2)+1) /
  (c(w1)+V); the per-bigram negative log-likelihood is quantized to
  integer micro-nats BEFORE the per-document sum, so the document score
  is an order-independent integer sum — bit-exact in any engine and at
  any parallelism (the same strategy as DSIR's quantized weights; the
  per-term round carries the established idf precedent for cross-engine
  float determinism). At 100 TB the LM tables broadcast when small and
  hash-join otherwise; the corpus shuffles once by doc_id for the final
  aggregate.

Unknown contexts degrade gracefully: c(w1) = 0 for OOV, so
P = 1/V — the uniform prior. Documents with fewer than two tokens score
(n_bigrams=0, nll_q=0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NLL_SCALE = 1_000_000  # micro-nats


def _tokens(text_col: str):
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != "")


def _doc_bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    t = _tokens(text_col)
    return (
        docs.select(F.col(id_col).alias("doc_id"), t.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda j: F.struct(
                        F.element_at(F.col("t"), j).alias("w1"),
                        F.element_at(F.col("t"), j + 1).alias("w2"),
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def train_bigram_lm(ref_docs: DataFrame, text_col: str = "text"):
    """Train the add-1 bigram LM on the reference slice. Returns
    (bigrams(w1, w2, c12), contexts(w1, c1), vocab_df) — vocab_df is a
    1-row frame with the distinct-unigram count V, kept as a DataFrame so
    the scorer composes it without a driver round-trip."""
    toks = ref_docs.select(F.explode(_tokens(text_col)).alias("w"))
    contexts_all = toks.groupBy(F.col("w").alias("w1")).agg(
        F.count("*").cast("long").alias("c1")
    )
    vocab = contexts_all.agg(F.count("*").cast("long").alias("v"))
    bi = _doc_bigrams(
        ref_docs.select(F.monotonically_increasing_id().alias("__id"), text_col),
        text_col,
        "__id",
    )
    bigrams = bi.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c12"))
    # context counts must count w1 POSITIONS (all tokens but each doc's
    # last), not raw unigram occurrences — derive from the bigram table so
    # sum(c12 | w1) = c1 exactly
    contexts = bigrams.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    return bigrams, contexts, vocab


def doc_nll(
    docs: DataFrame,
    ref_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document's total bigram negative log-likelihood (in
    integer micro-nats) under the add-1 bigram LM trained on ``ref_docs``.
    Returns (doc_id, n_bigrams, nll_q) — ascending nll_q/n_bigrams is the
    CCNet quality order (head = most reference-like)."""
    bigrams, contexts, vocab = train_bigram_lm(ref_docs, text_col)
    db = _doc_bigrams(docs, text_col, id_col)
    scored = (
        db.join(F.broadcast(bigrams), ["w1", "w2"], "left")
        .join(F.broadcast(contexts), ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                -F.log(
                    (F.coalesce("c12", F.lit(0)) + 1).cast("double")
                    / (F.coalesce("c1", F.lit(0)) + F.col("v")).cast("double")
                )
                * NLL_SCALE
            )
            .cast("long")
            .alias("q"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("q").cast("long").alias("nll_q"),
    )
    all_ids = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return all_ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("nll_q", F.lit(0)).cast("long").alias("nll_q"),
    )


def nll_buckets(
    docs: DataFrame,
    ref_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet's head/middle/tail partition (Wenzek et al. 2020 §4.3): rank
    documents by per-bigram average NLL under the reference LM and split
    at the corpus terciles — head = most reference-like third, the slice
    CCNet keeps outright.

    Determinism: avg_q = (nll_q * 1000) integer-DIV n_bigrams (exact in
    any engine); the tercile thresholds are exact interpolated
    percentiles over the integer avg_q values (the events_median
    convention — Spark ``percentile`` == DuckDB ``quantile_cont``), and
    bucket assignment is avg_q <= threshold. Documents with no bigrams
    have no likelihood evidence and are pinned to 'tail'.

    Scale: scoring is doc_nll's broadcast-LM join; the thresholds are ONE
    global two-value aggregate broadcast back (at 10^10 docs swap the
    exact percentile for approx_percentile — the gate keeps the exact
    form so the oracle can reproduce it bit-for-bit).

    Returns (doc_id, n_bigrams, nll_q, avg_q, bucket).
    """
    scored = doc_nll(docs, ref_docs, text_col, id_col)
    avg_q = F.when(
        F.col("n_bigrams") > 0,
        F.expr("(nll_q * 1000) div n_bigrams"),
    ).cast("long")
    scored = scored.withColumn("avg_q", avg_q)
    thr = F.broadcast(
        scored.filter(F.col("n_bigrams") > 0).agg(
            F.percentile("avg_q", F.lit(1.0 / 3.0)).alias("t1"),
            F.percentile("avg_q", F.lit(2.0 / 3.0)).alias("t2"),
        )
    )
    return scored.crossJoin(thr).select(
        "doc_id", "n_bigrams", "nll_q", "avg_q",
        F.when(F.col("avg_q").isNull(), "tail")
        .when(F.col("avg_q") <= F.col("t1"), "head")
        .when(F.col("avg_q") <= F.col("t2"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


def kneser_ney_bigram(
    ref_docs: DataFrame,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Interpolated Kneser-Ney bigram estimation (Kneser & Ney, ICASSP
    1995; the Chen & Goodman 1998 interpolated form) — the standard
    smoothing for production n-gram LMs, upgrading ``train_bigram_lm``'s
    add-1 model: instead of pretending unseen bigrams were seen once, KN
    discounts every observed count by a fixed D and redistributes the
    held-out mass through the CONTINUATION probability (how many distinct
    contexts a word follows), which famously fixes the "San Francisco"
    problem (frequent word, single context).

        P(w2|w1) = max(c(w1,w2) - D, 0)/c(w1·)
                   + D·N1+(w1,·)/c(w1·) · N1+(·,w2)/N1+(·,·)

    with c(w1·) = Σ_w c(w1,w), N1+ = distinct-bigram-type counts.

    Every input to the formula is an exact BIGINT count (three
    map-side-combinable shuffles over the bigram-type table: by (w1,w2),
    by w1, by w2 — bigram volume, never corpus volume); the probability
    is a fixed-order per-row double formula, so the output is
    bit-identical at any parallelism and term-for-term mirrorable in SQL.
    Rows sum to 1 per context over the full vocab (observed part here +
    the factorized continuation backoff for unseen pairs).

    Returns (w1, w2, c12, p_kn) for every OBSERVED bigram type; the
    backoff distribution for unseen pairs is D·N1+(w1,·)/c(w1·) times
    the continuation table, recoverable from the same aggregates.
    """
    # materialize the bigram-type table once: ctx/rgt/total all derive
    # from it, and without the cut the tokenize+explode corpus pass runs
    # three times (once per aggregate) — at 100 TB that's the whole cost
    bg = (
        _doc_bigrams(ref_docs, text_col, id_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c12"))
        .localCheckpoint(eager=False)
    )
    ctx = bg.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count("*").cast("long").alias("n1l"),
    )
    rgt = bg.groupBy("w2").agg(F.count("*").cast("long").alias("n1r"))
    total = bg.count()
    d = F.lit(float(discount))
    c12d = F.col("c12").cast("double")
    c1d = F.col("c1").cast("double")
    p = F.greatest(c12d - d, F.lit(0.0)) / c1d + (
        d * F.col("n1l").cast("double") / c1d
    ) * (F.col("n1r").cast("double") / F.lit(float(total)))
    return (
        bg.join(ctx, "w1")
        .join(rgt, "w2")
        .select("w1", "w2", "c12", F.round(p, 9).alias("p_kn"))
    )
