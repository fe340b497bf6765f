"""Trainable quality classifier (the fastText / DCLM filtering shape).

Engine addition: modern corpus curation (Li et al. 2024 DCLM, Penedo et
al. 2024 FineWeb-Edu) filters crawled text with a LEARNED linear
classifier over hashed bag-of-words features, not just hand rules. The
reference has no learned component at all; this module adds
full-batch logistic-regression training AND inference as Spark
aggregation plans.

Cross-engine exactness (the repo-wide gate rule) is achieved by doing
the ENTIRE training loop in int64 fixed point — no float ever enters a
distributed aggregate, so no accumulation-order sensitivity exists to
pin:

- features: hashed-unigram PRESENCE (x_j in {0,1}), bucket = md5
  16-bit prefix mod d (the selection.py/dedup.py pinned hash), plus a
  bias feature always 1. Binary features keep the problem perfectly
  conditioned — raw counts let high-frequency buckets and the bias
  dwarf the informative ones and full-batch GD oscillates (measured:
  count features plateau at the base rate where presence features
  reach 100% on a separable corpus).
- weights: int64 in units of 1/FP (FP = 2^20).
- margin:  z_int = sum over present buckets of w_j — an int64 sum,
  exact and order-independent (no rounding anywhere).
- sigmoid: the "fast sigmoid" rational approximation
  p = 1/2 + z / (2*(1+|z|)), evaluated in fixed point as
  p_fp = FP/2 + sign(z) * ((|z_int| * FP) div (2*(FP + |z_int|))) —
  integer division on non-negative operands, identical in Spark
  (`div`), DuckDB (`//`), and Python (`//`). Monotone, p(0)=1/2,
  saturating — the standard sigmoid surrogate for quantized training.
- gradient: g_j = sum over docs containing bucket j of (p_fp - y*FP)
  — int64 exact.
- update:   w_j -= sign(g_j) * ((lr_num * |g_j|) div (lr_den * n_docs))
  — again non-negative integer division only.

Scale shape (the 100 TB audit): the (doc_id, bucket) presence table
is built once (one explode + one map-side-combinable distinct) and
persisted; each iteration is (a) a broadcast join of the d+1-row weight
table + a doc_id-keyed sum for z, (b) a doc_id join for the error, (c)
a bucket-keyed sum for the gradient — d+1 result rows collected per
iteration (O(d), never O(docs)). Inference is one broadcast join + one
doc_id aggregate. Overflow bound: |p_fp - y*FP| <= FP = 2^20 and presence is 0/1, so
the per-bucket gradient sum is < FP * n_docs; int64 holds to ~8.8e12
documents — beyond a 10^10-URL crawl.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .selection import _bucket

FP = 1 << 20
DEFAULT_BUCKETS = 64


def featurize_presence(
    docs: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket) hashed-unigram PRESENCE rows (distinct buckets
    per document), plus one bias row per document at bucket =
    n_buckets. One explode + one map-side-combinable distinct."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    present = toks.select(
        "doc_id", _bucket(F.col("tok"), n_buckets).alias("bucket")
    ).distinct()
    bias = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.lit(n_buckets).cast("long").alias("bucket"),
    )
    return present.unionByName(bias)


# fixed-point fast sigmoid over a column named z_int:
# FP/2 + sign(z)*((|z|*FP) div (2*(FP+|z|))) — non-negative operands only,
# so Spark `div`, DuckDB `//`, and Python `//` all agree
P_FP_SQL = (
    f"cast({FP // 2}L"
    " + (case when z_int > 0 then 1L when z_int < 0 then -1L else 0L end)"
    f" * ((abs(z_int) * {FP}L) div (2L * ({FP}L + abs(z_int))))"
    " as bigint)"
)


def _scores(spark, counts: DataFrame, weights: Sequence[int]) -> DataFrame:
    """(doc_id, z_int, p_fp) for the given weight vector."""
    wdf = spark.createDataFrame(
        [(int(j), int(w)) for j, w in enumerate(weights)], "bucket long, w long"
    )
    z = (
        counts.join(F.broadcast(wdf), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("w").cast("long").alias("z_int"))
    )
    return z.withColumn("p_fp", F.expr(P_FP_SQL))


def train_logreg_quantized(
    docs: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    iters: int = 8,
    lr_num: int = 1,
    lr_den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
) -> List[int]:
    """Full-batch quantized logistic regression; returns the final
    int64 weight vector (n_buckets features + bias), starting from all
    zeros. ``docs[label_col]`` must be 0/1. Every iteration collects
    exactly n_buckets+1 rows to the driver (the gradient), never data.
    """
    spark = docs.sparkSession
    labels = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(label_col).cast("long").alias("y"),
    )
    counts = featurize_presence(docs, n_buckets, text_col, id_col).persist()
    n_docs = labels.count()
    weights = [0] * (n_buckets + 1)
    for _ in range(iters):
        err = (
            _scores(spark, counts, weights)
            .join(labels, "doc_id")
            .select("doc_id", (F.col("p_fp") - F.col("y") * F.lit(FP)).alias("e"))
        )
        grad_rows = (
            counts.join(err, "doc_id")
            .groupBy("bucket")
            .agg(F.sum("e").cast("long").alias("g"))
            .collect()
        )
        grads = {int(r["bucket"]): int(r["g"]) for r in grad_rows}
        den = lr_den * n_docs
        for j in range(n_buckets + 1):
            g = grads.get(j, 0)
            step = (lr_num * abs(g)) // den
            weights[j] -= step if g > 0 else -step if g < 0 else 0
    counts.unpersist()
    return weights


def score_docs(
    docs: DataFrame,
    weights: Sequence[int],
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_fp: int = FP // 2,
) -> DataFrame:
    """Inference: (doc_id, z_int, p_fp, predicted) for a trained weight
    vector. One broadcast join + one doc_id aggregate; predicted =
    p_fp >= threshold_fp (ties keep, matching the oracle)."""
    counts = featurize_presence(docs, n_buckets, text_col, id_col)
    s = _scores(docs.sparkSession, counts, weights)
    return s.withColumn(
        "predicted", (F.col("p_fp") >= F.lit(int(threshold_fp))).cast("long")
    )


def train_and_score(
    docs: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    iters: int = 8,
    lr_num: int = 1,
    lr_den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
) -> DataFrame:
    """Train on the labeled corpus, then score the same corpus (the
    self-filtering shape: label a seed slice by rule, learn, apply).
    Returns (doc_id, y, z_int, p_fp, predicted) — all BIGINT,
    gate-safe."""
    weights = train_logreg_quantized(
        docs, n_buckets, iters, lr_num, lr_den, text_col, id_col, label_col
    )
    scored = score_docs(docs, weights, n_buckets, text_col, id_col)
    labels = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(label_col).cast("long").alias("y"),
    )
    return scored.join(labels, "doc_id").select(
        "doc_id", "y", "z_int", "p_fp", "predicted"
    )


def featurize_hashing(
    docs: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Signed feature hashing (the hashing trick, Weinberger et al.
    2009): token COUNTS folded into ``n_buckets`` dimensions with a
    ±1 sign from an independent hash, so collisions cancel in
    expectation and inner products are unbiased — the standard
    fixed-width featurization for training linear models over unbounded
    vocabularies (``featurize_presence`` above is its unsigned
    presence-only cousin used by the quantized trainer).

    bucket(tok) = md5(tok)[:4 hex] mod n_buckets;
    sign(tok)   = +1 if md5('s:'+tok)[0 hex] is even else −1;
    value(doc, b) = Σ_{tok: bucket=b} sign(tok)·count(doc, tok).

    Returns sparse (doc_id, bucket, value) rows, value ≠ 0 (exact
    cancellations are dropped — the sparse-vector contract). All BIGINT,
    engine-portable. ONE token explode + ONE map-side-combinable
    aggregate; no shuffle wider than (doc_id, bucket).
    """
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10).cast("long")
        % F.lit(int(n_buckets))
    )
    sign = F.when(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("s:"), F.col("tok"))), 1, 1),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        toks.select("doc_id", bucket.alias("bucket"), sign.alias("__s"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("__s").cast("long").alias("value"))
        .where(F.col("value") != 0)
    )


def train_and_score_nb(
    docs: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
) -> DataFrame:
    """Multinomial Naive Bayes over hashed token buckets (the OTHER
    classic text-filter trainer next to the quantized logistic
    regression above; McCallum & Nigam 1998) — train and score in one
    pass, exact cross-engine.

    Float determinism: per-(class, bucket) add-1 log-likelihoods and
    class log-priors are QUANTIZED to integer micro-nats
    (round(ln(p)·10^6) — one deterministic ln + one round each, the
    _qvecs idiom), so every document score is an exact BIGINT dot
    product Σ count·q(y,b) + q_prior(y) and the argmax can never flip
    on summation order. Ties break to class 0 (pinned).

    Scale shape: training is TWO map-side-combinable aggregates
    ((class, bucket) counts; class totals); the model is a
    2·n_buckets-row broadcast; scoring is one (doc, bucket) count
    aggregate + one broadcast join + one doc-key sum. No driver
    iteration at all — NB's one-pass training is why it still gets used
    at corpus scale.

    Returns (doc_id, y, score_0, score_1, predicted) — all BIGINT.
    """
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(label_col).cast("long").alias("y"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).withColumn(
        "bucket",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10).cast("long")
        % F.lit(int(n_buckets)),
    )
    toks = toks.localCheckpoint(eager=False)
    d = int(n_buckets)

    cb = toks.groupBy("y", "bucket").agg(
        F.count("*").cast("long").alias("c")
    )
    tot = toks.groupBy("y").agg(F.count("*").cast("long").alias("t"))
    # dense (class, bucket) grid so zero-count buckets get the add-1 floor
    grid = (
        tot.select("y", "t")
        .crossJoin(
            toks.sparkSession.range(d).select(F.col("id").alias("bucket"))
        )
        .join(cb, ["y", "bucket"], "left")
        .select(
            "y",
            "bucket",
            F.round(
                F.log(
                    (F.coalesce("c", F.lit(0)) + F.lit(1.0))
                    / (F.col("t") + F.lit(float(d)))
                )
                * F.lit(1_000_000.0),
                0,
            )
            .cast("long")
            .alias("q"),
        )
    )
    n_docs = docs.count()
    priors = (
        docs.select(F.col(label_col).cast("long").alias("y"))
        .groupBy("y")
        .agg(F.count("*").cast("long").alias("ny"))
        .select(
            "y",
            F.round(
                F.log(F.col("ny") / F.lit(float(n_docs))) * F.lit(1_000_000.0),
                0,
            )
            .cast("long")
            .alias("qp"),
        )
    )
    dc = toks.groupBy("doc_id", "bucket").agg(
        F.count("*").cast("long").alias("tc")
    )
    contrib = (
        dc.join(F.broadcast(grid), "bucket")
        .groupBy("doc_id", F.col("y").alias("cls"))
        .agg(F.sum(F.col("tc") * F.col("q")).cast("long").alias("s"))
        .join(
            F.broadcast(priors).select(
                F.col("y").alias("cls"), "qp"
            ),
            "cls",
        )
        .select("doc_id", "cls", (F.col("s") + F.col("qp")).alias("score"))
    )
    scores = contrib.groupBy("doc_id").pivot("cls", [0, 1]).agg(
        F.first("score")
    )
    labels = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(label_col).cast("long").alias("y"),
    )
    return (
        scores.join(labels, "doc_id")
        .select(
            "doc_id",
            "y",
            F.col("0").cast("long").alias("score_0"),
            F.col("1").cast("long").alias("score_1"),
            F.when(F.col("1") > F.col("0"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("predicted"),
        )
    )
