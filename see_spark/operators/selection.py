"""Data selection via importance resampling (the DSIR shape).

Engine addition: the reference stops at indexing (see_text.erl tokenizes,
see_rank_tfidf.erl ranks); a pre-training pipeline additionally needs to
SELECT which crawled documents to train on. This implements the
hashed-n-gram importance-weighting scheme of Xie et al. 2023 ("Data
Selection for Language Models via Importance Resampling"): score every raw
document by how target-like its hashed unigram distribution is, then keep
the top-weighted slice.

Integer quantization makes the whole computation exact across engines (the
repo-wide gate rule): instead of the paper's log-likelihood ratio
sum(ln p_t[b] - ln p_r[b]) — whose float accumulation order differs between
Spark and DuckDB — each bucket gets the integer likelihood-ratio proxy

    score[b] = ((count_target[b] + 1) * SCALE) div (count_raw[b] + 1)

(add-1 smoothed, floor division), and a document's weight is the exact
integer sum of its token-occurrence scores. Monotone in the smoothed
count ratio, so the induced top-k ordering is the same family the paper
uses, and bit-for-bit reproducible.

Token→bucket hashing reuses the repo's cross-engine md5 pattern
(operators/textfilters.py, dedup.py): bucket = first 16 bits of md5(token)
mod n_buckets, identical in Spark (`conv(substring(md5(tok),1,4),16,10)`)
and DuckDB (`('0x' || substr(md5(tok),1,4))::BIGINT`).

Scale shape (the 100 TB audit):
- one explode + one groupBy(bucket) over <= n_buckets keys — map-side
  combinable, shuffle payload is n_buckets rows per mapper;
- bucket scores (n_buckets rows) broadcast back to the token stream —
  no shuffle;
- one groupBy(doc_id) for the weight sum — the only data-sized shuffle,
  on a 16-byte (doc_id, partial-sum) payload;
- TakeOrderedAndProject for the k-cut — no global sort.
Overflow bound: (count_target[b]+1)*SCALE must fit in int64; at 100 TB of
text (~2e13 tokens, ~3e11 per bucket at the default 64 buckets) the product
is ~3e17 < 2^63. Raise n_buckets before raising SCALE if either grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64
DEFAULT_SCALE = 1_000_000


def _bucket(tok_col, n_buckets: int):
    return F.conv(F.substring(F.md5(tok_col), 1, 4), 16, 10).cast("long") % n_buckets


def dsir_topk(
    docs: DataFrame,
    k: int = 100,
    n_buckets: int = DEFAULT_BUCKETS,
    scale: int = DEFAULT_SCALE,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "is_target",
) -> DataFrame:
    """Top-k raw documents by integer-quantized DSIR importance weight.

    ``docs`` must carry ``target_col`` (boolean/int): rows with 1 define the
    target distribution; rows with 0 are the raw pool being scored. Returns
    (doc_id, weight) for the k heaviest raw docs, tie-broken by doc_id
    ascending so the k-cut is deterministic.
    """
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(target_col).cast("int").alias("is_target"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    bucketed = toks.select(
        "doc_id", "is_target", _bucket(F.col("tok"), n_buckets).alias("bucket")
    )
    stats = bucketed.groupBy("bucket").agg(
        F.sum("is_target").alias("ct"),
        F.sum(F.lit(1) - F.col("is_target")).alias("cr"),
    )
    scores = stats.select(
        "bucket",
        F.expr(f"((ct + 1L) * {scale}L) div (cr + 1L)").alias("score"),
    )
    weights = (
        bucketed.filter(F.col("is_target") == 0)
        .join(F.broadcast(scores), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("score").cast("long").alias("weight"))
    )
    return weights.orderBy(F.desc("weight"), F.asc("doc_id")).limit(k)


def grouped_split(
    docs: DataFrame,
    group_col: str = "host",
    id_col: str = "doc_id",
    train_milli: int = 800,
    val_milli: int = 100,
) -> DataFrame:
    """Leakage-safe train/val/test split: the split decision hashes the
    GROUP (host, PLD, source site), not the document — so every document
    of a group lands in the same split BY CONSTRUCTION. Doc-level splits
    leak: near-duplicate pages from one site straddle train and val, and
    the model "generalizes" to text it effectively saw (the standard
    web-corpus evaluation mistake; group-wise splitting is the published
    remedy, cf. scikit-learn GroupShuffleSplit semantics). The remaining
    test split gets 1000 - train - val milli.

    Deterministic + engine-exact: bucket = 60-bit md5 of the group mod
    1000 (dedup.hash60, the pinned portable hash) against cumulative
    milli thresholds — reproducible across runs, partitionings, and
    engines, unlike DataFrame.randomSplit. Zero shuffle (a projection).
    Returns (doc_id, group, bucket, split).
    """
    from .dedup import hash60

    bucket = F.pmod(hash60(F.col(group_col).cast("string")), F.lit(1000))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).cast("string").alias("group"),
        bucket.cast("long").alias("bucket"),
        F.when(bucket < train_milli, "train")
        .when(bucket < train_milli + val_milli, "val")
        .otherwise("test")
        .alias("split"),
    )


def budget_select(
    scored: DataFrame,
    token_budget: int,
    score_col: str = "score",
    cost_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget corpus selection: keep the highest-scoring documents
    whose CUMULATIVE token cost fits a global budget — the final assembly
    step of every pretraining dataset ("best N billion tokens by quality"),
    which a plain top-k cannot express because the constraint is on the
    running sum of a second column, not the row count. Greedy
    score-descending fill is the standard density-1 knapsack
    approximation used in practice.

    A document is kept iff prefix_sum(cost) in (score DESC, doc_id ASC)
    order is <= budget — a PREFIX cut with a pinned tie-break: once the
    running sum crosses the budget every later (lower-scoring) document
    is out too, with no back-filling of smaller docs (that keeps the cut
    a single deterministic threshold in rank order rather than a
    data-order-dependent knapsack walk).

    Scale shape: ONE distributed prefix sum (``seq.with_prefix_sum`` —
    range-partition on the order key + partition-local window + an
    O(partitions) offset pass; never a global single-partition window)
    and a filter. Returns (doc_id, score, n_tokens, cum_tokens) for the
    kept set.
    """
    from ..functions.seq import with_prefix_sum

    base = scored.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(score_col).cast("long").alias("score"),
        F.col(cost_col).cast("long").alias("n_tokens"),
        (-F.col(score_col).cast("long")).alias("__neg"),
    )
    cum = with_prefix_sum(
        base, "n_tokens", ["__neg", "doc_id"], out_col="cum_tokens"
    )
    return cum.where(F.col("cum_tokens") <= F.lit(int(token_budget))).select(
        "doc_id", "score", "n_tokens", "cum_tokens"
    )
