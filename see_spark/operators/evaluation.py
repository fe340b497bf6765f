"""Retrieval-quality evaluation — engine addition.

The reference tests its ranker only via golden-query assertions
(apps/db/test/see_db_srv_test.erl); it has no quantitative relevance
harness. This module adds the standard TREC-style offline metrics computed
over a (results, qrels) pair — the public textbook definitions
(Manning/Raghavan/Schütze, IIR ch.8; NDCG from Järvelin & Kekäläinen,
TOIS 2002):

  precision@k  |relevant ∩ top-k| / k
  recall@k     |relevant ∩ top-k| / |relevant|
  MRR          1 / rank of the first relevant result in the top-k (0 if
               none)
  NDCG@k       DCG@k / IDCG@k with gain (2^rel - 1) and the log2 discount
               1/log2(rank+1); IDCG ranks the query's qrels by rel desc.

Everything is ratio-of-sums per query — two combinable aggregates keyed by
query_id (one over scored results, one over qrels for |relevant| and IDCG)
joined on query_id. Both relations are evaluation-sized (queries × k and
queries × judged docs), so at 100 TB corpus scale this never touches the
corpus: it runs over the search HEAD, not the index. Scores are rounded to
6 dp so the double-summation tail is engine-portable (the repo-wide oracle
convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LN2 = "ln(2.0)"


def retrieval_metrics(results: DataFrame, qrels: DataFrame, k: int = 10,
                      round_dp: int = 6) -> DataFrame:
    """Per-query metrics over ranked ``results`` (query_id, url, rank —
    rank 1-based, unique per query) judged by ``qrels`` (query_id, url,
    rel — graded, rel >= 1 means relevant; unjudged results count as
    rel 0, the standard convention).

    Returns (query_id, n_results, n_relevant, precision_at_k,
    recall_at_k, mrr, ndcg) — one row per query that has at least one
    judged-relevant document (queries with no qrels have undefined
    recall/NDCG and are excluded, mirroring trec_eval).
    """
    topk = results.filter(F.col("rank") <= k)
    judged = topk.join(qrels, ["query_id", "url"], "left").withColumn(
        "rel", F.coalesce(F.col("rel"), F.lit(0)).cast("long")
    )
    # log2(rank+1) as ln-ratio: both engines share libm ln behavior
    discount = F.log(F.col("rank").cast("double") + 1.0) / F.expr(_LN2)
    gain = F.pow(F.lit(2.0), F.col("rel").cast("double")) - 1.0
    per_q = judged.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_results"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0))
        .cast("long")
        .alias("hits"),
        F.sum(gain / discount).alias("dcg"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("first_rel"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("url"))
    ideal = (
        qrels.filter(F.col("rel") > 0)
        .withColumn("__r", F.row_number().over(w))
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_relevant"),
            F.sum(
                F.when(
                    F.col("__r") <= k,
                    (F.pow(F.lit(2.0), F.col("rel").cast("double")) - 1.0)
                    / (F.log(F.col("__r").cast("double") + 1.0) / F.expr(_LN2)),
                ).otherwise(F.lit(0.0))
            ).alias("idcg"),
        )
    )
    return (
        per_q.join(ideal, "query_id")
        .select(
            "query_id",
            "n_results",
            "n_relevant",
            F.round(F.col("hits") / F.lit(float(k)), round_dp)
            .alias("precision_at_k"),
            F.round(F.col("hits") / F.col("n_relevant"), round_dp)
            .alias("recall_at_k"),
            F.round(
                F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0)), round_dp
            ).alias("mrr"),
            F.round(F.col("dcg") / F.col("idcg"), round_dp).alias("ndcg"),
        )
    )


def rank_agreement(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    score_a: str = "score_a",
    score_b: str = "score_b",
) -> DataFrame:
    """Agreement between two rankers over the SAME item set: one row
    (n, sum_d2, concordant, discordant, spearman_milli, kendall_milli).

    Ranks are pinned total orders (score desc, id asc), so both engines
    produce identical integer ranks; Spearman's rho and Kendall's tau
    are then EXACT integer arithmetic — the only care is signed
    division, emitted as sign(num) * (1000*|num| div den) so truncation
    is toward zero in both engines (DuckDB // floors, Spark div
    truncates — they differ on negatives, so the sign is factored out).

    Scale: rank assignment is a global window — this operator is for
    EVAL-SIZED inputs (top-k lists, judged pools, signal-agreement
    samples), exactly like retrieval_metrics above; Kendall's pair join
    is O(n^2) by definition. For corpus-wide monitoring, feed it a
    deterministic sample (textfilters.weighted_sample), never the corpus.
    """
    ra = a.select(
        F.col(id_col).alias("id"),
        F.row_number()
        .over(Window.orderBy(F.desc(score_a), F.asc(id_col)))
        .cast("long")
        .alias("ra"),
    )
    rb = b.select(
        F.col(id_col).alias("id"),
        F.row_number()
        .over(Window.orderBy(F.desc(score_b), F.asc(id_col)))
        .cast("long")
        .alias("rb"),
    )
    j = ra.join(rb, "id")
    base = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb")))
        .cast("long")
        .alias("sum_d2"),
    )
    p1 = j.select(F.col("id").alias("i1"), F.col("ra").alias("ra1"),
                  F.col("rb").alias("rb1"))
    p2 = j.select(F.col("id").alias("i2"), F.col("ra").alias("ra2"),
                  F.col("rb").alias("rb2"))
    pairs = p1.join(p2, F.col("i1") < F.col("i2"))
    cd = pairs.agg(
        F.sum(
            (
                (F.col("ra1") - F.col("ra2")) * (F.col("rb1") - F.col("rb2"))
                > 0
            ).cast("long")
        ).alias("concordant"),
        F.sum(
            (
                (F.col("ra1") - F.col("ra2")) * (F.col("rb1") - F.col("rb2"))
                < 0
            ).cast("long")
        ).alias("discordant"),
    )
    out = base.crossJoin(cd).select(
        "n", "sum_d2", "concordant", "discordant",
        F.expr("n * (n * n - 1) - 6 * sum_d2").alias("__spnum"),
        F.expr("n * (n * n - 1)").alias("__spden"),
        (F.col("concordant") - F.col("discordant")).alias("__ktnum"),
        F.expr("n * (n - 1) div 2").alias("__ktden"),
    )
    return out.select(
        "n", "sum_d2", "concordant", "discordant",
        (
            F.when(F.col("__spnum") < 0, F.lit(-1)).otherwise(F.lit(1))
            * F.expr("(1000 * abs(__spnum)) div __spden")
        ).cast("long").alias("spearman_milli"),
        (
            F.when(F.col("__ktnum") < 0, F.lit(-1)).otherwise(F.lit(1))
            * F.expr("(1000 * abs(__ktnum)) div __ktden")
        ).cast("long").alias("kendall_milli"),
    )


def calibration_bins(
    scored: DataFrame,
    p_col: str = "p_fp",
    label_col: str = "y",
    scale: int = 1 << 20,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins + per-bin ECE contribution for a
    probabilistic classifier (Guo et al. 2017 calibration shape) — the
    audit a filtering pipeline runs before trusting a quality
    classifier's threshold: a model can be accurate yet badly
    calibrated, and corpus filtering at p >= t is only meaningful if p
    tracks the observed keep rate.

    Input: one row per doc with an integer fixed-point probability
    ``p_col`` in [0, scale) and binary ``label_col``. All outputs are
    exact BIGINT arithmetic (no float path):

      (bin, n, n_pos, sum_p, obs_milli, pred_milli, gap_fp)

    bin = least(p·n_bins div scale, n_bins−1); obs_milli = observed
    positive rate; pred_milli = mean predicted probability; gap_fp =
    |n_pos·scale − sum_p| — the unnormalized calibration gap, so
    ECE_fp = Σ gap_fp / (N·scale) is exactly derivable downstream.

    Scale shape: ONE map-side-combinable aggregate over the bin key
    (≤ n_bins groups); nothing else.
    """
    binned = scored.select(
        F.least(
            F.expr(f"{p_col} * {int(n_bins)} div {int(scale)}"),
            F.lit(int(n_bins) - 1),
        )
        .cast("long")
        .alias("bin"),
        F.col(p_col).cast("long").alias("__p"),
        F.col(label_col).cast("long").alias("__y"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("__y").cast("long").alias("n_pos"),
            F.sum("__p").cast("long").alias("sum_p"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            "sum_p",
            F.expr("n_pos * 1000 div n").cast("long").alias("obs_milli"),
            F.expr(f"sum_p * 1000 div (n * {int(scale)})")
            .cast("long")
            .alias("pred_milli"),
            F.abs(
                F.col("n_pos") * F.lit(int(scale)) - F.col("sum_p")
            )
            .cast("long")
            .alias("gap_fp"),
        )
    )


def b3_cluster_quality(
    assign: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster",
    truth_col: str = "truth",
    round_dp: int = 9,
) -> DataFrame:
    """B-cubed clustering evaluation (Bagga & Baldwin 1998; Amigó et al.
    2009 showed it's the extrinsic metric satisfying all four clustering
    constraints) of a predicted clustering against ground truth — the
    audit a dedup pipeline runs on its LSH clusters against exact-dup
    groups: B³ precision drops when a cluster glues unrelated docs,
    recall drops when one true group is shattered.

      B³P = (1/N) Σ_items |C(i) ∩ T(i)| / |C(i)|
          = (1/N) Σ_{(c,t) blocks} inter² / cluster_size
      B³R symmetric over truth_size; F1 harmonic from the ROUNDED P/R
      (pinned so both engines derive it from identical inputs).

    Input: one row per item (id, cluster, truth). Output: ONE row
    (n_items, b3_precision, b3_recall, b3_f1), doubles rounded to
    ``round_dp``.

    Scale shape: three map-side-combinable aggregates (cluster sizes,
    truth sizes, (cluster, truth) contingency blocks — the contingency
    table is at most min(#clusters, #truths) blocks per side, never
    item-quadratic), two key joins, one scalar fold.
    """
    n = assign.count()
    csz = assign.groupBy(cluster_col).agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    tsz = assign.groupBy(truth_col).agg(
        F.count("*").cast("long").alias("truth_size")
    )
    blocks = assign.groupBy(cluster_col, truth_col).agg(
        F.count("*").cast("long").alias("inter")
    )
    joined = blocks.join(csz, cluster_col).join(tsz, truth_col)
    sums = joined.agg(
        F.sum(
            (F.col("inter") * F.col("inter")) / F.col("cluster_size")
        ).alias("sp"),
        F.sum(
            (F.col("inter") * F.col("inter")) / F.col("truth_size")
        ).alias("sr"),
    )
    pr = sums.select(
        F.round(F.col("sp") / F.lit(float(n)), round_dp).alias("p"),
        F.round(F.col("sr") / F.lit(float(n)), round_dp).alias("r"),
    )
    return pr.select(
        F.lit(int(n)).cast("long").alias("n_items"),
        F.col("p").alias("b3_precision"),
        F.col("r").alias("b3_recall"),
        F.when(F.col("p") + F.col("r") == 0.0, F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(2.0) * F.col("p") * F.col("r")
                / (F.col("p") + F.col("r")),
                round_dp,
            )
        )
        .alias("b3_f1"),
    )


def classification_confusion(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "id",
    pred_col: str = "pred",
    truth_col: str = "truth",
) -> DataFrame:
    """Multi-class confusion matrix — the evaluation every classifier
    in the pipeline (language ID, quality filter, NB/logreg) reports
    against labels: one row per observed (truth, pred) cell with exact
    counts and the per-truth-class recall share that cell represents.

      (truth, pred, n, n_truth, cell_milli)   cell_milli = 1000·n div
      n_truth; diagonal cells' cell_milli ARE the per-class recalls.

    Two combinable aggregates + one key join; matrix size is
    classes², never data-sized.
    """
    j = pred.select(
        F.col(id_col).alias("id"), F.col(pred_col).alias("pred")
    ).join(
        truth.select(F.col(id_col).alias("id"), F.col(truth_col).alias("truth")),
        "id",
    )
    cells = j.groupBy("truth", "pred").agg(
        F.count("*").cast("long").alias("n")
    )
    totals = j.groupBy("truth").agg(
        F.count("*").cast("long").alias("n_truth")
    )
    return cells.join(totals, "truth").select(
        "truth",
        "pred",
        "n",
        "n_truth",
        F.expr("n * 1000 div n_truth").cast("long").alias("cell_milli"),
    )


def gains_table(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "y",
    id_col: str = "doc_id",
    n_bins: int = 10,
) -> DataFrame:
    """Cumulative-gains / lift table (the decile chart every scoring
    model ships with): rank by score descending, cut into ``n_bins``
    equal bins, report per-bin and cumulative capture of positives and
    the lift over random targeting. The question it answers for a
    filtering pipeline: "if I only keep the top 10% by classifier
    score, what fraction of the good documents do I get?"

    All exact BIGINT: (bin, n, n_pos, cum_pos, capture_milli,
    lift_milli) with capture = cum_pos/total_pos and lift = per-bin
    positive rate over the global rate, both in integer milli.

    Scale shape: one distributed dense rank (desc score, id tie-break)
    + one combinable aggregate + one bounded (n_bins-row) running sum.
    """
    from ..functions.seq import with_dense_sequence

    base = scored.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(score_col).cast("long").alias("s"),
        F.col(label_col).cast("long").alias("y"),
    )
    n = base.count()
    ranked = with_dense_sequence(
        base.select("id", "y", (-F.col("s")).alias("__neg")),
        ["__neg", "id"],
        out_col="__r",
    )
    b = int(n_bins)
    binned = ranked.groupBy(
        F.expr(f"__r * {b} div {max(n, 1)}").cast("long").alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    tot = binned.agg(F.sum("n_pos")).collect()[0][0] or 0
    return (
        binned.withColumn(
            "cum_pos", F.sum("n_pos").over(w).cast("long")
        )
        .select(
            "bin",
            "n",
            "n_pos",
            "cum_pos",
            F.expr(f"cum_pos * 1000 div greatest({int(tot)}, 1)")
            .cast("long")
            .alias("capture_milli"),
            F.expr(
                f"(n_pos * {max(n,1)} * 1000) div (n * greatest({int(tot)}, 1))"
            )
            .cast("long")
            .alias("lift_milli"),
        )
    )
