"""Probabilistic record linkage — the Fellegi-Sunter model (1969), the
canonical framework behind every entity-resolution system: candidate
pairs get a log-likelihood-ratio score from per-field agreement
patterns, with per-field weights ESTIMATED from labeled pairs
(m_i = P(field i agrees | true match), u_i = P(agrees | non-match)).
Positive score ⇒ evidence for a match; the field weights quantify which
signals (language, source, length band, token overlap) actually
discriminate in THIS corpus rather than by fiat.

This composes with the dedup stack: blocking (sorted-neighborhood /
LSH) proposes candidates, exact-dup truth labels a training slice, F-S
scores generalize to near-dups the exact rule can't label.

Float determinism (the repo's micro-nat idiom): m and u are exact
rationals from counts with add-half smoothing, the per-field log ratios
are quantized once to integer micro-nats, and every pair score is then
an exact BIGINT sum — no summation-order hazard, engine-exact.

Scale shape: weight estimation is ONE aggregate over the labeled pairs
(2·|fields| scalar counts collected to the driver — never row data);
scoring is a pure projection over candidate pairs. Nothing shuffles
beyond what the blocking stage already did.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def estimate_fs_weights(
    labeled: DataFrame,
    agreement_cols: Sequence[str],
    label_col: str = "is_match",
) -> list:
    """Per-field (agree_weight, disagree_weight) in integer micro-nats:
    w = round(ln(m/u)·10^6), w̄ = round(ln((1−m)/(1−u))·10^6) with
    m, u add-half smoothed ((c + 0.5)/(n + 1) — never 0 or 1).
    Returns [(col, w_agree, w_disagree), ...]."""
    import math

    def _round_half_away(x: float) -> int:
        # SQL ROUND (Spark HALF_UP / DuckDB) rounds half AWAY from zero;
        # Python's built-in round() is half-even — pin to the SQL rule
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    aggs = [F.count("*").alias("__n")]
    aggs += [
        F.sum(
            F.when(F.col(label_col) & F.col(c), 1).otherwise(0)
        ).alias(f"__ma_{c}")
        for c in agreement_cols
    ]
    aggs += [
        F.sum(F.when(F.col(label_col), 1).otherwise(0)).alias("__nm"),
    ]
    aggs += [
        F.sum(
            F.when(~F.col(label_col) & F.col(c), 1).otherwise(0)
        ).alias(f"__ua_{c}")
        for c in agreement_cols
    ]
    row = labeled.agg(*aggs).collect()[0]
    n_match = int(row["__nm"])
    n_non = int(row["__n"]) - n_match
    out = []
    for c in agreement_cols:
        m = (int(row[f"__ma_{c}"]) + 0.5) / (n_match + 1.0)
        u = (int(row[f"__ua_{c}"]) + 0.5) / (n_non + 1.0)
        w = _round_half_away(math.log(m / u) * 1_000_000.0)
        wbar = _round_half_away(math.log((1.0 - m) / (1.0 - u)) * 1_000_000.0)
        out.append((c, int(w), int(wbar)))
    return out


def fellegi_sunter_scores(
    pairs: DataFrame,
    agreement_cols: Sequence[str],
    label_col: str = "is_match",
    weights: list = None,
) -> DataFrame:
    """Score candidate pairs with F-S log-likelihood-ratio weights
    (estimated from ``pairs`` itself when ``weights`` is None — the
    self-training shape: exact-dup truth labels the slice, the learned
    weights generalize). Appends (score, fs_match) to the pair rows:
    score = Σ_i (agree_i ? w_i : w̄_i) exact BIGINT, fs_match =
    score > 0."""
    if weights is None:
        weights = estimate_fs_weights(pairs, agreement_cols, label_col)
    score = F.lit(0).cast("long")
    for c, w, wbar in weights:
        score = score + F.when(
            F.col(c), F.lit(int(w)).cast("long")
        ).otherwise(F.lit(int(wbar)).cast("long"))
    return pairs.withColumn("score", score.cast("long")).withColumn(
        "fs_match", (F.col("score") > 0).cast("long")
    )
