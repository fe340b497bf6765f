"""One-pass corpus quality pipeline: the composed keep/drop decision.

Every web-scale corpus recipe (CCNet, Gopher/MassiveText, RefinedWeb,
FineWeb) ends in the same shape: a per-document conjunction of
independent quality gates. This operator composes the engine's
individually exact-tested components into that decision:

  keep = predicted language matches        (textstats.language_id)
       AND not repetition-flagged          (textfilters.gopher_repetition)
       AND token count inside [min, max]   (gopher's n_tokens)
       AND heuristic quality >= threshold  (textstats.quality_score)
       AND per-bigram LM NLL <= threshold  (lm.doc_nll, integer micro-nats:
                                            nll_q <= n_bigrams * max_nll —
                                            an integer comparison, exact)

Each component reduces the corpus to one row per doc_id; the composition
is doc_id equi-joins that AQE co-partitions. The corpus is scanned once
per component (parquet-pruned to (doc_id, text)); a hand-fused single
pass would save scans but forfeit the per-component oracles — at 100 TB
the components' own aggregates dominate, and scan sharing is the storage
layer's job (column cache / scan reuse). Thresholds are pinned
parameters; every comparison is either integer-exact or a
deterministic-double compare, so the composite has an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_quality_pipeline(
    docs: DataFrame,
    ref_docs: DataFrame,
    lang: str = "en",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_quality: float = 0.05,
    max_nll_micro: int = 3_400_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Returns one row per document: the component signals and the final
    keep in {1,0}. ``ref_docs`` trains the perplexity LM (CCNet's
    trusted-reference slice)."""
    from .lm import doc_nll
    from .textfilters import gopher_repetition
    from .textstats import language_id, quality_score

    lg = language_id(docs, text_col, id_col).select("doc_id", "predicted_lang")
    rep = gopher_repetition(docs, text_col, id_col).select(
        "doc_id", "n_tokens", "flagged"
    )
    q = quality_score(docs, text_col, id_col).select("doc_id", "quality")
    nll = doc_nll(docs, ref_docs, text_col, id_col)
    joined = lg.join(rep, "doc_id").join(q, "doc_id").join(nll, "doc_id")
    keep = (
        (F.col("predicted_lang") == lang)
        & (F.col("flagged") == 0)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("quality") >= min_quality)
        & (F.col("nll_q") <= F.col("n_bigrams") * F.lit(int(max_nll_micro)))
    )
    return joined.select(
        "doc_id", "predicted_lang", "flagged", "n_tokens", "quality",
        "n_bigrams", "nll_q",
        F.when(keep, 1).otherwise(0).cast("long").alias("keep"),
    )
