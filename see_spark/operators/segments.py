"""Index-segment merge planning — engine addition.

The crawl loop appends one postings/word_stats delta per round
(operators/crawl.py, operators/recrawl.py sign-corrected re-index deltas),
so the index accumulates round-sized segments exactly like an LSM / Lucene
index accumulates flush segments. Left unmerged, a query fans out over
O(rounds) segments; merged too eagerly, write amplification explodes. The
public answer is a tiered merge policy (Lucene TieredMergePolicy; the LSM
size-tier family from Bigtable/Cassandra): segments are bucketed into
SIZE TIERS, and a tier holding at least ``merge_factor`` segments merges
``merge_factor``-at-a-time into the next tier.

This module does the PLANNING as one deterministic relational pass —
suitable for the driver to run between rounds and turn into merge jobs:

  tier        — decimal-digit tier, ``len(str(size_bytes)) - 1``: exact
                integer math in any engine (a float ``floor(log10)`` is
                NOT engine-portable at tier boundaries), tier ratio 10.
  merge group — within a tier, segments ordered (size desc, segment_id)
                and chunked ``merge_factor`` at a time; only FULL groups
                merge (a partial group waits for future rounds — Lucene's
                "don't merge below the floor" rule).
  target_size — the merged segment's size (sum over the group), which is
                what promotes the output into a higher tier.

Scale shape: the input is METADATA — one row per segment, O(rounds ×
partitions) — so this costs one window + one combinable aggregate on a
dimension-sized relation; the expensive part (the merge itself) is a plain
groupBy over the chosen segments that the plan parameterizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def plan_merges(segments: DataFrame, merge_factor: int = 10) -> DataFrame:
    """(segment_id, size_bytes) -> per-segment merge decision.

    Returns (segment_id, size_bytes, tier, merge_group, will_merge,
    target_size): ``merge_group`` is dense within (tier), -1 for
    segments left alone; ``target_size`` is the group's summed size for
    merging rows, the segment's own size otherwise.
    """
    sized = segments.select(
        "segment_id",
        F.col("size_bytes").cast("long").alias("size_bytes"),
        (F.length(F.greatest(F.col("size_bytes"), F.lit(1)).cast("string")) - 1)
        .cast("long")
        .alias("tier"),
    )
    w = Window.partitionBy("tier").orderBy(
        F.desc("size_bytes"), F.asc("segment_id")
    )
    grouped = sized.withColumn("__rn", F.row_number().over(w)).withColumn(
        "merge_group",
        F.expr(f"(__rn - 1) div {int(merge_factor)}").cast("long"),
    ).drop("__rn")
    gw = Window.partitionBy("tier", "merge_group")
    return (
        grouped.withColumn("__n", F.count("*").over(gw))
        .withColumn("__sum", F.sum("size_bytes").over(gw))
        .select(
            "segment_id",
            "size_bytes",
            "tier",
            F.when(F.col("__n") == merge_factor, F.col("merge_group"))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("merge_group"),
            (F.col("__n") == merge_factor).alias("will_merge"),
            F.when(F.col("__n") == merge_factor, F.col("__sum"))
            .otherwise(F.col("size_bytes"))
            .cast("long")
            .alias("target_size"),
        )
    )


def merge_amplification(plan: DataFrame) -> DataFrame:
    """One-row audit of a merge plan: bytes rewritten this pass, segment
    count before/after, and write amplification in integer milli units
    (rewritten*1000 // total). The driver logs this per compaction pass —
    at a 10^11-posting index the rewrite fraction IS the cost model."""
    return plan.agg(
        F.count("*").cast("long").alias("segments_before"),
        (
            F.count("*")
            - F.sum(F.when(F.col("will_merge"), 1).otherwise(0))
            + F.countDistinct(
                F.when(
                    F.col("will_merge"),
                    F.concat_ws(":", "tier", "merge_group"),
                )
            )
        ).cast("long").alias("segments_after"),
        F.sum(
            F.when(F.col("will_merge"), F.col("size_bytes")).otherwise(0)
        ).cast("long").alias("bytes_rewritten"),
        F.sum("size_bytes").cast("long").alias("__total"),
    ).select(
        "segments_before",
        "segments_after",
        "bytes_rewritten",
        # exact JVM integer division (repo convention) — an FP divide
        # can cross an integer boundary at large numerators
        F.expr("(bytes_rewritten * 1000) div __total")
        .cast("long")
        .alias("rewrite_milli"),
    )


def segment_skip_audit(
    seg_postings: DataFrame, query_words, segments: DataFrame = None
) -> DataFrame:
    """Per-segment query-pruning decision — the read-side payoff of the
    tiered layout above: with per-round postings segments, a query needs
    to open ONLY segments containing at least one query word (disjunctive
    skipping; a conjunctive query can additionally skip any segment
    missing EVERY required word, which this audit's n_words_present also
    answers). Production engines keep a per-segment term bloom/dictionary
    for this test (functions/bloom.py supplies the probabilistic form);
    this operator is the EXACT audit — run per compaction pass, it
    reports how much of the index each standing query family actually
    touches, which is the number that justifies (or indicts) the merge
    policy.

    ``seg_postings``: (segment_id, word); ``query_words``: iterable of
    words; ``segments``: optional (segment_id) dimension so segments with
    NO postings at all still report (skippable). One combinable aggregate
    over the segment-dictionary relation restricted to the broadcast
    query words — never the postings payload.
    """
    spark = seg_postings.sparkSession
    q = F.broadcast(
        spark.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(w) for w in sorted(set(query_words))])
            ).alias("word")
        )
    )
    present = (
        seg_postings.select("segment_id", "word")
        .join(q, "word")
        .groupBy("segment_id")
        .agg(F.countDistinct("word").cast("long").alias("n_words_present"))
    )
    base = (
        segments.select("segment_id").distinct()
        if segments is not None
        else seg_postings.select("segment_id").distinct()
    )
    return base.join(present, "segment_id", "left").select(
        "segment_id",
        F.coalesce("n_words_present", F.lit(0)).cast("long")
        .alias("n_words_present"),
        (F.coalesce("n_words_present", F.lit(0)) == 0).alias("can_skip"),
        (
            F.coalesce("n_words_present", F.lit(0))
            == F.lit(len(set(query_words)))
        ).alias("has_all_words"),
    )
