"""Span-level recrawl change audit over interleaved documents.

The input_hint's table shape is one row per document with
``spans: array<struct<kind,text,media_ref,offset>>`` — the interleaved
text+media sequence the parser emits (core/htmlx.to_spans; reference
see_html.erl:39-78 emits the same data/link order). When a page is
refetched, the revisit machinery (operators/recrawl.py, revisit.py)
decides WHETHER it changed by content hash; this module answers HOW it
changed at span granularity — the signal a training-data pipeline needs
to decide whether a change is content (re-embed, re-dedup) or chrome
(ignore), and what the media churn is (media refs appearing/disappearing
drive the media fetch queue).

``span_diff`` compares two snapshots as per-document MULTISETS of
(kind, text, media_ref) — order-insensitive by design: offset shifts
from an inserted boilerplate line shouldn't count every following span
as changed (the standard bag-of-spans relaxation; an order-sensitive
LCS diff is O(n²) per doc and needs no distributed plan).

Scale shape: spans are hashed to 60 bits doc-side (one md5 projection),
so the two groupBy-count shuffles and the full-outer join move
(doc_id, hash, count) rows — ~24 B/row at 10^10 spans — and raw span
text NEVER shuffles. Output is one row per document present in either
snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import hash60


def _span_counts(spans: DataFrame, id_col: str) -> DataFrame:
    h = hash60(
        F.concat_ws(
            "\x1f",
            F.col("kind"),
            F.coalesce(F.col("text"), F.lit("\x00")),
            F.coalesce(F.col("media_ref"), F.lit("\x00")),
        )
    )
    return (
        spans.select(
            F.col(id_col).alias("doc_id"),
            h.alias("span_h"),
            (F.col("kind") == "media").cast("int").alias("is_media"),
        )
        .groupBy("doc_id", "span_h", "is_media")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def span_diff(
    old_spans: DataFrame,
    new_spans: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document multiset diff of two span snapshots, each one row per
    span: (doc_id, kind, text, media_ref, offset). Returns
    (doc_id, n_old_spans, n_new_spans, added, removed, unchanged,
    media_added, media_removed, changed) for every doc in either
    snapshot — added/removed count multiset multiplicity exactly
    (a span going 2 -> 3 occurrences contributes 1 to added)."""
    o = _span_counts(old_spans, id_col).withColumnRenamed("cnt", "c_old")
    n = _span_counts(new_spans, id_col).withColumnRenamed("cnt", "c_new")
    j = o.join(n, ["doc_id", "span_h", "is_media"], "full_outer").select(
        "doc_id",
        "is_media",
        F.coalesce("c_old", F.lit(0)).alias("c_old"),
        F.coalesce("c_new", F.lit(0)).alias("c_new"),
    )
    add = F.greatest(F.col("c_new") - F.col("c_old"), F.lit(0))
    rem = F.greatest(F.col("c_old") - F.col("c_new"), F.lit(0))
    out = j.groupBy("doc_id").agg(
        F.sum("c_old").cast("long").alias("n_old_spans"),
        F.sum("c_new").cast("long").alias("n_new_spans"),
        F.sum(add).cast("long").alias("added"),
        F.sum(rem).cast("long").alias("removed"),
        F.sum(F.least("c_old", "c_new")).cast("long").alias("unchanged"),
        F.sum(add * F.col("is_media")).cast("long").alias("media_added"),
        F.sum(rem * F.col("is_media")).cast("long").alias("media_removed"),
    )
    return out.withColumn(
        "changed", (F.col("added") + F.col("removed")) > 0
    )
