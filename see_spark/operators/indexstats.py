"""Inverted-index layout statistics (engine addition): per-word posting-list
delta-gap stats, the numbers that drive compressed index layout decisions
(delta + varint/PFOR encoding sizes, posting-list skew, candidate words for
skip lists).

The reference stores postings as in-RAM Erlang sets
(see_db_storage_ets.erl:63,169-175) and never thinks about layout; at
10^11-posting scale the on-disk encoding is a first-class design input, and
these stats are what you compute before choosing it: sorted-doc_id gap
distributions give the exact delta-varint cost per word.

Plan shape: ONE shuffle on word; the window sort and the aggregate share
the same partitioning (the window's sort is reused by the groupBy — no
second exchange). All arithmetic is integer-exact except avg_gap (rounded),
and gap_bits uses bit-length via binary-string length (`bin`), which both
engines (Spark `bin`, DuckDB `bin`) define identically for positive ints —
no float log2 edge cases at powers of two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def posting_gap_stats(postings: DataFrame, round_dp: int = 6) -> DataFrame:
    """Per word over the doc_id-sorted posting list:

      n_docs   — posting-list length (the word's df)
      avg_gap  — mean delta between consecutive doc_ids (null if n_docs=1)
      max_gap  — largest delta (worst-case varint width driver)
      gap_bits — sum of bit-lengths of the deltas: the exact payload bits a
                 delta + minimal-binary encoding would spend after the first
                 posting (the first doc_id is stored raw, not counted here)

    Input: postings(word, doc_id) with doc_id unique per (word, doc_id).
    """
    w = Window.partitionBy("word").orderBy("doc_id")
    gaps = postings.select("word", "doc_id").withColumn(
        "__gap", F.col("doc_id") - F.lag("doc_id").over(w)
    )
    return gaps.groupBy("word").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("__gap"), round_dp).alias("avg_gap"),
        F.max("__gap").alias("max_gap"),
        F.sum(F.length(F.bin(F.col("__gap")))).alias("gap_bits"),
    )
