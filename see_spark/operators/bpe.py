"""BPE tokenizer training over a distributed corpus.

Byte-pair encoding (Sennrich, Haddow & Birch 2016, arXiv:1508.07909) —
the vocabulary-construction step of an LLM data pipeline, expressed
Spark-first:

- **The 100 TB step is the word histogram.** BPE statistics depend only on
  the corpus's distinct (word, count) table, so the raw text is reduced by
  ONE map-side-combinable shuffle to a histogram that is many orders of
  magnitude smaller (Heaps' law: ~10^7-10^8 distinct words for a web-scale
  corpus). Everything after runs on the histogram, never the corpus.
- **Merges iterate on the histogram.** Each merge = one pair-count
  aggregate (map-side combinable, keyed by candidate pairs) + a 1-row
  argmax collect (the same O(1)-rows-per-iteration driver pattern as the
  k-means trainer in similarity.py) + one narrow string transform. No
  shuffle grows with the corpus; the histogram is checkpointed per
  iteration so the plan does not grow.
- **Words are symbol strings with each symbol wrapped in its own spaces**
  (" h  e  l  l  o "), so applying a merge (l, r) is
  ``replace(word, ' l  r ', ' lr ')`` — built-in, codegen'd, and with
  identical left-to-right non-overlapping semantics in Spark, DuckDB and
  Python, which is exactly BPE's greedy within-word merge order. The
  double-space join matters: every symbol owns both its delimiters, so a
  run like "l l l l" merges to "ll ll" (with a shared single space the
  second match would lose its leading delimiter to the first). That makes
  the whole trainer — and therefore its merge table — reproducible
  bit-for-bit by a SQL oracle.

Ties are pinned: highest pair count, then (left, right) lexicographic
ascending — deterministic at any parallelism and across engines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# each symbol owns its delimiters: " s1  s2  s3 "
_SYM = lambda word_col: F.concat(  # noqa: E731
    F.lit(" "), F.array_join(F.split(word_col, ""), "  "), F.lit(" ")
)


def bpe_word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> distinct-word histogram with each word pre-exploded to a
    symbol string (" c  h  a  r  s "). The one corpus-sized shuffle of BPE
    training; empty tokens (consecutive separators) are dropped. Returns
    (word_str, cnt)."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
        .select(_SYM(F.col("word")).alias("word_str"), "cnt")
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over the histogram, weighted by word
    count. One map-side-combinable aggregate keyed by (l, r)."""
    t = F.split(F.trim(F.col("word_str")), "  ")
    pairs = (
        words.select("cnt", t.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "cnt",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda j: F.struct(
                        F.element_at(F.col("t"), j).alias("l"),
                        F.element_at(F.col("t"), j + 1).alias("r"),
                    ),
                )
            ).alias("p"),
        )
    )
    return pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r")).agg(
        F.sum("cnt").cast("long").alias("pair_count")
    )


def bpe_train(docs: DataFrame, n_merges: int, text_col: str = "text") -> DataFrame:
    """Train ``n_merges`` BPE merges. Returns the merge table
    (rank, left, right, pair_count), rank 0 = first merge — the artifact a
    tokenizer ships. Stops early if no pair remains (tiny corpora)."""
    spark: SparkSession = docs.sparkSession
    words = bpe_word_histogram(docs, text_col).localCheckpoint(eager=True)
    merges = []
    for rank in range(n_merges):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("pair_count"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, c = best[0].l, best[0].r, best[0].pair_count
        merges.append((rank, l, r, c))
        words = words.withColumn(
            "word_str",
            F.replace("word_str", F.lit(f" {l}  {r} "), F.lit(f" {l}{r} ")),
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "rank long, left string, right string, pair_count long"
    )


def bpe_encode(
    docs: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained merge list to documents: whitespace-split words ->
    symbol strings -> each merge replayed in rank order (the greedy replay
    is exactly training's replace chain, so train+encode on the training
    corpus reproduces training's final word states). Returns
    (doc_id, n_words, n_tokens) — BPE token counts per document.

    ``merges`` is rank-ordered (left, right) pairs or Rows (e.g. from
    ``bpe_train(...).collect()``). The replace chain is one nested codegen
    expression; for vocab-scale merge lists (30k+) chunk the chain or move
    to an Arrow-batched UDF — at gate scale (<=64) the single expression
    stays inside the JVM codegen limit.
    """
    pairs = [
        (m.left, m.right) if hasattr(m, "left") else (m[0], m[1]) for m in merges
    ]
    toks = (
        docs.select(F.col(id_col).alias("doc_id"), F.split(text_col, " ").alias("w"))
        .select(
            "doc_id",
            F.size(F.filter("w", lambda x: x != "")).cast("long").alias("n_words"),
            F.explode("w").alias("word"),
        )
        .filter(F.col("word") != "")
    )
    merged = reduce(
        lambda col, p: F.replace(col, F.lit(f" {p[0]}  {p[1]} "), F.lit(f" {p[0]}{p[1]} ")),
        pairs,
        _SYM(F.col("word")),
    )
    per_word = toks.select(
        "doc_id",
        "n_words",
        F.size(F.split(F.trim(merged), "  ")).cast("long").alias("n_sym"),
    )
    return per_word.groupBy("doc_id").agg(
        F.first("n_words").alias("n_words"),
        F.sum("n_sym").cast("long").alias("n_tokens"),
    )
