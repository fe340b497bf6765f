"""Inverted-index build: postings with precomputed tf (O3/O10/O11).

The reference recomputes tf by refetching the full word list per
(candidate, query word) — the N+1 pattern called out in SURVEY §3.1 step 5
(see_rank_tfidf.erl:8-11). Here tf is computed ONCE at index time from the
interleaved spans, so the search path never touches raw documents:

  tokens = extract_words(concat of kind='text' span texts)   (O8)
  postings(word, doc_id, term_count, doc_len, tf = term_count/doc_len)

Only text pages are indexed; binary/redirect/error pages are recorded in
the frontier but never enter postings (see_db_storage_ets.erl:163-167).

Shuffle shape: explode -> one groupBy (doc_id, word) with map-side partial
aggregation; doc_len via a window over doc_id (same shuffle key as the
groupBy output, so AQE fuses the exchange) — two narrow shuffles total,
both on keys the downstream joins reuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.udfs import tokenize_expr, tokens_from_spans


def postings_from_docs(text_docs: DataFrame) -> DataFrame:
    """text_docs: (doc_id, title, spans, ...) for text pages only.
    Tokenization is the Catalyst fast path (``tokenize_expr`` — pinned
    equivalent to the ``extract_words`` kernel), so the whole index build
    is JVM-side: no Python workers between the parsed spans and the
    postings shuffle."""
    from ..sources.tables import N_POSTINGS_BUCKETS

    tokens = text_docs.select(
        "doc_id",
        F.explode(tokenize_expr(tokens_from_spans(F.col("spans")))).alias("word"),
    )
    counts = tokens.groupBy("doc_id", "word").agg(
        F.count("*").alias("term_count")
    )
    w = Window.partitionBy("doc_id")
    return counts.withColumn(
        "doc_len", F.sum("term_count").over(w)
    ).withColumn(
        "tf", F.col("term_count") / F.col("doc_len")
    ).withColumn(
        # physical index shard: the postings commit partitions on this,
        # and the search read path prunes to the query words' buckets
        # (tables.N_POSTINGS_BUCKETS, catalog.read_parts)
        "word_bucket",
        F.pmod(F.xxhash64("word"), F.lit(N_POSTINGS_BUCKETS)).cast("int"),
    ).select("word", "doc_id", "term_count", "doc_len", "tf", "word_bucket")


def document_frequencies(postings: DataFrame) -> DataFrame:
    """O11 df: posting-set size per word (distinct docs)."""
    return postings.groupBy("word").agg(
        F.countDistinct("doc_id").alias("df")
    )


def word_stats_increment(fresh_postings: DataFrame) -> DataFrame:
    """Per-round df delta for the materialized word_stats table.

    ``fresh_postings`` holds exactly one row per (word, doc_id) for docs
    fetched THIS round, and every doc is fetched exactly once (URL-seen
    blocks re-enqueue), so a plain per-word row count is the exact df
    increment — df(word) = Σ increments, the reference's stored
    posting-set size (see_db_storage_ets.erl:117-123) kept as an
    append-only delta instead of a read-modify-write of the vocabulary.
    Map-side combinable: one narrow shuffle on word per round. Rows
    carry the same word_bucket as postings so the table commits
    physically bucketed and query reads prune to the query words'
    buckets."""
    from ..sources.tables import N_POSTINGS_BUCKETS

    return fresh_postings.groupBy("word").agg(
        F.count("*").alias("df")
    ).withColumn(
        "word_bucket",
        F.pmod(F.xxhash64("word"), F.lit(N_POSTINGS_BUCKETS)).cast("int"),
    )


def corpus_stats_increment(
    fresh_postings: DataFrame, field: str = "body", len_col: str = "doc_len"
) -> DataFrame:
    """Per-round corpus-length delta for the materialized corpus_stats
    table: one row ``(field, n_docs, sum_len)`` per field per round.

    BM25-family scorers need per-corpus scalars (avgdl, per-field average
    lengths). Deriving them at query time means a full-postings
    distinct+avg on the READ path — at 100 TB that is a corpus scan per
    query. Instead the same append-only delta pattern as ``word_stats``:
    each round aggregates only ITS fresh postings (every doc indexed
    exactly once — URL-seen blocks re-enqueue), and the read path sums
    O(rounds) delta rows:  avg field length = Σ sum_len / Σ n_docs,
    exactly the postings-wide average. Map-side combinable to one row.
    """
    per_doc = (
        fresh_postings.select("doc_id", len_col)
        .groupBy("doc_id")
        .agg(F.first(len_col).alias("__len"))
    )
    return per_doc.agg(
        F.count("*").alias("__n"), F.sum("__len").alias("__s")
    ).select(
        F.lit(field).alias("field"),
        F.col("__n").cast("long").alias("n_docs"),
        F.coalesce(F.col("__s"), F.lit(0)).cast("long").alias("sum_len"),
    )


def title_stats_increment(index_docs: DataFrame) -> DataFrame:
    """Title-field corpus-length delta, same ``(field, n_docs, sum_len)``
    shape: token counts of this round's titles via the same Catalyst
    tokenizer the title-postings serving path uses, counting only docs
    whose title tokenizes to >= 1 word (exactly the docs that appear in
    title postings, so Σ/Σ equals the title-postings distinct-doc avg)."""
    lens = (
        index_docs.filter(F.col("title").isNotNull())
        .select(F.size(tokenize_expr(F.col("title"))).alias("__len"))
        .filter(F.col("__len") > 0)
    )
    return lens.agg(
        F.count("*").alias("__n"), F.sum("__len").alias("__s")
    ).select(
        F.lit("title").alias("field"),
        F.col("__n").cast("long").alias("n_docs"),
        F.coalesce(F.col("__s"), F.lit(0)).cast("long").alias("sum_len"),
    )


def word_stats_reindex_delta(
    old_postings: DataFrame, new_postings: DataFrame
) -> DataFrame:
    """Signed df delta for RE-indexed documents — the index-maintenance
    arm of conditional revisits (operators/revisit.py): when a revisit
    finds changed content, the doc's postings rows are replaced and
    word_stats must move by (new df contribution - old df contribution)
    per word.

    Inputs are the changed docs' CURRENT postings and their replacement
    postings (one row per (word, doc_id) each, the postings invariant).
    Returns (word, df) with df possibly negative — the same append-only
    delta shape ``word_stats_increment`` commits, so Σ deltas stays the
    exact posting-set size whether a doc was indexed once or re-indexed
    many times. Two map-side-combinable word aggregates + one word-keyed
    outer join; rows only for words whose df actually moved."""
    from ..sources.tables import N_POSTINGS_BUCKETS

    oldc = old_postings.groupBy("word").agg(F.count("*").alias("__old"))
    newc = new_postings.groupBy("word").agg(F.count("*").alias("__new"))
    return (
        oldc.join(newc, "word", "full_outer")
        .select(
            "word",
            (
                F.coalesce("__new", F.lit(0)) - F.coalesce("__old", F.lit(0))
            ).cast("long").alias("df"),
        )
        .filter(F.col("df") != 0)
        .withColumn(
            "word_bucket",
            F.pmod(F.xxhash64("word"), F.lit(N_POSTINGS_BUCKETS)).cast("int"),
        )
    )


def doc_keywords(
    postings: DataFrame, page_count: int, k: int = 3,
    word_stats: DataFrame = None, round_dp: int = 6,
) -> DataFrame:
    """Per-document top-``k`` tf-idf keywords (engine addition): the
    standard document-summarization projection of the index — the k terms
    that best DISTINGUISH each document, i.e. highest tf·ln(N/(1+df))
    with the reference's idf form (core/rank.py, see_rank_tfidf.erl
    semantics: negative idf allowed, so ubiquitous words sink).

    Index-time analytics, not a query-path op: df comes from ONE
    aggregate over the postings (or from the materialized ``word_stats``
    table when given — then postings are touched once), followed by one
    window keyed by doc_id. Both shuffles are combinable/index-shaped;
    nothing is per-query. Ties pinned (score desc, word asc) so the
    k-cut is deterministic in any engine. Returns (doc_id, word,
    keyword_rank, score) with score rounded for engine portability.
    """
    if word_stats is not None:
        dfs = word_stats.groupBy("word").agg(F.sum("df").alias("df"))
    else:
        dfs = postings.groupBy("word").agg(
            F.countDistinct("doc_id").alias("df")
        )
    scored = postings.join(dfs, "word").withColumn(
        "__score",
        F.col("tf")
        * F.log(F.lit(float(page_count)) / (F.lit(1.0) + F.col("df"))),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("__score"), F.asc("word")
    )
    return (
        scored.withColumn("keyword_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("keyword_rank") <= k)
        .select(
            "doc_id", "word", "keyword_rank",
            F.round("__score", round_dp).alias("score"),
        )
    )
