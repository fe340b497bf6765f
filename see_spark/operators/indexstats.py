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


def zipf_fit(postings: DataFrame, top_n: int = 500) -> DataFrame:
    """Zipf rank-frequency fit over the term distribution — the corpus
    health number capacity planning reads (a healthy natural-language
    corpus fits ln(freq) ~ a + s*ln(rank) with s near -1; spam farms,
    boilerplate floods, and tokenizer regressions all bend it).

    One combinable word aggregate -> top_n cut by (freq desc, word asc)
    -> least-squares slope over (ln rank, ln freq), both quantized to
    integer MILLI-nats BEFORE the sums so every Σ is exact int64
    arithmetic in any engine (milli keeps n*Σxy within int64 for any
    top_n <= 10^6; a raw double Σ would be partial-aggregation-order
    dependent). Returns one row: (n_words, top_freq, slope_milli).
    """
    freqs = postings.groupBy("word").agg(
        F.sum("term_count").cast("long").alias("freq")
    )
    w = Window.orderBy(F.desc("freq"), F.asc("word"))
    # the global window runs over the top_n slice only at scale too:
    # pre-cut with a TakeOrderedAndProject-shaped limit first
    top = (
        freqs.orderBy(F.desc("freq"), F.asc("word"))
        .limit(top_n)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )
    q = top.select(
        F.round(F.log(F.col("rank").cast("double")) * 1000, 0)
        .cast("long").alias("x"),
        F.round(F.log(F.col("freq").cast("double")) * 1000, 0)
        .cast("long").alias("y"),
        "freq",
    )
    sums = q.agg(
        F.count("*").cast("long").alias("n_words"),
        F.max("freq").cast("long").alias("top_freq"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return sums.select(
        "n_words",
        "top_freq",
        F.expr(
            "((n_words * sxy - sx * sy) * 1000) div (n_words * sxx - sx * sx)"
        ).cast("long").alias("slope_milli"),
    )


def hot_term_cache_plan(
    term_access: DataFrame, hot_mass_milli: int = 800
) -> DataFrame:
    """Serving-tier assignment for the term dictionary: the smallest
    prefix of terms (by access frequency) covering ``hot_mass_milli``/1000
    of total query-term accesses goes to the HOT tier (RAM-resident
    postings/dictionary), the tail stays cold — the classic skew-driven
    cache plan (query logs are Zipfian, so a tiny hot set covers most
    accesses; see the zipf_fit audit above for the slope that predicts
    the hot-set size).

    ``term_access``: (word, n_queries). One global cumulative window over
    the DICTIONARY relation (vocab-sized, not corpus-sized; at 10^8-term
    vocab switch the window to the two-pass range-partition cumsum used
    by packing.py). Pinned rule: a term is hot while the cumulative mass
    INCLUDING it is <= the threshold, plus the first term always (a
    threshold below the top term's own mass would otherwise cache
    nothing). Ties (n_queries, word) pinned. Integer milli math
    throughout. Returns (word, n_queries, cum_rank, cum_milli, is_hot).
    """
    total = term_access.agg(
        F.sum("n_queries").cast("long").alias("__t")
    )
    w = Window.orderBy(F.desc("n_queries"), F.asc("word")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rw = Window.orderBy(F.desc("n_queries"), F.asc("word"))
    return (
        term_access.crossJoin(F.broadcast(total))
        .withColumn("__cum", F.sum("n_queries").over(w).cast("long"))
        .withColumn("cum_rank", F.row_number().over(rw).cast("long"))
        .select(
            "word",
            F.col("n_queries").cast("long").alias("n_queries"),
            "cum_rank",
            F.expr("(__cum * 1000) div __t").cast("long").alias("cum_milli"),
            (
                (F.expr("(__cum * 1000) div __t") <= hot_mass_milli)
                | (F.col("cum_rank") == 1)
            ).alias("is_hot"),
        )
    )


def index_tiers(
    postings: DataFrame,
    query_words: list[str],
    n_tiers: int = 3,
    k: int = 20,
) -> DataFrame:
    """Tiered-index assignment + first-tier-sufficiency audit (Risvik,
    Aasheim & Lidal 2003, "Multi-tier architecture for web search
    engines"): documents are ranked by a static quality key — here the
    repetition-penalized distinct-token rate, (1000 * n_distinct_terms)
    div doc_len, integer-exact — and split into ``n_tiers`` tiers of
    ntile sizes (first ``n mod t`` tiers one doc larger). The audit then
    asks THE tiered-index question: how much of the pinned query's
    exact top-``k`` (by summed term frequency, doc_id tie-break) lives
    in each tier, cumulatively — i.e. could serving tier 0 alone have
    answered the query?

    Tier boundaries use the closed-form ntile rule on a DISTRIBUTED
    dense rank (functions/seq.py), never a global ntile window — at
    10^10 docs a single-partition window is the difference between a
    plan that runs and one that doesn't. The final per-tier cumulation
    is over ``n_tiers`` metadata rows (a broadcast-sized relation).

    Returns one row per tier: (tier, n_docs, min_score, max_score,
    topk_hits, cum_hits, covers_topk).
    """
    from ..functions.seq import with_dense_sequence

    per_doc = postings.groupBy("doc_id").agg(
        F.countDistinct("word").cast("long").alias("n_distinct"),
        F.max("doc_len").cast("long").alias("doc_len"),
    )
    scored = per_doc.select(
        "doc_id",
        F.expr("(1000 * n_distinct) div doc_len").cast("long").alias("score"),
    )
    ranked = with_dense_sequence(
        scored.withColumn("__neg", -F.col("score")),
        order_cols=["__neg", "doc_id"],
        out_col="__r",
        start=0,
    )
    nn = ranked.agg(F.count("*").cast("long").alias("__n"))
    t = F.lit(int(n_tiers))
    # closed-form ntile: q = n div t, m = n mod t; ranks < m*(q+1) land in
    # the first m (larger) tiers, the rest in size-q tiers.
    tiers = ranked.crossJoin(F.broadcast(nn)).select(
        "doc_id",
        "score",
        F.when(
            F.col("__r") < (F.expr(f"__n div {int(n_tiers)}") + 1) * (F.col("__n") % t),
            F.expr(f"__r div ((__n div {int(n_tiers)}) + 1)"),
        )
        .otherwise(
            F.when(
                F.expr(f"__n div {int(n_tiers)}") > 0,
                F.expr(
                    f"(__r - (__n % {int(n_tiers)})) div (__n div {int(n_tiers)})"
                ),
            ).otherwise(F.col("__r"))  # n < t: one doc per tier
        )
        .cast("long")
        .alias("tier"),
    )
    words = sorted(set(query_words))
    topk = (
        postings.where(F.col("word").isin(words))
        .groupBy("doc_id")
        .agg(F.sum("term_count").cast("long").alias("__tf"))
        .orderBy(F.col("__tf").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id")
    )
    hits = tiers.join(topk, "doc_id", "left_semi").groupBy("tier").agg(
        F.count("*").cast("long").alias("topk_hits")
    )
    per_tier = (
        tiers.groupBy("tier")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("score").cast("long").alias("min_score"),
            F.max("score").cast("long").alias("max_score"),
        )
        .join(hits, "tier", "left")
        .withColumn("topk_hits", F.coalesce("topk_hits", F.lit(0)).cast("long"))
    )
    w = Window.orderBy("tier").rowsBetween(Window.unboundedPreceding, 0)
    total = topk.count()
    return per_tier.select(
        "tier",
        "n_docs",
        "min_score",
        "max_score",
        "topk_hits",
        F.sum("topk_hits").over(w).cast("long").alias("cum_hits"),
    ).withColumn("covers_topk", F.col("cum_hits") >= F.lit(int(total)))


def compression_size_audit(postings: DataFrame, min_docs: int = 2) -> DataFrame:
    """Exact compressed-size costing of every posting list under the two
    classic docid-gap codecs — the numbers an index-layout decision is
    actually made on (Lucene/PISA-class engines pick per-block codecs
    from exactly these):

      raw       64 bits/docid (the uncompressed strawman)
      Rice      unary quotient + k-bit remainder per gap, k = floor(
                log2(avg_gap)) — near-optimal for geometric gaps
      Elias-Fano n·l + n + (U >> l) bits, l = floor(log2(U/n)) — the
                quasi-succinct layout with O(1) skip/select (Vigna 2013)

    Gap convention: previous docid starts at −1, so Σgaps = last + 1 = U
    (every gap ≥ 1, no zero-gap special case). All arithmetic is BIGINT
    — floor-log2 is length(bin(x)) − 1, no floating log — so the audit
    is engine-exact. Returns one row per word with ≥ ``min_docs``
    postings: (word, n_docs, universe, raw_bits, rice_k, rice_bits,
    ef_l, ef_bits, best).

    Scale shape: one window (lag) keyed by word for gaps, one per-word
    aggregate, one broadcast-back join of the two per-word code
    parameters, one final per-word sum — everything combinable, nothing
    wider than the word key.
    """
    w = Window.partitionBy("word").orderBy("doc_id")
    gaps = postings.select("word", F.col("doc_id").cast("long").alias("doc_id")).withColumn(
        "__gap",
        F.col("doc_id") - F.lag("doc_id", 1, -1).over(w),
    )
    per_word = gaps.groupBy("word").agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.max("doc_id") + 1).cast("long").alias("universe"),
    ).where(F.col("n_docs") >= F.lit(int(min_docs)))
    params = per_word.select(
        "word",
        "n_docs",
        "universe",
        (F.length(F.bin(F.expr("greatest(universe div n_docs, 1)"))) - 1)
        .cast("long")
        .alias("rice_k"),
        (F.length(F.bin(F.expr("greatest(universe div n_docs, 1)"))) - 1)
        .cast("long")
        .alias("ef_l"),
    )
    sums = (
        gaps.join(params.select("word", "rice_k"), "word")
        .groupBy("word")
        .agg(
            F.sum(
                F.expr("shiftright(__gap, cast(rice_k as int)) + 1 + rice_k")
            )
            .cast("long")
            .alias("rice_bits")
        )
    )
    out = params.join(sums, "word").select(
        "word",
        "n_docs",
        "universe",
        (F.col("n_docs") * 64).cast("long").alias("raw_bits"),
        "rice_k",
        "rice_bits",
        "ef_l",
        F.expr("n_docs * ef_l + n_docs"
               " + shiftright(universe, cast(ef_l as int))")
        .cast("long")
        .alias("ef_bits"),
    )
    return out.withColumn(
        "best",
        F.when(
            (F.col("rice_bits") <= F.col("ef_bits"))
            & (F.col("rice_bits") <= F.col("raw_bits")),
            F.lit("rice"),
        )
        .when(F.col("ef_bits") <= F.col("raw_bits"), F.lit("ef"))
        .otherwise(F.lit("raw")),
    )
