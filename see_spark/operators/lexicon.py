"""Vocabulary-level query operators: fuzzy term expansion and trigram
substring search (engine additions — the reference matches query tokens
against index terms exactly and only exactly, see_db_srv.erl:107-109; these
are the standard lexicon upgrades every production engine layers on top of
the same postings contract).

Scale shape: both operators work off the *vocabulary* — the distinct-word
relation, orders of magnitude smaller than postings (|vocab| ~ 10^7-10^8 at
web scale vs 10^11+ posting rows). Fuzzy expansion is a single pruned scan
of the vocabulary against a broadcast handful of query terms (JVM codegen
`levenshtein`, never Python); substring search probes a precomputed
trigram->word index with equi-joins (the pg_trgm design) instead of running
LIKE '%pat%' over postings. Both end in the same broadcast-semi-join into
postings that the exact search path uses, so everything downstream of the
lexicon stage is shared.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MAX_RESULTS = 100  # see_db_srv.erl:21


def _broadcast_literals(spark: SparkSession, col_name: str, values) -> DataFrame:
    """Tiny broadcast relation from Python literals, built as a Catalyst
    literal expression (explode(array(lit...))) — createDataFrame(list)
    would cost defaultParallelism Python-worker tasks per query (profiled
    in round 2; same rationale as operators/search.py)."""
    return F.broadcast(
        spark.range(1)
        .select(F.explode(F.array(*[F.lit(v) for v in values])).alias(col_name))
    )


def vocabulary(postings: DataFrame) -> DataFrame:
    """(word, df) from a postings relation — one combinable shuffle.
    In the crawl deployment this is the materialized word_stats table
    (operators/indexer.py); this derivation exists for standalone use."""
    return postings.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))


def fuzzy_expand(
    spark: SparkSession,
    terms: list,
    vocab: DataFrame,
    max_dist: int = 1,
) -> DataFrame:
    """Expand query terms to vocabulary words within Levenshtein distance
    ``max_dist``. Returns (term, word, dist) — every vocab word within the
    edit budget of each term, including exact hits at dist 0.

    Plan: ONE scan of the vocabulary, nested-loop joined against the
    broadcast term list with a length-band pre-filter
    (abs(len(word)-len(term)) <= max_dist) so the dynamic-programming
    `levenshtein` only runs on length-plausible pairs. No shuffle: the
    output is at most |vocab| x |terms| rows pre-filter and a handful
    post-filter. At 10^8-word scale this is a single embarrassingly
    parallel pass; a further prune (first-char buckets / deletion
    neighborhoods) trades exactness of the candidate set for scan
    fraction and is deliberately not done — `levenshtein` is codegen'd
    and the scan is one column of one table.
    """
    if not terms:
        return spark.createDataFrame([], "term string, word string, dist int")
    tdf = _broadcast_literals(spark, "term", terms)
    return (
        vocab.select("word")
        .join(tdf)  # broadcast nested-loop over a literal handful of terms
        .filter(
            F.abs(F.length("word") - F.length("term")) <= F.lit(max_dist)
        )
        .withColumn("dist", F.levenshtein("term", "word"))
        .filter(F.col("dist") <= F.lit(max_dist))
        .select("term", "word", "dist")
    )


def search_fuzzy(
    spark: SparkSession,
    query: str,
    postings: DataFrame,
    docs: DataFrame,
    page_count: int,
    k: int = MAX_RESULTS,
    max_dist: int = 1,
    round_dp: int = 6,
) -> DataFrame:
    """Fuzzy disjunctive tf-idf search: tokenize the query (the pinned O8
    kernel), expand each token to vocabulary words within ``max_dist``
    edits, then rank docs by

        score(d) = sum over (term, word) matches of
                   qcount(term) * tf(word, d) * idf(word) / (1 + dist)

    — the 1/(1+dist) factor discounts inexact matches; OR semantics
    (any expanded word matches), because demanding AND over misspelled
    terms is self-defeating. idf = ln(N/(1+df)), the reference's formula
    (see_rank_tfidf.erl:13-15), negative values allowed.

    Plan shape: the expansion output (a handful of rows) is broadcast into
    postings — identical downstream shape to operators/search.py: df
    aggregate restricted to matched words, one doc_id shuffle,
    TakeOrderedAndProject top-k, post-k-cut title join. Scores rounded to
    ``round_dp`` for cross-parallelism determinism (double sum order).
    """
    from ..core.text import extract_words

    words = extract_words(query)
    if not words:
        return spark.createDataFrame([], "url string, title string, score double")
    counts: dict = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    vocab = vocabulary(postings)
    exp = fuzzy_expand(spark, sorted(counts), vocab, max_dist=max_dist)
    qdf = F.broadcast(
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("term"),
                            F.lit(c).cast("int").alias("qcount"),
                        )
                        for t, c in counts.items()
                    ]
                )
            ).alias("__q")
        )
        .select("__q.term", "__q.qcount")
    )
    # (word, weight) with per-term multiplicity folded in; a word reachable
    # from two query terms scores from both (summed), matching the
    # reference's query-token-multiplicity rule lifted to expansions.
    wdf = F.broadcast(
        exp.join(qdf, "term").select(
            "word",
            (F.col("qcount") / (F.lit(1.0) + F.col("dist"))).alias("weight"),
        )
    )
    df_by_word = (
        postings.join(wdf.select("word").distinct(), "word", "left_semi")
        .groupBy("word")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    matched = postings.join(wdf, "word").join(F.broadcast(df_by_word), "word")
    scored = matched.groupBy("doc_id").agg(
        F.sum(
            F.col("weight")
            * F.col("tf")
            * F.log(F.lit(float(page_count)) / (F.lit(1.0) + F.col("df")))
        ).alias("score")
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    return (
        top.join(docs.select("doc_id", "title"), "doc_id")
        .select(
            F.col("doc_id").alias("url"),
            "title",
            F.round("score", round_dp).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("url"))
    )


def _trigrams_of(name: str) -> Column:
    """All (possibly repeated) character trigrams of the named string
    column, as an array; empty for strings shorter than 3. Pure Catalyst."""
    return F.expr(
        f"CASE WHEN length({name}) >= 3 THEN"
        f" transform(sequence(0, length({name}) - 3),"
        f" i -> substring({name}, i + 1, 3))"
        f" ELSE array() END"
    )


def trigram_index(vocab: DataFrame) -> DataFrame:
    """(trigram, word): the pg_trgm-style substring index over the
    vocabulary. Distinct per (word, trigram) — repeated trigrams within a
    word collapse, so the probe's count-distinct AND works. Words shorter
    than 3 chars produce no rows (not substring-searchable below the
    trigram floor). Build cost: one pass over the vocabulary, output
    ~ (avg_len-2) x |vocab| rows; at scale this is written once per index
    round alongside word_stats, bucketed by trigram so probes are
    co-located equi-joins."""
    w = vocab.select("word").where(F.length("word") >= 3)
    return (
        w.select("word", F.explode(_trigrams_of("word")).alias("trigram"))
        .distinct()
        .select("trigram", "word")
    )


def substring_match(
    index: DataFrame,
    pattern: str,
) -> DataFrame:
    """Vocabulary words containing ``pattern`` (length >= 3), via the
    trigram index: a word containing the pattern necessarily contains
    every trigram of the pattern (100% recall), so candidates =
    words matching ALL pattern trigrams (count-distinct HAVING over
    equi-join probes — never a LIKE scan of the vocabulary), then the
    exact `contains` check keeps only true matches (precision). Returns
    (word,)."""
    if len(pattern) < 3:
        raise ValueError("substring pattern must be at least 3 chars (trigram floor)")
    pats = sorted({pattern[i : i + 3] for i in range(len(pattern) - 2)})
    candidates = (
        index.filter(F.col("trigram").isin(pats))
        .groupBy("word")
        .agg(F.countDistinct("trigram").alias("__nt"))
        .filter(F.col("__nt") == F.lit(len(pats)))
        .select("word")
    )
    return candidates.filter(F.col("word").contains(pattern))


def substring_search(
    postings: DataFrame,
    index: DataFrame,
    pattern: str,
    k: int = MAX_RESULTS,
) -> DataFrame:
    """Docs containing any vocabulary word that contains ``pattern``:
    trigram-index probe (substring_match) -> broadcast the matched words
    into postings -> per-doc (n_words = distinct matched words,
    hits = total occurrences) -> top-k by (hits desc, doc_id asc), a
    TakeOrderedAndProject. The postings side never scans strings — the
    string work happened on the vocabulary."""
    words = F.broadcast(substring_match(index, pattern))
    return (
        postings.join(words, "word")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("word").alias("n_words"),
            F.sum("term_count").alias("hits"),
        )
        .orderBy(F.desc("hits"), F.asc("doc_id"))
        .limit(k)
    )


def suggest_corrections(
    spark: SparkSession,
    terms: list,
    vocab: DataFrame,
    max_dist: int = 2,
) -> DataFrame:
    """Query spell suggestion ("did you mean"): the best vocabulary
    correction per query term — the standard search-engine fallback when
    a term has zero (or few) hits. Candidate set = ``fuzzy_expand``
    (one vocab scan against the broadcast terms, codegen levenshtein);
    pick is pinned: smallest edit distance, then HIGHEST document
    frequency (the most attested spelling wins ties), then word asc. An
    exact vocab hit suggests itself at dist 0 — callers key "did you
    mean" UI off dist > 0. Terms with no candidate inside ``max_dist``
    emit (term, null, null, null).

    ``vocab``: (word, df) — the materialized word_stats table at
    production scale, so suggestion costs one scan of the vocabulary and
    never touches postings or documents.
    """
    exp = fuzzy_expand(spark, terms, vocab.select("word"), max_dist)
    cand = exp.join(vocab.select("word", "df"), "word")
    w = Window.partitionBy("term").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("word")
    )
    best = (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    tdf = _broadcast_literals(spark, "term", terms)
    return tdf.join(best, "term", "left").select(
        "term",
        F.col("word").alias("suggestion"),
        F.col("dist").cast("long").alias("dist"),
        F.col("df").cast("long").alias("df"),
    )


def autocomplete(
    spark: SparkSession,
    prefixes: list,
    vocab: DataFrame,
    k: int = 8,
) -> DataFrame:
    """Query autocomplete: top-``k`` vocabulary completions per prefix,
    ranked by document frequency desc (the most attested completion
    first), word asc on ties — the search-box suggestion surface the
    reference's bare GET /search UI lacks (see_web.erl serves no
    suggest endpoint).

    (prefix, word, df, rank) for every prefix in ``prefixes`` (prefixes
    with no completion emit nothing — callers render an empty dropdown).

    ``vocab``: (word, df) — the materialized word_stats table in the
    crawl deployment, so a suggestion costs ONE scan of the word
    dimension (10^7-10^9 rows at web scale, trivially partitioned),
    never postings or documents. The prefix set is a broadcast literal;
    matching is a codegen startswith against it; the per-prefix top-k is
    a window over candidate rows only (a few thousand per prefix, not
    the vocabulary)."""
    pdf = _broadcast_literals(
        spark, "prefix", sorted({str(p) for p in prefixes})
    )
    cand = vocab.select("word", "df").join(
        pdf, F.col("word").startswith(F.col("prefix"))
    )
    w = Window.partitionBy("prefix").orderBy(F.desc("df"), F.asc("word"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
        .select("prefix", "word", F.col("df").cast("long").alias("df"), "rank")
    )


def related_terms(
    postings: DataFrame,
    seeds,
    page_count: int,
    min_df: int = 2,
    k: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Query-expansion candidates by pointwise mutual information (Church
    & Hanks, CL 1990): for each seed term, the top-``k`` co-occurring
    vocabulary words by

        pmi(s, w) = ln( N * df(s, w) / (df(s) * df(w)) )

    over DOCUMENT-level co-occurrence (the doc is the context window —
    the standard choice for index-resident expansion; engine addition,
    the reference has no expansion surface). ``min_df`` drops
    hapax-dominated partners whose PMI is inflated by rarity — the
    classic PMI failure mode.

    Scale shape: the corpus side never fans out — the distinct postings
    relation is joined FIRST against the broadcast seed list (so only
    seed-containing docs join back against their own words), then one
    combinable (seed, word) count, one vocab-df count, broadcast
    seed-df, and a per-seed window for the k-cut. Cost is bounded by
    |docs containing a seed| x doc_len, not corpus².

    Returns (seed, word, df_pair, pmi, expansion_rank), ties pinned
    (pmi desc, word asc); pmi rounded for engine portability.
    """
    docs_w = postings.select("doc_id", "word").distinct()
    seed_rel = _broadcast_literals(
        docs_w.sparkSession, "word", sorted(set(seeds))
    )
    seed_docs = docs_w.join(seed_rel, "word").select(
        F.col("word").alias("seed"), "doc_id"
    )
    pairs = seed_docs.join(docs_w, "doc_id").filter(
        F.col("word") != F.col("seed")
    )
    co = pairs.groupBy("seed", "word").agg(
        F.count("*").cast("long").alias("df_pair")
    )
    dfs = docs_w.groupBy("word").agg(F.count("*").cast("long").alias("df_w"))
    seed_dfs = F.broadcast(
        dfs.join(seed_rel, "word").select(
            F.col("word").alias("seed"), F.col("df_w").alias("df_s")
        )
    )
    scored = (
        co.join(dfs, "word")
        .filter(F.col("df_w") >= min_df)
        .join(seed_dfs, "seed")
        .withColumn(
            "pmi",
            F.log(
                (F.lit(float(page_count)) * F.col("df_pair"))
                / (F.col("df_s") * F.col("df_w"))
            ),
        )
    )
    w = Window.partitionBy("seed").orderBy(F.desc("pmi"), F.asc("word"))
    return (
        scored.withColumn(
            "expansion_rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("expansion_rank") <= k)
        .select(
            "seed", "word", "df_pair",
            F.round("pmi", round_dp).alias("pmi"),
            "expansion_rank",
        )
    )


def query_chains(
    queries: DataFrame,
    session_gap_s: int = 1800,
    top_n: int = 3,
) -> DataFrame:
    """Next-query suggestion mining from a query log — the
    session-co-occurrence signal behind "searches related to ..."
    (Boldi et al. 2008 query-flow-graph shape, the count-based core):
    within a user session (same user, inter-query gap <= ``session_gap_s``
    seconds), every ADJACENT ordered pair (q, next_q) with q != next_q
    is a reformulation observation; suggestions per query are the
    top-``top_n`` next-queries by (count DESC, next_q ASC).

    Input: (user_id, ts, query) — ts a timestamp, ties broken by query
    string so the order is total. Scale shape: ONE user-keyed shuffle
    (lag window for both the gap test and the successor), one
    combinable (q, next_q) count, one q-keyed window for the top-n cut.
    The reference has no query log; this is the standard engine addition
    a serving stack mines from its own search traffic.

    Returns (query, next_query, n_obs, rank).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "query")
    pairs = (
        queries.select(
            "user_id",
            F.col("ts").cast("long").alias("ts"),
            F.col("query"),
        )
        .withColumn("__next_q", F.lead("query").over(w))
        .withColumn("__next_ts", F.lead("ts").over(w))
        .where(
            F.col("__next_q").isNotNull()
            & (F.col("__next_ts") - F.col("ts") <= session_gap_s)
            & (F.col("__next_q") != F.col("query"))
        )
        .groupBy(F.col("query"), F.col("__next_q").alias("next_query"))
        .agg(F.count("*").cast("long").alias("n_obs"))
    )
    rk = Window.partitionBy("query").orderBy(
        F.col("n_obs").desc(), F.col("next_query").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(rk).cast("long"))
        .where(F.col("rank") <= top_n)
    )
