"""Conjunctive TF-IDF search as ONE lazy DataFrame plan (O6,O8-O14,O25).

The reference's read path (see_db_srv.erl:107-114, SURVEY §3.1) rebuilt
Spark-first:

  tokenize query (O8, driver-side — a query is tiny)
  -> broadcast the query-token multiset (qcount keeps duplicate query words,
     which score multiply: see_db_srv_test.erl:193,212)
  -> semi-join postings on word (O6: index probe)
  -> AND semantics: HAVING count(distinct word) == |distinct query words|
     (O9, the classic rewrite of posting-set intersection)
  -> score = Σ qcount · tf · ln(N / (1+df))   (O10-O12; N counts ALL
     frontier rows incl. unvisited — see_db_storage_ets.erl:133-134; IDF may
     be negative)
  -> orderBy(score desc, url asc).limit(k)  — TakeOrderedAndProject, a true
     distributed top-k, no global sort (O13; tie-break pinned per SURVEY
     §7.0)
  -> join doc titles (O14).

Plan shape at scale: postings join against a BROADCAST few-row query dict;
one shuffle on doc_id for the candidate aggregation; top-k is
partial-per-partition then driver-merged. The docs join happens AFTER the
k-cut, so it touches ≤ k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..core.text import extract_words

MAX_RESULTS = 100  # see_db_srv.erl:21


def search(
    spark: SparkSession,
    query: str,
    postings: DataFrame,
    docs: DataFrame,
    page_count: int,
    k: int = MAX_RESULTS,
    word_stats: DataFrame = None,
) -> DataFrame:
    """Returns (url, title, score) — top-k by desc score, url tie-break.

    ``word_stats``: optional materialized df table of (word, df) per-round
    INCREMENTS (``tables.WORD_STATS_SCHEMA``; maintained by the crawl loop,
    crawl.py) — df(word) = sum over the word's increment rows. When given,
    the query never touches postings for document frequencies. When absent,
    df is derived from postings — but postings are semi-joined to the
    broadcast query words BEFORE the aggregate. Catalyst does not push a
    later semi-join below an Aggregate (verified on the optimized plan in
    round 2), so joining after groupBy silently aggregates the FULL
    postings table per query — the shape this function must never produce
    (plan-guarded in tests/test_plan_quality.py).
    """
    words = extract_words(query)
    if not words:
        return spark.createDataFrame([], "url string, title string, score double")
    counts: dict = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    # Literal expression, NOT createDataFrame(list): parallelizing a
    # Python list costs defaultParallelism Python-worker round-trip tasks
    # per query (profiled: ~0.3-1.4 s of blocked task time EACH at high
    # core counts). explode(array(struct(lit...))) stays entirely in
    # Catalyst, and literals need no SQL-escaping of user query words.
    qdf = F.broadcast(
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(w).alias("word"),
                            F.lit(c).cast("int").alias("qcount"),
                        )
                        for w, c in counts.items()
                    ]
                )
            ).alias("__q")
        )
        .select("__q.word", "__q.qcount")
    )
    n_distinct = len(counts)

    if word_stats is not None:
        df_by_word = (
            word_stats.join(qdf.select("word"), "word", "left_semi")
            .groupBy("word")
            .agg(F.sum("df").alias("df"))
        )
    else:
        df_by_word = (
            postings.join(qdf.select("word"), "word", "left_semi")
            .groupBy("word")
            .agg(F.countDistinct("doc_id").alias("df"))
        )
    # ≤ |distinct query words| rows after the semi-join — broadcast it so
    # the score join needs no shuffle on word.
    matched = postings.join(qdf, "word").join(F.broadcast(df_by_word), "word")
    scored = (
        matched.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(
                F.col("qcount")
                * F.col("tf")
                * F.log(F.lit(float(page_count)) / (F.lit(1.0) + F.col("df")))
            ).alias("score"),
        )
        .filter(F.col("n_words") == n_distinct)  # AND semantics (O9)
        .drop("n_words")
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    return (
        top.join(docs.select(F.col("doc_id"), F.col("title")), "doc_id")
        .select(F.col("doc_id").alias("url"), "title", "score")
        .orderBy(F.desc("score"), F.asc("url"))
    )


def _query_multiset(spark: SparkSession, counts: dict) -> DataFrame:
    """Broadcast (word, qcount) relation from the tokenized query multiset,
    built as a Catalyst literal (explode(array(struct(lit...)))) — see the
    plan note in search(): createDataFrame would cost defaultParallelism
    Python-worker tasks per query."""
    return F.broadcast(
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(w).alias("word"),
                            F.lit(c).cast("int").alias("qcount"),
                        )
                        for w, c in counts.items()
                    ]
                )
            ).alias("__q")
        )
        .select("__q.word", "__q.qcount")
    )


def search_or(
    spark: SparkSession,
    query: str,
    postings: DataFrame,
    docs: DataFrame,
    page_count: int,
    k: int = MAX_RESULTS,
    word_stats: DataFrame = None,
    round_dp: int = 6,
) -> DataFrame:
    """Disjunctive (OR) tf-idf ranking: identical to ``search`` minus the
    AND gate — a doc matching ANY query word is a candidate, scored over
    the words it does match (engine addition; the reference is
    AND-only, see_db_srv.erl:109,178-182). Same scale shape: broadcast
    query multiset, word-restricted df aggregate (plan-guarded family),
    one doc_id shuffle, TakeOrderedAndProject top-k, post-k-cut title
    join. Scores rounded to ``round_dp`` so the fractional tail of the
    double sum can't differ across parallelism."""
    words = extract_words(query)
    if not words:
        return spark.createDataFrame([], "url string, title string, score double")
    counts: dict = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    qdf = _query_multiset(spark, counts)
    if word_stats is not None:
        df_by_word = (
            word_stats.join(qdf.select("word"), "word", "left_semi")
            .groupBy("word")
            .agg(F.sum("df").alias("df"))
        )
    else:
        df_by_word = (
            postings.join(qdf.select("word"), "word", "left_semi")
            .groupBy("word")
            .agg(F.countDistinct("doc_id").alias("df"))
        )
    matched = postings.join(qdf, "word").join(F.broadcast(df_by_word), "word")
    scored = matched.groupBy("doc_id").agg(
        F.sum(
            F.col("qcount")
            * F.col("tf")
            * F.log(F.lit(float(page_count)) / (F.lit(1.0) + F.col("df")))
        ).alias("score")
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    return (
        top.join(docs.select(F.col("doc_id"), F.col("title")), "doc_id")
        .select(
            F.col("doc_id").alias("url"),
            "title",
            F.round("score", round_dp).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("url"))
    )


def build_impact_index(postings: DataFrame, c: int):
    """Impact-ordered index prefix (engine addition): per word, the top-``c``
    postings by tf (tf desc, doc_id asc — the pinned tie-break), plus
    per-word stats carrying the c-th tf for query-time pruning bounds.

    This is the batch materialization of WAND/max-score impact ordering
    (Broder et al. CIKM'03; Turtle & Flood's max_score): built ONCE at
    index time (one window shuffle keyed by word), it lets the query path
    touch O(|query| * c) rows instead of every posting of every query
    word. ``cth_tf`` is NULL for words with < c postings — those words'
    postings are all in the prefix, so an unseen doc contributes 0.

    Returns (impact_postings(word, doc_id, tf),
             impact_stats(word, n_postings, cth_tf)).
    """
    w = Window.partitionBy("word").orderBy(F.desc("tf"), F.asc("doc_id"))
    ranked = postings.select("word", "doc_id", "tf").withColumn(
        "__r", F.row_number().over(w)
    )
    impact = ranked.where(F.col("__r") <= c).drop("__r")
    stats = ranked.groupBy("word").agg(
        F.count("*").cast("long").alias("n_postings"),
        F.max(F.when(F.col("__r") == c, F.col("tf"))).alias("cth_tf"),
    )
    return impact, stats


def search_or_pruned(
    spark: SparkSession,
    query: str,
    postings: DataFrame,
    docs: DataFrame,
    page_count: int,
    k: int = MAX_RESULTS,
    c: int = None,
    impact: DataFrame = None,
    impact_stats: DataFrame = None,
    round_dp: int = 6,
) -> DataFrame:
    """Disjunctive tf-idf top-k via impact-index pruning, PROVABLY exact:
    identical output contract to ``search_or`` (url, title, score).

    Fagin-style threshold certificate over the ``build_impact_index``
    prefix: candidates = docs in any query word's top-``c`` prefix; they
    are scored exactly (every query-word posting they own). Any
    non-candidate doc d satisfies, per query word w,

        contrib(w, d) <= max(0, qcount(w) * idf(w) * cth_tf(w))

    — if idf(w) <= 0 every contribution of w is <= 0; if w has < c
    postings d cannot contain w at all (bound 0); otherwise d's tf is at
    most the c-th tf of the prefix. Summing bounds gives tau; if the
    k-th candidate score is STRICTLY above tau no non-candidate can
    displace the top-k (strictness also protects the doc_id tie-break),
    and the pruned result is certified exact. When the certificate fails
    (adversarial distributions, fewer than k candidates) this falls back
    to the flat ``search_or`` — exactness is unconditional, pruning is
    the fast path.

    Scale shape: with a materialized (impact, impact_stats) pair the
    query path reads O(|query| * c) prefix rows, broadcasts the
    candidate ids, and shuffles only candidate postings to the doc_id
    aggregate — the flat path's shuffle of EVERY matched posting (the
    dominant cost for common words) disappears. The certificate costs
    two scalar actions (tau, k-th score) on dimension-sized data.
    """
    words = extract_words(query)
    if not words:
        return spark.createDataFrame([], "url string, title string, score double")
    counts: dict = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    c = c if c is not None else 4 * k
    qdf = _query_multiset(spark, counts)
    qpost = postings.join(qdf.select("word"), "word", "left_semi")
    if impact is None or impact_stats is None:
        # on-the-fly build over the query's slice only (index-time builds
        # pass the materialized pair and skip this window entirely)
        impact, impact_stats = build_impact_index(qpost, c)
    df_by_word = (
        qpost.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    )
    idf = F.log(F.lit(float(page_count)) / (F.lit(1.0) + F.col("df")))

    cand = (
        impact.join(qdf.select("word"), "word", "left_semi")
        .select("doc_id")
        .distinct()
    )
    matched = postings.join(qdf, "word").join(F.broadcast(df_by_word), "word")
    scored = (
        matched.join(F.broadcast(cand), "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.sum(F.col("qcount") * F.col("tf") * idf).alias("score"))
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    # certificate: tau = sum of per-word non-candidate bounds
    bound = F.when(
        F.col("cth_tf").isNotNull() & (idf > 0),
        F.col("qcount") * F.col("cth_tf") * idf,
    ).otherwise(F.lit(0.0))
    tau_row = (
        impact_stats.join(qdf, "word")
        .join(F.broadcast(df_by_word), "word")
        .agg(F.coalesce(F.sum(bound), F.lit(0.0)).alias("tau"))
        .collect()
    )
    tau = tau_row[0]["tau"]
    topk_rows = top.collect()
    certified = len(topk_rows) >= k and topk_rows[-1]["score"] > tau
    if not certified:
        return search_or(
            spark, query, postings, docs, page_count, k=k, round_dp=round_dp
        )
    return (
        top.join(docs.select(F.col("doc_id"), F.col("title")), "doc_id")
        .select(
            F.col("doc_id").alias("url"),
            "title",
            F.round("score", round_dp).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("url"))
    )


def search_fielded(
    spark: SparkSession,
    query: str,
    body_postings: DataFrame,
    title_postings: DataFrame,
    docs: DataFrame,
    page_count: int,
    k: int = MAX_RESULTS,
    title_weight: float = 2.0,
    round_dp: int = 6,
) -> DataFrame:
    """Fielded (title-boosted) disjunctive tf-idf ranking (engine
    addition): the standard two-field upgrade of the reference's
    single-field scorer. Each field contributes its own tf, the title
    field scaled by ``title_weight``:

        score(d) = sum over matched (field, word) of
                   field_weight * qcount(w) * tf_field(w, d) * idf(w)

    idf comes from the BODY field only (the conventional choice — titles
    are short and would distort df); a word matching only in titles gets
    df=0, i.e. idf = ln(N/1).

    Plan shape: the two posting relations UNION with a literal
    field-weight column — no outer join between fields, the sum
    decomposes — then the exact ``search_or`` tail: broadcast query
    multiset, df aggregate restricted to query words on the body side,
    one doc_id shuffle, top-k cut, post-cut title join.
    """
    words = extract_words(query)
    if not words:
        return spark.createDataFrame([], "url string, title string, score double")
    counts: dict = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    qdf = _query_multiset(spark, counts)
    df_by_word = (
        body_postings.join(qdf.select("word"), "word", "left_semi")
        .groupBy("word")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    fields = body_postings.select(
        "doc_id", "word", "tf", F.lit(1.0).alias("fweight")
    ).unionByName(
        title_postings.select(
            "doc_id", "word", "tf", F.lit(float(title_weight)).alias("fweight")
        )
    )
    matched = (
        fields.join(qdf, "word")
        # left join + coalesce(df, 0): a title-only word has no body df row
        .join(F.broadcast(df_by_word), "word", "left")
        .withColumn("df", F.coalesce(F.col("df"), F.lit(0)))
    )
    scored = matched.groupBy("doc_id").agg(
        F.sum(
            F.col("fweight")
            * F.col("qcount")
            * F.col("tf")
            * F.log(F.lit(float(page_count)) / (F.lit(1.0) + F.col("df")))
        ).alias("score")
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    return (
        top.join(docs.select(F.col("doc_id"), F.col("title")), "doc_id")
        .select(
            F.col("doc_id").alias("url"),
            "title",
            F.round("score", round_dp).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("url"))
    )


def corpus_avg_len(corpus_stats: DataFrame, field: str = "body"):
    """Scalar average field length from the materialized corpus_stats
    delta table (``indexer.corpus_stats_increment`` /
    ``title_stats_increment`` rows: (field, n_docs, sum_len) per round).
    Sums O(rounds) tiny delta rows — NEVER the postings table; this is
    the read-path replacement for the per-query postings-wide
    distinct+avg. Returns None when the field has no docs yet."""
    row = (
        corpus_stats.filter(F.col("field") == field)
        .agg(F.sum("n_docs").alias("n"), F.sum("sum_len").alias("s"))
        .collect()[0]
    )
    if not row["n"]:
        return None
    return row["s"] / row["n"]


def search_bm25(
    spark: SparkSession,
    query: str,
    postings: DataFrame,
    docs: DataFrame,
    page_count: int,
    k: int = MAX_RESULTS,
    k1: float = 1.2,
    b: float = 0.75,
    avgdl: float = None,
    corpus_stats: DataFrame = None,
    round_dp: int = 9,
) -> DataFrame:
    """BM25 ranking over the same postings/docs contract as ``search``
    (engine addition — the reference ranks tf-idf only, see_rank_tfidf.erl;
    BM25 is the standard upgrade and shares the whole plan shape):

      idf(w)   = ln(1 + (N - df + 0.5) / (df + 0.5))      (RSJ, >= 0)
      tfn(w,d) = tc*(k1+1) / (tc + k1*(1 - b + b*doc_len/avgdl))
      score(d) = sum over query words of qcount * idf * tfn

    Identical scale shape to ``search``: broadcast query dict, semi-joined
    df aggregate (never the full postings table), one doc_id shuffle,
    TakeOrderedAndProject top-k, post-k-cut title join. ``avgdl`` is a
    per-corpus scalar, resolved in priority order: the explicit value,
    then ``corpus_stats`` (the materialized per-round delta table
    run_round commits — sums O(rounds) rows, the production path), and
    only as a last resort a distinct-doc aggregate over ``postings``
    (acceptable for ad-hoc/oracle use; at corpus scale it is a full
    postings scan per query, which is why the stats table exists).
    Scores rounded to ``round_dp`` so output is identical across
    parallelism (double summation order).
    """
    words = extract_words(query)
    if not words:
        return spark.createDataFrame([], "url string, title string, score double")
    counts: dict = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    qdf = F.broadcast(
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(w).alias("word"),
                            F.lit(c).cast("int").alias("qcount"),
                        )
                        for w, c in counts.items()
                    ]
                )
            ).alias("__q")
        )
        .select("__q.word", "__q.qcount")
    )
    n_distinct = len(counts)
    if avgdl is None and corpus_stats is not None:
        avgdl = corpus_avg_len(corpus_stats, "body")
    if avgdl is None:
        avgdl = (
            postings.select("doc_id", "doc_len")
            .distinct()
            .agg(F.avg("doc_len"))
            .collect()[0][0]
        )
    df_by_word = (
        postings.join(qdf.select("word"), "word", "left_semi")
        .groupBy("word")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    matched = postings.join(qdf, "word").join(F.broadcast(df_by_word), "word")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(page_count)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tfn = (F.col("term_count") * F.lit(k1 + 1.0)) / (
        F.col("term_count")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.lit(float(avgdl)))
    )
    scored = (
        matched.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.col("qcount") * idf * tfn).alias("score"),
        )
        .filter(F.col("n_words") == n_distinct)
        .drop("n_words")
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    return (
        top.join(docs.select(F.col("doc_id"), F.col("title")), "doc_id")
        .select(
            F.col("doc_id").alias("url"),
            "title",
            F.round("score", round_dp).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("url"))
    )


def search_query(
    spark: SparkSession,
    query: str,
    postings: DataFrame,
    docs: DataFrame,
    page_count: int,
    k: int = MAX_RESULTS,
    word_stats: DataFrame = None,
    title_postings: DataFrame = None,
    text_docs: DataFrame = None,
    title_weight: float = 2.0,
    max_dist: int = 1,
    round_dp: int = 6,
) -> DataFrame:
    """Structured query-language entry (engine addition): one string
    composes the engine's whole ranking family. Grammar in
    core/queryparse.py; semantics PINNED as:

      gates   — every ``"exact phrase"`` must occur (positional equi-join
                doc set, semi-joined); no ``-excluded`` word may occur
                (anti-join); plain terms gate conjunctively exactly like
                ``search()``.
      scorers — score(d) = and_score(plain terms)            [0 if none]
                         + title_weight·Σ qcount·tf_title·idf_body
                           for ``title:`` terms  (search_fielded rule)
                         + Σ qcount/(1+dist)·tf·idf over Levenshtein
                           expansions of ``tok~`` terms (search_fuzzy rule)
      base    — docs passing the AND gate when plain terms exist; else
                docs passing the phrase gates; else any doc matched by a
                scorer (disjunctive).

    ``title_postings`` is required for title: terms; ``text_docs``
    (doc_id, text) for phrases. Plan shape: every component reuses its
    standalone operator's scale shape (broadcast query dicts,
    word-restricted df aggregates, one doc_id shuffle each), the gates are
    semi/anti-joins on doc_id BEFORE the k-cut, and the final top-k is
    TakeOrderedAndProject.
    """
    from ..core.queryparse import _counts, parse_query
    from .lexicon import fuzzy_expand
    from .positional import phrase_search

    p = parse_query(query)
    if not (p["terms"] or p["phrases"] or p["title"] or p["fuzzy"]):
        return spark.createDataFrame([], "url string, title string, score double")
    if p["title"] and title_postings is None:
        raise ValueError("title: terms need title_postings")
    if p["phrases"] and text_docs is None:
        raise ValueError("phrases need text_docs (doc_id, text)")

    idf = lambda df_col: F.log(  # noqa: E731
        F.lit(float(page_count)) / (F.lit(1.0) + df_col)
    )

    and_scored = None
    if p["terms"]:
        counts = _counts(p["terms"])
        qdf = _query_multiset(spark, counts)
        if word_stats is not None:
            df_by_word = (
                word_stats.join(qdf.select("word"), "word", "left_semi")
                .groupBy("word").agg(F.sum("df").alias("df"))
            )
        else:
            df_by_word = (
                postings.join(qdf.select("word"), "word", "left_semi")
                .groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
            )
        and_scored = (
            postings.join(qdf, "word")
            .join(F.broadcast(df_by_word), "word")
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("__n"),
                F.sum(F.col("qcount") * F.col("tf") * idf(F.col("df")))
                .alias("score"),
            )
            .filter(F.col("__n") == len(counts))
            .select("doc_id", "score")
        )

    title_scored = None
    if p["title"]:
        qdf_t = _query_multiset(spark, _counts(p["title"]))
        df_t = (
            postings.join(qdf_t.select("word"), "word", "left_semi")
            .groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
        )
        title_scored = (
            title_postings.join(qdf_t, "word")
            .join(F.broadcast(df_t), "word", "left")
            .withColumn("df", F.coalesce(F.col("df"), F.lit(0)))
            .groupBy("doc_id")
            .agg(
                F.sum(
                    F.lit(float(title_weight))
                    * F.col("qcount") * F.col("tf") * idf(F.col("df"))
                ).alias("__tscore")
            )
        )

    fuzzy_scored = None
    if p["fuzzy"]:
        counts_f = _counts(p["fuzzy"])
        vocab = postings.select("word").distinct()
        exp = fuzzy_expand(spark, sorted(counts_f), vocab, max_dist=max_dist)
        qdf_f = F.broadcast(
            spark.range(1).select(
                F.explode(F.array(*[
                    F.struct(
                        F.lit(t).alias("term"),
                        F.lit(c).cast("int").alias("qcount"),
                    )
                    for t, c in counts_f.items()
                ])).alias("__q")
            ).select("__q.term", "__q.qcount")
        )
        wdf = F.broadcast(
            exp.join(qdf_f, "term").select(
                "word",
                (F.col("qcount") / (F.lit(1.0) + F.col("dist"))).alias("weight"),
            )
        )
        df_f = (
            postings.join(wdf.select("word").distinct(), "word", "left_semi")
            .groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
        )
        fuzzy_scored = (
            postings.join(wdf, "word")
            .join(F.broadcast(df_f), "word")
            .groupBy("doc_id")
            .agg(
                F.sum(F.col("weight") * F.col("tf") * idf(F.col("df")))
                .alias("__fscore")
            )
        )

    if and_scored is not None:
        base = and_scored
    elif p["phrases"]:
        base = (
            phrase_search(text_docs, p["phrases"][0])
            .select("doc_id").withColumn("score", F.lit(0.0))
        )
    else:
        parts = [s.select("doc_id") for s in (title_scored, fuzzy_scored)
                 if s is not None]
        base = parts[0]
        for extra in parts[1:]:
            base = base.unionByName(extra)
        base = base.distinct().withColumn("score", F.lit(0.0))

    for ph in p["phrases"]:
        base = base.join(
            phrase_search(text_docs, ph).select("doc_id"), "doc_id",
            "left_semi",
        )
    if p["exclude"]:
        excl = (
            postings.filter(F.col("word").isin(list(p["exclude"])))
            .select("doc_id").distinct()
        )
        base = base.join(excl, "doc_id", "left_anti")

    total = base
    for part in (title_scored, fuzzy_scored):
        if part is not None:
            total = total.join(part, "doc_id", "left")
    score = (
        F.col("score")
        + (F.coalesce(F.col("__tscore"), F.lit(0.0))
           if title_scored is not None else F.lit(0.0))
        + (F.coalesce(F.col("__fscore"), F.lit(0.0))
           if fuzzy_scored is not None else F.lit(0.0))
    )
    top = (
        total.select("doc_id", score.alias("__total"))
        .orderBy(F.desc("__total"), F.asc("doc_id"))
        .limit(k)
    )
    return (
        top.join(docs.select("doc_id", "title"), "doc_id")
        .select(
            F.col("doc_id").alias("url"),
            "title",
            F.round("__total", round_dp).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("url"))
    )


def diversify_by_host(
    results: DataFrame,
    k: int = MAX_RESULTS,
    per_host: int = 2,
    host_col: str = "host",
    score_col: str = "score",
    id_col: str = "url",
) -> DataFrame:
    """SERP host-collapse (engine addition): cap each host at
    ``per_host`` results before the global top-k, so one mega-site
    cannot monopolize a results page — the standard web-search
    diversification the reference's flat top-100 lacks.

    One window shuffle keyed by host (the host cardinality of a top-k
    CANDIDATE set, not the corpus — this runs after scoring, typically
    over k..100k rows) followed by the same TakeOrderedAndProject k-cut
    as the flat ranking. Appends ``host_rank`` (1-based within host).
    Ties are pinned (score desc, id asc) so the cut is deterministic in
    any engine."""
    w = Window.partitionBy(host_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        results.withColumn("host_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("host_rank") <= per_host)
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(k)
    )


def collapse_duplicates(
    results: DataFrame,
    dup_map: DataFrame,
    k: int = MAX_RESULTS,
    id_col: str = "url",
    score_col: str = "score",
) -> DataFrame:
    """SERP duplicate collapse (engine addition): near/exact-duplicate
    documents must not occupy multiple result slots — map each result to
    its duplicate-cluster canonical (``dup_map``: (doc_id,
    canonical_id), e.g. from exact_dedup's md5 groups or
    dedup_clusters' connected components) and keep only the
    best-scoring member per cluster, then re-cut to ``k``. The
    host-collapse sibling is ``diversify_by_host``; this one collapses
    CONTENT identity.

    Runs over the scored candidate page (<= the pre-cut k), so the
    window is SERP-sized, never corpus-sized; unmapped results are their
    own canonical (coalesce). Ties pinned (score desc, id asc) at both
    the per-cluster pick and the final cut.
    """
    j = results.join(
        dup_map.withColumnRenamed("doc_id", id_col), id_col, "left"
    ).withColumn(
        "canonical_id",
        F.coalesce(F.col("canonical_id"), F.col(id_col)).cast("long"),
    )
    w = Window.partitionBy("canonical_id").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        j.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .drop("__r")
        .orderBy(F.desc(score_col), F.asc("canonical_id"))
        .limit(k)
    )


def percolate(
    new_postings: DataFrame,
    standing_queries: DataFrame,
) -> DataFrame:
    """Prospective search / percolation (engine addition — the
    Elasticsearch-percolator / pub-sub-search shape): STANDING conjunctive
    queries are the indexed side, and each round's NEW documents probe
    them — the reverse of the normal query path, and the way alerting
    ("tell me when a page matching X appears") runs over a crawl without
    re-executing every subscription per round.

    ``standing_queries``: (query_id, word) — one row per distinct query
    word (conjunctive AND semantics, the reference's only connective:
    see_db_srv.erl:109). ``new_postings``: the ROUND DELTA's postings
    (doc_id, word) — never the full index; that is what makes this cheap
    at 10^10 URLs: cost is |round's postings ∩ subscribed words|.

    Plan: one equi-join on word (subscriptions are usually
    broadcast-sized; Catalyst picks broadcast under the threshold), one
    (doc_id, query_id) aggregate with the count-distinct HAVING rewrite
    of posting-set intersection (O9). Returns (doc_id, query_id,
    n_matched) for full conjunctive matches only.
    """
    q = standing_queries.select("query_id", "word").distinct()
    sizes = q.groupBy("query_id").agg(F.count("*").alias("__need"))
    matched = (
        new_postings.select("doc_id", "word")
        .distinct()
        .join(q, "word")
        .groupBy("doc_id", "query_id")
        .agg(F.countDistinct("word").cast("long").alias("n_matched"))
    )
    return (
        matched.join(F.broadcast(sizes), "query_id")
        .filter(F.col("n_matched") == F.col("__need"))
        .select("doc_id", "query_id", "n_matched")
    )


def more_like_this(
    postings: DataFrame,
    source_id,
    page_count: int,
    m: int = 5,
    k: int = 10,
    round_dp: int = 6,
) -> DataFrame:
    """"More like this": rank documents by similarity to ONE source
    document — the classic related-content query (Lucene's MLT shape):
    take the source doc's top-``m`` distinguishing terms (highest
    tf·idf, the doc_keywords criterion, ties pinned word-asc), then
    score every other document over those terms with Σ tf·idf and
    return the top ``k`` (ties doc-asc).

    Scale shape: the source doc's postings are ONE doc's vocabulary
    (broadcast); the df aggregate is word-restricted to that vocabulary
    (semi-join UNDER the aggregate — the plan-guarded family, never a
    full-postings df pass); candidate scoring joins postings against m
    broadcast keywords, one doc_id-keyed combinable aggregate,
    TakeOrderedAndProject top-k. No full-corpus shuffle anywhere.

    Returns (doc_id, n_shared, score).
    """
    src = postings.where(F.col("doc_id") == source_id).select(
        "word", F.col("tf").alias("src_tf")
    )
    dfb = (
        postings.join(F.broadcast(src.select("word")), "word", "left_semi")
        .groupBy("word")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    idf = F.log(F.lit(float(page_count)) / (F.lit(1.0) + F.col("df")))
    kw = (
        src.join(F.broadcast(dfb), "word")
        .select(
            "word",
            idf.alias("idf"),
            (F.col("src_tf") * idf).alias("kscore"),
        )
        .orderBy(F.desc("kscore"), F.asc("word"))
        .limit(m)
    )
    cand = postings.join(
        F.broadcast(kw.select("word", "idf")), "word"
    ).where(F.col("doc_id") != source_id)
    scored = cand.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_shared"),
        F.sum(F.col("tf") * F.col("idf")).alias("__score"),
    )
    return (
        scored.orderBy(F.desc("__score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "n_shared", F.round("__score", round_dp).alias("score"))
    )


def ltr_features(
    postings: DataFrame,
    edges: DataFrame,
    query_words: list[str],
) -> DataFrame:
    """Learning-to-rank feature assembly — the per-(query, doc) feature
    vector export a ranking-model training pipeline sits on (the
    LETOR/MSLR feature-file shape, all integer-exact): for every
    document matching >= 1 query word, joins the text-match signals from
    the postings relation (distinct matched words, summed term
    frequency, doc length, milli-normalized tf) with the link-graph
    signals (in/out-degree from the edge table). The reference ranks
    with one hand-coded tf-idf (see_db_ranking.erl); exporting the raw
    feature matrix instead is what lets a trained ranker replace the
    formula without touching the index.

    Scale shape: the query-word filter is a BROADCAST isin (postings
    never shuffles for it), the per-doc aggregate is map-side
    combinable on doc_id, degrees are two combinable edge aggregates,
    and the final assembly is doc_id-keyed joins — no all-pairs
    anything. Returns (doc_id, n_match, tf_sum, doc_len,
    tf_norm_milli, in_deg, out_deg).
    """
    words = sorted(set(query_words))
    matched = (
        postings.where(F.col("word").isin(words))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("word").cast("long").alias("n_match"),
            F.sum("term_count").cast("long").alias("tf_sum"),
            F.max("doc_len").cast("long").alias("doc_len"),
        )
        .withColumn(
            "tf_norm_milli", F.expr("(1000 * tf_sum) div doc_len").cast("long")
        )
    )
    indeg = edges.groupBy(F.col("dst").alias("doc_id")).agg(
        F.count("*").cast("long").alias("in_deg")
    )
    outdeg = edges.groupBy(F.col("src").alias("doc_id")).agg(
        F.count("*").cast("long").alias("out_deg")
    )
    return (
        matched.join(indeg, "doc_id", "left")
        .join(outdeg, "doc_id", "left")
        .select(
            "doc_id",
            "n_match",
            "tf_sum",
            "doc_len",
            "tf_norm_milli",
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
        )
    )


def search_rrf(
    postings: DataFrame,
    query_words: list[str],
    k: int = 60,
    pool: int = 50,
    topk: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher SIGIR 2009):
    combine rankers by summing 1/(k + rank) over each ranker's list —
    the robust, training-free fusion every hybrid-retrieval stack uses
    (its headline property: a doc ranked well by several weak rankers
    beats one ranked first by a single ranker). Fused here: raw summed
    term frequency (favors long matching docs) and length-normalized
    term rate (favors focused docs) — both integer-exact, so the fusion
    is engine-exact too: contribution = 1_000_000 div (k + rank) in
    integer micro-units, absent-from-list contributes 0.

    Scale shape: the broadcast word filter + per-doc aggregate feed two
    TakeOrderedAndProject ``pool``-cuts; ranks are windows over POOL
    rows (metadata-sized after the cut, never the corpus); the fusion
    is one full-outer join of two pool-sized frames. Returns
    (doc_id, rank_a, rank_b, rrf_micro, rank) — rank_a/rank_b 0 when
    the doc missed that ranker's pool.
    """
    from pyspark.sql import Window

    words = sorted(set(query_words))
    m = (
        postings.where(F.col("word").isin(words))
        .groupBy("doc_id")
        .agg(
            F.sum("term_count").cast("long").alias("tf_sum"),
            F.max("doc_len").cast("long").alias("doc_len"),
        )
        .withColumn(
            "tf_norm", F.expr("(1000 * tf_sum) div doc_len").cast("long")
        )
    )

    def _ranked(order_col):
        w = Window.orderBy(F.col(order_col).desc(), F.col("doc_id").asc())
        return (
            m.orderBy(F.col(order_col).desc(), F.col("doc_id").asc())
            .limit(pool)
            .withColumn("r", F.row_number().over(w).cast("long"))
            .select("doc_id", "r")
        )

    a = _ranked("tf_sum").withColumnRenamed("r", "rank_a")
    b = _ranked("tf_norm").withColumnRenamed("r", "rank_b")
    fused = a.join(b, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("rank_a", F.lit(0)).cast("long").alias("rank_a"),
        F.coalesce("rank_b", F.lit(0)).cast("long").alias("rank_b"),
    )
    contrib = lambda c: F.when(
        F.col(c) > 0, F.expr(f"1000000 div ({int(k)} + {c})")
    ).otherwise(F.lit(0))
    fused = fused.withColumn(
        "rrf_micro", (contrib("rank_a") + contrib("rank_b")).cast("long")
    )
    w = Window.orderBy(F.col("rrf_micro").desc(), F.col("doc_id").asc())
    return (
        fused.orderBy(F.col("rrf_micro").desc(), F.col("doc_id").asc())
        .limit(topk)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )


def search_bm25f(
    spark: SparkSession,
    query: str,
    body_postings: DataFrame,
    title_postings: DataFrame,
    docs: DataFrame,
    page_count: int,
    k: int = MAX_RESULTS,
    k1: float = 1.2,
    b_body: float = 0.75,
    b_title: float = 0.6,
    w_body: float = 1.0,
    w_title: float = 3.0,
    corpus_stats: DataFrame = None,
    round_dp: int = 6,
) -> DataFrame:
    """BM25F (Robertson, Zaragoza & Taylor, CIKM 2004 "Simple BM25
    extension to multiple weighted fields"): the principled multi-field
    BM25. The paper's key point — and what separates this from
    ``search_fielded``'s weighted score sum — is that term-frequency
    saturation is applied AFTER combining fields, so a term occurring in
    both title and body keeps counting (a weighted-sum-of-BM25s saturates
    each field separately and over-rewards duplicated occurrences):

      B_f(d)     = 1 - b_f + b_f * len_f(d) / avglen_f
      tfn(w,d)   = sum over fields f of  w_f * tc_f(w,d) / B_f(d)
      idf(w)     = ln(1 + (N - df + 0.5)/(df + 0.5))   (RSJ, df = docs
                   containing w in ANY field)
      score(d)   = sum over query words of qcount * idf * tfn/(k1 + tfn)

    Conjunctive like the reference's scorer: a doc must match every
    distinct query word in at least one field.

    Contract: ``body_postings`` (doc_id, word, term_count, doc_len),
    ``title_postings`` (doc_id, word, term_count, title_len) — field
    lengths ride the postings rows exactly like the body's ``doc_len``
    (precomputed at index time; see indexer.py, reference tf analogue
    see_rank_tfidf.erl). Per-field average lengths come from
    ``corpus_stats`` when given (the materialized delta table — the
    production path, O(rounds) rows); the fallback is one distinct-doc
    aggregate per field over the posting tables (ad-hoc/oracle use only
    — a per-query corpus scan at scale).

    Plan shape: each field semi-joins the broadcast query words, the two
    relations UNION into one (doc_id, word)-grouped combine (the per-pair
    sum has <= 2 addends — commutative, engine-exact), df restricted to
    query words over the union, one doc_id shuffle for the score
    aggregate, TakeOrderedAndProject top-k, post-cut title join. Never
    touches postings rows for non-query words.
    """
    words = extract_words(query)
    if not words:
        return spark.createDataFrame([], "url string, title string, score double")
    counts: dict = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    qdf = _query_multiset(spark, counts)
    n_distinct = len(counts)

    body = body_postings.join(qdf.select("word"), "word", "left_semi")
    title = title_postings.join(qdf.select("word"), "word", "left_semi")

    avg_body = avg_title = None
    if corpus_stats is not None:
        avg_body = corpus_avg_len(corpus_stats, "body")
        avg_title = corpus_avg_len(corpus_stats, "title")
    if avg_body is None:
        avg_body = (
            body_postings.select("doc_id", "doc_len").distinct()
            .agg(F.avg("doc_len")).collect()[0][0]
        )
    if avg_title is None:
        avg_title = (
            title_postings.select("doc_id", "title_len").distinct()
            .agg(F.avg("title_len")).collect()[0][0]
        )

    def _field(rel, len_col, avg_len, b_f, w_f):
        norm = (
            F.lit(1.0 - b_f)
            + F.lit(b_f) * F.col(len_col) / F.lit(float(avg_len))
        )
        return rel.select(
            "doc_id",
            "word",
            (F.lit(float(w_f)) * F.col("term_count") / norm).alias("wtf"),
        )

    u = _field(body, "doc_len", avg_body, b_body, w_body).unionByName(
        _field(title, "title_len", avg_title, b_title, w_title)
    )
    per_word = u.groupBy("doc_id", "word").agg(F.sum("wtf").alias("tfn"))

    df_by_word = (
        body.select("word", "doc_id")
        .unionByName(title.select("word", "doc_id"))
        .groupBy("word")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(page_count)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    scored = (
        per_word.join(qdf, "word")
        .join(F.broadcast(df_by_word), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(
                F.col("qcount") * idf * F.col("tfn")
                / (F.lit(float(k1)) + F.col("tfn"))
            ).alias("score"),
        )
        .filter(F.col("n_words") == n_distinct)
        .drop("n_words")
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


def facet_counts(
    results: DataFrame,
    docs: DataFrame,
    facet_cols: list,
    id_col: str = "doc_id",
) -> DataFrame:
    """Faceted-search counts over a result page: for each facet column,
    how many of the matched documents carry each value — the standard
    result-refinement sidebar (language, source/collection, host …)
    every production search UI layers over the ranked list (the
    reference's web UI has no facets; engine addition).

    Scale shape: ``results`` is a top-k page (≤ hundreds of rows), so it
    BROADCASTS into the metadata join — the docs table never shuffles —
    and the per-facet aggregates run over k rows. One stacked output:
    (facet, value, n), deterministic integers.
    """
    joined = docs.join(
        F.broadcast(results.select(F.col(id_col).alias("__rid"))),
        F.col(id_col) == F.col("__rid"),
    )
    parts = [
        joined.groupBy(
            F.lit(c).alias("facet"),
            F.col(c).cast("string").alias("value"),
        ).agg(F.count("*").cast("long").alias("n"))
        for c in facet_cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def search_qlm(
    spark: SparkSession,
    query: str,
    postings: DataFrame,
    docs: DataFrame,
    k: int = MAX_RESULTS,
    mu: float = 2000.0,
    corpus_tokens: Optional[int] = None,
    round_dp: int = 9,
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty 2001)
    — the probabilistic-LM family, the third classic ranker next to
    tf-idf (the reference's only one, see_rank_tfidf.erl) and BM25.

    Full QL scores ln Π_w ((tf + μ·p_c(w)) / (dl + μ))^qcount with
    collection model p_c(w) = cf(w)/C. This returns the standard
    rank-equivalent form with the document-independent constant
    Σ qcount·ln(μ·p_c) dropped:

      score(d) = Σ_{w matched} qcount·ln(1 + tf·C/(μ·cf(w)))
                 − Qtot·ln(dl + μ)

    over OR-matched candidates (docs containing ≥1 query term), where
    Qtot = Σ qcount over query words present in the corpus; unseen query
    words are dropped (p_c = 0 would send every score to −∞ — the
    standard treatment). Note the second term PENALIZES long documents:
    QL has a built-in length prior that tf-idf lacks.

    Scale shape, same as ``search``: broadcast query literal, cf per
    word from a SEMI-JOINED aggregate (never the full postings table —
    the round-2 plan lesson), matched join broadcasts the ≤|q|-row cf
    relation, one doc_id shuffle, TakeOrderedAndProject top-k. ``C``
    (corpus token count) is a per-corpus scalar — pass the materialized
    value in production; else one distinct-doc aggregate computes it.
    Scores round to ``round_dp`` (ln + float sum are the non-exact ops).
    """
    words = extract_words(query)
    if not words:
        return spark.createDataFrame(
            [], "url string, title string, score double"
        )
    counts: dict = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    qdf = F.broadcast(
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(w).alias("word"),
                            F.lit(c).cast("int").alias("qcount"),
                        )
                        for w, c in counts.items()
                    ]
                )
            ).alias("__q")
        )
        .select("__q.word", "__q.qcount")
    )
    if corpus_tokens is None:
        corpus_tokens = int(
            postings.select("doc_id", "doc_len")
            .distinct()
            .agg(F.coalesce(F.sum("doc_len"), F.lit(0)))
            .collect()[0][0]
        )
    cf_rows = (
        postings.join(qdf.select("word"), "word", "left_semi")
        .groupBy("word")
        .agg(F.sum("term_count").cast("long").alias("cf"))
        .collect()
    )
    cf_by_word = {r["word"]: r["cf"] for r in cf_rows}
    q_tot = sum(c for w, c in counts.items() if cf_by_word.get(w, 0) > 0)
    if q_tot == 0:
        return spark.createDataFrame(
            [], "url string, title string, score double"
        )
    cdf = F.broadcast(
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(w).alias("word"),
                            F.lit(int(cf)).cast("long").alias("cf"),
                        )
                        for w, cf in sorted(cf_by_word.items())
                        if cf > 0
                    ]
                )
            ).alias("__c")
        )
        .select("__c.word", "__c.cf")
    )
    matched = postings.join(qdf, "word").join(cdf, "word")
    scored = matched.groupBy("doc_id").agg(
        F.sum(
            F.col("qcount")
            * F.log(
                F.lit(1.0)
                + (F.col("term_count") * F.lit(float(corpus_tokens)))
                / (F.lit(float(mu)) * F.col("cf"))
            )
        ).alias("__s"),
        F.first("doc_len").alias("__dl"),
    )
    scored = scored.select(
        "doc_id",
        (
            F.col("__s")
            - F.lit(float(q_tot)) * F.log(F.col("__dl") + F.lit(float(mu)))
        ).alias("score"),
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    return (
        top.join(docs.select(F.col("doc_id"), F.col("title")), "doc_id")
        .select(
            F.col("doc_id").alias("url"),
            "title",
            F.round("score", round_dp).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("url"))
    )


def search_rocchio(
    spark: SparkSession,
    query: str,
    postings: DataFrame,
    page_count: int,
    k: int = MAX_RESULTS,
    fb_k: int = 10,
    n_exp: int = 5,
    alpha: float = 1.0,
    beta: float = 0.5,
    round_dp: int = 9,
) -> DataFrame:
    """Rocchio pseudo-relevance feedback (Rocchio 1971 / standard PRF):
    run the conjunctive tf-idf ranking, assume the top ``fb_k`` results
    relevant, move the query vector toward their centroid, re-rank.

      1. round 1 = ``search`` scoring (AND, tf·idf, pinned tie-break)
         → top fb_k doc ids.
      2. feedback weight per non-query term t in those docs:
         w_fb(t) = Σ_{d ∈ fb} tf(t,d)·idf(t), idf = ln(N/(1+df)) —
         rounded to ``round_dp`` BEFORE selection so the top-``n_exp``
         cut (desc weight, word asc) is float-order deterministic.
      3. expanded query: original words at α·qcount, expansion words at
         β·w_fb/fb_k; final score(d) = Σ_w weight_w·tf(w,d)·idf(w) over
         OR-matched docs (expansion makes AND meaningless).

    Returns (doc_id, score, n_words). Scale shape: the feedback docs are
    a ≤fb_k-row broadcast; candidate terms come from ONE semi-join of
    postings against it (a fb_k-doc slice, not the corpus); their dfs
    from a semi-joined aggregate; the final weight relation is ≤
    |q|+n_exp rows, broadcast into the scoring join. Two doc_id
    shuffles total (round-1 scoring + final scoring); everything else
    is broadcast.
    """
    words = extract_words(query)
    if not words:
        return spark.createDataFrame(
            [], "doc_id long, score double, n_words long"
        )
    counts: dict = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    qdf = F.broadcast(
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(w).alias("word"),
                            F.lit(c).cast("int").alias("qcount"),
                        )
                        for w, c in counts.items()
                    ]
                )
            ).alias("__q")
        )
        .select("__q.word", "__q.qcount")
    )
    n_distinct = len(counts)
    n_lit = F.lit(float(page_count))

    def _idf(df_col):
        return F.log(n_lit / (F.lit(1.0) + df_col))

    # round 1: conjunctive tf-idf over query words
    df_q = F.broadcast(
        postings.join(qdf.select("word"), "word", "left_semi")
        .groupBy("word")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    m1 = postings.join(qdf, "word").join(df_q, "word")
    fb = F.broadcast(
        m1.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(
                F.col("qcount")
                * (F.col("term_count") / F.col("doc_len"))
                * _idf(F.col("df"))
            ).alias("score"),
        )
        .filter(F.col("n_words") == n_distinct)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(fb_k)
        .select("doc_id")
    )
    # candidate expansion terms: postings restricted to the fb docs,
    # minus the original query words
    fb_postings = postings.join(fb, "doc_id").join(
        qdf.select("word"), "word", "left_anti"
    )
    df_c = F.broadcast(
        postings.join(
            F.broadcast(fb_postings.select("word").distinct()),
            "word",
            "left_semi",
        )
        .groupBy("word")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    wfb = (
        fb_postings.join(df_c, "word")
        .groupBy("word")
        .agg(
            F.round(
                F.sum(
                    (F.col("term_count") / F.col("doc_len"))
                    * _idf(F.col("df"))
                ),
                round_dp,
            ).alias("w_fb"),
            F.first("df").alias("df"),
        )
    )
    exp_terms = F.broadcast(
        wfb.orderBy(F.desc("w_fb"), F.asc("word"))
        .limit(n_exp)
        .select(
            "word",
            (F.lit(float(beta)) * F.col("w_fb") / F.lit(float(fb_k))).alias(
                "weight"
            ),
            "df",
        )
    )
    q_weights = qdf.join(df_q, "word").select(
        "word",
        (F.lit(float(alpha)) * F.col("qcount")).alias("weight"),
        "df",
    )
    weights = F.broadcast(q_weights.unionByName(exp_terms))
    m2 = postings.join(weights, "word")
    out = (
        m2.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(
                F.col("weight")
                * (F.col("term_count") / F.col("doc_len"))
                * _idf(F.col("df"))
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select(
            "doc_id", F.round("score", round_dp).alias("score"), "n_words"
        )
    )
    return out


def fagin_ta_depth(
    scores: DataFrame,
    k: int = 10,
    id_col: str = "id",
    s1_col: str = "s1",
    s2_col: str = "s2",
) -> DataFrame:
    """Threshold-Algorithm depth audit (Fagin, Lotem & Naor, PODS 2001):
    for a top-k by s1+s2 over two independently sorted score lists, TA
    may stop at depth d once the k-th best total seen is ≥ the threshold
    τ_d = s1@d + s2@d (no unseen object can beat it). This audit
    computes the exact minimal stopping depth — the number that says how
    much of each index a rank-join actually touches, the basis for
    sorted-access cost models in federated/multi-signal ranking.

    Tie convention (pinned): the stop condition is STRICT, τ_d < k-th
    total. An unseen object at depth d has both ranks > d, so its total
    is ≤ τ_d; strictness guarantees no unseen object can even TIE the
    k-th total, i.e. the reported depth certifies the top-k INCLUDING
    all tied members. Textbook TA with the ≥ convention may stop one
    τ-band shallower when τ_d exactly equals the k-th total — but then a
    tied top-k member (under the pinned id tie-break) could still be
    unseen, which is exactly the ambiguity this audit exists to avoid.

    Output ONE row: (k, n, kth_total, depth_needed, tau_at_depth,
    scan_saved_milli). Exact BIGINT (integer scores).

    Scale shape: two rank assignments (``seq.with_dense_sequence`` — the
    audit's only shuffles), one rank-equi join for τ_d, one
    TakeOrderedAndProject for the true k-th total, one filtered min.
    """
    from ..functions.seq import with_dense_sequence

    base = scores.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(s1_col).cast("long").alias("s1"),
        F.col(s2_col).cast("long").alias("s2"),
    ).localCheckpoint(eager=False)
    n = base.count()
    kth_row = (
        base.select((F.col("s1") + F.col("s2")).alias("tot"))
        .orderBy(F.desc("tot"))
        .limit(int(k))
        .agg(F.min("tot").cast("long").alias("kth"))
        .collect()[0]
    )
    kth = int(kth_row["kth"])
    # with_dense_sequence ranks ASCENDING; we need descending score
    # order, so rank on the negated score (pinned tie-break by id).
    r1 = with_dense_sequence(
        base.select("id", "s1", (-F.col("s1")).alias("__neg")),
        ["__neg", "id"],
        out_col="__d",
    ).select(F.col("__d").alias("d"), F.col("s1").alias("s1_at"))
    r2 = with_dense_sequence(
        base.select("id", "s2", (-F.col("s2")).alias("__neg")),
        ["__neg", "id"],
        out_col="__d",
    ).select(F.col("__d").alias("d"), F.col("s2").alias("s2_at"))
    tau = r1.join(r2, "d").select(
        "d", (F.col("s1_at") + F.col("s2_at")).alias("tau")
    )
    depth_row = (
        tau.where(F.col("tau") < F.lit(kth))
        .agg(F.min("d").cast("long").alias("dmin"))
        .collect()[0]
    )
    # depth is 1-based rows scanned; if τ never crosses, full scan
    depth = int(depth_row["dmin"]) + 1 if depth_row["dmin"] is not None else n
    tau_at = (
        tau.where(F.col("d") == depth - 1).collect()[0]["tau"]
        if depth <= n
        else None
    )
    spark = scores.sparkSession
    return spark.range(1).select(
        F.lit(int(k)).cast("long").alias("k"),
        F.lit(int(n)).cast("long").alias("n"),
        F.lit(kth).cast("long").alias("kth_total"),
        F.lit(int(depth)).cast("long").alias("depth_needed"),
        F.lit(tau_at if tau_at is not None else -1)
        .cast("long")
        .alias("tau_at_depth"),
        F.lit(((n - depth) * 1000) // max(n, 1)).cast("long").alias(
            "scan_saved_milli"
        ),
    )
