"""Corpus-curation filters for training-data pipelines.

The four standard pre-training text filters that sit between a crawl and a
tokenizer run (the reference stops at indexing — see_text.erl tokenizes but
never filters; these are the engine-addition ops the assignment asks for on
top of reference parity), each expressed as pure Catalyst plans with exact
DuckDB oracles:

- PII redaction: email / IPv4 regex redaction with per-doc counts
  (regexp_count + regexp_replace, whole-stage codegen, zero shuffle).
- Gopher-style repetition signals: duplicate-line fraction and
  top-bigram coverage per document (the Rae et al. 2021 "Gopher rules"
  shape): per-doc aggregates keyed by doc_id, map-side combinable.
- Corpus-level line dedup (the CCNet shape): drop every pseudo-line that
  occurs in more than `max_docs` distinct documents, reassemble the kept
  lines in order. Two shuffles — one keyed by line hash (the count), one
  keyed by doc_id (the reassembly) — both on 60-bit hashes, never on raw
  line strings, so shuffle bytes stay ~16 B/row at 100 TB.
- Corpus bigram stats: global top-k n-grams (partial-agg count + a
  TakeOrderedAndProject k-cut — no full sort).
- Deterministic stratified sampling: per-language keep rates decided by a
  salted md5 bucket of doc_id, so the sample is reproducible across runs,
  partitionings, and engines (no Spark `sample()`, which is seed- and
  partitioning-dependent).

The synthetic documents table is single-line word soup, so "lines" are
pinned as non-overlapping 8-token chunks of the whitespace token stream —
derived identically in the SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import hash60

LINE_TOKENS = 8

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def _toks(text_col: str):
    return F.split(F.col(text_col), " ")


def _lines(toks):
    """Non-overlapping LINE_TOKENS-token chunks, joined back with ' '.
    ceil(n/8) chunks; Spark slice() clamps the final partial chunk exactly
    like DuckDB list slicing (verified)."""
    n_chunks = F.ceil(F.size(toks) / F.lit(float(LINE_TOKENS))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * LINE_TOKENS + 1, LINE_TOKENS), " "),
    )


def _bigrams(toks):
    """Adjacent-token bigrams; empty array for sub-2-token docs (guarded:
    Spark sequence(1, 0) would count DOWN, not return empty)."""
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def pii_redact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact emails then IPv4 addresses (that order: an email's domain has
    no digits, so the passes can't interact). Returns per-doc match counts
    and the md5 of the redacted text (scalar, gate-safe).

    Patterns stay inside the Java/RE2 common subset (character classes +
    bounded quantifiers, no backrefs, no lookaround) so the DuckDB oracle
    matches byte-for-byte."""
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(F.col(text_col), F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col(text_col), F.lit(IPV4_RE)).cast("long").alias("n_ipv4"),
        F.md5(redacted).alias("redacted_md5"),
    )


def gopher_repetition(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals (Gopher rules 4+6 shape):
    - dup_line_frac: 1 - distinct_lines/lines over the 8-token pseudo-lines
      (array-local — no shuffle);
    - top_bigram_frac: tokens covered by the single most frequent bigram
      (2*max_count/n_tokens) — explode + two partial-aggregable groupBys
      keyed by doc_id;
    - flagged: dup_line_frac > 0.30 OR top_bigram_frac > 0.20 (pinned).
    """
    toks = _toks(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(_lines(toks)).cast("long").alias("n_lines"),
        F.size(F.array_distinct(_lines(toks))).cast("long").alias("n_distinct_lines"),
        _bigrams(toks).alias("__bigrams"),
    )
    top = (
        base.select("doc_id", F.explode("__bigrams").alias("bigram"))
        .groupBy("doc_id", "bigram")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_cnt"))
    )
    out = base.drop("__bigrams").join(top, "doc_id", "left")
    dup_frac = 1.0 - F.col("n_distinct_lines") / F.col("n_lines")
    # 2*count kept integral before the ONE double division so the oracle's
    # value matches bit-for-bit (the checker compares floats exactly)
    top_frac = F.coalesce(
        (2 * F.col("top_cnt")) / F.col("n_tokens"), F.lit(0.0)
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "n_lines",
        dup_frac.alias("dup_line_frac"),
        top_frac.alias("top_bigram_frac"),
        F.when((dup_frac > 0.30) | (top_frac > 0.20), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("flagged"),
    )


def line_dedup(
    docs: DataFrame,
    max_docs: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level line dedup (CCNet): drop every pseudo-line occurring in
    more than ``max_docs`` DISTINCT documents; reassemble the survivors in
    original order. Returns (doc_id, n_lines, kept_lines, kept_md5) for
    every input doc (fully-deduped docs keep md5('')).

    Scale shape: posexplode -> count distinct docs per 60-bit line hash
    (one shuffle, ~16 B keys) -> inner join back on the hash (co-partitioned
    with the count's output) -> re-aggregate by doc_id. Raw line text never
    shuffles on the frequency path."""
    toks = _toks(text_col)
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_lines(toks)).cast("long").alias("n_lines"),
        F.posexplode(_lines(toks)).alias("pos", "line"),
    ).withColumn("line_h", hash60(F.col("line")))
    freq = lines.groupBy("line_h").agg(
        F.countDistinct("doc_id").alias("n_docs_with_line")
    )
    kept = lines.join(freq, "line_h").filter(F.col("n_docs_with_line") <= max_docs)
    per_doc = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("kept_lines"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                " ",
            )
        ).alias("kept_md5"),
    )
    all_docs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_lines(toks)).cast("long").alias("n_lines"),
    )
    return all_docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce("kept_lines", F.lit(0)).cast("long").alias("kept_lines"),
        F.coalesce("kept_md5", F.md5(F.lit(""))).alias("kept_md5"),
    )


def top_bigrams(
    docs: DataFrame, k: int = 20, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-wide top-k bigrams with pinned tie-break (count DESC, bigram
    ASC). One partial-aggregable count shuffle; the k-cut compiles to
    TakeOrderedAndProject, never a full sort."""
    return (
        docs.select(F.explode(_bigrams(_toks(text_col))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram").asc())
        .limit(k)
    )


def _ngrams(toks, n: int):
    """Word n-grams joined with ' '; empty array below n tokens (guarded —
    Spark sequence(1, 0) would count DOWN; DuckDB's range(1, 0) is empty,
    but the oracles carry the same explicit guard for clarity)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C / PaLM shape): flag a
    training document when >= ``min_hits`` of its DISTINCT word n-grams
    appear anywhere in the benchmark/test-set corpus. Returns one row per
    input doc: (doc_id, n_ngrams, n_contaminated, contaminated) — all
    integer columns, no float thresholds.

    Scale shape: the benchmark side is test sets — 10^4..10^6 n-grams — so
    it reduces to a DISTINCT n-gram dimension and BROADCASTS; the corpus
    side (the 100 TB side) explodes per-doc distinct n-grams and probes the
    broadcast set with an inner join, so raw text never shuffles. The only
    shuffle is the per-doc hit count keyed by doc_id (map-side combinable),
    O(contaminated n-grams) rows. Docs shorter than n tokens pass through
    with n_ngrams = 0.
    """
    toks = _toks(text_col)
    bench_ngrams = (
        benchmark.select(
            F.explode(_ngrams(F.split(F.col(bench_text_col), " "), n)).alias("ngram")
        )
        .distinct()
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(_ngrams(toks, n)).alias("__ngrams"),
    )
    hits = (
        base.select("doc_id", F.explode("__ngrams").alias("ngram"))
        .join(F.broadcast(bench_ngrams), "ngram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_contaminated"))
    )
    return (
        base.select("doc_id", F.size("__ngrams").cast("long").alias("n_ngrams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
            F.when(F.coalesce("n_contaminated", F.lit(0)) >= min_hits, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("contaminated"),
        )
    )


# pinned per-language keep rates, in thousandths (exact integer compare —
# no float thresholds anywhere near the hash bucket)
STRATA_RATES = {"en": 500, "de": 250, "es": 250, "fr": 250, "zh": 125}
DEFAULT_RATE = 100


def stratified_sample(
    docs: DataFrame, id_col: str = "doc_id", lang_col: str = "lang"
) -> DataFrame:
    """Deterministic stratified sample: keep a doc iff its salted md5
    bucket (0..999) falls under its language's pinned rate. Engine- and
    partitioning-independent (unlike DataFrame.sample), so train/held-out
    membership is stable across reruns and cluster sizes. Zero shuffle."""
    bucket = F.pmod(
        hash60(F.concat(F.lit("strat:"), F.col(id_col).cast("string"))), F.lit(1000)
    )
    rate = F.lit(DEFAULT_RATE)
    for lang, r in sorted(STRATA_RATES.items()):
        rate = F.when(F.col(lang_col) == lang, F.lit(r)).otherwise(rate)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(lang_col).alias("lang"),
            bucket.alias("bucket"),
            rate.alias("rate"),
        )
        .filter(F.col("bucket") < F.col("rate"))
        .select("doc_id", "lang", F.col("bucket").cast("long").alias("bucket"))
    )


def host_quota_sample(
    docs: DataFrame,
    cap: int,
    host_col: str = "host",
    id_col: str = "doc_id",
    salt: str = "hq",
) -> DataFrame:
    """Per-host document quota — the domain-diversity cap every web-scale
    corpus recipe applies (a handful of hosts otherwise contribute an
    outsized share of pages; Dolma/FineWeb-style per-domain caps): keep at
    most ``cap`` documents per host, chosen by a salted-hash order so the
    survivors are a deterministic fair sample — reproducible across
    engines, partitionings, and reruns, unlike any RNG-based pick — with
    doc_id as the total-order tie-break.

    ONE host-keyed shuffle (the window); at 10^10 docs the only skew risk
    is a mega-host's partition, which the cap itself bounds downstream —
    for the window pass, AQE's skew-split handles it because row_number
    needs no cross-partition state beyond the sort. Appends host_rank
    (1-based within host) and keeps only rows with host_rank <= cap.
    """
    order = hash60(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(host_col).orderBy(
        order.asc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("host_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("host_rank") <= cap)
    )


def normalize_text(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode text normalization — the cleanup stage web pipelines run
    before tokenization/dedup so byte-different renderings of the same
    text (decomposed accents, stray control bytes, ragged whitespace)
    hash and tokenize identically. Pinned step order:

      1. NFC canonical composition (Arrow-batched ``unicodedata`` — the
         one step Catalyst lacks; DuckDB's ``nfc_normalize`` reproduces
         it exactly, so the operator keeps an exact oracle);
      2. strip C0/C1-ish control chars except tab/newline (Catalyst
         regexp, zero shuffle);
      3. collapse space/tab runs to one space and trim.

    Returns (doc_id, text_norm, changed, n_chars) — ``changed`` flags
    rows whose bytes moved, so a pipeline can count normalization debt.
    All row-local: the only Python is the NFC pass, Arrow-batched like
    the other kernel UDFs; at 100 TB this is scan-bound.
    """
    from ..functions.udfs import nfc_udf

    nfc = nfc_udf(F.col(text_col))
    stripped = F.regexp_replace(
        nfc, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", ""
    )
    collapsed = F.trim(F.regexp_replace(stripped, "[ \\t]+", " "))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        collapsed.alias("text_norm"),
        (collapsed != F.col(text_col)).cast("long").alias("changed"),
        F.length(collapsed).cast("long").alias("n_chars"),
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "ws1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — Efraimidis
    & Spirakis 2006: each row gets key = ln(u) / w with u in (0, 1]
    derived from a seeded 60-bit hash of its id; the k largest keys are
    an exact weight-proportional sample. Because u is pure arithmetic on
    md5 (u = (h + 1) / 2^60 — a power-of-two division, exact in IEEE)
    and ln is the one libm op (JVM == DuckDB for these inputs, the
    repo-wide convention), both engines select the SAME k rows, making
    the sample itself oracle-checkable — unlike rand()-based sampling.

    Rows with weight <= 0 are excluded (zero weight = never sampled).
    Scale: row-local key computation + top-k (TakeOrderedAndProject —
    per-partition heaps, no global sort); changing ``seed`` redraws.
    Used for corpus-quality sampling where importance is a column
    (quality milli, PageRank, token count) rather than uniform.
    """
    from .dedup import hash60

    u = (
        hash60(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
        + F.lit(1)
    ).cast("double") / F.lit(float(1 << 60))
    key = F.log(u) / F.col(weight_col).cast("double")
    out = (
        df.where(F.col(weight_col) > 0)
        .select(
            F.col(id_col).alias("id"),
            F.col(weight_col).cast("long").alias("weight"),
            key.alias("__key"),
        )
        .orderBy(F.desc("__key"), F.asc("id"))
        .limit(k)
    )
    return out.select(
        "id", "weight", F.round("__key", 9).alias("ws_key")
    )


def c4_filters(
    docs: DataFrame,
    min_words: int = 5,
    min_kept_lines: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style heuristic cleaning (Raffel et al. 2020 §2.2, the
    deterministic line rules): a line (split on newline, trimmed) is
    KEPT iff it ends in a terminal punctuation mark ('.', '!', '?', or a
    closing double quote), has >= ``min_words`` whitespace words, and
    does not mention 'javascript' (case-insensitive); the DOCUMENT is
    kept iff >= ``min_kept_lines`` lines survive and the raw text
    contains neither a curly brace nor the phrase 'lorem ipsum' (the C4
    page-level drops). Returns per-doc counters + the md5 of the kept
    lines joined by newline (order preserved) so the gate pins content,
    not just counts.

    Scale shape: pure Catalyst array HOFs (split/transform/filter/
    aggregate) inside whole-stage codegen — ZERO shuffle; at 100 TB this
    is a map-only pass, the cheapest possible filter stage.
    """
    nl = "\n"
    lines = F.transform(F.split(F.col(text_col), nl), lambda x: F.trim(x))

    def _wc(x):
        return F.size(F.split(x, " +"))

    def _keep_line(x):
        return (
            (x != "")
            & x.substr(F.length(x), F.lit(1)).isin(".", "!", "?", '"')
            & (_wc(x) >= min_words)
            & ~F.lower(x).contains("javascript")
        )

    kept = F.filter(lines, _keep_line)
    has_brace = F.col(text_col).contains("{")
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("kept_lines"),
        F.aggregate(
            kept, F.lit(0), lambda acc, x: acc + _wc(x)
        ).cast("long").alias("kept_words"),
        has_brace.alias("has_brace"),
        has_lorem.alias("has_lorem"),
        (
            (F.size(kept) >= min_kept_lines) & ~has_brace & ~has_lorem
        ).alias("keep"),
        F.md5(F.array_join(kept, nl)).alias("kept_md5"),
    )


def pmi_collocations(
    docs: DataFrame,
    k: int = 50,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 9,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information (Church &
    Hanks 1990) — ASSOCIATION-ranked bigrams, the classic complement to
    the frequency-ranked ``top_bigrams`` above: "new york" beats "of
    the" because PMI normalizes by unigram frequency.

      pmi(a,b) = ln( c(ab)·T·T / (B·c(a)·c(b)) )

    with c(ab) adjacent-bigram count, c(·) unigram counts, T total
    tokens, B total bigrams — probabilities p(ab)=c(ab)/B and
    p(·)=c(·)/T. The ln argument is a ratio of exact BIGINTs (products
    stay far under 2^53 at any df-capped corpus), so both engines see
    the identical double; ordering uses the ROUNDED pmi (desc, then
    bigram asc) so the k-cut is float-order deterministic. ``min_count``
    drops rare bigrams — the standard PMI low-frequency guard (a
    1-occurrence pair of two hapaxes would otherwise top the list).

    Scale shape: two map-side-combinable count shuffles (bigrams,
    unigrams), unigram counts broadcast-joined onto the ≥min_count
    bigram slice, TakeOrderedAndProject k-cut. T and B are one-row
    scalar aggregates.
    """
    toks = docs.select(_toks(text_col).alias("__t"))
    toks = toks.localCheckpoint(eager=False)
    uni = toks.select(F.explode("__t").alias("w")).groupBy("w").agg(
        F.count("*").cast("long").alias("c")
    )
    big = (
        toks.select(F.explode(_bigrams(F.col("__t"))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").cast("long").alias("c_ab"))
        .where(F.col("c_ab") >= F.lit(int(min_count)))
    )
    t_tot = int(
        toks.select(F.coalesce(F.sum(F.size("__t")), F.lit(0)).alias("s"))
        .collect()[0]["s"]
    )
    b_tot = int(
        toks.select(
            F.coalesce(
                F.sum(F.greatest(F.size("__t") - 1, F.lit(0))), F.lit(0)
            ).alias("s")
        ).collect()[0]["s"]
    )
    parts = F.split(F.col("bigram"), " ")
    split = big.select(
        "bigram",
        "c_ab",
        parts.getItem(0).alias("__w1"),
        parts.getItem(1).alias("__w2"),
    )
    ua = uni.select(F.col("w").alias("__w1"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("__w2"), F.col("c").alias("c_b"))
    # NOT forced broadcast: the unigram relation is vocabulary-sized
    # (10^8+ at web scale) — equi-joins on the word key, AQE picks the
    # strategy (broadcast at test scale, sort-merge at corpus scale).
    scored = (
        split.join(ua, "__w1")
        .join(ub, "__w2")
        .select(
            "bigram",
            "c_ab",
            "c_a",
            "c_b",
            F.round(
                F.log(
                    (
                        F.col("c_ab")
                        * F.lit(float(t_tot))
                        * F.lit(float(t_tot))
                    )
                    / (
                        F.lit(float(b_tot))
                        * F.col("c_a")
                        * F.col("c_b")
                    )
                ),
                round_dp,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.desc("pmi"), F.asc("bigram")
    ).limit(k)


def textrank_keywords(
    docs: DataFrame,
    k: int = 30,
    n_iter: int = 5,
    min_len: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level TextRank keyword extraction (Mihalcea & Tarau 2004):
    build the word co-occurrence graph (adjacent-token pairs, undirected,
    deduplicated), run PageRank over it, return the top-k words — the
    unsupervised keyword ranking that beats raw frequency because a word
    matters when it co-occurs with other mattering words. The original
    uses a POS filter for candidate words; engine-portably we proxy with
    a length filter (``min_len``), documented deviation.

    Scale shape: the graph build is two combinable aggregates (distinct
    adjacent pairs; distinct words), word→id mapping via ONE distributed
    dense rank (``seq.with_dense_sequence``), then ``linkgraph.pagerank``
    — one edge shuffle per iteration, dangling mass as a scalar. The
    word graph is vocabulary-sized, orders smaller than the corpus.

    Returns (word, rank) — top-k by (rank desc, word asc), rank rounded
    to linkgraph.ROUND_DP by pagerank itself.
    """
    from ..functions.seq import with_dense_sequence
    from .linkgraph import pagerank

    toks = docs.select(
        F.col(id_col).alias("__d"), _toks(text_col).alias("__t")
    )
    toks = toks.select(
        "__d",
        F.expr(
            f"filter(__t, w -> length(w) >= {int(min_len)})"
        ).alias("__t"),
    )
    pairs = (
        toks.select(
            F.explode(
                F.expr(
                    "IF(size(__t) < 2, array(),"
                    " transform(sequence(1, size(__t) - 1),"
                    " i -> struct(element_at(__t, i) as a,"
                    " element_at(__t, cast(i + 1 as int)) as b)))"
                )
            ).alias("__p")
        )
        .select(
            F.least("__p.a", "__p.b").alias("wa"),
            F.greatest("__p.a", "__p.b").alias("wb"),
        )
        .where(F.col("wa") != F.col("wb"))
        .distinct()
    )
    pairs = pairs.localCheckpoint(eager=False)
    words = (
        pairs.select(F.col("wa").alias("word"))
        .unionAll(pairs.select(F.col("wb").alias("word")))
        .distinct()
    )
    ids = with_dense_sequence(words, ["word"], out_col="node")
    ids = ids.localCheckpoint(eager=False)
    ia = ids.select(F.col("word").alias("wa"), F.col("node").alias("na"))
    ib = ids.select(F.col("word").alias("wb"), F.col("node").alias("nb"))
    e = pairs.join(ia, "wa").join(ib, "wb")
    edges = e.select(
        F.col("na").alias("src"), F.col("nb").alias("dst")
    ).unionAll(e.select(F.col("nb").alias("src"), F.col("na").alias("dst")))
    ranks = pagerank(ids.select("node"), edges, n_iter=n_iter)
    return (
        ranks.join(ids, "node")
        .select("word", "rank")
        .orderBy(F.desc("rank"), F.asc("word"))
        .limit(k)
    )


def class_tfidf(
    docs: DataFrame,
    class_col: str = "lang",
    k: int = 5,
    text_col: str = "text",
    round_dp: int = 9,
) -> DataFrame:
    """Class-level TF-IDF labeling (the c-TF-IDF step BERTopic-style
    topic pipelines use to NAME a cluster): treat each class as one
    concatenated pseudo-document, score terms by within-class rate ×
    across-class rarity, keep the top-k per class —

      score(t, c) = (tf_{t,c} / tokens_c) · ln(C / (1 + classes(t)))

    with C = #classes and classes(t) = #classes containing t. Terms
    every class shares get idf ≤ 0 and fall away; the survivors are the
    class's distinguishing vocabulary (cluster labels, language marker
    words, per-source boilerplate).

    Exactness: counts are integers, one division + one ln per row, the
    per-class k-cut orders by the ROUNDED score (desc, term asc).
    Scale shape: two combinable aggregates ((class, term) counts +
    class totals), one distinct-count aggregate on the term key, one
    per-class window top-k.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(class_col).alias("cls"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    toks = toks.localCheckpoint(eager=False)
    tf = toks.groupBy("cls", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    wc = toks.groupBy("cls").agg(F.count("*").cast("long").alias("w"))
    cf = tf.groupBy("term").agg(F.count("*").cast("long").alias("cf"))
    n_classes = wc.count()
    scored = (
        tf.join(wc, "cls")
        .join(cf, "term")
        .select(
            "cls",
            "term",
            "tf",
            F.round(
                (F.col("tf") / F.col("w"))
                * F.log(
                    F.lit(float(n_classes)) / (F.lit(1.0) + F.col("cf"))
                ),
                round_dp,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("cls").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= F.lit(int(k)))
        .select("cls", F.col("__r").cast("long").alias("rank"), "term", "tf", "score")
    )
