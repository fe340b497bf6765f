"""Text analysis operators for training-data curation.

All JVM-side Catalyst expressions (regex/arith/array builtins) — no UDFs —
so each has an exact ANSI-SQL oracle and stays inside whole-stage codegen:

- language-ID: stopword-hit n-gram heuristic with pinned argmax tie-break
- quality scoring: length / punctuation / stopword / repetition ratios
- token counting: whitespace tokens + a BPE-ish word-piece regex count
- document fingerprinting: rolling min-hash over word shingles (winnowing
  baseline) shared with dedup.hash60
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import hash60

# tiny deterministic stopword lists per language (heuristic lang-id)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un"],
    "es": ["el", "la", "los", "y", "es", "un"],
    "zh": ["de", "shi", "le", "zai", "he"],
}


def _hits(toks, words) -> "F.Column":
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Predicted language = argmax stopword hits, ties broken by language
    code ascending (pinned). Returns (doc_id, predicted_lang, best_hits)."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    out = docs.select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
    for lang, words in STOPWORDS.items():
        out = out.withColumn(f"hits_{lang}", _hits(F.col("__toks"), words))
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{l}") for l in langs])
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):  # earlier langs win ties -> apply last
        pred = F.when(F.col(f"hits_{lang}") == best, F.lit(lang)).otherwise(pred)
    return out.select(
        "doc_id", pred.alias("predicted_lang"), best.cast("long").alias("best_hits")
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + a composite score:
    n_chars, n_tokens, mean token length, punctuation ratio, stopword ratio,
    distinct-token ratio (repetition proxy). Formula is arbitrary but pinned:
      score = min(n_tokens,200)/200 * distinct_ratio * (0.5 + 0.5*stop_ratio)
    """
    toks = F.split(F.col(text_col), " ")
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        (F.length(F.regexp_replace(text_col, r"[^ ]", "")) + 1).cast("long").alias("n_ws_plus1"),
        (F.size(toks) - F.size(F.array_distinct(toks))).cast("long").alias("n_repeats"),
        F.size(F.filter(toks, lambda t: F.array_contains(en, t))).cast("long").alias("n_stop"),
        F.length(F.regexp_replace(text_col, r"[^!-/:-@\[-`{-~]", "")).cast("long").alias("n_punct"),
    )
    return out.select(
        "doc_id", "n_chars", "n_tokens",
        (F.col("n_chars") / F.col("n_tokens")).alias("mean_tok_len"),
        (F.col("n_punct") / F.col("n_chars")).alias("punct_ratio"),
        (F.col("n_stop") / F.col("n_tokens")).alias("stop_ratio"),
        (1.0 - F.col("n_repeats") / F.col("n_tokens")).alias("distinct_ratio"),
        (
            F.least(F.col("n_tokens"), F.lit(200)) / 200.0
            * (1.0 - F.col("n_repeats") / F.col("n_tokens"))
            * (0.5 + 0.5 * F.col("n_stop") / F.col("n_tokens"))
        ).alias("quality"),
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count, BPE-ish word-piece count (runs of letters,
    runs of digits, single punct — the classic GPT-2-style pretokenizer
    shape as a regex), and distinct whitespace tokens."""
    toks = F.split(F.col(text_col), " ")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("ws_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("distinct_tokens"),
        F.size(
            F.regexp_extract_all(
                F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
            )
        ).cast("long").alias("bpe_ish_tokens"),
    )


def fingerprint(
    docs: DataFrame, n: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Rolling-hash document fingerprint: min 60-bit hash over n-word
    shingles (the winnowing baseline: one representative hash per doc).
    Equal fingerprints => near-identical prefixes/content with high prob."""
    toks = F.split(F.col(text_col), " ")
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_min(F.transform(shingles, lambda s: hash60(s))).alias("fingerprint"),
    )


def readability(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Flesch-Kincaid grade level (Kincaid et al. 1975 — the public
    readability formula FineWeb-Edu-style quality filters use as a
    feature) in INTEGER MILLI units so the score is engine- and
    partitioning-exact:

      grade = 0.39 * words/sentences + 11.8 * syllables/words - 15.59
      grade_milli = (390 * n_words) div n_sentences
                  + (11800 * n_syllables) div n_words - 15590

    Pinned proxies (the classic closed-vocabulary-free approximations):
    a SYLLABLE is a maximal vowel group ([aeiouy]+) in the lowercased
    text — whitespace breaks groups, so no per-word loop is needed; a
    SENTENCE is a maximal [.!?]+ run (clamped to >= 1); words are
    non-empty whitespace tokens (clamped to >= 1 so empty docs emit a
    floor score instead of dividing by zero).

    Zero shuffle: three regexp counts per row, scan-bound at 100 TB.
    """
    text = F.col(text_col)
    n_words = F.greatest(
        F.size(F.filter(F.split(text, r"\s+"), lambda t: t != "")),
        F.lit(1),
    ).cast("long")
    n_sents = F.greatest(
        F.size(F.regexp_extract_all(text, F.lit(r"[.!?]+"), 0)), F.lit(1)
    ).cast("long")
    n_syl = F.size(
        F.regexp_extract_all(F.lower(text), F.lit(r"[aeiouy]+"), 0)
    ).cast("long")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        n_sents.alias("n_sentences"),
        n_syl.alias("n_syllables"),
    ).withColumn(
        "fk_grade_milli",
        (
            F.expr("(390 * n_words) div n_sentences")
            + F.expr("(11800 * n_syllables) div n_words")
            - F.lit(15590)
        ).cast("long"),
    )


def lang_outliers(
    docs: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "host",
    lang_col: str = "lang",
    min_docs: int = 3,
) -> DataFrame:
    """Language-contamination audit: flag documents whose language
    differs from their HOST's majority language — on a real crawl these
    are usually boilerplate-dominated pages, mislabeled langid, scraped
    spam, or embedded foreign quotations, and multilingual curation
    pipelines route them to review rather than into a monolingual split.

    Majority = the host's most frequent lang, ties pinned (count desc,
    lang desc — a total order, engine-exact). Hosts with fewer than
    ``min_docs`` documents flag nothing (no evidence — the engine's
    cold-start rule). Two combinable host-keyed aggregates (lang counts
    -> struct-max + total) and one join back; the doc side shuffles
    once on host.

    Returns (doc_id, host, lang, majority_lang, majority_milli,
    is_outlier)."""
    counts = docs.groupBy(host_col, lang_col).agg(
        F.count("*").cast("long").alias("__n")
    )
    per_host = counts.groupBy(host_col).agg(
        F.sum("__n").cast("long").alias("__host_docs"),
        F.max(F.struct(F.col("__n"), F.col(lang_col))).alias("__top"),
    )
    dim = per_host.select(
        host_col,
        F.col("__host_docs"),
        F.col(f"__top.{lang_col}").alias("majority_lang"),
        F.expr("(__top.__n * 1000) div __host_docs").cast("long")
        .alias("majority_milli"),
    )
    return docs.select(id_col, host_col, lang_col).join(dim, host_col).select(
        F.col(id_col).alias("doc_id"),
        F.col(host_col).alias("host"),
        F.col(lang_col).alias("lang"),
        "majority_lang",
        "majority_milli",
        (
            (F.col(lang_col) != F.col("majority_lang"))
            & (F.col("__host_docs") >= min_docs)
        ).alias("is_outlier"),
    )


def token_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy of the whitespace-token distribution
    (bits) — the classic unigram-diversity quality signal: near-zero
    entropy flags keyword-stuffed / template / repeated-token spam that
    length and stopword ratios (quality_score) miss, and the normalized
    form (entropy / log2(types)) is scale-free across document lengths.
    Standard alongside the Gopher repetition rules (Rae et al. 2021 use
    duplicate-n-gram fractions; entropy is the smooth version).

    H = log2(n) - (Σ_w c_w·log2(c_w)) / n   over token counts c_w.

    Scale shape: one explode to token volume, then two MAP-SIDE-COMBINABLE
    shuffles ((doc_id, token) count, then per-doc aggregate) — no windows,
    no driver state. The float sum is per-document over magnitude-similar
    terms; rounded to 6dp it is stable across partition orders (same
    determinism treatment as tfidf/pagerank).

    Returns (doc_id, n_tokens, n_types, entropy_bits, norm_entropy);
    norm_entropy is NULL for single-type documents (undefined).
    """
    toks = F.explode(F.split(F.col(text_col), " ")).alias("tok")
    counts = (
        docs.select(F.col(id_col).alias("doc_id"), toks)
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    agg = counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.col("c") * F.log2("c")).alias("__s"),
    )
    ent = F.log2("n_tokens") - F.col("__s") / F.col("n_tokens")
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_types",
        F.round(ent, 6).alias("entropy_bits"),
        F.round(
            F.when(F.col("n_types") > 1, ent / F.log2("n_types")), 6
        ).alias("norm_entropy"),
    )


def term_drift(
    docs_a: DataFrame,
    docs_b: DataFrame,
    k: int = 20,
    text_col: str = "text",
    round_dp: int = 9,
) -> DataFrame:
    """Corpus-drift monitor: the top-k terms by per-term KL-divergence
    contribution between two corpus snapshots — what a crawl operator
    watches round-over-round to catch topic drift, spam floods, or a
    broken extractor (one template's boilerplate suddenly dominating).

    With add-1 smoothing over the UNION vocabulary V:
      p(t) = (c_a(t)+1)/(T_a+|V|),  q(t) = (c_b(t)+1)/(T_b+|V|)
      contrib(t) = p(t)·ln(p(t)/q(t))      (Σ contrib = KL(p‖q))

    Per-term contributions are deterministic doubles (exact integer
    inputs, one division each, one ln), so rows are engine-exact after
    rounding; the k-cut orders by ROUNDED contrib desc (terms
    OVERrepresented in A), term asc. Total KL is derivable downstream
    by summing — kept out of the row contract because a cross-engine
    float SUM over the whole vocabulary is summation-order-dependent.

    Scale shape: two combinable word-count aggregates + one full-outer
    join on the term key + TakeOrderedAndProject; the three corpus
    scalars (T_a, T_b, |V|) are one-row aggregates.
    """
    def counts(d, name):
        return (
            d.select(F.explode(F.split(F.col(text_col), " ")).alias("term"))
            .groupBy("term")
            .agg(F.count("*").cast("long").alias(name))
        )

    ca = counts(docs_a, "c_a")
    cb = counts(docs_b, "c_b")
    j = ca.join(cb, "term", "full_outer").select(
        "term",
        F.coalesce("c_a", F.lit(0)).cast("long").alias("c_a"),
        F.coalesce("c_b", F.lit(0)).cast("long").alias("c_b"),
    )
    j = j.localCheckpoint(eager=False)
    tots = j.agg(
        F.sum("c_a").alias("ta"), F.sum("c_b").alias("tb"), F.count("*").alias("v")
    ).collect()[0]
    ta, tb, v = int(tots["ta"]), int(tots["tb"]), int(tots["v"])
    p = (F.col("c_a") + F.lit(1.0)) / F.lit(float(ta + v))
    q = (F.col("c_b") + F.lit(1.0)) / F.lit(float(tb + v))
    scored = j.select(
        "term", "c_a", "c_b", F.round(p * F.log(p / q), round_dp).alias("contrib")
    )
    return scored.orderBy(F.desc("contrib"), F.asc("term")).limit(k)
