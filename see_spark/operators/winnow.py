"""Winnowing: local document fingerprints for copy detection (MOSS).

Schleimer, Wilkerson & Aiken 2003 ("Winnowing: local algorithms for
document fingerprinting", SIGMOD): hash every k-gram of a document, then
slide a window of ``w`` consecutive k-gram hashes and record the MINIMUM
of each window (rightmost position on ties). The selected set is a
guaranteed-coverage fingerprint: any shared substring of length
>= w + k - 1 tokens between two documents yields at least one shared
selected fingerprint, while expected density is only 2/(w+1) — the
local-sampling property whole-document sketches (textstats.fingerprint,
MinHash) do not have. This is the standard plagiarism / quotation /
boilerplate-overlap detector for a training corpus: MinHash-LSH finds
globally-similar PAIRS, winnowing finds LOCALLY-copied passages between
otherwise-different documents.

Spark-first shape (no Python UDFs anywhere):

- k-gram hashing: ``lead(word, i)`` over the per-doc position order +
  one md5 — a single window pass over the positional postings the index
  build already produces (positional.positional_postings).
- window-minimum selection: the paper's sequential scan is re-expressed
  CLOSED-FORM so it parallelizes: position q is the rightmost minimum
  of SOME length-w window iff A(q) + B(q) >= min(w, n) - 1, where A(q)
  = length of the consecutive run of predecessors with hash >= h(q) and
  B(q) = run of successors with hash > h(q) (runs capped at w - 1).
  A and B come from w - 1 ``lag``/``lead`` columns — pure Catalyst
  window expressions, one shuffle on doc_id, no iteration, no state.
  (For n < w the same formula with the min(w, n) threshold selects
  exactly the rightmost global minimum — the whole doc is one window.)
- match join: selected fingerprints equi-join on the hash value, with a
  document-frequency cap (``max_df``) dropping ubiquitous fingerprints
  (boilerplate headers) BEFORE the pair fan-out — the same guard
  dedup.ngram_jaccard_pairs uses, so a fingerprint shared by every page
  of a template site can never explode the join.

Scale: hashing + selection are one doc_id-partitioned window pass
(states: w-1 lags — constant memory per row); the match path shuffles
once on the 60-bit hash (uniform by construction) and the df cap bounds
per-key fan-out at max_df^2. At 10^10 documents the fingerprint table
is ~2/(w+1) of the k-gram count and is the thing you persist per crawl
round (append-only, mergeable), not recompute.

Oracle: every step is deterministic md5/integer SQL; the DuckDB oracle
in ``__spark_entry__`` replays the identical expressions (same lag/lead
closed form), so the gate check is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import hash60


def kgram_hashes(pos_postings: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, word, pos) -> (doc_id, pos, khash): 60-bit hash of each
    k-token gram, pos = gram start in the kept-token sequence. One
    per-doc window pass; rows whose gram would run past the document end
    are dropped (n_grams = n_tokens - k + 1)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("word")] + [F.lead("word", i).over(w) for i in range(1, k)]
    last = parts[-1]
    return (
        pos_postings.select(
            "doc_id",
            "pos",
            F.concat_ws(" ", *parts).alias("__gram"),
            last.alias("__last"),
        )
        .where(F.col("__last").isNotNull())
        .select("doc_id", "pos", hash60(F.col("__gram")).alias("khash"))
    )


def winnow_select(kgrams: DataFrame, w: int = 4) -> DataFrame:
    """Mark each k-gram row with ``selected``: true iff the paper's
    window scan records it. Closed form (see module doc): one window
    partition by doc_id, w-1 lags + w-1 leads + a per-doc count."""
    if w < 2:
        raise ValueError("w must be >= 2")
    win = Window.partitionBy("doc_id").orderBy("pos")
    h = F.col("khash")
    a_run = None
    a_sum = F.lit(0)
    for i in range(1, w):
        cond = F.coalesce(F.lag("khash", i).over(win) >= h, F.lit(False))
        a_run = cond if a_run is None else (a_run & cond)
        a_sum = a_sum + a_run.cast("int")
    b_run = None
    b_sum = F.lit(0)
    for i in range(1, w):
        cond = F.coalesce(F.lead("khash", i).over(win) > h, F.lit(False))
        b_run = cond if b_run is None else (b_run & cond)
        b_sum = b_sum + b_run.cast("int")
    n = F.count("*").over(Window.partitionBy("doc_id"))
    thr = F.least(F.lit(w), n) - F.lit(1)
    return kgrams.select(
        "doc_id", "pos", "khash",
        ((a_sum + b_sum) >= thr).alias("selected"),
    )


def fingerprints(docs_pos: DataFrame, k: int = 3, w: int = 4) -> DataFrame:
    """Selected fingerprints (doc_id, pos, khash) — the persisted set."""
    marked = winnow_select(kgram_hashes(docs_pos, k=k), w=w)
    return marked.where(F.col("selected")).drop("selected")


def winnow_stats(docs_pos: DataFrame, k: int = 3, w: int = 4) -> DataFrame:
    """Per-document fingerprint audit: (doc_id, n_kgrams, n_selected,
    density_milli). Healthy corpora sit near 2000/(w+1) density; a doc
    far above is hash-degenerate (repeated text), far below is a bug."""
    marked = winnow_select(kgram_hashes(docs_pos, k=k), w=w)
    return marked.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kgrams"),
        F.sum(F.col("selected").cast("long")).cast("long").alias("n_selected"),
        F.expr("(sum(cast(selected as bigint)) * 1000) div count(*)")
        .cast("long")
        .alias("density_milli"),
    )


def winnow_matches(
    docs_pos: DataFrame, k: int = 3, w: int = 4, max_df: int = 50,
    min_shared: int = 2,
) -> DataFrame:
    """Copied-passage candidates: (doc_a, doc_b, shared_fps) for pairs
    sharing >= min_shared distinct selected fingerprints, ubiquitous
    fingerprints (> max_df docs) dropped before the pair join."""
    fp = fingerprints(docs_pos, k=k, w=w).select("doc_id", "khash").distinct()
    df_counts = fp.groupBy("khash").agg(F.count("*").alias("__df"))
    kept = fp.join(
        df_counts.where(F.col("__df") <= max_df).select("khash"), "khash"
    )
    a = kept.select(F.col("khash"), F.col("doc_id").alias("doc_a"))
    b = kept.select(F.col("khash"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "khash")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )


def template_mass(
    fp: DataFrame,
    hosts: DataFrame,
    share_milli: int = 500,
    min_docs: int = 3,
) -> DataFrame:
    """Per-document BOILERPLATE mass from winnowing fingerprints: a
    fingerprint is a host TEMPLATE hash when it appears in >= share_milli
    per-mille of the host's documents (with >= min_docs docs of evidence
    — single-page hosts are degenerately all-template); each doc then
    reports what fraction of its own fingerprints are template
    (template_milli). High template_milli = navigation/chrome-dominated
    page; the curation pipeline downweights or strips those. This is the
    HOST-level complement of content.classify_blocks (which works within
    one page) — template detection needs cross-page evidence.

    ``fp``: (doc_id, khash) selected fingerprints (winnow.fingerprints);
    ``hosts``: (doc_id, host). Shapes: two combinable aggregates keyed by
    (host, khash) and host, one broadcast-or-hash join back — never
    all-pairs, never a window over row data.

    Output: (doc_id, host, n_fps, n_template, template_milli).
    """
    f = fp.select("doc_id", "khash").distinct().join(hosts, "doc_id")
    host_docs = hosts.groupBy("host").agg(
        F.countDistinct("doc_id").cast("long").alias("__hn")
    )
    hash_df = f.groupBy("host", "khash").agg(
        F.countDistinct("doc_id").cast("long").alias("__df")
    )
    template = (
        hash_df.join(host_docs, "host")
        .where(
            (F.col("__hn") >= min_docs)
            & (F.col("__df") * 1000 >= F.lit(share_milli) * F.col("__hn"))
        )
        .select("host", "khash", F.lit(1).alias("__tpl"))
    )
    marked = f.join(template, ["host", "khash"], "left")
    return marked.groupBy("doc_id", "host").agg(
        F.count("*").cast("long").alias("n_fps"),
        F.sum(F.coalesce("__tpl", F.lit(0))).cast("long").alias("n_template"),
        F.expr("(sum(coalesce(__tpl, 0)) * 1000) div count(*)")
        .cast("long")
        .alias("template_milli"),
    )
