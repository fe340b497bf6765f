"""LM sequence packing: concat-and-chunk documents into fixed-length
training sequences, as a deterministic distributed manifest.

The standard pre-training data step after filtering/dedup: tokenized
documents are concatenated and the stream is cut into ``ctx_len``-token
training sequences. A naive implementation needs a GLOBAL token offset —
one total-order sort/cumsum over the corpus, the classic scale-killer.
This operator instead packs independently inside ``n_buckets`` salted
buckets (bucket = 60-bit salted hash of doc_id, engine-portable):

  * ONE shuffle, keyed by bucket; within a bucket a window cumsum over the
    pinned (doc_id) order assigns each doc its token start offset;
  * each doc then expands to the sequences it overlaps — pure Catalyst
    ``sequence``/``explode`` arithmetic, O(n_tokens/ctx_len + 1) output
    rows per doc;
  * sequence ids are globally unique: ``bucket * 2^40 + seq_in_bucket``.

Buckets bound the window's partition size (corpus_tokens / n_buckets) and
scale with the cluster; the result is invariant to input partitioning and
parallelism (asserted by tests), because bucket assignment and in-bucket
order are value-derived, never partition-derived. Integer columns only —
bit-exact against the DuckDB oracle by construction.

Per-bucket trailing ragged sequences are the standard cost of salted
packing (at most n_buckets partially-filled sequences corpus-wide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import hash60

_SEQ_ID_BITS = 40  # seq_in_bucket fits 2^40 sequences per bucket


def pack_sequences(
    docs: DataFrame,
    ctx_len: int = 128,
    n_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Packing manifest: one row per (document, training sequence it feeds).

    Columns: seq_id, bucket, doc_id, n_tokens (doc's whitespace-token
    count), tok_start / tok_end (the doc's token slice [start, end) that
    lands in this sequence), seq_off (where that slice begins inside the
    sequence). Every sequence except the last of each bucket is exactly
    ctx_len tokens of contiguous doc slices.
    """
    toks = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.pmod(
            hash60(F.concat(F.lit("pack:"), F.col(id_col).cast("string"))),
            F.lit(n_buckets),
        ).cast("long").alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = base.withColumn(
        "start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    )
    ctx = F.lit(ctx_len)
    first_seq = F.expr(f"start DIV {ctx_len}")
    last_seq = F.expr(f"(start + n_tokens - 1) DIV {ctx_len}")
    exploded = placed.withColumn(
        "s", F.explode(F.sequence(first_seq, last_seq))
    )
    tok_start = F.greatest(F.lit(0).cast("long"), F.col("s") * ctx - F.col("start"))
    tok_end = F.least(F.col("n_tokens"), (F.col("s") + 1) * ctx - F.col("start"))
    return exploded.select(
        (F.col("bucket") * F.lit(1 << _SEQ_ID_BITS) + F.col("s"))
        .cast("long")
        .alias("seq_id"),
        "bucket",
        "doc_id",
        "n_tokens",
        tok_start.cast("long").alias("tok_start"),
        tok_end.cast("long").alias("tok_end"),
        (F.col("start") + tok_start - F.col("s") * ctx)
        .cast("long")
        .alias("seq_off"),
    )


def epoch_mix(
    docs: DataFrame,
    weights: dict,
    default_weight: int = 1000,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic source-weighted epoch mixing: replicate each document
    ``weights[source]/1000`` times per training epoch (milli-weights, the
    repo's pinned integer-rate convention). A weight of 2500 emits every
    doc twice plus a 50% deterministic subset a third time; 500 keeps a
    50% subset once; the fractional part is decided by a salted 60-bit
    hash bucket of doc_id — reproducible across runs, partitionings and
    engines (never ``DataFrame.sample``). Returns one row per emitted copy
    (doc_id, source, copy 0-based).

    Scale shape: zero shuffle — a per-row ``sequence``/``explode`` whose
    fan-out is the weight (bounded, typically < 10), the same cost profile
    as reading the epoch would have. Downstream shuffles (packing) treat
    (doc_id, copy) as the identity.
    """
    rate = F.lit(int(default_weight))
    for src, w in sorted(weights.items()):
        rate = F.when(F.col(source_col) == src, F.lit(int(w))).otherwise(rate)
    bucket = F.pmod(
        hash60(F.concat(F.lit("mix:"), F.col(id_col).cast("string"))),
        F.lit(1000),
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        rate.cast("long").alias("rate"),
        bucket.cast("long").alias("bucket"),
    ).withColumn(
        "n_copies",
        (
            F.expr("rate DIV 1000")
            + F.when(
                F.col("bucket") < F.pmod(F.col("rate"), F.lit(1000)), F.lit(1)
            ).otherwise(F.lit(0))
        ).cast("int"),
    )
    return (
        base.filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)).alias("copy"),
        )
        .select("doc_id", "source", F.col("copy").cast("long").alias("copy"))
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Within-document fixed-size token chunks with overlap — the chunk
    manifest retrieval/embedding pipelines build (pack_sequences is the
    cross-document sibling for LM training; this one never crosses a
    document boundary and repeats ``overlap`` tokens between neighbors so
    no span of meaning is cut).

    Pinned tiling: stride = chunk_tokens - overlap; chunk i covers token
    positions [i*stride+1, i*stride+chunk_tokens] (1-based, clipped at the
    doc end); n_chunks = 1 + ceil((n - chunk_tokens)/stride) when
    n > chunk_tokens else 1 — so the final chunk always reaches the last
    token and every token is in >= 1 chunk. Empty docs emit nothing.

    Zero shuffle: tokens never leave their row — chunk rows explode from
    an array transform (one narrow map over the corpus), so at 100 TB
    this is scan-bound. Returns (doc_id, chunk_id, start_tok, n_tok,
    chunk_text).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    t = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    base = docs.select(
        F.col(id_col).alias("doc_id"), t.alias("t"), F.size(t).alias("n")
    ).filter(F.col("n") >= 1)
    n_chunks = F.when(
        F.col("n") > chunk_tokens,
        1 + (F.col("n") - chunk_tokens + stride - 1).cast("long") / F.lit(stride),
    ).otherwise(F.lit(1))
    # integer ceil-div via floor cast (operands positive)
    n_chunks = F.floor(n_chunks).cast("long")
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            (i * stride + 1).alias("start_tok"),
            F.slice(F.col("t"), (i * stride + 1).cast("int"), chunk_tokens).alias(
                "toks"
            ),
        ),
    )
    return (
        base.select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").cast("long").alias("chunk_id"),
            F.col("c.start_tok").cast("long").alias("start_tok"),
            F.size("c.toks").cast("long").alias("n_tok"),
            F.array_join("c.toks", " ").alias("chunk_text"),
        )
    )


def epoch_shuffle(
    docs: DataFrame,
    seed: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training shuffle: assign every document a
    dense position 0..n-1 in the order of a salted 60-bit hash of its id
    (``hash60`` — the engine-portable md5 convention) — the epoch-order
    permutation an LM data loader consumes. No RNG anywhere: the same
    (seed, corpus) gives the same permutation on any engine, any
    partitioning, any run, and different seeds give uncorrelated orders
    (change the seed per epoch).

    (doc_id, shuffle_pos). Scale shape: one narrow hash projection plus
    the distributed dense-sequence (functions/seq.py: range-partition on
    the hash, per-partition sort, O(partitions) driver offsets) — no
    global window, no driver-side row data. Hash collisions are
    tie-broken by doc_id, keeping the order total.
    """
    from ..functions.seq import with_dense_sequence

    keyed = docs.select(F.col(id_col).alias("doc_id")).withColumn(
        "__key",
        hash60(F.concat(F.lit(f"shuffle:{seed}:"), F.col("doc_id").cast("string"))),
    )
    return with_dense_sequence(
        keyed, order_cols=["__key", "doc_id"], out_col="shuffle_pos", start=0
    ).select("doc_id", F.col("shuffle_pos").cast("long").alias("shuffle_pos"))


def curriculum_order(
    scored: DataFrame,
    n_buckets: int = 10,
    seed: str = "cur",
    score_col: str = "q_milli",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-curriculum training order: bucket documents by score
    thresholds (exact interpolated quantile boundaries — NOT ntile,
    whose global row numbering cannot scale; ties share a bucket by
    construction), shuffle within each bucket by the salted portable
    hash, and INTERLEAVE buckets round-robin — every stretch of the
    training stream sees the full quality spectrum while bucket 0's
    (highest-score) docs lead each cycle.

    (doc_id, bucket, pos): bucket 0 = highest scores; pos is the dense
    global training position.

    Scale shape: two distributed dense-sequence passes (range-partition
    sort, O(partitions) driver offsets) plus two tiny aggregates
    (quantile thresholds; per-bucket offsets) — no global window, no
    per-bucket single-partition ranking. Deterministic in any engine:
    thresholds are binary-exact on milli-integer scores and every order
    key ends in doc_id."""
    from ..functions.seq import with_dense_sequence
    from .dedup import hash60

    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    base = scored.select(
        F.col(id_col).alias("doc_id"),
        F.col(score_col).cast("long").alias("score"),
    )
    if n_buckets == 1:
        bucketed = base.withColumn("bucket", F.lit(0).cast("long"))
        return _interleave_buckets(bucketed, seed)
    qs = base.agg(
        *[
            F.percentile(F.col("score").cast("double"), F.lit(i / n_buckets))
            .alias(f"t{i}")
            for i in range(1, n_buckets)
        ]
    )
    # bucket = number of thresholds the score clears, counted from the
    # top: bucket 0 holds scores above the (n-1)/n quantile
    bucketed = base.crossJoin(F.broadcast(qs)).withColumn(
        "bucket",
        sum(
            [
                F.when(
                    F.col("score") <= F.col(f"t{n_buckets - j}"), 1
                ).otherwise(0)
                for j in range(1, n_buckets)
            ],
            F.lit(0),
        ).cast("long"),
    ).select("doc_id", "score", "bucket")
    return _interleave_buckets(bucketed, seed)


def _interleave_buckets(bucketed: DataFrame, seed: str) -> DataFrame:
    """Round-robin interleave of (doc_id, bucket) rows — see
    curriculum_order. Two dense-sequence passes + one tiny offset agg."""
    from ..functions.seq import with_dense_sequence
    from .dedup import hash60

    keyed = bucketed.withColumn(
        "__h",
        hash60(
            F.concat(F.lit(f"cur:{seed}:"), F.col("doc_id").cast("string"))
        ),
    )
    ranked = with_dense_sequence(
        keyed, order_cols=["bucket", "__h", "doc_id"], out_col="__g", start=0
    )
    offs = ranked.groupBy("bucket").agg(F.min("__g").alias("__off"))
    within = ranked.join(F.broadcast(offs), "bucket").withColumn(
        "__r", F.col("__g") - F.col("__off")
    )
    out = with_dense_sequence(
        within, order_cols=["__r", "bucket", "doc_id"], out_col="pos", start=0
    )
    return out.select(
        "doc_id", "bucket", F.col("pos").cast("long").alias("pos")
    )


def padding_waste(
    docs: DataFrame,
    buckets: tuple = (64, 128, 256, 512),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed batching waste audit — the pre-packing question a
    training pipeline answers before choosing between padded batches and
    sequence packing (operators/packing.pack_sequences): if documents
    are padded up to the smallest bucket boundary that fits them, how
    many pad tokens does each bucket burn? Documents longer than the
    largest bucket are reported in the 'overflow' row (they need
    chunking, operators/packing.chunk_documents). Whitespace token
    counts, integer-exact.

    Zero-shuffle token count + ONE combinable bucket aggregate. Returns
    (bucket, n_docs, total_tokens, total_padding, padding_milli) where
    padding_milli = 1000*padding div (padding + tokens), bucket is the
    boundary as a string ('overflow' for too-long docs, padding 0).
    """
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    bounds = sorted(buckets)
    bucket = F.lit("overflow")
    for b in reversed(bounds):
        bucket = F.when(n_tok <= b, F.lit(str(b))).otherwise(bucket)
    pad = F.lit(0).cast("long")
    for b in reversed(bounds):
        pad = F.when(n_tok <= b, F.lit(b) - n_tok).otherwise(pad)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            bucket.alias("bucket"),
            n_tok.alias("__n"),
            pad.cast("long").alias("__pad"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("__n").cast("long").alias("total_tokens"),
            F.sum("__pad").cast("long").alias("total_padding"),
        )
        .withColumn(
            "padding_milli",
            F.expr(
                "(1000 * total_padding) div (total_padding + total_tokens)"
            ).cast("long"),
        )
    )
