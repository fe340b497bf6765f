"""Content-defined chunking (CDC) dedup — the rsync/LBFS/backup-storage
family: cut every document into chunks at positions chosen by the
CONTENT (a rolling-window hash hitting a mask), so an insertion early in
a page shifts byte offsets but not chunk boundaries downstream, and
re-crawled near-identical pages share most chunks. The storage-side
sibling of the text near-dup operators: where MinHash asks "are these
documents similar", CDC asks "how many bytes of this corpus are
literally redundant" — the number a WARC/archive store cares about.

Variant implemented: pure content-defined boundaries (LBFS/Muthitacharoen
2001 shape) WITHOUT min/max chunk clamps. The clamps make boundary
selection sequential (each cut depends on the previous); dropping them
makes every boundary decision position-local, so the whole computation is
one Catalyst HOF projection per document — embarrassingly parallel and
exactly mirrorable in SQL. Expected chunk length is 2^mask_bits bytes
(geometric); pathological inputs can produce long chunks, the documented
trade for determinism + parallelism.

Scale shape: chunking is a zero-shuffle projection (explode included);
the dedup audit is one map-side-combinable aggregate on the chunk hash.
Payload bytes never shuffle — only (hash, length) pairs do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_chunk_table(
    docs: DataFrame,
    window: int = 8,
    mask_bits: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, start, length, chunk_hash) — content-defined chunks.

    A boundary sits AFTER position i (1-based, i ≥ window) iff the
    md5 of the ``window``-byte slice ending at i, folded to 60 bits,
    is ≡ 0 mod 2^mask_bits. Chunks span between consecutive boundaries
    (document start/end are implicit boundaries). chunk_hash = md5 of
    the chunk text.
    """
    w = int(window)
    m = 1 << int(mask_bits)
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("__t")
    ).withColumn("__n", F.length("__t").cast("long"))
    # boundary positions: 0, every masked window end, n
    cuts = F.expr(
        f"concat(array(0L), filter(transform(sequence({w}, "
        f"cast(greatest(__n, {w}) as int)), "
        f"i -> IF(conv(substr(md5(substr(__t, cast(i - {w} + 1 as int), {w})),"
        f" 1, 15), 16, 10) % {m} = 0, cast(i as long), -1L)),"
        " p -> p > 0 AND p < __n), array(__n))"
    )
    d = d.withColumn(
        "__cuts", F.when(F.col("__n") <= w, F.array(F.lit(0).cast("long"), F.col("__n"))).otherwise(cuts)
    )
    spans = F.expr(
        "transform(sequence(1, cast(size(__cuts) - 1 as int)), "
        "k -> struct(element_at(__cuts, k) as s, "
        "element_at(__cuts, cast(k + 1 as int)) - element_at(__cuts, k) as l))"
    )
    return (
        d.select("doc_id", "__t", F.explode(spans).alias("__c"))
        .where(F.col("__c.l") > 0)
        .select(
            "doc_id",
            F.col("__c.s").cast("long").alias("start"),
            F.col("__c.l").cast("long").alias("length"),
            F.md5(
                F.expr("substr(__t, cast(__c.s + 1 as int), cast(__c.l as int))")
            ).alias("chunk_hash"),
        )
    )


def cdc_dedup_audit(chunks: DataFrame) -> DataFrame:
    """One-row storage audit over a CDC chunk table: how many bytes a
    content-addressed chunk store would hold vs the raw corpus.

    (n_chunks, n_unique, total_bytes, unique_bytes, saved_milli) — all
    exact BIGINT; saved_milli = 1000·(total−unique) div total.
    """
    per_hash = chunks.groupBy("chunk_hash").agg(
        F.count("*").cast("long").alias("copies"),
        F.first("length").alias("length"),
    )
    return per_hash.agg(
        F.sum("copies").cast("long").alias("n_chunks"),
        F.count("*").cast("long").alias("n_unique"),
        F.sum(F.col("copies") * F.col("length")).cast("long").alias("total_bytes"),
        F.sum("length").cast("long").alias("unique_bytes"),
    ).select(
        "n_chunks",
        "n_unique",
        "total_bytes",
        "unique_bytes",
        F.expr("(total_bytes - unique_bytes) * 1000 div total_bytes")
        .cast("long")
        .alias("saved_milli"),
    )
