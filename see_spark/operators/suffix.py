"""Distributed suffix-array construction by prefix doubling.

The suffix array is the index behind exact-substring dedup at scale
(Lee et al. 2021 build one over the whole training corpus to find
50-token verbatim repeats; `operators/exact_substring.py` audits at a
fixed match length — this module builds the real index). The
construction is the classic prefix-doubling scheme (Manber & Myers
1990; Larsson & Sadakane 2007), which is also the textbook
MapReduce/Spark suffix-array algorithm because every round is plain
sort/join relational algebra:

  rank_0(i)   = dense rank of the byte at i
  rank_{k+1}(i) = dense rank of the pair (rank_k(i), rank_k(i + 2^k))
                  with −1 past the end (shorter suffix sorts first)

After ceil(log2(n)) rounds ranks are the full lexicographic suffix
order. Everything is EXACT integer arithmetic — the DuckDB oracle
doesn't reimplement the rounds, it just sorts the suffix STRINGS
directly, so the gate proves the doubling scheme against ground truth.

Scale shape per round: one equi-join on (doc, pos+h) — never an
inequality join — plus one dense ranking of the DISTINCT key pairs
(``seq.with_dense_sequence``: range partition + per-partition offsets,
never a single-partition window; #distinct keys ≤ n). All documents are
processed in ONE computation: the initial rank key includes doc_id, so
ranks of different documents never collide and per-doc suffix order
falls out of one global pipeline — no per-doc loop, no skew beyond the
longest document.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def suffix_array(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: Optional[int] = None,
) -> DataFrame:
    """Per-document suffix array over ``text_col`` (byte/ASCII order).

    Returns (doc_id, pos, sa_rank): ``sa_rank`` is the 1-based position
    of suffix ``text[pos:]`` in the sorted suffix order of its document.
    ``max_len`` truncates documents first (bounds the round count at
    ceil(log2(max_len))).
    """
    from ..functions.seq import with_dense_sequence

    text = F.col(text_col)
    if max_len is not None:
        text = F.substring(text, 1, int(max_len))
    d = docs.select(F.col(id_col).cast("long").alias("doc"), text.alias("__t"))
    longest = d.agg(F.coalesce(F.max(F.length("__t")), F.lit(0))).collect()[0][0]
    chars = d.select(
        "doc", F.posexplode(F.split("__t", "")).alias("pos", "__ch")
    ).where(F.length("__ch") > 0)

    # rank_0: dense rank of (doc, byte) — doc in the key means ranks
    # from different documents never compare equal downstream
    keys0 = chars.select("doc", F.ascii("__ch").alias("__b")).distinct()
    keys0 = with_dense_sequence(keys0, ["doc", "__b"], out_col="rank")
    state = chars.select("doc", "pos", F.ascii("__ch").alias("__b")).join(
        keys0, ["doc", "__b"]
    ).select("doc", "pos", "rank")
    state = state.localCheckpoint(eager=False)

    h = 1
    while h < longest:
        nxt = state.select(
            "doc", (F.col("pos") - F.lit(h)).alias("pos"),
            F.col("rank").alias("__r2"),
        )
        paired = state.join(nxt, ["doc", "pos"], "left").select(
            "doc",
            "pos",
            F.col("rank").alias("__r1"),
            F.coalesce("__r2", F.lit(-1)).cast("long").alias("__r2"),
        )
        keys = paired.select("__r1", "__r2").distinct()
        keys = with_dense_sequence(keys, ["__r1", "__r2"], out_col="rank")
        state = paired.join(keys, ["__r1", "__r2"]).select(
            "doc", "pos", "rank"
        )
        state = state.localCheckpoint(eager=False)
        h *= 2

    w = Window.partitionBy("doc").orderBy("rank")
    return state.select(
        F.col("doc").alias("doc_id"),
        F.col("pos").cast("long").alias("pos"),
        F.row_number().over(w).cast("long").alias("sa_rank"),
    )


def lcp_intervals(
    sa: DataFrame,
    docs: DataFrame,
    min_lcp: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: Optional[int] = None,
) -> DataFrame:
    """Adjacent-suffix longest-common-prefix audit over a built suffix
    array: for each document, compare each suffix with its sa_rank
    successor and emit pairs whose common prefix is ≥ ``min_lcp`` —
    the within-document repeated-substring detector (the per-doc
    sibling of the corpus-level ExactSubstr audit). LCP of ADJACENT
    suffixes in suffix order is the classic reduction: any repeated
    substring of length L appears as an adjacent pair with lcp ≥ L.

    One self-join on (doc, sa_rank+1) + a bounded prefix comparison.
    Returns (doc_id, pos_a, pos_b, lcp).
    """
    text = F.col(text_col)
    if max_len is not None:
        text = F.substring(text, 1, int(max_len))
    t = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), text.alias("__t")
    )
    a = sa.select("doc_id", F.col("pos").alias("pos_a"), "sa_rank")
    b = sa.select(
        "doc_id",
        F.col("pos").alias("pos_b"),
        (F.col("sa_rank") - 1).alias("sa_rank"),
    )
    pairs = a.join(b, ["doc_id", "sa_rank"]).join(t, "doc_id")
    # lcp = length of common prefix: bounded scan with early stop via HOFs
    lcp = F.expr(
        "aggregate(sequence(1, cast(least(length(substr(__t, cast(pos_a + 1 as int))),"
        " length(substr(__t, cast(pos_b + 1 as int)))) as int)), "
        "named_struct('n', 0L, 'stop', false), "
        "(acc, i) -> IF(acc.stop OR substr(__t, cast(pos_a + i as int), 1)"
        " != substr(__t, cast(pos_b + i as int), 1), "
        "named_struct('n', acc.n, 'stop', true), "
        "named_struct('n', acc.n + 1, 'stop', false)), "
        "acc -> acc.n)"
    )
    out = pairs.select(
        "doc_id",
        F.col("pos_a").cast("long").alias("pos_a"),
        F.col("pos_b").cast("long").alias("pos_b"),
        lcp.cast("long").alias("lcp"),
    )
    return out.where(F.col("lcp") >= F.lit(int(min_lcp)))


BWT_TERM = "\t"  # sentinel: sorts below every corpus byte (ASCII 9)


def bwt_transform(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: Optional[int] = None,
) -> DataFrame:
    """Burrows-Wheeler transform per document, built FROM the
    prefix-doubling suffix array (the classic SA→BWT reduction:
    bwt[r] = text[pos_r − 1], wrapping to the appended sentinel) — plus
    the run-structure audit that explains why BWT precedes compression
    in bzip2/FM-index pipelines: equal characters cluster, so the BWT
    string has far fewer runs than the original. FM-index search and
    bzip2-class compression both start exactly here.

    Appends ``BWT_TERM`` (tab — sorts below every corpus byte in both
    engines' binary collation) so suffix order equals rotation order
    and the transform is invertible.

    Returns (doc_id, bwt, bwt_runs, orig_runs): run counts are exact
    integers; a compression-oriented caller reads bwt_runs/orig_runs as
    the clustering gain.

    Scale shape: suffix_array's cost dominates (log n dense-rank
    rounds); the transform itself is one join back to the text row and
    one per-doc ordered fold (array_sort over an in-row array — no
    extra shuffle beyond the per-doc groupBy).
    """
    text = F.col(text_col)
    if max_len is not None:
        text = F.substring(text, 1, int(max_len))
    t = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.concat(text, F.lit(BWT_TERM)).alias("__t"),
    )
    sa = suffix_array(t, id_col="doc_id", text_col="__t")
    joined = sa.join(t, "doc_id").select(
        "doc_id",
        "sa_rank",
        F.expr(
            "IF(pos = 0, substr(__t, length(__t), 1),"
            " substr(__t, cast(pos as int), 1))"
        ).alias("__ch"),
        "__t",
    )

    def runs(col):
        return F.expr(
            f"1 + aggregate(sequence(2, cast(length({col}) as int)), 0L,"
            f" (a, i) -> a + IF(substr({col}, i, 1) !="
            f" substr({col}, i - 1, 1), 1L, 0L))"
        )

    per_doc = joined.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("sa_rank", "__ch"))
                ),
                lambda s: s["__ch"],
            ),
            "",
        ).alias("bwt"),
        F.first("__t").alias("__t"),
    )
    return per_doc.select(
        "doc_id",
        "bwt",
        runs("bwt").cast("long").alias("bwt_runs"),
        runs("__t").cast("long").alias("orig_runs"),
    )
