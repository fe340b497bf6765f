"""Positional inverted index: phrase search, proximity search, snippets.

The reference's index stores only posting SETS (word -> page-id set,
apps/db/src/see_db_storage_ets.erl:63,169-175), so its query surface is
conjunctive bag-of-words (see_db_srv.erl:107-114). A positional index is
the standard extension every production engine layers on the same build
pass: token POSITIONS recorded at index time buy phrase queries ("exact
words adjacent"), proximity queries ("within k tokens"), and snippet
extraction — all as joins/aggregations over one extra integer column.

Spark-first shapes, all JVM-side (the tokenizer is the pinned Catalyst
fast path, functions/udfs.tokenize_expr — no Python anywhere here):

  - build: ``posexplode`` of the kept-token array; position = index in
    the post-filter sequence (consecutive for surviving tokens), the
    classic positional-index convention;
  - phrase match: k-way self-equi-join on ``(doc_id, pos - i)`` after a
    per-word filter. At scale the word filters prune to the phrase words'
    postings only (store postings sorted/bucketed by word and the scan
    prunes); the joins are equi-joins Catalyst can broadcast when one
    side is rare — never a cross or theta join;
  - proximity: per-doc equi-join on doc_id + band filter |p1-p2| <= w.
    Per-doc occurrence lists are short (bounded by doc length), so the
    fan-out is bounded and skew-safe;
  - snippets: computed AFTER the match (touches only matching docs),
    pure array slice on the token array.

Every operator here has an exact DuckDB oracle in ``__spark_entry__``
(positions reproduced with list_transform + row_number, same separator
class and byte-length guard).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.udfs import tokenize_expr


def positional_postings(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, word, pos); pos is 0-based in the
    kept-token sequence. One narrow shuffle-free projection+explode."""
    return docs.select(
        "doc_id",
        F.posexplode(tokenize_expr(F.col("text"))).alias("pos", "word"),
    ).select("doc_id", "word", F.col("pos").cast("long").alias("pos"))


def phrase_occurrences(pos_postings: DataFrame, phrase: Sequence[str]) -> DataFrame:
    """All start positions of the exact phrase: (doc_id, pos).

    word_i must sit at pos+i for every i — expressed as i equi-joins of
    per-word slices aligned to the phrase start. Join keys are always
    (doc_id, pos): no inequality joins, no explode.
    """
    if not phrase:
        raise ValueError("empty phrase")
    base = (
        pos_postings.filter(F.col("word") == phrase[0])
        .select("doc_id", "pos")
    )
    for i, w in enumerate(phrase[1:], start=1):
        nxt = (
            pos_postings.filter(F.col("word") == w)
            .select("doc_id", (F.col("pos") - i).alias("pos"))
        )
        base = base.join(nxt, ["doc_id", "pos"])
    return base


def phrase_search(docs: DataFrame, phrase: Sequence[str]) -> DataFrame:
    """Docs containing the exact phrase: (doc_id, n_occurrences, first_pos)."""
    occ = phrase_occurrences(positional_postings(docs), phrase)
    return occ.groupBy("doc_id").agg(
        F.count("*").alias("n_occurrences"),
        F.min("pos").alias("first_pos"),
    )


def proximity_search(
    docs: DataFrame, word_a: str, word_b: str, window: int
) -> DataFrame:
    """Docs where the two words co-occur within ``window`` positions:
    (doc_id, n_pairs, min_dist). Equi-join on doc_id over the two pruned
    word slices; the band predicate filters pairs post-join (per-doc
    occurrence counts are doc-length-bounded, so the join fan-out is)."""
    pos = positional_postings(docs)
    a = pos.filter(F.col("word") == word_a).select("doc_id", F.col("pos").alias("pa"))
    b = pos.filter(F.col("word") == word_b).select("doc_id", F.col("pos").alias("pb"))
    dist = F.abs(F.col("pa") - F.col("pb"))
    pairs = a.join(b, "doc_id").where(dist <= window)
    return pairs.groupBy("doc_id").agg(
        F.count("*").alias("n_pairs"),
        F.min(dist).alias("min_dist"),
    )


def phrase_snippets(
    docs: DataFrame, phrase: Sequence[str], context: int = 3
) -> DataFrame:
    """First-occurrence snippet per matching doc: (doc_id, first_pos,
    snippet) — ``context`` tokens either side of the phrase, joined by
    single spaces. The token array is re-derived only for MATCHING docs
    (inner join after the match), so the slice work is O(hits)."""
    hits = phrase_search(docs, phrase)
    toks = docs.select("doc_id", tokenize_expr(F.col("text")).alias("toks"))
    start = F.greatest(F.lit(1), F.col("first_pos") + 1 - context)
    # 1-based inclusive end = first_pos + len(phrase) + context
    end = F.col("first_pos") + len(phrase) + context
    return (
        hits.join(toks, "doc_id")
        .select(
            "doc_id",
            "first_pos",
            F.array_join(
                F.slice(F.col("toks"), start, (end - start + 1).cast("int")),
                " ",
            ).alias("snippet"),
        )
    )


def best_window_snippets(
    pos_postings: DataFrame,
    tok_arrays: DataFrame,
    terms: Sequence[str],
    width: int = 10,
) -> DataFrame:
    """SERP snippet extraction: for every document containing at least
    one query term, the token window of ``width`` starting at a term
    occurrence that maximizes query-term DENSITY (count of term
    occurrences inside the window), ties broken to the earliest start —
    the classic best-passage heuristic (search engines show the densest
    matching window, not the first match; complements phrase_snippets
    which anchors on exact phrases only).

    Shape: filter positional postings to the query terms (a literal
    isin — at 10^10 scale the postings scan prunes to the terms'
    slices), then ONE range-frame window per doc over the term
    occurrences only (never over all tokens: candidate starts are term
    positions — any denser window can be left-shifted to start at a
    term occurrence without losing members, so the restriction is
    lossless), an argmax struct-aggregate, and one join against the
    kept-token arrays for the final slice. The window frame is
    RANGE [0, width-1] over the integer position — O(occurrences) work,
    not O(tokens).

    Output: (doc_id, start, density, snippet) — all scalars.
    """
    occ = pos_postings.where(
        F.col("word").isin([t for t in terms])
    ).select("doc_id", "pos")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rangeBetween(0, width - 1)
    )
    dens = occ.select(
        "doc_id", "pos", F.count("*").over(w).cast("long").alias("density")
    )
    best = dens.groupBy("doc_id").agg(
        F.max(
            F.struct(
                F.col("density"), (-F.col("pos")).alias("negpos")
            )
        ).alias("__b")
    )
    sel = best.select(
        "doc_id",
        F.col("__b.density").alias("density"),
        (-F.col("__b.negpos")).cast("long").alias("start"),
    )
    return sel.join(tok_arrays, "doc_id").select(
        "doc_id",
        "start",
        "density",
        F.array_join(
            F.slice(F.col("toks"), F.col("start") + 1, width), " "
        ).alias("snippet"),
    )
