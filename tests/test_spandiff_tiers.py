"""Span-level snapshot diff vs hand-built snapshots, and tiered-index
assignment/audit vs hand-computed ntile splits and coverage."""

from __future__ import annotations

from see_spark.operators.indexstats import index_tiers
from see_spark.operators.spandiff import span_diff

SPAN_SCHEMA = (
    "doc_id long, kind string, text string, media_ref string, offset long"
)


def test_span_diff_hand_case(spark):
    old = spark.createDataFrame(
        [
            (1, "text", "aa", None, 0),
            (1, "text", "bb", None, 1),
            (1, "media", None, "img://1/0", 2),
            (2, "text", "cc", None, 0),
            (3, "text", "gone", None, 0),  # doc only in old
        ],
        SPAN_SCHEMA,
    )
    new = spark.createDataFrame(
        [
            (1, "text", "aa", None, 0),
            (1, "text", "aa", None, 1),  # multiplicity 1 -> 2
            (1, "media", None, "img://1/9", 2),  # media swapped
            (2, "text", "cc", None, 0),  # unchanged doc
            (4, "media", None, "img://4/0", 0),  # doc only in new
        ],
        SPAN_SCHEMA,
    )
    rows = {r["doc_id"]: r for r in span_diff(old, new).collect()}
    assert set(rows) == {1, 2, 3, 4}
    r1 = rows[1]
    # doc 1: 'bb' removed, extra 'aa' added, media 1/0 removed, 1/9 added
    assert (r1["n_old_spans"], r1["n_new_spans"]) == (3, 3)
    assert (r1["added"], r1["removed"], r1["unchanged"]) == (2, 2, 1)
    assert (r1["media_added"], r1["media_removed"]) == (1, 1)
    assert r1["changed"] is True
    r2 = rows[2]
    assert (r2["added"], r2["removed"], r2["changed"]) == (0, 0, False)
    r3 = rows[3]
    assert (r3["n_new_spans"], r3["removed"], r3["changed"]) == (0, 1, True)
    r4 = rows[4]
    assert (r4["n_old_spans"], r4["media_added"], r4["changed"]) == (0, 1, True)


def test_span_diff_partitioning_invariance(spark):
    rows = [
        (d, "text", f"t{d}-{i}", None, i) for d in range(10) for i in range(4)
    ]
    old = spark.createDataFrame(rows, SPAN_SCHEMA)
    new = spark.createDataFrame(rows[2:] + rows[:1], SPAN_SCHEMA)
    a = sorted(map(tuple, span_diff(old, new).collect()))
    b = sorted(
        map(tuple, span_diff(old.repartition(7), new.repartition(3)).collect())
    )
    assert a == b


def _postings(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, word string, term_count long, doc_len long"
    )


def test_index_tiers_sizes_and_coverage(spark):
    # 7 docs; static score = 1000 * n_distinct div doc_len
    # doc d has doc_len 10 and n_distinct = d+1 -> score = (d+1)*100
    rows = []
    for d in range(7):
        for w in range(d + 1):
            rows.append((d, f"w{w}", 1, 10))
        # query word 'table' appears tf = 7 - d (doc 0 matches most)
        rows.append((d, "table", 7 - d, 10))
    df = _postings(spark, rows)
    out = {r["tier"]: r for r in index_tiers(df, ["table"], n_tiers=3, k=2).collect()}
    # 7 docs into 3 tiers -> sizes 3,2,2 (ntile rule)
    assert [out[t]["n_docs"] for t in (0, 1, 2)] == [3, 2, 2]
    # scores descend with tier; boundaries don't overlap
    assert out[0]["min_score"] >= out[1]["max_score"]
    assert out[1]["min_score"] >= out[2]["max_score"]
    # top-2 by tf = docs 0 and 1; their scores (200, 300 incl 'table'
    # distinct) are LOW -> they live in the last tier, so tier 0 alone
    # does NOT cover the query
    assert out[0]["covers_topk"] is False
    assert out[2]["covers_topk"] is True
    assert out[2]["cum_hits"] == 2


def test_index_tiers_small_n(spark):
    # fewer docs than tiers: one per tier, ranks pass through
    rows = [(0, "a", 1, 1), (1, "a", 1, 2)]
    out = index_tiers(_postings(spark, rows), ["a"], n_tiers=3, k=5).collect()
    assert sorted(r["tier"] for r in out) == [0, 1]
    assert all(r["n_docs"] == 1 for r in out)
    # every match is a hit; cumulative coverage reached at the last tier
    assert max(r["cum_hits"] for r in out) == 2


def test_index_tiers_partitioning_invariance(spark):
    rows = [
        (d, f"w{w}", 1 + (d + w) % 3, 12)
        for d in range(30)
        for w in range((d % 5) + 2)
    ]
    df = _postings(spark, rows)
    a = sorted(map(tuple, index_tiers(df, ["w0", "w1"]).collect()))
    b = sorted(map(tuple, index_tiers(df.repartition(11), ["w0", "w1"]).collect()))
    assert a == b
