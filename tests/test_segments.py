"""Tiered segment-merge planning (operators/segments.py)."""

from __future__ import annotations

from see_spark.operators.segments import merge_amplification, plan_merges


def _plan(spark, sizes, merge_factor=3):
    segs = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)],
        "segment_id long, size_bytes long",
    )
    return plan_merges(segs, merge_factor=merge_factor)


def test_full_tier_groups_merge_partial_groups_wait(spark):
    # tier 2 (100-999): four segments -> one full group of 3 + one loner
    # tier 3 (1000-9999): two segments -> partial, nobody merges
    rows = {
        r["segment_id"]: r
        for r in _plan(
            spark, [500, 400, 300, 200, 5000, 1000], merge_factor=3
        ).collect()
    }
    merged = [i for i, r in rows.items() if r["will_merge"]]
    assert sorted(merged) == [0, 1, 2]  # the 3 largest tier-2 segments
    assert all(rows[i]["merge_group"] == 0 for i in merged)
    assert all(rows[i]["target_size"] == 1200 for i in merged)
    assert rows[3]["will_merge"] is False and rows[3]["merge_group"] == -1
    assert rows[3]["target_size"] == 200
    assert rows[4]["will_merge"] is False and rows[5]["will_merge"] is False


def test_tiers_are_exact_decimal_digits(spark):
    rows = {r["segment_id"]: r["tier"] for r in _plan(
        spark, [1, 9, 10, 99, 100, 999, 1000, 10**9], merge_factor=99
    ).collect()}
    assert rows == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 7: 9}


def test_grouping_is_size_desc_then_id(spark):
    # six tier-1 segments, factor 3: group 0 = three largest
    plan = _plan(spark, [10, 20, 30, 40, 50, 60], merge_factor=3).collect()
    g0 = sorted(r["segment_id"] for r in plan if r["merge_group"] == 0)
    g1 = sorted(r["segment_id"] for r in plan if r["merge_group"] == 1)
    assert g0 == [3, 4, 5] and g1 == [0, 1, 2]
    assert all(r["will_merge"] for r in plan)


def test_amplification_audit(spark):
    plan = _plan(spark, [500, 400, 300, 200, 5000, 1000], merge_factor=3)
    a = merge_amplification(plan).collect()[0]
    assert a["segments_before"] == 6
    # 3 merged into 1, 3 untouched -> 4 after
    assert a["segments_after"] == 4
    assert a["bytes_rewritten"] == 1200
    assert a["rewrite_milli"] == 1200 * 1000 // 7400


def test_segment_skip_audit_arms(spark):
    from see_spark.operators.segments import segment_skip_audit

    seg = spark.createDataFrame(
        [(0, "apple"), (0, "banana"), (1, "apple"), (2, "cherry")],
        "segment_id long, word string",
    )
    all_segs = spark.createDataFrame([(0,), (1,), (2,), (3,)],
                                     "segment_id long")
    rows = {r["segment_id"]: r for r in
            segment_skip_audit(seg, ["apple", "banana"], all_segs).collect()}
    assert rows[0]["has_all_words"] is True and rows[0]["can_skip"] is False
    assert rows[1]["n_words_present"] == 1 and rows[1]["can_skip"] is False
    assert rows[2]["can_skip"] is True          # words present, none match
    assert rows[3]["can_skip"] is True          # empty segment still reports
