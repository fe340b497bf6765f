"""Sharded-bloom URL-seen: exactness vs the plain anti-join, shard
independence, and empty-shard handling."""

from pyspark.sql import functions as F


def _inputs(spark):
    from see_spark.sources.synth import synth_candidates, synth_frontier

    frontier = synth_frontier(spark, 5000)
    cands = synth_candidates(spark, 3000, 5000)
    return frontier, cands


def test_sharded_seen_filter_equals_exact_anti_join(spark):
    from see_spark.functions.bloom import build_bloom_shards, seen_filter_sharded

    frontier, cands = _inputs(spark)
    shards = build_bloom_shards(frontier, n_shards=16, bits_per_shard=1 << 14)
    got = seen_filter_sharded(
        cands, frontier, shards, n_shards=16, bits_per_shard=1 << 14
    )
    exact = cands.join(frontier.select("url_hash"), "url_hash", "left_anti")
    assert sorted(r["url"] for r in got.collect()) == sorted(
        r["url"] for r in exact.collect()
    )


def test_sharded_seen_filter_non_power_of_two_shards(spark):
    """Regression: build-side sharding must route by SIGNED pmod like the
    probe side. With unsigned modulo and n_shards=3 a negative url_hash
    lands in a different shard at build vs probe time, so a seen URL leaks
    through as 'definitely fresh' (first-enqueue-wins dedup broken)."""
    from see_spark.functions.bloom import build_bloom_shards, seen_filter_sharded

    frontier, cands = _inputs(spark)
    # sanity: the synthetic hashes must include negatives for this to bite
    assert frontier.filter(F.col("url_hash") < 0).limit(1).count() == 1
    shards = build_bloom_shards(frontier, n_shards=3, bits_per_shard=1 << 14)
    got = seen_filter_sharded(
        cands, frontier, shards, n_shards=3, bits_per_shard=1 << 14
    )
    exact = cands.join(frontier.select("url_hash"), "url_hash", "left_anti")
    assert sorted(r["url"] for r in got.collect()) == sorted(
        r["url"] for r in exact.collect()
    )


def test_shard_bitmaps_are_small_and_cover_all_shards(spark):
    from see_spark.functions.bloom import build_bloom_shards

    frontier, _ = _inputs(spark)
    rows = build_bloom_shards(frontier, n_shards=8, bits_per_shard=1 << 13).collect()
    assert len(rows) == 8
    assert all(len(r["bitmap"]) == (1 << 13) // 8 for r in rows)


def test_build_strategies_produce_identical_bitmaps(spark):
    """partials (map-side, default) and shuffle (raw-hash repartition)
    builds must emit byte-identical shard bitmaps — they are one filter
    with two physical plans."""
    from see_spark.functions.bloom import build_bloom_shards

    frontier, _ = _inputs(spark)
    a = {
        r["shard"]: bytes(r["bitmap"])
        for r in build_bloom_shards(
            frontier, n_shards=5, bits_per_shard=1 << 13
        ).collect()
    }
    b = {
        r["shard"]: bytes(r["bitmap"])
        for r in build_bloom_shards(
            frontier, n_shards=5, bits_per_shard=1 << 13, strategy="shuffle"
        ).collect()
    }
    assert a == b


def test_empty_frontier_shard_passes_all_candidates(spark):
    from see_spark.functions.bloom import build_bloom_shards, seen_filter_sharded

    # frontier confined to one shard value: candidates in other shards must
    # pass through the no-bitmap branch untouched
    frontier = spark.createDataFrame([(16,)], "url_hash long")  # shard 0 of 16
    cands = spark.createDataFrame(
        [(1, "a"), (2, "b"), (16, "seen")], "url_hash long, url string"
    )
    shards = build_bloom_shards(frontier, n_shards=16, bits_per_shard=1 << 10)
    got = sorted(
        r["url"]
        for r in seen_filter_sharded(
            cands, frontier, shards, n_shards=16, bits_per_shard=1 << 10
        ).collect()
    )
    assert got == ["a", "b"]
