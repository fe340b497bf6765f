"""Cuckoo filter: the north rule's second URL-seen structure (O2).

Contract mirrors tests/test_bloom_shards.py: zero false negatives (the
property the pre-filter's exactness argument rests on), bounded false
positives, deletion (the capability blooms lack), deterministic builds,
non-power-of-two shard routing, and end-to-end equality of the deduped
set against the plain exact anti-join.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from see_spark.functions import cuckoo as ck


def _hashes(n, seed=7):
    rng = np.random.RandomState(seed)
    # int64 spread over the full signed range, like xxhash64 output
    return rng.randint(-(2**63), 2**63 - 1, size=n).astype(np.int64)


class TestCuckooFilterLocal:
    def test_no_false_negatives(self):
        h = _hashes(50_000).view(np.uint64)
        filt = ck.CuckooFilter(ck.buckets_for(len(h)))
        failures = filt.add_many(h)
        assert failures == 0
        assert filt.contains_many(h).all()

    def test_false_positive_rate_bounded(self):
        h = _hashes(50_000, seed=1).view(np.uint64)
        probe = _hashes(50_000, seed=2).view(np.uint64)
        filt = ck.CuckooFilter(ck.buckets_for(len(h)))
        filt.add_many(h)
        overlap = np.isin(probe, h)
        fpp = filt.contains_many(probe)[~overlap].mean()
        # 16-bit fp, 4-slot buckets: theoretical ~2*4/2^16 = 0.012%
        assert fpp < 0.005

    def test_delete_then_absent(self):
        h = _hashes(10_000, seed=3).view(np.uint64)
        filt = ck.CuckooFilter(ck.buckets_for(len(h)))
        filt.add_many(h)
        gone = h[:1000]
        assert filt.delete_many(gone) == 1000
        # remaining keys still all present (no false negatives introduced)
        assert filt.contains_many(h[1000:]).all()
        # deleted keys probe mostly absent (a few fp collisions with the
        # 9k survivors are allowed — that's the filter's fpp, not a bug)
        assert filt.contains_many(gone).mean() < 0.01

    def test_duplicate_insert_needs_duplicate_delete(self):
        h = np.array([12345], dtype=np.uint64)
        filt = ck.CuckooFilter(1 << 10)
        filt.add_many(np.repeat(h, 2))
        assert filt.delete_many(h) == 1
        assert filt.contains_many(h).all()  # second copy still there
        assert filt.delete_many(h) == 1
        assert not filt.contains_many(h).any()

    def test_deterministic_build(self):
        h = _hashes(20_000, seed=4).view(np.uint64)
        a = ck.CuckooFilter(ck.buckets_for(len(h)))
        b = ck.CuckooFilter(ck.buckets_for(len(h)))
        a.add_many(h)
        b.add_many(h)
        assert np.array_equal(a.table, b.table)

    def test_high_load_overflow_is_safe_not_wrong(self):
        # deliberately undersized: failures are reported, presence of the
        # successfully inserted keys still holds
        h = _hashes(5_000, seed=5).view(np.uint64)
        filt = ck.CuckooFilter(1 << 10)  # 4096 slots for 5000 keys
        failures = filt.add_many(h)
        assert failures > 0
        assert filt.load_factor > 0.9


@pytest.mark.usefixtures("spark")
class TestCuckooSharded:
    @pytest.mark.parametrize("n_shards", [8, 7])  # non-power-of-two too
    def test_sharded_dedup_matches_exact_anti_join(self, spark, n_shards):
        seen = spark.range(0, 3000).select(
            F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash")
        )
        cands = spark.range(1500, 5000).select(
            F.col("id").alias("cand_id"),
            F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash"),
        )
        shards = ck.build_cuckoo_shards(
            seen, n_shards=n_shards, buckets_per_shard=1 << 12
        )
        out = ck.seen_filter_sharded_cuckoo(
            cands, seen, shards, n_shards=n_shards, buckets_per_shard=1 << 12
        )
        got = sorted(r["cand_id"] for r in out.collect())
        expected = sorted(
            r["cand_id"]
            for r in cands.join(seen, "url_hash", "left_anti").collect()
        )
        assert got == expected == list(range(3000, 5000))

    def test_cuckoo_crawl_matches_bloom_crawl(self, spark):
        """The seen-structure choice (bloom vs cuckoo) is a physical choice
        only: the same crawl under the sharded cuckoo pre-filter must
        reproduce the byte-identical frontier — URL-seen set, states, seq,
        fetch order (the north rule's parity property)."""
        import tempfile

        from see_spark.operators.crawl import CrawlConfig, run_crawl
        from see_spark.sources.catalog import SnapshotCatalog
        from see_spark.sources.fetcher import FixtureFetcher
        from see_spark.sources.fixtures import (
            DOMAIN_FILTER,
            SEED_URLS,
            fixture_robots,
            fixture_site,
        )

        def crawl(structure):
            config = CrawlConfig(
                domain_filter=DOMAIN_FILTER, host_budget=2, max_rounds=30,
                use_sharded_bloom=True, bloom_shards=5,
                seen_structure=structure,
            )
            catalog = SnapshotCatalog(
                tempfile.mkdtemp(prefix=f"see_ck_{structure}_"), spark
            )
            run_crawl(
                spark, catalog, FixtureFetcher(spark, fixture_site()), config,
                seeds=SEED_URLS, robots=fixture_robots(),
            )
            key = lambda r: (r["url"], r["state"], r["seq"], r["fetch_order"])  # noqa: E731
            return sorted(map(key, catalog.read("frontier").collect()))

        assert crawl("cuckoo") == crawl("bloom")

    def test_empty_frontier_passes_everything(self, spark):
        seen = spark.range(0).select(F.col("id").alias("url_hash"))
        cands = spark.range(100).select(
            F.col("id").alias("cand_id"),
            F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        )
        shards = ck.build_cuckoo_shards(seen, n_shards=4, buckets_per_shard=1 << 10)
        out = ck.seen_filter_sharded_cuckoo(
            cands, seen, shards, n_shards=4, buckets_per_shard=1 << 10
        )
        assert out.count() == 100
