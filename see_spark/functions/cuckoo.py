"""Vectorized cuckoo filter — the alternative URL-seen membership structure
(north rule, O2: "bloom/cuckoo URL-seen membership ... in vectorized
pandas/Arrow UDFs").

Role mirrors ``bloom.py``: a *negative-space* short-circuit in front of the
exact ``left_anti`` join. A candidate whose fingerprint misses both of its
buckets is provably unseen; a hit may be a false positive, so the trailing
anti-join keeps exactness. Correctness never depends on the filter.

Why a cuckoo filter at all, when the bloom already works:

- **Deletion.** A bloom cannot unset a bit; a cuckoo filter removes one
  fingerprint copy exactly. That matches the frontier's lease-recovery
  mode (O4): when a checked-out URL is requeued after a crash, its entry
  can be *deleted* and re-inserted instead of rebuilding the filter.
- **Space at low fpp.** At the same ~1% fpp a 16-bit-fingerprint cuckoo
  table at 95% load spends ~16.8 bits/key vs the bloom's ~10 bits at 1%
  — but to reach 0.1% the bloom needs ~14.4 bits while the cuckoo still
  pays 16.8 (fpp ≈ 2·4/2^16 ≈ 0.012% here): at strict fpp targets the
  cuckoo wins, and the exact-anti-join probe side shrinks accordingly.

Reference parity: the reference keeps its visited set exact in ETS
(``/root/reference/apps/crawler/src/see_crawler_worker.erl`` visit check);
both filter families are pre-filters in front of this engine's exact
anti-join, so either yields the identical URL-seen set — pinned by
``tests/test_crawl_parity.py``.

Topology: cuckoo tables are NOT OR-mergeable (inserting a fingerprint may
evict another), so the sharded build uses the ``"shuffle"`` strategy only:
repartition the 8-byte hashes by ``pmod(hash, n_shards)`` and build each
shard's table once in its own task. That is exactly the regime where the
bloom's shuffle strategy wins anyway (10^10 rows — see ``bloom.py``), and
nothing ever flows through the driver. The probe is the same co-partitioned
cogroup as ``bloom.seen_filter_sharded``: each task holds ONE shard's
table, per-executor memory is one shard regardless of total filter size.

Determinism: eviction victims are chosen by a counter-based rotation (no
RNG), so the same input set in the same order builds the same table, and
the FILTER's output feeds an exact anti-join anyway — crawl order parity
across parallelism levels is unaffected by build order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FP_MULT = np.uint64(0xC2B2AE3D27D4EB4F)  # odd 64-bit mix for bucket2
_BUCKET_SLOTS = 4
_MAX_KICKS = 500


def _fingerprints(hashes: np.ndarray) -> np.ndarray:
    """Nonzero 16-bit fingerprints from the stored 64-bit url_hash.

    Uses bits the bucket index does not (the index uses the LOW bits), so
    fingerprint and index stay independent. 0 is the empty-slot sentinel,
    so a zero fingerprint is mapped to 1.
    """
    fp = ((hashes >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _alt_bucket(idx: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    """Partial-key cuckoo: i2 = i1 XOR h(fp). Involutive, so the same
    function maps i2 back to i1 — membership needs no flag."""
    with np.errstate(over="ignore"):
        mix = (fp.astype(np.uint64) * _FP_MULT) >> np.uint64(32)
    return (idx ^ mix) & np.uint64(n_buckets - 1)


class CuckooFilter:
    """(n_buckets x 4)-slot table of 16-bit fingerprints; n_buckets is a
    power of two. ~0.012% fpp at any realistic load factor."""

    def __init__(self, n_buckets: int, table: np.ndarray | None = None):
        if n_buckets & (n_buckets - 1):
            raise ValueError("n_buckets must be a power of two")
        self.n_buckets = n_buckets
        self.table = (
            table
            if table is not None
            else np.zeros((n_buckets, _BUCKET_SLOTS), dtype=np.uint16)
        )

    # -- vectorized bulk insert ------------------------------------------
    def add_many(self, hashes: np.ndarray) -> int:
        """Insert all; returns how many could NOT be placed (table too
        full — callers size the table so this is 0; a nonzero return is
        still safe because the anti-join is exact, it only means those
        entries probe as maybe-unseen and are caught by the join)."""
        h = hashes.astype(np.uint64)
        fp = _fingerprints(h)
        i1 = h & np.uint64(self.n_buckets - 1)
        i2 = _alt_bucket(i1, fp, self.n_buckets)

        # Vectorized passes: for each of the 8 candidate slots, claim the
        # slot for the FIRST pending item hashing to it (np.unique keeps
        # the first occurrence per bucket), then drop placed items and
        # repeat. Each pass is pure numpy; the loop runs until no pass
        # makes progress (≤ 8 passes typically, load-dependent).
        pending = np.ones(len(h), dtype=bool)
        while pending.any():
            placed_any = False
            for buckets in (i1, i2):
                for slot in range(_BUCKET_SLOTS):
                    idx = np.flatnonzero(pending)
                    if idx.size == 0:
                        break
                    b = buckets[idx]
                    free = self.table[b, slot] == 0
                    if not free.any():
                        continue
                    cand = idx[free]
                    bb = buckets[cand]
                    # first pending item per distinct free bucket wins
                    uniq, first = np.unique(bb, return_index=True)
                    winners = cand[first]
                    self.table[bb[first], slot] = fp[winners]
                    pending[winners] = False
                    placed_any = True
            if not placed_any:
                break
        # Sequential eviction for the (rare) overflow remainder.
        failures = 0
        for j in np.flatnonzero(pending):
            if not self._insert_with_kicks(int(i1[j]), np.uint16(fp[j])):
                failures += 1
        return failures

    def _insert_with_kicks(self, bucket: int, fingerprint: np.uint16) -> bool:
        idx = np.uint64(bucket)
        fp = fingerprint
        for kick in range(_MAX_KICKS):
            row = self.table[int(idx)]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                return True
            # deterministic victim rotation — no RNG, reproducible builds
            victim = kick % _BUCKET_SLOTS
            fp, row[victim] = row[victim].copy(), fp
            idx = _alt_bucket(
                np.array([idx], dtype=np.uint64),
                np.array([fp], dtype=np.uint16),
                self.n_buckets,
            )[0]
        return False

    # -- vectorized probe -------------------------------------------------
    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        h = hashes.astype(np.uint64)
        fp = _fingerprints(h)
        i1 = (h & np.uint64(self.n_buckets - 1)).astype(np.int64)
        i2 = _alt_bucket(
            i1.view(np.uint64), fp, self.n_buckets
        ).astype(np.int64)
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    # -- deletion (the capability blooms lack) ----------------------------
    def delete_many(self, hashes: np.ndarray) -> int:
        """Remove ONE fingerprint copy per present hash; returns how many
        were found and removed. Only delete items that were inserted —
        deleting a never-inserted item may remove another key's colliding
        fingerprint (standard cuckoo-filter contract)."""
        h = hashes.astype(np.uint64)
        fp_all = _fingerprints(h)
        i1_all = h & np.uint64(self.n_buckets - 1)
        i2_all = _alt_bucket(i1_all, fp_all, self.n_buckets)
        removed = 0
        for j in range(len(h)):  # per-row: duplicate deletes must each hit
            fp = fp_all[j]
            done = False
            for idx in (int(i1_all[j]), int(i2_all[j])):
                row = self.table[idx]
                hits = np.flatnonzero(row == fp)
                if hits.size:
                    row[hits[0]] = 0
                    removed += 1
                    done = True
                    break
            if done:
                continue
        return removed

    @property
    def load_factor(self) -> float:
        return float((self.table != 0).mean())


def buckets_for(n_rows: int, cap: int = 1 << 26) -> int:
    """Table sizing: 4-slot buckets at ≤90% target load → n/3.6 buckets
    rounded up to a power of two (actual load ≤ n/(4·buckets))."""
    want = max(1 << 10, int(n_rows / 3.6) + 1)
    n = 1 << (want - 1).bit_length()
    return min(n, cap)


def build_cuckoo_shards(
    df: DataFrame,
    hash_col: str = "url_hash",
    n_shards: int = 64,
    buckets_per_shard: int = 1 << 16,
) -> DataFrame:
    """Sharded distributed build, shuffle strategy (the only one possible:
    cuckoo tables don't OR-merge). One shuffle of the 8-byte hashes by
    ``pmod(hash, n_shards)``; each shard's task builds its table once.
    Returns ``(shard int, table binary)`` — same shape contract as
    ``bloom.build_bloom_shards`` so the probe cogroup is interchangeable.
    """
    schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField("table", T.BinaryType()),
        ]
    )

    def _build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        filt = CuckooFilter(buckets_per_shard)
        # deterministic build order: sort the shard's hashes so the same
        # set yields the same table bytes at any upstream partitioning
        hashes = np.sort(pdf[hash_col].to_numpy(dtype=np.int64)).view(np.uint64)
        filt.add_many(hashes)
        return pd.DataFrame({"shard": [key[0]], "table": [filt.table.tobytes()]})

    return (
        df.select(hash_col)
        .withColumn("shard", F.pmod(F.col(hash_col), F.lit(n_shards)).cast("int"))
        .groupBy("shard")
        .applyInPandas(_build, schema=schema)
    )


def seen_filter_sharded_cuckoo(
    candidates: DataFrame,
    frontier: DataFrame,
    cuckoo_shards: DataFrame,
    n_shards: int = 64,
    buckets_per_shard: int = 1 << 16,
) -> DataFrame:
    """URL-seen dedup with a co-partitioned sharded cuckoo filter: the
    exact cogroup shape of ``bloom.seen_filter_sharded`` — candidates and
    shard tables meet on ``shard``; definite misses skip the exact
    anti-join, suspects flow through it. Per-executor filter memory is one
    shard's table (8·buckets_per_shard bytes) regardless of filter size."""
    out_schema = T.StructType(
        list(candidates.schema.fields)
        + [T.StructField("__maybe", T.BooleanType(), False)]
    )

    cand_shard = candidates.withColumn(
        "__shard", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int")
    )

    def _probe(
        key: tuple, cands_pdf: pd.DataFrame, table_pdf: pd.DataFrame
    ) -> pd.DataFrame:
        body = cands_pdf.drop(columns=["__shard"])
        if len(table_pdf) == 0:  # no frontier rows in this shard
            body["__maybe"] = False
            return body
        filt = CuckooFilter(
            buckets_per_shard,
            np.frombuffer(table_pdf["table"].iloc[0], dtype=np.uint16).reshape(
                buckets_per_shard, _BUCKET_SLOTS
            ).copy(),
        )
        hashes = body["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        body["__maybe"] = filt.contains_many(hashes)
        return body

    probed = (
        cand_shard.groupBy("__shard")
        .cogroup(cuckoo_shards.groupBy("shard"))
        .applyInPandas(_probe, schema=out_schema)
        .localCheckpoint(eager=False)  # one cogroup pass feeds both branches
    )
    fresh = probed.filter(~F.col("__maybe")).drop("__maybe")
    deduped_suspects = probed.filter(F.col("__maybe")).drop("__maybe").join(
        frontier.select("url_hash"), "url_hash", "left_anti"
    )
    return fresh.unionByName(deduped_suspects)
