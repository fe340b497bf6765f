"""Distributed cardinality sketches: an engine-portable HyperLogLog.

Why not ``approx_count_distinct``: Spark's built-in HLL++ is a black box —
its register layout is JVM-internal, so its estimates can't be reproduced
by any other engine, can't be persisted as data, and can't be merged
incrementally across crawl rounds from SQL. This module builds HLL as
PLAIN COLUMNS (md5-derived hash -> bucket + leading-zero rank -> groupBy
max), which buys three things the crawl engine needs at 10^10-URL scale:

  1. **mergeable state**: per-(key, bucket) max-rank rows are an
     append-only sketch table — union + max re-merges rounds, hosts, or
     partitions without re-reading raw URLs (the same delta-commit shape
     as word_stats);
  2. **engine portability**: every step is deterministic string/integer
     SQL, so DuckDB reproduces the estimate bit-for-bit (the driver gate's
     exact oracle — impossible with HLL++);
  3. **plan quality**: the build is one map-side-combinable aggregate
     (groupBy key+bucket max) — a single shuffle of at most
     |keys| x m rows, no matter how many input rows.

Math (Flajolet et al., public): m = 2^p buckets; per element, bucket =
12 md5 bits mod m, rank = leading-zero bits of the next 60 md5 bits + 1;
estimate = alpha_m * m^2 / sum_j 2^-M_j with linear-counting correction
E <= 2.5m -> m * ln(m / V) when V (empty buckets) > 0. Leading-zero
counting is CASE arithmetic on hex digits — no floating log2 anywhere in
the rank path, so ranks are integers in both engines and the only
engine-inexact op is the final ln/division (rounded by callers).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# alpha_m for m >= 128 (standard HLL constant)
def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_rank_cols(value_col: str, p: int = 10) -> List:
    """(bucket, rank) expressions for one value — pure Catalyst.

    bucket: first 3 md5 hex chars (12 bits) mod m (m divides 4096 for
    p <= 12, so the bucket distribution stays uniform);
    rank: 1 + leading-zero bits of the 60-bit value in md5 chars 4..18,
    computed as 4 * (leading zero hex digits) + CASE on the first nonzero
    digit. All-zero value (never in practice) -> rank 61.
    """
    if not 4 <= p <= 12:
        raise ValueError("p must be in [4, 12] (bucket bits from 3 hex chars)")
    s = F.md5(F.col(value_col))
    m = 1 << p
    bucket = F.pmod(F.conv(F.substring(s, 1, 3), 16, 10).cast("long"), F.lit(m))
    # ltrim with a trim-character set is expr-only in the Python API
    stripped = F.expr(f"ltrim('0', substring(md5({value_col}), 4, 15))")
    nz = F.length(stripped)
    zero_digits = F.lit(15) - nz
    first = F.conv(F.substring(stripped, 1, 1), 16, 10).cast("int")
    digit_zeros = (
        F.when(first >= 8, 0)
        .when(first >= 4, 1)
        .when(first >= 2, 2)
        .otherwise(3)
    )
    rank = (
        F.when(nz == 0, F.lit(61))
        .otherwise(zero_digits * 4 + digit_zeros + 1)
        .cast("int")
    )
    return [bucket.alias("hll_bucket"), rank.alias("hll_rank")]


def hll_sketch(
    df: DataFrame, keys: Sequence[str], value_col: str, p: int = 10
) -> DataFrame:
    """Mergeable sketch rows: (keys..., hll_bucket, register=max rank).

    ONE map-side-combinable shuffle regardless of input size; output is at
    most |distinct keys| * 2^p rows. Union two sketches and re-aggregate
    with max to merge (see tests)."""
    return (
        df.select(*keys, *hll_rank_cols(value_col, p))
        .groupBy(*keys, "hll_bucket")
        .agg(F.max("hll_rank").alias("register"))
    )


def hll_estimate(
    sketch: DataFrame, keys: Sequence[str], p: int = 10
) -> DataFrame:
    """Sketch rows -> (keys..., hll_estimate double).

    Empty buckets contribute 2^0 to the harmonic sum and count toward V
    (linear counting). Observed-bucket terms 2^-register are exact powers
    of two, so the per-key sums are order-independent up to double
    precision; callers round for cross-engine comparison."""
    m = 1 << p
    alpha = _alpha(m)
    agg = sketch.groupBy(*keys).agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.pow(F.lit(2.0), -F.col("register"))).alias("obs_sum"),
    )
    empty = F.lit(m) - F.col("n_buckets")
    harmonic = F.col("obs_sum") + empty  # 2^0 per empty bucket
    raw = F.lit(alpha * m * m) / harmonic
    # small-range correction (V = empty buckets)
    est = F.when(
        (raw <= 2.5 * m) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty),
    ).otherwise(raw)
    return agg.select(*keys, est.alias("hll_estimate"))


def hll_distinct(
    df: DataFrame, keys: Sequence[str], value_col: str, p: int = 10
) -> DataFrame:
    """Convenience: sketch + estimate in one lazy plan."""
    return hll_estimate(hll_sketch(df, keys, value_col, p), keys, p)


# --------------------------------------------------------------------------
# Count-min sketch: the frequency-sketch sibling of the HLL above, for
# per-host frontier pressure monitoring at 10^10-URL scale (north rule:
# per-domain skew must be detected before it melts a politeness window).
# Same portability contract: every step is md5-derived integer SQL, so a
# DuckDB oracle reproduces estimates bit-for-bit, and the counter table is
# mergeable append-only state (union + sum re-merges rounds/partitions).
# Cormode & Muthukrishnan 2005: depth d rows x width w counters; item ->
# one bucket per row via independent hashes; estimate = min over rows.
# Guarantees est >= true always, est <= true + eps*N w.h.p.
# Scale shape: build is ONE map-side-combinable aggregate over d rows per
# input (16-byte payload), counter table d*w rows (broadcastable);
# estimation is a broadcast join, no data-sized shuffle.


def cms_bucket(value_col, row: int, width: int):
    """Row-i bucket: 60 md5 bits of 'cms{i}:' || value, mod width —
    independent across rows via the salt, identical in DuckDB as
    ('0x' || substr(md5('cms{i}:' || v), 1, 15))::BIGINT % width."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cms{row}:"), F.col(value_col))), 1, 15),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_build(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 256,
) -> DataFrame:
    """Counter table (row, bucket, cnt) — d*width rows max."""
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("row"),
                        cms_bucket(value_col, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb")
    )
    return (
        stacked.groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame, keys: DataFrame, value_col: str,
    depth: int = 4, width: int = 256,
) -> DataFrame:
    """Point-query every row of ``keys``: adds ``cms_count`` = min over the
    d rows of the counter cells (0 if a cell is empty). The counter table
    is broadcast — keys-side never shuffles."""
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("row"),
                        cms_bucket(value_col, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("*", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")).drop("rb")
    joined = probes.join(F.broadcast(counters), ["row", "bucket"], "left")
    others = [c for c in keys.columns]
    return (
        joined.groupBy(*others)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("cms_count"))
    )
