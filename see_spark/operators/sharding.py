"""Index shard planning — distribute a corpus over S serving shards.

The reference is a single-node index (one ETS table per word,
see_db_storage_ets.erl); serving a 10^10-doc index needs document-
partitioned shards, and HOW documents are assigned decides tail latency:
a shard holding the longest documents does proportionally more scoring
work per query, so naive hash assignment leaves O(sqrt) load spread
while size-aware assignment tightens it.

``plan_shards`` implements the parallel form of the LPT (longest
processing time) greedy: rank documents by size desc (id asc tie-break)
with the distributed dense-sequence (functions/seq.py — O(partitions)
driver state, no global window), then stripe rank % S. Adjacent ranks —
the largest docs — land on DIFFERENT shards, and every stripe of S
consecutive docs contributes one doc to each shard, so shard totals
differ by at most (stripe-local spread) regardless of the size
distribution. Deterministic in any engine: the rank order is a pinned
total order.

``shard_stats`` audits the plan: per-shard doc count, total size, and
``load_milli`` = 1000 * shard_size * S div corpus_size (1000 = perfectly
balanced), the number a capacity planner alarms on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.seq import with_dense_sequence


def plan_shards(
    docs: DataFrame,
    n_shards: int,
    size_col: str = "size",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, size, shard): LPT-striped shard assignment (module doc)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(size_col).cast("long").alias("size"),
    ).withColumn("__neg_size", -F.col("size"))
    ranked = with_dense_sequence(
        base, order_cols=["__neg_size", "doc_id"], out_col="__rank", start=0
    )
    return ranked.select(
        "doc_id",
        "size",
        (F.col("__rank") % n_shards).cast("long").alias("shard"),
    )


def shard_stats(assignment: DataFrame, n_shards: int) -> DataFrame:
    """(shard, n_docs, total_size, load_milli) — load audit of a
    ``plan_shards`` output; one map-side-combinable aggregate onto
    S keys plus a scalar corpus total injected as a cross join of a
    1-row aggregate (never a driver collect)."""
    per = assignment.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("size").cast("long").alias("total_size"),
    )
    grand = assignment.agg(F.sum("size").cast("long").alias("__corpus"))
    return per.crossJoin(F.broadcast(grand)).select(
        "shard",
        "n_docs",
        "total_size",
        F.expr(f"(1000 * total_size * {int(n_shards)}) div __corpus")
        .cast("long")
        .alias("load_milli"),
    )


def redde_shard_ranks(
    docs: DataFrame,
    query_words,
    n_shards: int = 8,
    sample_mod: int = 7,
    top_n: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ReDDE resource selection (Si & Callan, SIGIR 2003): which shards
    should a broker route this query to?

    At 10^10 docs a broker cannot score every shard for every query; the
    ReDDE estimator ranks shards from a small CENTRAL SAMPLE index: run
    the query against the sample, take the top ``top_n`` sampled docs,
    and credit each hit's shard with that shard's inverse sampling rate
    (shard_docs / shard_sample_docs) — an unbiased estimate of how many
    relevant docs the full shard holds. Shards are then ranked by the
    estimate; the broker fans the query out only to the leading ones.

    Deterministic concrete form (all integer, oracle bit-exact):
    shard = doc_id mod n_shards; the sample is docs whose 60-bit md5 of
    the decimal doc_id is 0 mod ``sample_mod`` (a content-independent
    deterministic ~1/sample_mod sample); relevance score = number of
    DISTINCT query words present in the doc's token set; top-n ties
    break by doc_id asc; est_rel_milli = (1000 * sample_hits *
    shard_docs) div sample_docs; rank by (est_rel_milli desc, shard).

    Scale: tokens join a BROADCAST query-word list, so scoring touches
    only sample docs containing a query term; the top-n window orders
    that small matched set (single-partition window over an
    already-tiny frame, not the corpus); shard tallies are one groupBy
    over the doc list. The corpus-wide token table is never shuffled.

    Returns (shard, shard_docs, sample_docs, sample_hits, est_rel_milli,
    rank) — one row per shard.
    """
    if n_shards < 1 or sample_mod < 1 or top_n < 1:
        raise ValueError("n_shards, sample_mod, top_n must all be >= 1")
    from pyspark.sql import Window
    from .dedup import hash60
    from .simjoin import token_sets

    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    ).withColumn("shard", (F.col("doc_id") % n_shards).cast("long"))
    sampled = base.withColumn(
        "in_sample",
        (hash60(F.col("doc_id").cast("string")) % sample_mod == 0).cast("int"),
    )

    qdf = F.broadcast(
        sampled.sparkSession.createDataFrame(
            [(w,) for w in dict.fromkeys(query_words)], "word string"
        )
    )
    scores = (
        token_sets(sampled.where(F.col("in_sample") == 1), "text", "doc_id")
        .join(qdf, "word")
        .groupBy("doc_id")
        .agg(F.count("*").alias("score"))
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    hits = (
        scores.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= top_n)
        .join(sampled.select("doc_id", "shard"), "doc_id")
        .groupBy("shard")
        .agg(F.count("*").alias("sample_hits"))
    )

    tallies = sampled.groupBy("shard").agg(
        F.count("*").alias("shard_docs"),
        F.sum("in_sample").alias("sample_docs"),
    )
    est = (
        tallies.join(hits, "shard", "left")
        .fillna({"sample_hits": 0})
        .select(
            "shard",
            F.col("shard_docs").cast("long").alias("shard_docs"),
            F.col("sample_docs").cast("long").alias("sample_docs"),
            F.col("sample_hits").cast("long").alias("sample_hits"),
            F.when(F.col("sample_docs") > 0,
                   F.expr("(1000 * sample_hits * shard_docs)"
                          " div sample_docs"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("est_rel_milli"),
        )
    )
    wr = Window.orderBy(F.desc("est_rel_milli"), F.asc("shard"))
    return est.withColumn(
        "rank", F.row_number().over(wr).cast("long")
    )


def skew_audit(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
    target_share_milli: int = 50,
) -> DataFrame:
    """Shuffle-key skew audit + salting recommendation — the
    before-you-shuffle diagnostic the north rule's "skew handled
    explicitly" clause asks for: for any would-be shuffle key (host on
    the frontier, word in the index build), measure how unevenly rows
    distribute over it, surface the heavy hitters, and recommend the
    salt factor that brings the heaviest key down to
    ``target_share_milli`` (in thousandths of the total).

    Integer-exact measures (engine-portable, no float percentiles):
      share_milli — per-key 1000*n div total
      gini_milli  — Gini coefficient of the key-count distribution via
                    the exact rank formula
                    (2*Σ r·x(r) - (K+1)*Σx) * 1000 div (K*Σx)
                    over counts sorted ascending (ties key-ascending)
      salt_k      — ceil(max_share_milli / target_share_milli), min 1:
                    splitting the heaviest key into salt_k subkeys puts
                    every subkey at or under the target share

    Scale shape: one combinable key count, then rank + prefix sums via
    the DISTRIBUTED dense-sequence/scan helpers (functions/seq.py) over
    the KEY dimension — never a global single-partition window — and
    two scalar aggregates broadcast back. Returns the ``top_k``
    heaviest keys (count desc, key asc), each row carrying the global
    stats: (key, n, share_milli, rank, n_keys, total, gini_milli,
    salt_k).
    """
    from ..functions.seq import with_prefix_sum

    counts = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count("*").cast("long").alias("n"))
    )
    counts = counts.localCheckpoint(eager=False)
    ranked = with_dense_sequence(
        counts, order_cols=["n", "key"], out_col="__r", start=1
    ).withColumn("__rx", F.col("__r") * F.col("n"))
    ranked = with_prefix_sum(
        ranked, "__rx", order_cols=["n", "key"], out_col="__srx"
    )
    scal = ranked.agg(
        F.count("*").cast("long").alias("__k"),
        F.sum("n").cast("long").alias("__tot"),
        F.max("__srx").cast("long").alias("__sumrx"),
        F.max("n").cast("long").alias("__maxn"),
    )
    t = int(target_share_milli)
    out = (
        counts.crossJoin(F.broadcast(scal))
        .select(
            "key",
            "n",
            F.expr("(1000 * n) div __tot").cast("long").alias("share_milli"),
            F.col("__k").alias("n_keys"),
            F.col("__tot").alias("total"),
            F.expr("(2000 * __sumrx - 1000 * (__k + 1) * __tot)"
                   " div (__k * __tot)")
            .cast("long")
            .alias("gini_milli"),
            F.greatest(
                F.expr(f"(((1000 * __maxn) div __tot) + {t} - 1) div {t}"),
                F.lit(1),
            )
            .cast("long")
            .alias("salt_k"),
        )
        .orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(top_k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    return out.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "key", "n", "share_milli", "rank", "n_keys", "total",
        "gini_milli", "salt_k",
    )


def hrw_assign(
    keys: DataFrame,
    n_shards: int,
    key_col: str = "key",
) -> DataFrame:
    """Rendezvous / highest-random-weight routing (Thaler & Ravishankar
    1998): every key goes to the shard with the maximum hash(shard, key)
    — the OTHER classic minimal-disruption router next to the consistent
    -hash ring (``operators/ring.py``). HRW needs no virtual-node ring
    state: perfectly uniform in expectation, and when a shard joins or
    leaves, ONLY keys whose argmax changes move (provably 1/(n+1) of
    them in expectation on join).

    weight = 60-bit md5 of 'hrw:<shard>:<key>' (the repo's engine-
    portable hash); argmax tie-break by shard id (pinned, though 60-bit
    ties are negligible). Pure Catalyst: the per-key argmax folds over a
    literal shard array — no explode, no shuffle, no Python.

    Returns (key, shard).
    """
    shard_w = F.array(
        *[
            F.struct(
                F.lit(s).cast("long").alias("s"),
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(f"hrw:{s}:"),
                                F.col(key_col).cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long").alias("w"),
            )
            for s in range(int(n_shards))
        ]
    )
    best = F.aggregate(
        shard_w,
        F.struct(
            F.lit(-1).cast("long").alias("s"),
            F.lit(-1).cast("long").alias("w"),
        ),
        lambda acc, x: F.when(x["w"] > acc["w"], x).otherwise(acc),
    )
    return keys.select(
        F.col(key_col).alias("key"), best["s"].alias("shard")
    )


def hrw_rebalance_audit(
    keys: DataFrame,
    n_before: int,
    n_after: int,
    key_col: str = "key",
) -> DataFrame:
    """Minimal-disruption audit for an HRW resize n_before → n_after:
    per (shard_before, shard_after) key counts. The HRW guarantee shows
    up as structure: on grow, every moved key lands on a NEW shard
    (shard_after >= n_before) — no key ever moves between surviving
    shards — and the moved fraction concentrates near
    (n_after − n_before)/n_after. Exact integers; two pure-projection
    assignments + one combinable aggregate.
    """
    a = hrw_assign(keys, n_before, key_col).select(
        "key", F.col("shard").alias("shard_before")
    )
    b = hrw_assign(keys, n_after, key_col).select(
        "key", F.col("shard").alias("shard_after")
    )
    return (
        a.join(b, "key")
        .groupBy("shard_before", "shard_after")
        .agg(F.count("*").cast("long").alias("n_keys"))
        .withColumn(
            "moved",
            (F.col("shard_before") != F.col("shard_after")).cast("long"),
        )
    )


def equidepth_boundaries(
    df: DataFrame, key_col: str, n_buckets: int
) -> list:
    """Exact equi-depth boundaries: the key values at ranks
    i·N div B (i = 1..B−1) in the total (key, rank) order — the
    deterministic version of the sampled range partitioning
    repartitionByRange does internally. One distributed dense rank
    (seq.with_dense_sequence) + a B−1-row collect (values, never row
    data)."""
    from ..functions.seq import with_dense_sequence

    n = df.count()
    b = int(n_buckets)
    if n == 0:
        return []
    keyed = df.select(F.col(key_col).cast("long").alias("__k"))
    ranked = with_dense_sequence(keyed, ["__k"], out_col="__r")
    marks = [((i * n) // b) for i in range(1, b)]
    rows = (
        ranked.where(F.col("__r").isin(marks))
        .select("__r", "__k")
        .collect()
    )
    by_rank = {r["__r"]: r["__k"] for r in rows}
    return [int(by_rank[m]) for m in marks]


def range_router_audit(
    df: DataFrame, key_col: str, n_buckets: int = 16
) -> DataFrame:
    """Partition-balance audit: route every row into ``n_buckets`` by
    (a) exact equi-depth boundaries learned from the data and (b) naive
    fixed-width ranges over [min, max] — per (scheme, bucket) exact
    counts. On any non-uniform key the fixed-width histogram shows the
    skew a range-partitioned shuffle would inherit, while equi-depth
    stays flat: this is the measurement behind choosing
    repartitionByRange + AQE skew handling over static ranges.

    bucket(v) = #boundaries strictly below... precisely Σ_i [v > b_i]
    (pinned strict comparison, duplicate keys at a boundary all land in
    the same bucket — counts then legitimately deviate from N/B, which
    the audit shows rather than hides).
    """
    b = int(n_buckets)
    bounds = equidepth_boundaries(df, key_col, b)
    lo, hi = df.agg(
        F.min(F.col(key_col).cast("long")), F.max(F.col(key_col).cast("long"))
    ).collect()[0]
    lo, hi = int(lo), int(hi)
    keyed = df.select(F.col(key_col).cast("long").alias("__k"))
    eq_bucket = F.lit(0).cast("long")
    for v in bounds:
        eq_bucket = eq_bucket + (F.col("__k") > F.lit(int(v))).cast("long")
    if hi == lo:
        fw_bucket = F.lit(0).cast("long")
    else:
        fw_bucket = F.least(
            F.expr(f"(__k - {lo}) * {b} div {hi - lo + 1}"),
            F.lit(b - 1),
        ).cast("long")
    eq = keyed.select(F.lit("equidepth").alias("scheme"), eq_bucket.alias("bucket"))
    fw = keyed.select(F.lit("fixedwidth").alias("scheme"), fw_bucket.alias("bucket"))
    return (
        eq.unionByName(fw)
        .groupBy("scheme", "bucket")
        .agg(F.count("*").cast("long").alias("n_rows"))
    )
