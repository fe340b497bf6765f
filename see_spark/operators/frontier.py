"""Frontier operators: seed ingest, URL-seen dedup, politeness checkout.

Reference semantics reimplemented batch-wise (SURVEY §2.1 O1/O2/O4/O24):

- O2  insert-if-absent URL-seen (see_db_storage_ets.erl:84-92): bloom
  pre-filter (north-rule addition) + exact ``left_anti`` join on url_hash;
  first-enqueue-wins inside a batch via min(seq).
- O1  frontier dequeue (ets:94-101) batched: per-host top-``host_budget``
  unvisited rows by the pinned priority ``(depth, seq)`` (SURVEY §7.0
  hazard 1 — the reference's order is a storage artifact; BFS FIFO is the
  pinned rule shared with the oracle).
- O4  lease requeue (see_db_srv.erl:98-105,116-118): pending rows whose
  checkout round is older than the lease flip back to unvisited at round
  start.
- O24 politeness/robots (north-rule additions the reference lacks —
  see_crawler_worker.erl:18-19 is a bare poll loop): per-host budget via a
  host-partitioned row_number window (shuffles only the unvisited slice,
  partitioned by host), a min-gap gate against broadcast ``hoststats``, and
  a robots prefix gate against the broadcast ``robots`` dimension.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.seq import with_dense_sequence
from ..functions.udfs import canonicalize_udf
from ..sources.tables import (
    STATE_ERROR,
    FRONTIER_SCHEMA,
    STATE_PENDING,
    STATE_ROBOTS,
    STATE_UNVISITED,
)


# URLs in this language are canonicalize() fixpoints (verified by a
# hypothesis property test + 20k-sample fuzz): lowercase scheme+host, a
# path of non-empty [a-z0-9_~-] segments (no dot segments, no '//', no
# percent escapes, query or fragment), optional trailing slash. Most
# crawled links are exactly this shape, so the guard keeps the Python
# canonicalizer kernel off the hot path for the common case.
_CANONICAL_FAST_RE = r"^http://[a-z0-9.-]+/([a-z0-9_~-]+/)*[a-z0-9_~-]*$"


def canonicalize_and_filter(
    df: DataFrame, url_col: str = "url", domain_filter: Optional[str] = None
) -> DataFrame:
    """O15 + O16: canonicalize (null = url_error) then domain-filter the
    netloc with Catalyst ``rlike`` (see_db_srv.erl:83-96,167-176).
    Adds ``url`` (canonical), ``host``, ``url_hash``, ``ingest_status``.

    Plan shape: already-canonical URLs (the fast-path regex, a verified
    canonicalize() fixpoint class) bypass the Python kernel entirely, and
    the host of a CANONICAL url is a plain regexp_extract (netloc =
    everything between :// and the first /, which canonical URLs always
    have) — so for clean-link batches the whole stage is codegen.
    """
    out = (
        df.withColumn(
            "__canon",
            F.when(
                F.col(url_col).rlike(_CANONICAL_FAST_RE), F.col(url_col)
            ).otherwise(canonicalize_udf(F.col(url_col))),
        )
        .withColumn(
            # null __canon (url_error) propagates to null host
            "host", F.regexp_extract(F.col("__canon"), r"^[^:]+://([^/]+)", 1)
        )
    )
    status = F.when(F.col("__canon").isNull(), F.lit("url_error"))
    if domain_filter is not None:
        status = status.when(
            ~F.col("host").rlike(domain_filter), F.lit("filter_mismatch")
        )
    out = out.withColumn("ingest_status", status.otherwise(F.lit("ok")))
    return (
        out.drop(url_col)
        .withColumnRenamed("__canon", "url")
        .withColumn("url_hash", F.xxhash64("url"))
    )


def seen_filter(
    candidates: DataFrame,
    frontier: DataFrame,
    bloom_probe=None,
) -> DataFrame:
    """O2 dedup: keep candidates whose url_hash is not in the frontier.

    ``bloom_probe`` (functions.bloom.maybe_seen_udf result) short-circuits
    definite negatives before the anti-join shuffle; the anti-join keeps
    exactness. Candidates must carry url_hash.
    """
    if bloom_probe is not None:
        maybe = candidates.withColumn("__maybe_seen", bloom_probe(F.col("url_hash")))
        fresh = maybe.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
        suspect = maybe.filter(F.col("__maybe_seen")).drop("__maybe_seen")
        deduped_suspect = suspect.join(
            frontier.select("url_hash"), "url_hash", "left_anti"
        )
        return fresh.unionByName(deduped_suspect)
    return candidates.join(frontier.select("url_hash"), "url_hash", "left_anti")


def dedup_within_batch(candidates: DataFrame, order_col: str = "link_rank") -> DataFrame:
    """First-enqueue-wins inside one round's discoveries (O2 applied to a
    batch): keep the minimum ``order_col`` row per url_hash.

    Expressed as min(struct(order, rest)) per key rather than a row_number
    window: struct comparison is field-ordered so the minimum IS the
    first-enqueued row, and a hash aggregate gets map-side partial
    aggregation (the shuffle carries one row per key per map partition)
    where a window would shuffle + sort every candidate row."""
    others = [c for c in candidates.columns if c not in ("url_hash", order_col)]
    packed = candidates.groupBy("url_hash").agg(
        F.min(F.struct(order_col, *others)).alias("__first")
    )
    return packed.select(
        "url_hash",
        F.col(f"__first.{order_col}").alias(order_col),
        *[F.col(f"__first.{c}").alias(c) for c in others],
    ).select(*candidates.columns)


def as_frontier_rows(
    candidates: DataFrame, depth_col, round_no: int, seq_start: int
) -> DataFrame:
    """Stamp deduped candidates into frontier-schema rows with dense ``seq``
    continuing the global discovery order (depth asc, then within-round
    discovery order: fetch order of the linking page, link position)."""
    stamped = with_dense_sequence(
        candidates.withColumn("__depth", depth_col),
        order_cols=["link_rank"],
        out_col="seq",
        start=seq_start,
    )
    return stamped.select(
        "url",
        "url_hash",
        "host",
        F.col("__depth").cast("int").alias("depth"),
        "seq",
        F.lit(STATE_UNVISITED).alias("state"),
        F.lit(None).cast("string").alias("detail"),
        F.lit(round_no).cast("int").alias("discovered_in_round"),
        F.lit(None).cast("int").alias("fetched_in_round"),
        F.lit(None).cast("long").alias("fetch_order"),
        F.lit(None).cast("int").alias("checkout_round"),
    )


def expire_leases(frontier: DataFrame, round_no: int, lease_rounds: int) -> DataFrame:
    """O4: pending -> unvisited when the visit lease expired.

    NOTE on the batch crawl loop: run_round never PERSISTS pending rows —
    a checked-out batch goes unvisited -> terminal inside one delta commit,
    and crash recovery is replay-based (``catalog.resume_point`` rolls
    every table back to the last fully committed round and re-runs the
    round). This operator therefore only fires on frontiers written by
    OTHER writers that do persist a pending state — e.g. a streaming /
    multi-writer deployment where a checkout commit and its result commit
    are separate transactions (the reference's visit-lease recovery,
    see_db_srv.erl O4). It is kept as the reusable recovery primitive for
    that mode and exercised by the gated `lease_expiry` query."""
    expired = (F.col("state") == STATE_PENDING) & (
        F.col("checkout_round") <= F.lit(round_no - lease_rounds)
    )
    return frontier.withColumn(
        "state", F.when(expired, F.lit(STATE_UNVISITED)).otherwise(F.col("state"))
    ).withColumn(
        "checkout_round",
        F.when(expired, F.lit(None).cast("int")).otherwise(F.col("checkout_round")),
    )


def robots_block(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """North-rule robots gate: flip unvisited URLs matching a disallowed
    prefix for their host to a terminal robots_blocked state. ``robots`` is
    a small dimension -> broadcast join; prefix test stays JVM-side."""
    rules = F.broadcast(robots.select("host", "disallow"))
    joined = frontier.join(rules, "host", "left")
    path = F.regexp_replace("url", r"^[a-z]+://[^/]+", "")
    blocked = (
        (F.col("state") == STATE_UNVISITED)
        & F.col("disallow").isNotNull()
        & F.exists(
            "disallow", lambda prefix: path.startswith(prefix)
        )
    )
    # materialize the flag once: the predicate reads `state`, which the
    # state-flip below rewrites, so chained withColumns would disagree.
    return (
        joined.withColumn("__blocked", blocked)
        .withColumn(
            "state",
            F.when(F.col("__blocked"), F.lit(STATE_ROBOTS)).otherwise(F.col("state")),
        )
        .withColumn(
            "detail",
            F.when(F.col("__blocked"), F.lit("robots_disallow")).otherwise(
                F.col("detail")
            ),
        )
        .drop("disallow", "__blocked")
    )


def checkout(
    frontier: DataFrame,
    hoststats: DataFrame,
    round_no: int,
    host_budget: int,
    min_gap_rounds: int = 1,
    host_gap: Optional[DataFrame] = None,
    host_budgets: Optional[DataFrame] = None,
) -> DataFrame:
    """O1+O24: the round's fetch batch.

    unvisited ∧ politeness-eligible hosts -> per-host top-``host_budget`` by
    (depth, seq) -> global ``fetch_order`` by (depth, seq) (dense, for
    crawl-order parity). Returns frontier-schema rows plus fetch_order.

    Scale shape: the filter prunes to the unvisited slice (partition-pruned
    under Iceberg's state partitioning), and hoststats/robots are broadcast
    dims. Skew containment is two-phase (salted) top-k: the per-host
    window would otherwise sort a giant host's entire row set in ONE task
    (the zipf head — profiling showed this stage capped at ~0.39 scaling
    efficiency). Phase 1 ranks within (host, salt) — every window group is
    bounded by the host's rows / ``salt_buckets`` — and keeps ``budget``
    rows per salt; phase 2 ranks the surviving ≤ salt_buckets x budget
    rows per host exactly. Any row in a host's true top-``budget`` by
    (depth, seq) is necessarily in its salt group's top-``budget``, so the
    result is identical to the single-window plan.

    ``host_budgets``: optional (host, budget) dimension overriding the
    scalar ``host_budget`` per host (absent hosts keep the scalar;
    budget 0 skips the host this round) — the consumer of
    ``allocate_budget``'s apportionment and the reputation/exhaustion
    signals. A broadcast dim like hoststats/host_gap; the salted
    two-phase cut stays exact because a host's true top-b rows are in
    every salt group's top-b for any per-host b.
    """
    eligible = frontier.filter(F.col("state") == STATE_UNVISITED)
    if host_gap is not None:
        # per-host gap override (robots Crawl-delay, in rounds): effective
        # gap = max(min_gap_rounds, host's gap_rounds). host_gap is
        # O(hosts that declare a delay) — a broadcast dim like hoststats.
        stats = F.broadcast(hoststats.select("host", "last_fetch_round"))
        gaps = F.broadcast(host_gap.select("host", "gap_rounds"))
        eff = F.greatest(
            F.coalesce(F.col("gap_rounds"), F.lit(min_gap_rounds)),
            F.lit(min_gap_rounds),
        )
        eligible = (
            eligible.join(stats, "host", "left")
            .join(gaps, "host", "left")
            .filter(
                F.col("last_fetch_round").isNull()
                | (F.col("last_fetch_round") <= F.lit(round_no) - eff)
            )
            .drop("last_fetch_round", "gap_rounds")
        )
    elif min_gap_rounds > 1:
        stats = F.broadcast(hoststats.select("host", "last_fetch_round"))
        eligible = eligible.join(stats, "host", "left").filter(
            F.col("last_fetch_round").isNull()
            | (F.col("last_fetch_round") <= F.lit(round_no - min_gap_rounds))
        ).drop("last_fetch_round")
    if host_budgets is not None:
        bud = F.broadcast(
            host_budgets.select("host", F.col("budget").alias("__hb"))
        )
        eligible = eligible.join(bud, "host", "left").withColumn(
            "__budget",
            F.coalesce(F.col("__hb"), F.lit(int(host_budget))).cast("int"),
        ).drop("__hb")
    else:
        eligible = eligible.withColumn(
            "__budget", F.lit(int(host_budget)).cast("int")
        )
    # Slim-key two-phase top-k: both windows shuffle ONLY the ranking
    # key (host, depth, seq) plus two small ints — never the full row.
    # Full rows (url/detail strings dominate the bytes) made the
    # checkout leg shuffle-bandwidth-bound: at 2->8 cores / 10x input it
    # tracked the host's memory-bandwidth ceiling 1:1 (BENCH
    # ATTRIBUTION_r4). The surviving keys re-join the full rows post-cut
    # on `seq` (the frontier's unique row key — with_dense_sequence /
    # next_seq stamping) as a BROADCAST hash join: the cut is Σ per-host
    # budgets = the round's fetch batch, which the politeness design
    # already bounds to what the fetch layer can do in a round.
    salt_buckets = 16
    slim = eligible.select(
        "host",
        "depth",
        "seq",
        "__budget",
        F.pmod(F.col("url_hash"), F.lit(salt_buckets)).cast("int").alias("__salt"),
    )
    w1 = Window.partitionBy("host", "__salt").orderBy("depth", "seq")
    pre = (
        slim.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= F.col("__budget"))
        .drop("__salt", "__r1")
    )
    w = Window.partitionBy("host").orderBy("depth", "seq")
    cut = (
        pre.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= F.col("__budget"))
        .select("depth", "seq")
    )
    keys = with_dense_sequence(
        cut, order_cols=["depth", "seq"], out_col="fetch_order", start=0
    ).select("seq", "fetch_order")
    cols = [c for c in eligible.columns if c not in ("__budget", "fetch_order")]
    return (
        eligible.select(*cols)
        .join(F.broadcast(keys), "seq")
        .select(*cols, "fetch_order")
        .withColumn("checkout_round", F.lit(round_no).cast("int"))
        .withColumn("state", F.lit(STATE_PENDING))
    )


def error_backoff_gap(
    frontier: DataFrame,
    base_gap: int = 1,
    cap_rounds: int = 16,
) -> DataFrame:
    """Per-host exponential error backoff as a checkout gap dimension:
    a host with n fetch errors waits ``min(cap, base_gap * 2^n)`` rounds
    between visits. Feed the result to ``checkout(host_gap=...)`` — the
    same broadcast per-host gap mechanism robots Crawl-delay uses, so the
    two compose by taking the greatest gap per host upstream.

    Exact shifts (shiftleft on a capped exponent), no float pow — any
    engine reproduces the gaps bit-for-bit. One map-side-combinable
    aggregate over the error partition; hosts without errors are absent
    (checkout's left join defaults them to min_gap_rounds)."""
    errs = frontier.filter(F.col("state") == STATE_ERROR).groupBy("host").agg(
        F.count("*").cast("int").alias("n_errors")
    )
    # clamp the exponent BEFORE shifting so shiftleft never overflows
    # (SQL expr: pyspark's shiftleft() only takes a literal bit count)
    return errs.select(
        "host",
        F.expr(
            f"cast(least(shiftleft({int(base_gap)}, least(n_errors, 30)),"
            f" {int(cap_rounds)}) as int)"
        ).alias("gap_rounds"),
    )


def checkout_prioritized(
    frontier: DataFrame,
    indegree: DataFrame,
    host_budget: int,
) -> DataFrame:
    """O24 variant: importance-first checkout — per-host budget window
    ordered by (discovered in-degree DESC, depth, seq) instead of pure BFS
    (depth, seq). This is the OPIC-family scheduling policy the north
    rule's "priority queue (depth + host-budget score)" generalizes to:
    pages many discovered pages point at get fetched first, subject to the
    same per-host politeness budget.

    ``indegree``: (url, indegree) — maintained incrementally by the crawl
    loop as a hoststats-style rollup of extracted links (one combinable
    shuffle per round); URLs absent from it rank as in-degree 0 (nothing
    discovered points at them yet). The join is a plain equi-join on url:
    both sides are url-keyed, so under co-partitioned storage it is
    shuffle-free; it is NOT broadcast (at 10^10-URL scale the in-degree
    relation is frontier-sized).

    Same two-phase salted top-k as ``checkout`` (the argument there holds
    for any total order): any row in a host's true top-``budget`` by
    (__negpri, depth, seq) is in its salt group's top-``budget``. seq ends
    the key, so the order is total and the result deterministic across
    parallelism. Returns the batch ordered by the same key via a dense
    ``fetch_order``.
    """
    eligible = (
        frontier.filter(F.col("state") == STATE_UNVISITED)
        .join(indegree, "url", "left")
        .withColumn(
            "__negpri", -F.coalesce(F.col("indegree"), F.lit(0)).cast("long")
        )
    )
    salt_buckets = 16
    w1 = Window.partitionBy("host", "__salt").orderBy("__negpri", "depth", "seq")
    pre = (
        eligible.withColumn(
            "__salt", F.pmod(F.col("url_hash"), F.lit(salt_buckets)).cast("int")
        )
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= host_budget)
        .drop("__salt", "__r1")
    )
    w = Window.partitionBy("host").orderBy("__negpri", "depth", "seq")
    batch = (
        pre.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= host_budget)
        .drop("__rank")
    )
    if "fetch_order" in batch.columns:
        batch = batch.drop("fetch_order")
    return (
        with_dense_sequence(
            batch, order_cols=["__negpri", "depth", "seq"],
            out_col="fetch_order", start=0,
        )
        .withColumn("priority", (-F.col("__negpri")).cast("long"))
        .drop("__negpri", "indegree")
    )


def trap_stats(
    urls: DataFrame,
    url_col: str = "url",
    max_depth: int = 8,
    max_seg_repeat: int = 3,
    max_len: int = 512,
) -> DataFrame:
    """Crawler-trap gate: flag URLs whose shape indicates a spider trap —
    calendar/session loops that re-embed the same path segments
    (/a/b/a/b/a/b/...), unbounded-depth generators, or runaway URL
    lengths. Heritrix-style path heuristics; applied to CANONICALIZED
    urls (query strings are already dropped by the canonicalizer, O15),
    ideally before URL-seen insertion so a trap never occupies frontier
    budget.

    Pure Catalyst (regexp strip of scheme+host, split, higher-order-
    function segment-repeat count — O(depth^2) per url with depth <= ~20,
    all JVM codegen, zero shuffle, zero Python), so it runs as a narrow
    map over the 10^10-row frontier and has an exact SQL oracle.

    Appends: depth (path segment count), max_repeat (occurrences of the
    most repeated segment), url_len, is_trap in {1,0}.
    """
    path = F.regexp_replace(F.col(url_col), "^[a-z]+://[^/]*", "")
    segs = F.filter(F.split(path, "/"), lambda x: x != "")
    out = urls.withColumn("__segs", segs).select(
        "*",
        F.size("__segs").cast("long").alias("depth_segs"),
        F.coalesce(
            F.array_max(
                F.transform(
                    "__segs",
                    lambda s: F.size(F.filter("__segs", lambda x: x == s)),
                )
            ),
            F.lit(0),
        ).cast("long").alias("max_repeat"),
        F.length(url_col).cast("long").alias("url_len"),
    ).drop("__segs")
    return out.withColumn(
        "is_trap",
        (
            (F.col("depth_segs") > max_depth)
            | (F.col("max_repeat") >= max_seg_repeat)
            | (F.col("url_len") > max_len)
        ).cast("long"),
    )


def adaptive_host_delay(
    observations: DataFrame,
    mult: int = 3,
    min_delay_ms: int = 100,
    max_delay_ms: int = 10_000,
    round_ms: int = 1000,
) -> DataFrame:
    """Latency-adaptive politeness (engine addition): derive each host's
    crawl delay from its OBSERVED fetch latency — the standard
    production refinement of a fixed politeness window (slow servers get
    longer gaps; a host signalling distress is backed off before it
    errors). The reference's scheduler uses a fixed queue discipline
    only (see_crawler_queue.erl); robots Crawl-delay (when present)
    composes with this by taking the greater gap upstream.

    ``observations``: (host, latency_ms:int) rows from completed
    fetches.  Per host:

      p75_ms     exact interpolated 75th percentile (quartile fractions
                 are binary-exact, so any engine reproduces the double
                 bit-for-bit — the events_median convention)
      delay_ms   clamp(min_delay_ms, max_delay_ms, floor(mult * p75))
      gap_rounds ceil(delay_ms / round_ms), integer arithmetic, >= 1 —
                 feed straight into ``checkout(host_gap=...)`` like
                 robots Crawl-delay and error_backoff_gap.

    One map-side-combinable aggregate onto ~|hosts| keys; no joins. At
    10^10 URLs the observation stream is the fetch log, already
    partitioned by host."""
    agg = observations.groupBy("host").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.percentile("latency_ms", F.lit(0.75)).alias("p75_ms"),
    )
    delay = F.expr(
        f"cast(least(cast({int(max_delay_ms)} as bigint),"
        f" greatest(cast({int(min_delay_ms)} as bigint),"
        f" cast(floor({int(mult)} * p75_ms) as bigint))) as bigint)"
    )
    return agg.select(
        "host",
        "n_obs",
        "p75_ms",
        delay.alias("delay_ms"),
    ).withColumn(
        "gap_rounds",
        F.expr(
            f"greatest(cast(1 as bigint),"
            f" (delay_ms + {int(round_ms)} - 1) div {int(round_ms)})"
        ),
    )


def allocate_budget(
    weights: DataFrame,
    total_budget: int,
    host_col: str = "host",
    weight_col: str = "weight",
) -> DataFrame:
    """Integer apportionment of a global fetch budget across hosts by
    weight — Hamilton's largest-remainder method, the exact integer rule
    (no float shares, no drift): host i gets
    base_i = (total * w_i) div W, and the L = total - sum(base) leftover
    slots go to the L largest remainders ((total * w_i) mod W, ties
    host-ascending). sum(budget) == total_budget exactly, always.

    Weights are whatever the crawl values — host reputation, Good-Turing
    unseen mass, indegree — already integer in this engine. Returns
    (host, weight, budget).

    Scale shape: two scalar aggregates broadcast back (W and the
    leftover count) plus ONE distributed dense-sequence over the host
    dimension for the remainder ranking — no global window, no driver
    row data; hosts are the 10^7-10^8-row dimension, not the frontier.
    """
    from ..functions.seq import with_dense_sequence

    base_df = weights.select(
        F.col(host_col).alias("host"),
        F.col(weight_col).cast("long").alias("weight"),
    )
    tot = base_df.agg(F.sum("weight").cast("long").alias("__w"))
    t = F.lit(int(total_budget))
    shared = base_df.crossJoin(F.broadcast(tot)).select(
        "host",
        "weight",
        F.expr(f"({int(total_budget)} * weight) div __w").alias("__base"),
        F.expr(f"({int(total_budget)} * weight) % __w").alias("__rem"),
    )
    leftover = shared.agg(
        (t - F.sum("__base")).cast("long").alias("__l")
    )
    ranked = with_dense_sequence(
        shared.withColumn("__negrem", -F.col("__rem")),
        order_cols=["__negrem", "host"],
        out_col="__rank",
        start=0,
    )
    return ranked.crossJoin(F.broadcast(leftover)).select(
        "host",
        "weight",
        (
            F.col("__base")
            + F.when(F.col("__rank") < F.col("__l"), 1).otherwise(0)
        )
        .cast("long")
        .alias("budget"),
    )


def backlog_audit(
    frontier: DataFrame,
    budgets: DataFrame,
    rounds_threshold: int = 10,
) -> DataFrame:
    """Per-host frontier BACKLOG / starvation audit — the capacity check
    an operator runs before blaming politeness for slow coverage: at the
    current per-round checkout budget, how many rounds would each host's
    unvisited backlog take to drain, and which hosts are starved (drain
    time >= ``rounds_threshold`` rounds)?

    ``frontier``: rows with (host, seq, state); ``budgets``: (host,
    budget) — the apportioner's output (allocate_budget /
    allocate_budget_by_pld). Hosts with budget 0 and a non-empty backlog
    drain never; drain_rounds reports -1 for them (sentinel, keeps the
    column integer). oldest_seq is the smallest enqueue sequence still
    unvisited — a monotone age proxy (seq is the crawl's dense enqueue
    order), so a persistently small oldest_seq across audits means the
    scheduler never reaches that host's tail.

    Scale shape: one combinable aggregate over unvisited rows keyed by
    host, one broadcast-or-hash join against the host DIMENSION — the
    frontier row set shuffles once, no windows.
    """
    unv = (
        frontier.where(F.col("state") == STATE_UNVISITED)
        .groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_unvisited"),
            F.min("seq").cast("long").alias("oldest_seq"),
            F.max("seq").cast("long").alias("newest_seq"),
        )
    )
    b = budgets.select("host", F.col("budget").cast("long").alias("budget"))
    j = unv.join(b, "host", "left").select(
        "host", "n_unvisited", "oldest_seq", "newest_seq",
        F.coalesce("budget", F.lit(0)).alias("budget"),
    )
    drain = F.when(
        F.col("budget") > 0,
        F.expr("(n_unvisited + budget - 1) div budget"),
    ).otherwise(F.lit(-1))
    return j.select(
        "host", "n_unvisited", "oldest_seq", "newest_seq", "budget",
        drain.cast("long").alias("drain_rounds"),
        (
            (drain >= rounds_threshold) | (F.col("budget") <= 0)
        ).alias("is_starved"),
    )


def maxmin_fair_alloc(
    demands: DataFrame,
    total_budget: int,
    host_col: str = "host",
    demand_col: str = "demand",
) -> DataFrame:
    """Max-min fair (progressive-filling / water-filling) allocation of a
    global fetch budget across hosts by BACKLOG — the fairness-floor
    complement to ``allocate_budget``'s proportional Hamilton rule:
    small hosts are fully served first, and the remaining budget is
    leveled equally across the big ones, so no crawler-trap-sized
    backlog can starve the long tail (Bertsekas & Gallager, *Data
    Networks* §6.5.2 — the standard fair-share rule).

    Exact integer rule: sort positive demands ascending (ties
    host-ascending); host at rank r (prefix sum P_r, n positive hosts)
    is FULLY served iff P_r + d_r*(n-r) <= B (monotone in r, since
    serving the smallest first is always feasible-first). With k =
    #fully-served and S = P_k: the water level is
    L = (B - S) div (n - k), and the spare (B - S) mod (n - k) slots go
    +1 each to the first spare unsatisfied hosts in host order — so
    sum(alloc) == min(B, sum(demand)) exactly, always, and every
    unsatisfied host gets L or L+1 (both < its demand by maximality of
    k). Zero-demand hosts allocate 0.

    Scale shape: one distributed prefix sum + one dense sequence over
    the HOST dimension (both two-phase, partition-local windows only —
    never a global single-partition window), two scalar aggregates
    broadcast back. Hosts are the 10^7-row dimension, not the frontier.
    Returns (host, demand, alloc, satisfied, water_level).
    """
    from ..functions.seq import with_dense_sequence, with_prefix_sum

    base = demands.select(
        F.col(host_col).alias("host"),
        F.col(demand_col).cast("long").alias("demand"),
    )
    pos = base.where(F.col("demand") > 0)
    scal = pos.agg(F.count("*").cast("long").alias("__n"))
    ranked = with_dense_sequence(
        pos, order_cols=["demand", "host"], out_col="__r", start=1
    )
    ranked = with_prefix_sum(
        ranked, "demand", order_cols=["demand", "host"], out_col="__p"
    )
    b = F.lit(int(total_budget))
    cond = ranked.crossJoin(F.broadcast(scal)).withColumn(
        "__full",
        (F.col("__p") + F.col("demand") * (F.col("__n") - F.col("__r")) <= b),
    )
    cond = cond.localCheckpoint(eager=False)
    # k = #fully served, S = prefix at k: one scalar row broadcast back.
    ks = cond.agg(
        F.coalesce(
            F.sum(F.when(F.col("__full"), 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("__k"),
        F.coalesce(
            F.max(F.when(F.col("__full"), F.col("__p"))), F.lit(0)
        ).cast("long").alias("__s"),
        F.coalesce(F.max("demand"), F.lit(0)).cast("long").alias("__dmax"),
    )
    lev = (
        F.when(
            F.col("__n") > F.col("__k"),
            F.expr(f"({int(total_budget)} - __s) div (__n - __k)"),
        )
        .otherwise(F.col("__dmax"))
        .cast("long")
    )
    spare = (
        F.when(
            F.col("__n") > F.col("__k"),
            F.expr(f"({int(total_budget)} - __s) % (__n - __k)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    shared = cond.crossJoin(F.broadcast(ks)).withColumn(
        "__lev", lev
    ).withColumn("__spare", spare)
    full = shared.where(F.col("__full")).select(
        "host",
        "demand",
        F.col("demand").alias("alloc"),
        F.lit(True).alias("satisfied"),
        F.col("__lev").alias("water_level"),
    )
    # The spare slots go to unsatisfied hosts in HOST order, which is not
    # the (demand, host) rank order above the water line — re-rank the
    # unsatisfied slice by host alone (a second dense sequence, over the
    # strictly smaller big-host slice).
    unsat = with_dense_sequence(
        shared.where(~F.col("__full")),
        order_cols=["host"],
        out_col="__hr",
        start=1,
    ).select(
        "host",
        "demand",
        (
            F.col("__lev")
            + F.when(F.col("__hr") <= F.col("__spare"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
        F.col("__lev").alias("water_level"),
    ).withColumn(
        # a spare +1 can complete a just-above-the-line host exactly
        "satisfied", F.col("alloc") == F.col("demand")
    )
    out_pos = full.unionByName(unsat)
    zero = base.where(F.col("demand") <= 0).select(
        "host",
        "demand",
        F.lit(0).cast("long").alias("alloc"),
        F.lit(True).alias("satisfied"),
        F.lit(None).cast("long").alias("water_level"),
    )
    return out_pos.unionByName(zero)
