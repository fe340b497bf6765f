"""Benchmark harness: headline throughput at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "throughput": {...}}

Sections:
- frontier scheduling throughput (the north-rule headline): bloom-prefiltered
  URL-seen dedup + politeness checkout over a lazily synthesized skewed
  frontier — URLs scheduled+deduped/sec;
- fetch+parse throughput: one full crawl round over the synthetic fetcher —
  fetched-docs/sec;
- representative analytics queries from __spark_entry__ at the given SF.

Config via env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SEE_BENCH_FRONTIER_N (default 2_000_000),
SEE_BENCH_CRAWL_N (default min(frontier/4, 500k)), SEE_BENCH_REPS
(timed reps per throughput leg, default 2), SEE_BENCH_SKIP_QUERIES=1
(throughput legs only).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def _cpu_steal_snapshot():
    """(steal_ticks, total_ticks) from /proc/stat; None off-Linux."""
    try:
        with open("/proc/stat") as fh:
            vals = [int(x) for x in fh.readline().split()[1:9]]
        return vals[7], sum(vals)
    except (OSError, ValueError, IndexError):
        return None


def _cpu_steal_frac(t0) -> float:
    t1 = _cpu_steal_snapshot()
    if t0 is None or t1 is None or t1[1] <= t0[1]:
        return -1.0
    return round((t1[0] - t0[0]) / (t1[1] - t0[1]), 4)


def _calibration(spark, cpus: int) -> dict:
    """Ambient-load calibration for cross-round comparability: this sandbox
    is a shared host with 2-3x run-to-run swings (BENCH/BASELINE.md), so a
    raw wall-clock comparison between rounds mostly measures the
    measurement window. Two normalizers are recorded:

    - loadavg (1/5/15 min) at bench time;
    - a ~2 s inline cpu-ceiling micro-probe (the BENCH/cpu_ceiling.py job:
      shuffle-free pure-JVM chained-hash sum — no plan property can limit
      it, so its rows/sec tracks how much of the machine this process
      actually got). Dividing a round's throughput numbers by its
      probe_rows_per_sec cancels ambient contention to first order.
    """
    from pyspark.sql import functions as F

    rows = 40_000_000
    df = spark.range(0, rows, 1, cpus * 4)
    expr = F.xxhash64(F.xxhash64(F.xxhash64(F.xxhash64("id"))))
    df.limit(1000).select(F.sum(expr % 1000003)).collect()  # JIT warm-up
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        df.select(F.sum(expr % 1000003)).collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return {
        "probe_rows": rows,
        "probe_sec": round(best, 3),
        "probe_rows_per_sec": round(rows / best),
    }


def setup_frontier_leg(spark, n_frontier: int, n_candidates: int):
    """Untimed input creation for the frontier leg (shared by bench and
    BENCH/profile_scaling.py so both time exactly the same region)."""
    from see_spark.sources.synth import synth_candidates, synth_frontier

    frontier = synth_frontier(spark, n_frontier).localCheckpoint(eager=True)
    cands = synth_candidates(spark, n_candidates, n_frontier).localCheckpoint(
        eager=True
    )
    return frontier, cands


def run_frontier_leg(spark, frontier, cands, n_frontier: int):
    """One timed execution: candidates -> sharded-bloom pre-filter -> exact
    anti-join -> within-batch dedup -> stamp dense seq -> per-host budget
    checkout window. Returns the checked-out batch size."""
    from pyspark.sql import functions as F

    from see_spark.functions import bloom as bloomlib
    from see_spark.operators import frontier as fops

    # sharded bloom: bitmaps are built and merged executor-side and meet
    # candidates in a cogroup — no driver-side OR-merge (which is a fixed
    # serial cost that caps scaling efficiency; see SCALE.md §3/§8)
    n_shards = 64
    bits_per_shard = max(1 << 16, bloomlib.bits_for(n_frontier) // n_shards)
    shard_bitmaps = bloomlib.build_bloom_shards(
        frontier.select("url_hash"),
        n_shards=n_shards, bits_per_shard=bits_per_shard,
    )
    fresh = fops.dedup_within_batch(
        bloomlib.seen_filter_sharded(
            cands, frontier, shard_bitmaps,
            n_shards=n_shards, bits_per_shard=bits_per_shard,
        ),
        "link_rank",
    )
    batch = fops.checkout(
        frontier.unionByName(
            fops.as_frontier_rows(
                fresh, F.col("parent_depth") + 1, 1, n_frontier
            )
        ),
        spark.createDataFrame([], "host string, last_fetch_round int, fetched_total long"),
        round_no=1,
        host_budget=8,   # realistic politeness budget, not drain-the-frontier
    )
    return batch.count()


def _reps() -> int:
    """Timed reps per throughput leg (best-of). Default 2; the 10x-input
    scaling campaign sets SEE_BENCH_REPS=1 — at ~2M fetched docs per rep
    a second rep doubles an already hour-scale pinned 8-core leg, and the
    JIT/worker warm-up the second rep exists to shed is already covered
    by the preceding warm-up query + frontier leg."""
    return max(1, int(os.environ.get("SEE_BENCH_REPS", "2")))


def bench_frontier_scheduling(spark, n_frontier: int, n_candidates: int, reps: int = None):
    """URLs scheduled+deduped/sec. Best of ``reps`` runs (this sandbox is a
    shared host with nonzero CPU steal; best-of is the standard
    steady-state estimator there — both reps are full, honest executions
    of the same DAG)."""
    if reps is None:
        reps = _reps()
    frontier, cands = setup_frontier_leg(spark, n_frontier, n_candidates)
    runs = [
        _timed(lambda: run_frontier_leg(spark, frontier, cands, n_frontier))
        for _ in range(reps)
    ]
    sec, n_batch = min(runs, key=lambda r: r[0])
    return {
        "sec": round(sec, 3),
        "all_secs": [round(s, 3) for s, _ in runs],
        # urls_in candidates are ALL scheduled (deduped + seq-stamped into
        # the frontier); checked_out_batch is the politeness-bounded slice
        # the round would then fetch (budget x hosts)
        "urls_in": n_candidates,
        "checked_out_batch": n_batch,
        "urls_per_sec": round(n_candidates / sec),
    }


def bench_index_and_search(spark, sf_dir: str, n_queries: int = 8):
    """Index BUILD vs search QUERY, timed separately (r3 verdict: the old
    tfidf_search headline re-derived postings from raw documents per run,
    conflating the write path with the read path the reference's /search
    actually serves).

    Build: tokenize -> postings(tf precomputed) + word_stats df deltas,
    materialized to parquet — the per-round index-maintenance cost.
    Query: ``search()`` over the MATERIALIZED tables only (postings +
    word_stats + page count), ``n_queries`` distinct conjunctive queries
    — raw documents and the tokenizer are never touched.
    """
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from see_spark.operators.indexer import word_stats_increment
    from see_spark.operators.search import search

    out = tempfile.mkdtemp(prefix="see_bench_idx_")
    # page count is search()'s IDF input, not index-build work — untimed
    n_docs = entry._documents(spark, sf_dir).count()

    def build():
        postings = entry._doc_postings(spark, sf_dir).withColumn(
            "tf", F.col("term_count") / F.col("doc_len")
        )
        postings.write.mode("overwrite").parquet(f"{out}/postings")
        p = spark.read.parquet(f"{out}/postings")
        word_stats_increment(p.select("word", "doc_id")).write.mode(
            "overwrite"
        ).parquet(f"{out}/word_stats")

    build_sec, _ = _timed(build)

    postings = spark.read.parquet(f"{out}/postings")
    word_stats = spark.read.parquet(f"{out}/word_stats")
    docs = entry._documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("source").alias("title"),
    )
    # distinct conjunctive queries over common corpus words so each run
    # exercises the same shape as the reference's /search endpoint
    query_strings = [
        "table join query",
        "index scan filter",
        "data system time",
        "query plan cost",
        "join order table",
        "scan index data",
        "filter time plan",
        "cost system query",
    ][:n_queries]

    def run_all():
        total_rows = 0
        for q in query_strings:
            total_rows += search(
                spark, q, postings, docs, n_docs, word_stats=word_stats
            ).count()
        return total_rows

    runs = [_timed(run_all) for _ in range(_reps())]  # best-of, note above
    qsec, total_rows = min(runs, key=lambda r: r[0])
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    return {
        "build_sec": round(build_sec, 3),
        "query_sec": round(qsec, 3),
        "query_all_secs": [round(s, 3) for s, _ in runs],
        "n_queries": len(query_strings),
        "per_query_sec": round(qsec / len(query_strings), 4),
        "n_docs": n_docs,
        "result_rows": total_rows,
    }


def crawl_config():
    from see_spark.operators.crawl import CrawlConfig

    return CrawlConfig(host_budget=50, use_bloom=True, bloom_bits=1 << 24)


def setup_crawl_leg(spark, n_frontier: int, n_hosts: int):
    """Untimed input-table creation for the crawl-round leg: the metric is
    fetched-docs/sec over checkout->fetch->parse->index->commit, and
    charging the synthetic frontier's initial write to it both dilutes the
    number and mixes a second scaling profile in."""
    from see_spark.sources.catalog import SnapshotCatalog
    from see_spark.sources.synth import synth_frontier

    catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="see_bench_"), spark)
    frontier = synth_frontier(spark, n_frontier, n_hosts=n_hosts)
    catalog.commit(
        "frontier", frontier,
        {"round": -1, "next_seq": n_frontier, "fetched_total": 0},
    )
    return catalog


def run_crawl_leg(spark, catalog):
    """One timed full round against a prepared catalog."""
    from see_spark.operators.crawl import run_round
    from see_spark.sources.fetcher import SyntheticFetcher

    return run_round(
        spark, catalog, SyntheticFetcher(), crawl_config(), round_no=0
    )


def bench_crawl_round(spark, n_frontier: int, n_hosts: int | None = None):
    """fetched-docs/sec over one full round: checkout -> synthetic fetch ->
    route -> parse spans -> postings -> link discovery -> commits.

    ``n_hosts`` scales the fetched-batch size (budget x hosts) with the
    frontier so bigger runs do proportionally more fetch/parse/index work
    instead of just scanning a bigger frontier."""
    if n_hosts is None:
        n_hosts = max(2000, n_frontier // 125)

    catalogs = [
        setup_crawl_leg(spark, n_frontier, n_hosts) for _ in range(_reps())
    ]  # fresh catalog per rep
    runs = [
        _timed(lambda c=c: run_crawl_leg(spark, c)) for c in catalogs
    ]  # best-of-N, see scheduling note
    sec, metrics = min(runs, key=lambda r: r[0])
    return {
        "sec": round(sec, 3),
        "all_secs": [round(s, 3) for s, _ in runs],
        "fetched": metrics.checked_out,
        "discovered": metrics.discovered,
        "docs_per_sec": round(metrics.checked_out / sec),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    frontier_n = int(os.environ.get("SEE_BENCH_FRONTIER_N", "2000000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from see_spark.session import get_spark

    spark = get_spark(cores=cpus, app_name="see_bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    # warm up executors + Python UDF workers so the first timed query isn't
    # charged for JVM/worker startup
    from pyspark.sql import functions as F
    from see_spark.functions.udfs import tokenize_udf

    spark.range(1000).select(
        tokenize_udf(F.lit("warm up words")).alias("w")
    ).count()

    load_before = os.getloadavg()
    steal_t0 = _cpu_steal_snapshot()
    calibration = _calibration(spark, cpus)

    skip_queries = os.environ.get("SEE_BENCH_SKIP_QUERIES") == "1"
    all_queries = entry.queries()
    headline = [] if skip_queries else [
        "tokenize_postings",
        "frontier_checkout_window",
        "url_seen_anti_join",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "knn_bruteforce",   # exact baseline (broadcast query scan)
        "knn_ivf",          # the bucketed scale path headlines alongside
        "events_sessionize",
        "tpch_pricing_summary",
    ]
    query_secs = {}
    query_all_secs = {}
    for name in headline:
        fn = all_queries[name]
        # count() forces full execution without driver-side row transfer.
        # Best-of _reps() like the throughput legs: a single-run timing
        # cannot tell one GC pause or co-tenant blip from a real plan
        # regression (r4's tokenize_postings 1.59->3.21 s scare was
        # exactly that — the r5 best-of re-measure put it back in line).
        runs = [
            _timed(lambda: fn(spark, sf_dir).count())[0]
            for _ in range(_reps())
        ]
        query_secs[name] = round(min(runs), 3)
        query_all_secs[name] = [round(s, 3) for s in runs]

    index = None
    if not skip_queries:
        # build vs query split: tfidf_search reports the READ path only
        # (materialized postings + word_stats); the build is its own line
        index = bench_index_and_search(spark, sf_dir)
        query_secs["tfidf_search"] = index["query_sec"]
        query_secs["index_build"] = index["build_sec"]

    sched = bench_frontier_scheduling(spark, frontier_n, frontier_n // 2)
    crawl_n = int(os.environ.get("SEE_BENCH_CRAWL_N", str(min(frontier_n // 4, 500_000))))
    crawl = bench_crawl_round(spark, crawl_n)

    total = round(sum(query_secs.values()) + sched["sec"] + crawl["sec"], 3)
    result = {
        "metric": "frontier URLs scheduled+deduped/sec; fetched-docs/sec; headline query secs",
        "value": total,
        "unit": "sec",
        "queries": query_secs,
        # every rep behind each best-of number, for regression triage
        "query_all_secs": query_all_secs,
        "sf": sf,
        "cpus": cpus,
        "throughput": {
            "frontier_urls_per_sec": sched["urls_per_sec"],
            "frontier_detail": sched,
            "fetch_docs_per_sec": crawl["docs_per_sec"],
            "fetch_detail": crawl,
        },
        # build/query split for the search read path (r4): tfidf_search
        # in "queries" is query_sec (n_queries conjunctive searches over
        # materialized postings+word_stats); index_build is the write path
        "index_search": index,
        # ambient-load normalizers (see _calibration docstring): compare
        # rounds via throughput / calibration.probe_rows_per_sec, not raw
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
        # hypervisor steal over the whole bench window: the co-tenant
        # contention loadavg cannot see (loadavg counts only this VM's
        # runnables). >~5% marks the window contaminated.
        "steal_frac": _cpu_steal_frac(steal_t0),
        "calibration": calibration,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
