"""Scaling-efficiency evidence (BASELINE.md protocol).

The north rule's two-cluster-size criterion (throughput efficiency >= 0.8
from N to 4N executors) cannot use a real cluster in this sandbox, so per
the driver instruction it is evidenced as the SAME job at two parallelism
levels — local[8] vs local[32] — on identical input, reporting throughput
at both plus efficiency = T(4N) / (4 * T(N)) where T is throughput
(urls/sec), i.e. speedup/4.

Also captures the determinism contract: the fixture-site crawl's visit
order and URL-seen set must be byte-identical at both parallelism levels
(each run in its own JVM/process).

Writes BENCH/BASELINE.md. Usage: python BENCH/run_scaling.py [frontier_n]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CRAWL_SNIPPET = r"""
import json, sys, tempfile
sys.path.insert(0, {repo!r})
from see_spark.session import get_spark
from see_spark.sources.catalog import SnapshotCatalog
from see_spark.sources.fixtures import fixture_site, fixture_robots, SEED_URLS, DOMAIN_FILTER
from see_spark.sources.fetcher import FixtureFetcher
from see_spark.operators.crawl import CrawlConfig, run_crawl

spark = get_spark(cores={cores})
spark.sparkContext.setLogLevel("ERROR")
cat = SnapshotCatalog(tempfile.mkdtemp(), spark)
cfg = CrawlConfig(domain_filter=DOMAIN_FILTER, host_budget=2, max_rounds=30)
run_crawl(spark, cat, FixtureFetcher(spark, fixture_site()), cfg,
          seeds=SEED_URLS, robots=fixture_robots())
rows = cat.read("frontier").collect()
visit = [r["url"] for r in sorted((r for r in rows if r["fetch_order"] is not None),
                                  key=lambda r: r["fetch_order"])]
seen = sorted(r["url"] for r in rows)
print(json.dumps({{"visit_order": visit, "seen": seen}}))
"""


def run_bench(cores: int, frontier_n: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SEE_BENCH_FRONTIER_N=str(frontier_n),
        SPARK_GRAFT_SF_DIR=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ),
    )
    # JVM heap: fixed 8 GiB at every level for the standard 2M/500k
    # campaign input. Two measured regimes (BENCH/ATTRIBUTION_r3.md cause
    # 4 + the round-3 A/B): at 4x input a fixed 8 GiB starves the 32-thread
    # level (8x GC), but at campaign size a 32 GiB heap is itself 1.7x
    # SLOWER than 8 GiB at local[32] (3196 vs 5338 docs/s, clean windows —
    # big-heap G1 geometry + page-fault cost, which 4 real 8 GiB executors
    # would not pay). Opt into 1 GiB/core scaling for big inputs with
    # SEE_SCALE_HEAP=1.
    if os.environ.get("SEE_SCALE_HEAP") == "1":
        env.setdefault("SEE_SPARK_DRIVER_MEM", f"{max(8, cores)}g")
    else:
        env.setdefault("SEE_SPARK_DRIVER_MEM", "8g")
    out = subprocess.run(
        _pin(cores) + [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO,
        # 10x-input campaigns exceed an hour on the pinned N-core leg;
        # default stays 1h for the standard 2M/500k input
        timeout=int(os.environ.get("SEE_SCALE_TIMEOUT", "3600")),
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench at {cores} cores produced no JSON: {out.stderr[-2000:]}")


def _pin(cores: int) -> list:
    """taskset prefix confining the level's whole process tree (JVM task
    threads, Python workers, GC/shuffle threads) to exactly N physical
    cores. Unpinned, local[N] borrows the host's other idle cores for
    Python workers and GC — an "N-core" level with up to 32 cores of real
    compute, flattering N and understating N->4N efficiency. A real
    N-core executor has no neighbors to borrow (see ATTRIBUTION_r3.md)."""
    if os.environ.get("SEE_PROFILE_NO_PIN") == "1":
        return []
    return ["taskset", "-c", f"0-{cores - 1}"]


def run_crawl_order(cores: int) -> dict:
    code = CRAWL_SNIPPET.format(repo=REPO, cores=cores)
    out = subprocess.run(
        _pin(cores) + [sys.executable, "-c", code], capture_output=True,
        text=True, cwd=REPO, timeout=1800,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"crawl at {cores} cores produced no JSON: {out.stderr[-2000:]}")


def main():
    frontier_n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n4_cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    results = {}
    for cores in (n_cores, n4_cores):
        results[cores] = run_bench(cores, frontier_n)
        print(f"local[{cores}]: {json.dumps(results[cores]['throughput'])}")

    t8 = results[n_cores]["throughput"]
    t32 = results[n4_cores]["throughput"]
    eff_sched = (t32["frontier_urls_per_sec"] / t8["frontier_urls_per_sec"]) / 4
    eff_fetch = (t32["fetch_docs_per_sec"] / t8["fetch_docs_per_sec"]) / 4

    orders = {}
    for cores in (n_cores, n4_cores):
        orders[cores] = run_crawl_order(cores)
    order_match = orders[n_cores]["visit_order"] == orders[n4_cores]["visit_order"]
    seen_match = orders[n_cores]["seen"] == orders[n4_cores]["seen"]

    md = f"""# BENCH/BASELINE — measured results

Protocol: BASELINE.md — same job, two parallelism levels (local[{n_cores}] = N,
local[{n4_cores}] = 4N), identical input (synthetic frontier n={frontier_n:,},
seeded; candidates = n/2 with 50% overlap). Each level runs in its own JVM.
Efficiency = T(4N) / (4 x T(N)), T = throughput.

## Frontier scheduling (URLs scheduled+deduped/sec)

| cores | urls/sec | wall sec |
|---|---|---|
| {n_cores} (N) | {t8['frontier_urls_per_sec']:,} | {t8['frontier_detail']['sec']} |
| {n4_cores} (4N) | {t32['frontier_urls_per_sec']:,} | {t32['frontier_detail']['sec']} |

**Scaling efficiency: {eff_sched:.2f}** (target >= 0.8)

## Fetch+parse (fetched-docs/sec, full crawl round)

| cores | docs/sec | fetched | wall sec |
|---|---|---|---|
| {n_cores} (N) | {t8['fetch_docs_per_sec']:,} | {t8['fetch_detail']['fetched']:,} | {t8['fetch_detail']['sec']} |
| {n4_cores} (4N) | {t32['fetch_docs_per_sec']:,} | {t32['fetch_detail']['fetched']:,} | {t32['fetch_detail']['sec']} |

**Scaling efficiency: {eff_fetch:.2f}** (target >= 0.8)

## Determinism across parallelism (north-rule correctness gate)

Fixture-site crawl in separate processes at local[{n_cores}] and local[{n4_cores}]:
- visit order byte-identical: **{order_match}** ({len(orders[n_cores]['visit_order'])} visits)
- URL-seen set identical: **{seen_match}** ({len(orders[n_cores]['seen'])} URLs)
"""
    if results[n4_cores]["queries"]:
        md += f"\n## Headline queries (sec, sf={results[n4_cores]['sf']})\n\n"
        md += f"| query | local[{n_cores}] | local[{n4_cores}] |\n|---|---|---|\n"
        for name in results[n4_cores]["queries"]:
            md += (
                f"| {name} | {results[n_cores]['queries'][name]} "
                f"| {results[n4_cores]['queries'][name]} |\n"
            )
    md += "\nRaw JSON:\n\n```json\n"
    md += json.dumps({str(k): v for k, v in results.items()}, indent=2)
    md += "\n```\n"

    # raw per-run output; the curated BENCH/BASELINE.md merges campaigns
    out_path = os.path.join(REPO, "BENCH", f"BASELINE_{n_cores}v{n4_cores}_raw.md")
    with open(out_path, "w") as fh:
        fh.write(md)
    print(f"wrote {out_path}")
    print(
        f"sched_eff={eff_sched:.2f} fetch_eff={eff_fetch:.2f} "
        f"order_match={order_match} seen_match={seen_match}"
    )


if __name__ == "__main__":
    main()
