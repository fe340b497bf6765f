"""Host parallel-ceiling probe for the scaling-efficiency analysis.

Runs a shuffle-free, embarrassingly parallel, pure-JVM Spark job — hash +
arithmetic over ``spark.range`` partitions, one scalar per partition to the
final tiny agg; no Python workers, no disk, no shuffle of row data — at
several core counts, each in a fresh JVM. This job has NO plan property
that can limit scaling: whatever efficiency it loses between N and 4N is
the machine's ceiling (shared memory bus, CPU steal, SMT siblings), not
the pipeline's. Its N->4N efficiency therefore upper-bounds what ANY Spark
job can show on this host, and is the yardstick BENCH/BASELINE.md compares
the crawl pipeline against.

Usage: python BENCH/cpu_ceiling.py [rows_per_core_millions] [cores...]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from see_spark.session import get_spark
from pyspark.sql import functions as F

cores = {cores}
rows = {rows}
spark = get_spark(cores=cores)
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(0, rows, 1, cores * 4)
# warm-up: JIT + codegen (modulo keeps the SUM inside long range)
df.limit(1000).select(F.sum(F.xxhash64("id") % 1000003)).collect()
best = None
for _ in range(2):
    t0 = time.perf_counter()
    # 4 chained hashes + arithmetic per row, one long per partition out
    expr = F.xxhash64(F.xxhash64(F.xxhash64(F.xxhash64("id"))))
    out = df.select(F.sum(expr % 1000003).alias("s")).collect()[0]["s"]
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({{"cores": cores, "sec": round(best, 3),
                   "rows_per_sec": round(rows / best)}}))
"""


def main():
    rows_per_core_m = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    cores_list = [int(c) for c in sys.argv[2:]] or [2, 8, 32]
    results = {}
    for cores in cores_list:
        # fixed TOTAL work across levels (strong scaling, like the bench)
        rows = rows_per_core_m * 1_000_000 * max(cores_list)
        code = SNIPPET.format(repo=REPO, cores=cores, rows=rows)
        # Same core-pinning as profile_scaling.py: an N-core level is an
        # honest N-core machine (JVM + GC threads confined), so the
        # ceiling and the pipeline are measured on the same machine model.
        cmd = [sys.executable, "-c", code]
        if os.environ.get("SEE_PROFILE_NO_PIN") != "1":
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        out = subprocess.run(
            cmd, capture_output=True, text=True,
            cwd=REPO, timeout=1800,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.strip().startswith("{")]
        if not line:
            raise RuntimeError(f"ceiling probe at {cores} failed: {out.stderr[-1500:]}")
        results[cores] = json.loads(line[-1])
        print(f"local[{cores}]: {results[cores]}", file=sys.stderr)
    effs = {}
    pairs = [(a, b) for a in cores_list for b in cores_list if b == 4 * a]
    for a, b in pairs:
        effs[f"{a}v{b}"] = round(
            results[b]["rows_per_sec"] / results[a]["rows_per_sec"] / 4, 3
        )
    print(json.dumps({"per_level": results, "ceiling_efficiency": effs}))


if __name__ == "__main__":
    main()
