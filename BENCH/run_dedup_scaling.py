"""2v8 scaling pair for the dedup + index-build legs at 10x corpus.

Round-4 closed the frontier/fetch scaling evidence but dedup_minhash_lsh
and index_build were only measured at sf0.1/local[32]; this campaign
extends the same protocol (taskset-pinned levels, fixed-equal heaps,
clean-window steal check, per-level pure-JVM calibration probe,
best-of reps, cross-level determinism) to those two legs.

Input: a deterministic 10x corpus derived from sf0.1 documents — ten
replicas, replica i's every token prefixed "r{i}" so replica shingle
spaces are disjoint (the dedup workload scales linearly instead of
exploding with cross-replica near-dup pairs; replica 0 is the original,
so all of sf0.1's intrinsic dup structure is preserved ten times).

Legs (timed regions identical at both levels):
- dedup: the gated dedup_minhash_lsh query (shingle -> 16 minhashes as
  k parallel min-aggregates -> 4-band LSH equi-join -> candidates-only
  Jaccard verify) executed by count();
- index_build: the bench's build closure (tokenize -> postings with tf
  -> parquet + word_stats increment -> parquet), fresh output dir per
  rep.

Efficiency = (T(4N)/T(N))/4 per leg; the simultaneously-measured probe
ceiling (shuffle-free chained-xxhash sum) bounds what ANY job can get
from 2->8 pinned cores on this host's memory bandwidth.

Usage: python BENCH/run_dedup_scaling.py [coresA coresB]  (default 2 8)
Writes BENCH/r5_dedup_2v8_raw.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PREP_SNIPPET = r"""
import sys
sys.path.insert(0, {repo!r})
from see_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(cores=8, app_name="prep10x")
spark.sparkContext.setLogLevel("ERROR")
base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
out = None
for i in range(10):
    r = base.select(
        (F.col("doc_id").cast("long") + i * 10_000_000).alias("doc_id"),
        (F.regexp_replace("text", r"(\S+)", f"r{{i}}$1") if i
         else F.col("text")).alias("text"),
        "lang", "source", "n_chars",
    )
    out = r if out is None else out.unionByName(r)
out.coalesce(8).write.mode("overwrite").parquet(
    {docs_dir!r} + "/documents.parquet")
print("PREP_OK")
"""

LEVEL_SNIPPET = r"""
import hashlib, json, os, sys, tempfile, time
sys.path.insert(0, {repo!r})
from see_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark(cores={cores}, app_name="dedup_scaling")
spark.sparkContext.setLogLevel("ERROR")
import bench
import __spark_entry__ as entry

# warm-up (JIT + Python workers) so rep 1 isn't charged for spin-up
from see_spark.functions.udfs import tokenize_udf
spark.range(1000).select(tokenize_udf(F.lit("warm up words")).alias("w")).count()

steal0 = bench._cpu_steal_snapshot()
cal = bench._calibration(spark, {cores})

docs_dir = {docs_dir!r}
n_docs = spark.read.parquet(docs_dir + "/documents.parquet").count()

dedup_runs = []
pairs_digest = None
for _ in range(2):
    t0 = time.perf_counter()
    df = entry.queries()["dedup_minhash_lsh"](spark, docs_dir)
    n_pairs = df.count()
    dedup_runs.append(round(time.perf_counter() - t0, 3))
# determinism evidence: the pair set itself, level-independent
rows = sorted((r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
              for r in entry.queries()["dedup_minhash_lsh"](
                  spark, docs_dir).collect())
pairs_digest = hashlib.md5(repr(rows).encode()).hexdigest()

from see_spark.operators.indexer import word_stats_increment
build_runs = []
n_postings = None
for _ in range(3):
    out = tempfile.mkdtemp(prefix="see_scale_idx_")
    t0 = time.perf_counter()
    postings = entry._doc_postings(spark, docs_dir).withColumn(
        "tf", F.col("term_count") / F.col("doc_len"))
    postings.write.mode("overwrite").parquet(f"{{out}}/postings")
    p = spark.read.parquet(f"{{out}}/postings")
    word_stats_increment(p.select("word", "doc_id")).write.mode(
        "overwrite").parquet(f"{{out}}/word_stats")
    build_runs.append(round(time.perf_counter() - t0, 3))
    if n_postings is None:
        n_postings = p.count()
    import shutil; shutil.rmtree(out, ignore_errors=True)

print(json.dumps({{
    "cores": {cores},
    "n_docs": n_docs,
    "calibration": cal,
    "steal_frac": bench._cpu_steal_frac(steal0),
    "dedup": {{"all_secs": dedup_runs, "sec": min(dedup_runs),
               "n_pairs": n_pairs, "pairs_digest": pairs_digest,
               "docs_per_sec": round(n_docs / min(dedup_runs))}},
    "index_build": {{"all_secs": build_runs, "sec": min(build_runs),
                     "n_postings": n_postings,
                     "docs_per_sec": round(n_docs / min(build_runs))}},
}}))
"""


def _pin(cores: int) -> list:
    if os.environ.get("SEE_PROFILE_NO_PIN") == "1":
        return []
    return ["taskset", "-c", f"0-{cores - 1}"]


def _run(cmd, env=None, timeout=5400):
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, env=env,
        timeout=timeout,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") or line == "PREP_OK":
            return line
    raise RuntimeError(f"no JSON from {cmd[:3]}: {out.stderr[-2000:]}")


def main():
    cores_a = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cores_b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    docs_dir = "/tmp/see_docs10x"

    prep = PREP_SNIPPET.format(repo=REPO, docs_dir=docs_dir)
    _run([sys.executable, "-c", prep])

    env = dict(os.environ)
    # fixed-equal heaps at both levels (the campaign's control variable;
    # 8 GiB is ample for this input — no GC starvation at either level)
    env.setdefault("SEE_SPARK_DRIVER_MEM", "8g")

    levels = {}
    for cores in (cores_a, cores_b):
        code = LEVEL_SNIPPET.format(repo=REPO, cores=cores, docs_dir=docs_dir)
        levels[cores] = json.loads(
            _run(_pin(cores) + [sys.executable, "-c", code], env=env)
        )
        print(f"local[{cores}]: {json.dumps(levels[cores])}", file=sys.stderr)

    a, b = levels[cores_a], levels[cores_b]
    factor = cores_b / cores_a
    result = {
        "input": {"corpus": "sf0.1 documents x10 (disjoint shingle replicas)",
                  "n_docs": a["n_docs"]},
        "cores": [cores_a, cores_b],
        "levels": levels,
        "probe_ceiling": round(
            b["calibration"]["probe_rows_per_sec"]
            / a["calibration"]["probe_rows_per_sec"] / factor, 3),
        "dedup_efficiency": round(
            b["dedup"]["docs_per_sec"] / a["dedup"]["docs_per_sec"] / factor, 3),
        "index_efficiency": round(
            b["index_build"]["docs_per_sec"]
            / a["index_build"]["docs_per_sec"] / factor, 3),
        "determinism_pairs_match":
            a["dedup"]["pairs_digest"] == b["dedup"]["pairs_digest"],
    }
    print(json.dumps(result))

    md = os.path.join(REPO, "BENCH", "r5_dedup_2v8_raw.md")
    with open(md, "w") as fh:
        fh.write("# r5: dedup + index-build 2v8 pair at 10x corpus\n\n")
        fh.write("```json\n" + json.dumps(result, indent=1) + "\n```\n")
    print(f"wrote {md}", file=sys.stderr)


if __name__ == "__main__":
    main()
