"""Per-operator task-CPU breakdown from Spark event logs.

Companion to profile_scaling.py: groups every stage's summed executor run
time by the stage's physical-operator scope signature (from RDD Info
scopes), so the two parallelism levels can be compared operator-by-
operator — which is how the r3 work-inflation finding was isolated
(per-task run time FLAT while task count x4 => fixed per-task overhead
dominates at small per-task data; see ATTRIBUTION_r3.md).

Usage: python BENCH/stage_breakdown.py <eventlog_v2_dir> [<dir2> ...]
(each dir is the per-app directory Spark 4 writes under spark.eventLog.dir)
"""

from __future__ import annotations

import collections
import glob
import json
import os
import re
import sys


def scopes(stage_info: dict) -> tuple:
    names = []
    for rdd in stage_info.get("RDD Info", []):
        raw = rdd.get("Scope")
        if raw:
            try:
                names.append(json.loads(raw).get("name", ""))
            except Exception:
                pass
    out = []
    for n in names:
        n = re.sub(r"\s+\(.*\)$", "", n)
        if n and n not in out:
            out.append(n)
    return tuple(sorted(set(out)))


def breakdown(app_dir: str) -> dict:
    stage_sig = {}
    task_agg = collections.defaultdict(lambda: [0, 0.0, 0.0])
    for path in sorted(glob.glob(os.path.join(app_dir, "events_*"))) or [app_dir]:
        with open(path) as fh:
            for line in fh:
                ev = json.loads(line)
                kind = ev.get("Event")
                if kind in (
                    "SparkListenerStageSubmitted",
                    "SparkListenerStageCompleted",
                ):
                    si = ev["Stage Info"]
                    stage_sig[si["Stage ID"]] = scopes(si)
                elif kind == "SparkListenerTaskEnd":
                    m = ev.get("Task Metrics") or {}
                    agg = task_agg[ev["Stage ID"]]
                    agg[0] += 1
                    agg[1] += m.get("Executor Run Time", 0) / 1000.0
                    # CPU is ns; run is ms. run >> cpu means the task
                    # thread was BLOCKED (python worker wait, disk I/O,
                    # lock), not computing — the discriminator between
                    # "machine ceiling" and "waiting on something".
                    agg[2] += m.get("Executor CPU Time", 0) / 1e9
    by_sig = collections.defaultdict(lambda: [0, 0.0, 0.0, 0])
    for sid, (n, sec, cpu) in task_agg.items():
        agg = by_sig[stage_sig.get(sid, ("?",))]
        agg[0] += n
        agg[1] += sec
        agg[2] += cpu
        agg[3] += 1
    return by_sig


def main():
    for app_dir in sys.argv[1:]:
        print(f"==== {app_dir}")
        by_sig = breakdown(app_dir)
        for sig, (n, sec, cpu, st) in sorted(
            by_sig.items(), key=lambda kv: -kv[1][1]
        )[:20]:
            label = ",".join(sig)[:95]
            per_task = sec / n if n else 0.0
            cpu_frac = cpu / sec if sec else 0.0
            print(
                f"{sec:9.1f}s {cpu_frac:4.0%}cpu {n:5d}t {st:3d}st "
                f"{per_task:7.3f}s/t  {label}"
            )


if __name__ == "__main__":
    main()
