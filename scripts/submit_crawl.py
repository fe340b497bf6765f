"""spark-submit entry point for the crawl engine (north rule: "launches via
spark-submit --py-files on multi-executor clusters").

Packaging + launch:

    cd /root/repo && python -c "import shutil; shutil.make_archive('/tmp/see_spark', 'zip', '.', 'see_spark')"
    spark-submit --master <cluster-url> --py-files /tmp/see_spark.zip \
        scripts/submit_crawl.py --warehouse /data/crawl --rounds 10 \
        --seeds seeds.txt --host-budget 8

No ``master`` is set here — spark-submit owns cluster topology; the same
script runs on local[N], YARN, or K8s unchanged. The session factory's
scale defaults (AQE, Arrow, shuffle sizing) still apply via --conf or the
in-code fallbacks.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Run the see_spark crawl loop")
    p.add_argument("--warehouse", required=True, help="snapshot-catalog directory")
    p.add_argument("--seeds", help="file with one seed URL per line")
    p.add_argument("--rounds", type=int, default=10)
    p.add_argument("--host-budget", type=int, default=8)
    p.add_argument("--min-gap-rounds", type=int, default=1)
    p.add_argument("--domain-filter", default=None)
    p.add_argument("--synthetic-frontier", type=int, default=0,
                   help="bootstrap a synthetic frontier of N rows instead of seeds (bench mode)")
    p.add_argument("--fetcher", choices=["synthetic", "http"], default="synthetic",
                   help="'http' = real network via RequestsFetcher; "
                        "'synthetic' = deterministic hash-derived content")
    p.add_argument("--timeout", type=float, default=10.0,
                   help="per-request timeout for --fetcher http")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from see_spark.operators.crawl import CrawlConfig, run_crawl
    from see_spark.sources.catalog import SnapshotCatalog
    from see_spark.sources.fetcher import SyntheticFetcher
    from see_spark.sources.synth import synth_frontier

    spark = SparkSession.builder.appName("see_spark_crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    catalog = SnapshotCatalog(args.warehouse, spark)
    config = CrawlConfig(
        domain_filter=args.domain_filter,
        host_budget=args.host_budget,
        min_gap_rounds=args.min_gap_rounds,
        max_rounds=args.rounds,
    )

    seeds = None
    if args.synthetic_frontier:
        n = args.synthetic_frontier
        catalog.commit(
            "frontier", synth_frontier(spark, n),
            {"round": -1, "next_seq": n, "fetched_total": 0},
        )
    elif args.seeds:
        with open(args.seeds) as fh:
            seeds = [line.strip() for line in fh if line.strip()]

    if args.fetcher == "http":
        from see_spark.sources.fetcher import RequestsFetcher

        fetcher = RequestsFetcher(timeout=args.timeout)
    else:
        # the sandbox has no network; SyntheticFetcher stands in (same
        # mapInPandas contract, see sources/fetcher.py docstring)
        fetcher = SyntheticFetcher()
    history = run_crawl(spark, catalog, fetcher, config, seeds=seeds)
    print(json.dumps([m.__dict__ for m in history]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
