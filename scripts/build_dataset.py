"""End-to-end training-dataset build: the engine's curation operators
composed into the pipeline a user actually runs after a crawl.

    normalize -> quality keep/drop (lang + Gopher repetition + heuristic
    quality + CCNet perplexity) -> exact dedup (canonical per md5 group)
    -> LM sequence packing manifest

Input is either a crawl warehouse (--warehouse: the docs table's text
spans are joined to per-doc text, same expression as the crawl's
quality evidence) or a plain parquet of (doc_id, text) (--docs).
Outputs under --out:

    docs.parquet     kept, deduplicated, normalized documents
    packing.parquet  (seq_id, bucket, doc_id, tok_start, tok_end,
                     seq_off) LM packing manifest at --ctx-len

and ONE JSON line of stage counts on stdout — the dataset is
reproducible byte-for-byte from the same input (every stage is the
deterministic operator the gate checks; nothing reads clocks or
randomness).

Usage:
    python scripts/build_dataset.py --docs /root/testdata/sf0.01/documents.parquet --out /tmp/ds
    python scripts/build_dataset.py --warehouse /tmp/wh --out /tmp/ds
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def load_docs(spark, args):
    if args.warehouse:
        from see_spark.sources.catalog import SnapshotCatalog

        catalog = SnapshotCatalog(args.warehouse, spark)
        docs = catalog.read("docs")
        return docs.select(
            F.col("doc_id"),
            F.array_join(
                F.transform(
                    F.filter(F.col("spans"), lambda sp: sp["kind"] == "text"),
                    lambda sp: sp["text"],
                ),
                " ",
            ).alias("text"),
        )
    return spark.read.parquet(args.docs).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )


def build(spark, docs, ctx_len: int, ref_frac_mod: int = 7):
    """Returns (kept_docs_df, packing_df, stats_dict). Deterministic."""
    from see_spark.operators.dedup import exact_dedup
    from see_spark.operators.packing import pack_sequences
    from see_spark.operators.pipeline import corpus_quality_pipeline
    from see_spark.operators.textfilters import normalize_text

    n_in = docs.count()
    normed = (
        normalize_text(docs)
        .select("doc_id", F.col("text_norm").alias("text"))
        .persist()
    )
    # CCNet-style trusted reference slice: a deterministic salted-md5
    # doc_id bucket (the repo's engine-portable hash idiom — stable
    # across runs, partitionings, and Spark versions)
    from see_spark.operators.dedup import hash60

    ref = normed.filter(
        F.pmod(
            hash60(F.concat(F.lit("ref:"), F.col("doc_id"))),
            F.lit(ref_frac_mod),
        )
        == 0
    ).select("doc_id", "text")
    verdicts = corpus_quality_pipeline(normed, ref)
    kept_ids = verdicts.filter(F.col("keep") == 1).select("doc_id")
    kept = normed.join(kept_ids, "doc_id")
    n_kept = kept.count()

    groups = exact_dedup(kept)
    canon = kept.join(
        groups.filter(F.col("is_canonical") == 1).select("doc_id"), "doc_id"
    ).persist()
    n_unique = canon.count()

    packing = pack_sequences(canon, ctx_len=ctx_len)
    n_seqs = packing.select("bucket", "seq_id").distinct().count()
    stats = {
        "docs_in": n_in,
        "kept_after_quality": n_kept,
        "unique_after_dedup": n_unique,
        "ctx_len": ctx_len,
        "packed_sequences": n_seqs,
    }
    return canon, packing, stats


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Build a training dataset")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--warehouse", help="crawl warehouse (SnapshotCatalog root)")
    src.add_argument("--docs", help="parquet of (doc_id, text)")
    p.add_argument("--out", required=True)
    p.add_argument("--ctx-len", type=int, default=128)
    p.add_argument("--cores", type=int, default=8)
    args = p.parse_args(argv)

    from see_spark.session import get_spark

    spark = get_spark(cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_docs(spark, args)
    kept, packing, stats = build(spark, docs, args.ctx_len)
    kept.write.mode("overwrite").parquet(os.path.join(args.out, "docs.parquet"))
    packing.write.mode("overwrite").parquet(
        os.path.join(args.out, "packing.parquet")
    )
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
