"""End-to-end dataset build (scripts/build_dataset.py): stage
composition, dedup actually fires, determinism across runs, and the
warehouse-mode span-text extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from scripts.build_dataset import build, load_docs

GOOD = (
    "the quick brown fox jumps over a lazy dog and then wanders to the "
    "river of calm water where it drinks and rests in the afternoon sun "
    "while birds sing softly in the trees above the meadow full of life"
)


def _docs(spark):
    rows = (
        [(f"g{i}", GOOD + f" variant{i}") for i in range(8)]
        # exact duplicates of one kept doc (dedup must collapse to 1)
        + [("dup1", GOOD + " variant0"), ("dup2", GOOD + " variant0")]
        # junk: too short / repetitive (quality gate must drop)
        + [("junk1", "spam spam spam spam spam spam"), ("junk2", "x y")]
    )
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_stages_compose_and_dedup_fires(spark):
    kept, packing, stats = build(spark, _docs(spark), ctx_len=32)
    assert stats["docs_in"] == 12
    # quality keeps the prose family, drops the junk
    assert 8 <= stats["kept_after_quality"] <= 10
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert not {"junk1", "junk2"} & ids
    # the three byte-identical copies collapse to the canonical min id —
    # lexicographic on string doc_ids, so "dup1" < "dup2" < "g0" survives
    assert stats["unique_after_dedup"] == stats["kept_after_quality"] - 2
    assert len({"dup1", "dup2", "g0"} & ids) == 1
    assert "dup1" in ids
    # packing covers every kept token exactly once per doc
    tok_total = kept.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).collect()[0]["n"]
    packed_total = packing.select(
        F.sum(F.col("tok_end") - F.col("tok_start")).alias("n")
    ).collect()[0]["n"]
    assert packed_total == tok_total
    assert stats["packed_sequences"] >= 1


def test_build_is_deterministic(spark):
    a_kept, _, a_stats = build(spark, _docs(spark), ctx_len=32)
    b_kept, _, b_stats = build(spark, _docs(spark).repartition(5), ctx_len=32)
    assert a_stats == b_stats
    assert sorted(r["doc_id"] for r in a_kept.collect()) == sorted(
        r["doc_id"] for r in b_kept.collect()
    )


def test_warehouse_mode_extracts_span_text(spark, crawl_result):
    catalog, _, oracle = crawl_result

    class _Args:
        warehouse = catalog.root
        docs = None

    docs = load_docs(spark, _Args())
    got = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got  # fixture crawl produced documents
    for url, doc in oracle.docs.items():
        expected = " ".join(s[1] for s in doc["spans"] if s[0] == "text")
        assert got[url] == expected
