"""CDC chunking: boundary shift-resistance (the property that justifies
content-defined over fixed-size), chunk reassembly, audit arithmetic;
term drift: overrepresented terms surface with exact counts."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from see_spark.operators.cdc import cdc_chunk_table, cdc_dedup_audit
from see_spark.operators.textstats import term_drift

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen green "
    "bottles hang on the wall and the rain in spain falls mainly on the plain"
)


def _chunks(spark, texts, **kw):
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = {}
    for r in cdc_chunk_table(df, **kw).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["start"], r["length"], r["chunk_hash"])
        )
    for v in out.values():
        v.sort()
    return out


def test_chunks_reassemble_exactly(spark):
    got = _chunks(spark, [(1, BASE)])
    spans = got[1]
    assert spans[0][0] == 0
    end = 0
    for s, l, _ in spans:
        assert s == end
        end = s + l
    assert end == len(BASE)


def test_prefix_insertion_shifts_offsets_not_hashes(spark):
    # insert bytes at the FRONT: fixed-size chunking would re-chunk
    # everything; CDC must reuse every chunk after the first boundary
    shifted = "XYZPREFIX " + BASE
    got = _chunks(spark, [(1, BASE), (2, shifted)])
    h1 = {h for _, _, h in got[1]}
    h2 = {h for _, _, h in got[2]}
    shared = h1 & h2
    # the tail chunks are identical content -> shared hashes dominate
    assert len(shared) >= len(h1) - 2
    assert h1 != h2  # the head chunk differs


def test_short_doc_single_chunk(spark):
    got = _chunks(spark, [(1, "tiny")])
    assert got[1] == [
        (0, 4, hashlib.md5(b"tiny").hexdigest())
    ]


def test_audit_counts_savings(spark):
    texts = [(1, BASE), (2, BASE)]  # full duplicate
    df = spark.createDataFrame(texts, "doc_id long, text string")
    r = cdc_dedup_audit(cdc_chunk_table(df)).collect()[0]
    assert r["total_bytes"] == 2 * len(BASE)
    assert r["unique_bytes"] == len(BASE)
    assert r["saved_milli"] == 500
    assert r["n_chunks"] == 2 * r["n_unique"]


def test_term_drift_surfaces_overrepresented_terms(spark):
    a = spark.createDataFrame(
        [(1, "spamword spamword spamword common common")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(2, "common common other words here")], "doc_id long, text string"
    )
    rows = term_drift(a, b, k=5).collect()
    assert rows[0]["term"] == "spamword"
    assert rows[0]["c_a"] == 3 and rows[0]["c_b"] == 0
    assert rows[0]["contrib"] > 0
    # a term only in B has negative contribution -> ranked last
    contribs = {r["term"]: r["contrib"] for r in rows}
    assert contribs.get("other", 0) <= 0


def test_term_drift_identical_corpora_near_zero(spark):
    a = spark.createDataFrame([(1, "same words here")], "doc_id long, text string")
    rows = term_drift(a, a, k=10).collect()
    for r in rows:
        assert r["contrib"] == pytest.approx(0.0, abs=1e-9)
