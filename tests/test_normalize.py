"""Text normalization (textfilters.py:normalize_text): NFC composition,
control-char strip, whitespace collapse, changed-flag semantics, null
safety, and partitioning invariance."""

from __future__ import annotations

import unicodedata

from see_spark.operators.textfilters import normalize_text

DECOMPOSED = "Café naïve"  # e+acute, i+diaeresis
COMPOSED = unicodedata.normalize("NFC", DECOMPOSED)


def _run(spark, rows, parts=2):
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(parts)
    return {r.doc_id: r for r in normalize_text(df).collect()}


def test_nfc_composition(spark):
    got = _run(spark, [(0, DECOMPOSED)])
    assert got[0].text_norm == COMPOSED
    assert got[0].changed == 1
    assert got[0].n_chars == len(COMPOSED)


def test_control_strip_and_ws_collapse(spark):
    got = _run(spark, [(0, "a\x07b   c\t\td "), (1, " \x00 ")])
    assert got[0].text_norm == "ab c d"
    assert got[1].text_norm == ""
    # newline survives (pinned: only space/tab runs collapse)
    got2 = _run(spark, [(0, "a\nb")])
    assert got2[0].text_norm == "a\nb"


def test_clean_text_unchanged(spark):
    got = _run(spark, [(0, "already clean text")])
    assert got[0].changed == 0
    assert got[0].text_norm == "already clean text"


def test_null_text(spark):
    df = spark.createDataFrame([(0, None)], "doc_id long, text string")
    r = normalize_text(df).collect()[0]
    assert r.text_norm is None


def test_partitioning_invariance(spark):
    rows = [(i, DECOMPOSED + " x" * i) for i in range(8)]
    a = sorted(map(tuple, normalize_text(
        _df(spark, rows, 1)).collect()))
    b = sorted(map(tuple, normalize_text(
        _df(spark, rows, 5)).collect()))
    assert a == b


def _df(spark, rows, parts):
    return spark.createDataFrame(rows, ["doc_id", "text"]).repartition(parts)
