"""Content novelty curve, padding-waste audit, and cloaking detection vs
hand-computed values."""

from __future__ import annotations

from see_spark.operators.discovery import content_novelty
from see_spark.operators.packing import padding_waste
from see_spark.operators.reputation import cloaking_audit


def test_content_novelty_curve(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d", 0),     # shingles: 'a b c','b c d' — both novel
            (2, "a b c", 1),       # 'a b c' seen in r0 -> 0 novel
            (3, "x y z w", 1),     # 'x y z','y z w' novel
            (4, "x y z", 2),       # seen in r1
            (5, "q r s", 2),       # novel
        ],
        "doc_id long, text string, round long",
    )
    got = {r["round"]: r for r in content_novelty(docs, n=3).collect()}
    assert (got[0]["n_shingles"], got[0]["n_novel"]) == (2, 2)
    assert got[0]["novelty_milli"] == 1000
    assert (got[1]["n_shingles"], got[1]["n_novel"]) == (3, 2)
    assert got[1]["novelty_milli"] == 666
    assert (got[2]["n_shingles"], got[2]["n_novel"]) == (2, 1)
    assert got[2]["n_docs"] == 2


def test_content_novelty_empty_round(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", 0), (2, "", 1)], "doc_id long, text string, round long"
    )
    got = {r["round"]: r for r in content_novelty(docs).collect()}
    assert got[1]["n_docs"] == 1  # the doc exists even if shingle-poor


def test_padding_waste_hand_values(spark):
    docs = spark.createDataFrame(
        [
            (1, " ".join(["w"] * 10)),   # bucket 64, pad 54
            (2, " ".join(["w"] * 64)),   # bucket 64, pad 0 (boundary)
            (3, " ".join(["w"] * 65)),   # bucket 128, pad 63
            (4, " ".join(["w"] * 600)),  # overflow, pad 0
        ],
        "doc_id long, text string",
    )
    got = {r["bucket"]: r for r in padding_waste(docs).collect()}
    b64 = got["64"]
    assert (b64["n_docs"], b64["total_tokens"], b64["total_padding"]) == (2, 74, 54)
    assert b64["padding_milli"] == (1000 * 54) // 128
    assert got["128"]["total_padding"] == 63
    ov = got["overflow"]
    assert (ov["n_docs"], ov["total_padding"]) == (1, 0)


def test_cloaking_audit(spark):
    rows = []
    # host good: 4 urls, both UAs, identical
    for i in range(4):
        rows += [(f"g{i}", "good", "bot", "H"), (f"g{i}", "good", "user", "H")]
    # host spam: 4 urls, 3 differ -> 750 milli, flagged
    for i in range(4):
        rows += [
            (f"s{i}", "spam", "bot", "B"),
            (f"s{i}", "spam", "user", "B" if i == 0 else f"U{i}"),
        ]
    # host thin: only 2 urls probed under both (below evidence floor),
    # both differ -> 1000 milli but NOT flagged
    for i in range(2):
        rows += [(f"t{i}", "thin", "bot", "B"), (f"t{i}", "thin", "user", "U")]
    # host partial: bot-only probes (no user fetch succeeded)
    rows += [("p0", "partial", "bot", "B")]
    df = spark.createDataFrame(
        rows, "url string, host string, ua string, content_hash string"
    )
    got = {r["host"]: r for r in cloaking_audit(df).collect()}
    assert got["good"]["flagged"] is False and got["good"]["n_diff"] == 0
    s = got["spam"]
    assert (s["n_both"], s["n_diff"], s["cloak_milli"]) == (4, 3, 750)
    assert s["flagged"] is True
    t = got["thin"]
    assert t["cloak_milli"] == 1000 and t["flagged"] is False
    p = got["partial"]
    assert (p["n_probed"], p["n_both"], p["flagged"]) == (1, 0, False)
