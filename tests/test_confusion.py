"""Confusion matrix: cell counts and per-class recall on a hand-built
prediction set, absent classes, and exact row totals."""

from __future__ import annotations

from see_spark.operators.evaluation import classification_confusion


def test_confusion_cells_and_recall(spark):
    preds = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "de"), (4, "en"), (5, "fr")],
        "id long, pred string",
    )
    truth = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "en"), (4, "de"), (5, "fr")],
        "id long, truth string",
    )
    got = {
        (r["truth"], r["pred"]): (r["n"], r["n_truth"], r["cell_milli"])
        for r in classification_confusion(preds, truth).collect()
    }
    assert got[("en", "en")] == (2, 3, 666)
    assert got[("en", "de")] == (1, 3, 333)
    assert got[("de", "en")] == (1, 1, 1000)
    assert got[("fr", "fr")] == (1, 1, 1000)
    assert sum(n for n, _, _ in got.values()) == 5


def test_confusion_only_joined_ids_count(spark):
    preds = spark.createDataFrame([(1, "a"), (99, "b")], "id long, pred string")
    truth = spark.createDataFrame([(1, "a"), (2, "a")], "id long, truth string")
    rows = classification_confusion(preds, truth).collect()
    assert len(rows) == 1 and rows[0]["n"] == 1
