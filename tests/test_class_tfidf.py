"""c-TF-IDF class labeling: class-exclusive terms top the list, shared
terms score <= 0, ranks are pinned, partitioning invariant."""

from __future__ import annotations

from see_spark.operators.textfilters import class_tfidf


DOCS = [
    (1, "en", "hello world common shared"),
    (2, "en", "hello again common"),
    (3, "de", "hallo welt common shared"),
    (4, "de", "hallo nochmal common"),
    (5, "fr", "bonjour monde common shared"),
]


def test_exclusive_terms_win(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    got = {}
    for r in class_tfidf(df, k=3).collect():
        got.setdefault(r["cls"], []).append((r["rank"], r["term"], r["score"]))
    for cls in got:
        got[cls].sort()
    # the class-exclusive marker word ranks first in each class
    assert got["en"][0][1] == "hello"
    assert got["de"][0][1] == "hallo"
    assert got["fr"][0][1] in ("bonjour", "monde")
    # 'common' appears in all 3 classes: idf = ln(3/4) < 0
    for cls, rows in got.items():
        for _, term, score in rows:
            if term == "common":
                assert score < 0


def test_partitioning_invariant(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    a = sorted(map(tuple, class_tfidf(df, k=4).collect()))
    b = sorted(map(tuple, class_tfidf(df.repartition(7), k=4).collect()))
    assert a == b
