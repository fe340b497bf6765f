"""Composite corpus pipeline (operators/pipeline.py): the keep decision
equals the conjunction of the component operators' own outputs, and each
clause individually rejects a crafted document."""

from __future__ import annotations

from pyspark.sql import functions as F

from see_spark.operators.pipeline import corpus_quality_pipeline

GOOD = (
    "the story of a small town is told in the pages of a book and it is "
    "a good story about the people of the town and the life they made "
    "in a quiet valley of the north with a river and a mill"
)
DOCS = [
    (0, GOOD),                                     # reference-like -> keep
    (5, GOOD + " and the tale goes on with the people of the town"),
    (1, "kurz und gut der die das und ist ein " * 4),   # german
    (2, "spam spam spam spam spam spam spam spam " * 6),  # repetition flag
    (3, "too short"),                               # length
    # english stopwords (passes lang + quality) stitched between OOV
    # tokens: every bigram is unseen by the reference LM -> high NLL
    (4, "the zz of qq and ww is ee the rr of tt and yy is uu the ii of "
        "oo and pp is aa the ss of dd and ff is gg the hh of jj"),
]


def _run(spark, **kw):
    d = spark.createDataFrame(DOCS, ["doc_id", "text"])
    ref = d.filter(F.col("doc_id") % 5 == 0)
    return {
        r.doc_id: r for r in corpus_quality_pipeline(d, ref, **kw).collect()
    }


def test_keep_and_clause_attribution(spark):
    got = _run(spark)
    assert got[0].keep == 1
    assert got[1].keep == 0 and got[1].predicted_lang == "de"
    assert got[2].keep == 0 and got[2].flagged == 1
    assert got[3].keep == 0 and got[3].n_tokens < 20
    # doc 4 passes every gate EXCEPT perplexity
    assert got[4].keep == 0
    assert got[4].predicted_lang == "en" and got[4].flagged == 0
    assert 20 <= got[4].n_tokens and got[4].quality >= 0.05
    assert got[4].nll_q > got[4].n_bigrams * 3_400_000


def test_keep_equals_component_conjunction(spark):
    got = _run(spark)
    for r in got.values():
        expected = int(
            r.predicted_lang == "en"
            and r.flagged == 0
            and 20 <= r.n_tokens <= 100_000
            and r.quality >= 0.05
            and r.nll_q <= r.n_bigrams * 3_400_000
        )
        assert r.keep == expected, r


def test_thresholds_parametrize(spark):
    # absurdly lenient thresholds keep everything english+unflagged+long
    got = _run(
        spark, min_tokens=1, min_quality=0.0, max_nll_micro=10**9
    )
    keeps = {d: r.keep for d, r in got.items()}
    assert keeps[0] == 1 and keeps[4] == 1
    assert keeps[3] == 0  # no stopwords -> not classified en: lang gates
    assert keeps[1] == 0  # language still gates
    assert keeps[2] == 0  # repetition still gates
