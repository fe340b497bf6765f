"""Fellegi-Sunter linkage: learned weights discriminate (agreeing on a
discriminative field raises the score, agreeing on a universal field is
near-neutral), scores match a pure-Python reference, and the learned
rule separates a planted match/non-match population."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from see_spark.operators.linkage import (
    estimate_fs_weights,
    fellegi_sunter_scores,
)


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "a long, b long, f_disc boolean, f_univ boolean, is_match boolean"
    )


# f_disc agrees iff match (perfectly discriminative);
# f_univ agrees ~always (useless). 10 matches, 10 non-matches.
ROWS = [(i, 100 + i, True, True, True) for i in range(10)] + [
    (50 + i, 150 + i, False, i > 0, False) for i in range(10)
]


def _ref_weights(rows):
    def rha(x):
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    nm = sum(1 for r in rows if r[4])
    nn = len(rows) - nm
    out = []
    for idx, name in ((2, "f_disc"), (3, "f_univ")):
        ma = sum(1 for r in rows if r[4] and r[idx])
        ua = sum(1 for r in rows if not r[4] and r[idx])
        m = (ma + 0.5) / (nm + 1.0)
        u = (ua + 0.5) / (nn + 1.0)
        out.append(
            (
                name,
                rha(math.log(m / u) * 1e6),
                rha(math.log((1 - m) / (1 - u)) * 1e6),
            )
        )
    return out


def test_weights_match_reference_and_discriminate(spark):
    got = estimate_fs_weights(
        _pairs(spark, ROWS), ["f_disc", "f_univ"]
    )
    want = _ref_weights(ROWS)
    assert got == want
    wd = dict((c, (w, wb)) for c, w, wb in got)
    # discriminative field: big positive agree weight, negative disagree
    assert wd["f_disc"][0] > 1_000_000 and wd["f_disc"][1] < -1_000_000
    # universal field: both weights near zero relative to the signal
    assert abs(wd["f_univ"][0]) < abs(wd["f_disc"][0]) / 3


def test_scores_separate_matches(spark):
    scored = fellegi_sunter_scores(
        _pairs(spark, ROWS), ["f_disc", "f_univ"]
    ).collect()
    for r in scored:
        assert r["fs_match"] == (1 if r["is_match"] else 0)
        assert (r["score"] > 0) == bool(r["is_match"])


def test_explicit_weights_are_exact_sums(spark):
    weights = [("f_disc", 700, -300), ("f_univ", 5, -10)]
    scored = {
        (r["a"], r["b"]): r["score"]
        for r in fellegi_sunter_scores(
            _pairs(spark, ROWS[:3] + ROWS[10:12]),
            ["f_disc", "f_univ"],
            weights=weights,
        ).collect()
    }
    for a, b, fd, fu, _ in ROWS[:3] + ROWS[10:12]:
        want = (700 if fd else -300) + (5 if fu else -10)
        assert scored[(a, b)] == want
