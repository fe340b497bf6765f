"""Cho-Garcia-Molina change-rate estimator + charset sniffing tests."""

import math


def test_change_rate_estimator_values(spark):
    from see_spark.operators.recrawl import change_rate_estimate

    hist = [
        # u1: 5 fetches rounds 0,2,4,6,8; changes at 4 and 8 -> n=4, X=2
        ("u1", 0, "a"), ("u1", 2, "a"), ("u1", 4, "b"),
        ("u1", 6, "b"), ("u1", 8, "c"),
        # u2: never changes -> lambda 0, half-life NULL
        ("u2", 0, "z"), ("u2", 5, "z"),
        # u3: single fetch -> no evidence, NULLs
        ("u3", 3, "q"),
    ]
    df = spark.createDataFrame(hist, "url string, round long, content_hash string")
    rows = {r["url"]: r for r in change_rate_estimate(df).collect()}

    r1 = rows["u1"]
    assert (r1["n_cmp"], r1["n_changes"], r1["span"]) == (4, 2, 8)
    expect = -math.log((2 * 2 + 1) / (2 * 4 + 1)) * 4 / 8
    assert abs(r1["lambda_6"] - round(expect, 6)) < 1e-9
    assert abs(r1["half_life_6"] - round(math.log(2) / expect, 6)) < 1e-9

    r2 = rows["u2"]
    assert r2["lambda_6"] == 0.0 and r2["half_life_6"] is None

    r3 = rows["u3"]
    assert r3["lambda_6"] is None and r3["half_life_6"] is None


def test_change_rate_more_changes_higher_lambda(spark):
    from see_spark.operators.recrawl import change_rate_estimate

    churny = [("c", i, str(i)) for i in range(6)]           # changes always
    calm = [("k", i, "x" if i < 5 else "y") for i in range(6)]
    df = spark.createDataFrame(
        churny + calm, "url string, round long, content_hash string"
    )
    rows = {r["url"]: r for r in change_rate_estimate(df).collect()}
    assert rows["c"]["lambda_6"] > rows["k"]["lambda_6"] > 0


def test_charset_precedence_bom_meta_header_default(spark):
    from see_spark.operators.charset import charset_sniff

    rows_in = [
        # BOM beats meta and header
        (1, "text/html; charset=latin-1", "EFBBBFaa",
         '<meta charset="koi8-r">'),
        (2, None, "fffe00", ""),
        (3, "x", "feffaa", ""),
        # meta beats header
        (4, "text/html; charset=latin-1", "3c68",
         "<META CHARSET='Shift_JIS'>"),
        (5, "text/html", "3c68",
         '<meta http-equiv="content-type" '
         'content="text/html; charset=windows-1252">'),
        # header only
        (6, 'text/plain; charset="EUC-JP"', "3c68", "<html>"),
        # nothing -> default
        (7, "text/html", "3c68", "<html><title>t</title>"),
        (8, None, "", ""),
    ]
    df = spark.createDataFrame(
        rows_in,
        "doc_id long, content_type string, body_prefix_hex string, "
        "body_prefix string",
    )
    out = {r["doc_id"]: (r["charset"], r["charset_source"])
           for r in charset_sniff(df).collect()}
    assert out[1] == ("utf-8", "bom")
    assert out[2] == ("utf-16le", "bom")
    assert out[3] == ("utf-16be", "bom")
    assert out[4] == ("shift_jis", "meta")
    assert out[5] == ("windows-1252", "meta")
    assert out[6] == ("euc-jp", "header")
    assert out[7] == ("utf-8", "default")
    assert out[8] == ("utf-8", "default")
