"""Tokenizer goldens, 1:1 from apps/db/test/see_text_test.erl:4-18."""

from see_spark.core.text import extract_words


def test_split_words():
    assert extract_words("aaa") == ["aaa"]
    assert extract_words(["aaa"]) == ["aaa"]
    assert extract_words(["aa", ["bb"]]) == ["aabb"]  # iodata flatten
    assert extract_words("aa bb") == ["aa", "bb"]
    assert extract_words("aa1 b2b") == ["aa1", "b2b"]
    assert extract_words(["aa", " \n\t\r", "bb"]) == ["aa", "bb"]
    assert extract_words("<[(aa)]>!@#$%^&*.,.|;:'\"?/={bb}") == ["aa", "bb"]


def test_normalize_words_unicode_lowercase():
    assert extract_words("ZAŻÓŁĆ GĘŚLĄ JAŹŃ") == ["zażółć", "gęślą", "jaźń"]


def test_skip_one_letter_words():
    assert extract_words("x aaa a f bb t") == ["aaa", "bb"]


def test_byte_size_guard_keeps_two_byte_unicode_char():
    # see_text.erl:21 guards on BYTE size: 'ż' is 2 UTF-8 bytes -> kept.
    assert extract_words("ż a") == ["ż"]


def test_tokenize_expr_matches_kernel(spark):
    """The Catalyst fast path (tokenize_expr) must agree token-for-token
    with the extract_words kernel: eunit goldens, unicode lowercase edge
    cases (sharp s, dotted capital I, final sigma, combining marks), the
    empty/null cases, and the whole sf0.001 documents corpus."""
    from pyspark.sql import functions as F

    from see_spark.functions.udfs import tokenize_expr

    samples = [
        "aaa", "aa bb", "aa1 b2b", "<[(aa)]>!@#$%^&*.,.|;:'\"?/={bb}",
        "ZAŻÓŁĆ GĘŚLĄ JAŹŃ", "x aaa a f bb t", "ż a", "", "   ",
        "STRASSE straße", "İSTANBUL", "ΟΔΟΣ ΣΟΦΟΣ", "étude",
        "tab\there\nnewline\rcr", "a`~b 12 3", "🙂🙂 emoji",
        None,
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    rows = df.select(
        "text", tokenize_expr(F.col("text")).alias("fast")
    ).collect()
    for r in rows:
        expected = extract_words(r["text"]) if r["text"] is not None else []
        assert r["fast"] == expected, repr(r["text"])

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mismatch = (
        docs.select("text", tokenize_expr(F.col("text")).alias("fast"))
        .collect()
    )
    for r in mismatch:
        assert r["fast"] == extract_words(r["text"]), r["text"][:80]
