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
