"""RFC 9111 freshness lifetime + language-contamination audit tests."""


def _ttl(spark, rows):
    from see_spark.operators.httpcache import http_ttl

    df = spark.createDataFrame(
        rows,
        "url string, cache_control string, date_s long, expires_s long, "
        "last_modified_s long",
    )
    return {r["url"]: (r["ttl_s"], r["ttl_source"])
            for r in http_ttl(df).collect()}


def test_http_ttl_precedence_chain(spark):
    out = _ttl(spark, [
        # no-store beats a max-age in the same header
        ("a", "no-store, max-age=300", 100, None, None),
        ("b", "private, NO-CACHE", 100, 700, 50),
        # max-age beats expires; quoted value parsed
        ("c", 'public, max-age="120"', 100, 700, None),
        ("d", "max-age=0", 100, None, None),
        # expires minus date, clamped at 0 when already stale
        ("e", "public", 100, 700, None),
        ("f", None, 100, 40, 50),
        # heuristic: 10% of age since last-modified
        ("g", None, 1000, None, 500),
        # nothing -> NULL/none
        ("h", None, 100, None, None),
    ])
    assert out["a"] == (0, "no-store")
    assert out["b"] == (0, "no-store")
    assert out["c"] == (120, "max-age")
    assert out["d"] == (0, "max-age")
    assert out["e"] == (600, "expires")
    assert out["f"] == (0, "expires")
    assert out["g"] == (50, "heuristic")
    assert out["h"] == (None, "none")


def test_http_ttl_maxage_not_matched_inside_other_tokens(spark):
    # s-maxage / a field VALUE containing 'max-age' must not match
    out = _ttl(spark, [
        ("a", "s-maxage=900", 100, None, None),
        ("b", "x-note=use-max-age=5-later", 100, None, None),
    ])
    assert out["a"] == (None, "none")
    assert out["b"] == (None, "none")


def test_lang_outliers_majority_and_evidence_floor(spark):
    from see_spark.operators.textstats import lang_outliers

    rows = (
        [(i, "big", "en") for i in range(6)]
        + [(6, "big", "fr"), (7, "big", "de")]
        + [(8, "tiny", "en"), (9, "tiny", "fr")]   # 2 docs < min_docs
    )
    df = spark.createDataFrame(rows, "doc_id long, host string, lang string")
    out = {r["doc_id"]: r for r in lang_outliers(df, min_docs=3).collect()}
    assert out[6]["is_outlier"] and out[7]["is_outlier"]
    assert not out[0]["is_outlier"]
    assert out[0]["majority_lang"] == "en"
    assert out[0]["majority_milli"] == 750          # 6 of 8
    # evidence floor: tiny host flags nothing despite the split
    assert not out[8]["is_outlier"] and not out[9]["is_outlier"]
