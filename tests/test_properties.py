"""Hypothesis property tests over the pure kernels (no Spark session):
invariants that must hold for ARBITRARY input, complementing the
eunit-ported example goldens. Deterministic profile (no flaky shrink
budgets in CI)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from see_spark.core.rank import rank, top_k
from see_spark.core.text import extract_words
from see_spark.core.urls import try_canonicalize

SETTINGS = settings(max_examples=200, deadline=None)

# printable-ish text including url metacharacters and unicode
url_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)


@SETTINGS
@given(url_text)
@example(
    raw='%a0',
).via('discovered failure')
def test_canonicalize_is_idempotent(raw):
    """canonicalize(canonicalize(u)) == canonicalize(u): queue-time
    canonicalization must be a fixpoint or re-enqueuing a canonical URL
    would mint a different url_hash and break URL-seen dedup."""
    once = try_canonicalize(raw)
    if once is None:
        return
    twice = try_canonicalize(once)
    assert twice == once


@SETTINGS
@given(url_text)
def test_canonicalize_total_no_exceptions(raw):
    """try_canonicalize never raises on arbitrary input — the ingest path
    maps malformed URLs to url_error, it must not kill an executor task."""
    try_canonicalize(raw)


@SETTINGS
@given(st.text(max_size=200))
def test_extract_words_retokenizes_to_itself(text):
    """Tokens are a fixpoint: re-tokenizing the extracted words yields the
    same list (tokens carry no separators, stay >= 2 bytes, and casefold
    is idempotent) — the property that makes index-time and query-time
    tokenization agree."""
    words = extract_words(text)
    assert extract_words(" ".join(words)) == words


@SETTINGS
@given(st.text(max_size=200))
def test_extract_words_respects_byte_guard(text):
    for w in extract_words(text):
        assert len(w.encode("utf-8")) >= 2


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.text(min_size=1, max_size=10),
            st.text(max_size=5),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
        ),
        max_size=50,
    ),
    st.integers(min_value=0, max_value=20),
)
def test_top_k_sorted_bounded_subset(scored, k):
    out = top_k(scored, k)
    assert len(out) <= k
    assert all(r in scored for r in out)
    keys = [(-r[2], r[0]) for r in out]
    assert keys == sorted(keys)
    # every omitted row ranks at-or-after every kept row
    if len(out) == k and keys:
        worst = max(keys)
        for r in scored:
            if r not in out:
                assert (-r[2], r[0]) >= worst


@SETTINGS
@given(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=12),
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=12),
    st.lists(st.sampled_from(["aa", "bb", "cc", "ee"]), max_size=30),
)
def test_rank_additive_over_query_concatenation(q1, q2, page):
    """Score sums over query tokens WITH multiplicity (reference rank/3
    folds the token list), so rank(q1 ++ q2) == rank(q1) + rank(q2)."""
    df = {w: 1 + (hash(w) % 3) for w in set(q1) | set(q2)}
    n = 10
    whole = rank(q1 + q2, page, n, df)
    parts = rank(q1, page, n, df) + rank(q2, page, n, df)
    assert whole == pytest.approx(parts)


@SETTINGS
@given(
    st.text(alphabet="abz019.-", min_size=1, max_size=12),
    st.lists(st.text(alphabet="abz019_~-", min_size=1, max_size=8), max_size=4),
    st.booleans(),
)
def test_canonical_fast_path_class_is_fixpoint(host, segs, trailing):
    """Every URL matching frontier._CANONICAL_FAST_RE must be a
    canonicalize() fixpoint — the JVM fast path returns such URLs
    untouched, so a non-fixpoint member would silently skip
    canonicalization and fork the url_hash space."""
    import re

    from see_spark.operators.frontier import _CANONICAL_FAST_RE

    url = "http://" + host + "/" + "/".join(segs)
    if segs and trailing:
        url += "/"
    if not re.match(_CANONICAL_FAST_RE, url):
        return  # outside the guarded class: the Python kernel handles it
    assert try_canonicalize(url) == url


@SETTINGS
@given(st.text(max_size=60), st.text(max_size=60))
def test_absolute_links_pass_through_verbatim(base, link):
    """O22 kernel contract (see_crawler_worker.erl:92): a link containing
    scheme:// passes through unchanged — the crawl loop's rlike guard
    relies on exactly this."""
    import re

    from see_spark.core.urls import absolute_link

    if re.search(r"[^/]+://", link):
        try:
            assert absolute_link(base, link) == link
        except Exception:
            pytest.fail("absolute pass-through raised")


@SETTINGS
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=300,
    )
)
def test_bloom_has_no_false_negatives(hashes):
    from see_spark.functions.bloom import Bloom

    arr = np.array(hashes, dtype=np.int64).view(np.uint64)
    bloom = Bloom(1 << 12, k=7)
    bloom.add_many(arr)
    assert bool(bloom.contains_many(arr).all())
