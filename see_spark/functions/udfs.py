"""Vectorized pandas/Arrow UDFs wrapping the pure kernels.

Per the input_hint ("no per-row Python" in the hot path): every kernel runs
Arrow-batched via ``pandas_udf``; per-element Python inside a batch is
confined to genuinely scalar string work (URL parsing, HTML tokenizing) that
Catalyst has no builtin for. Everything that CAN be a builtin (hashing,
filtering, regex domain matching, length guards) stays JVM-side in the
operators — these UDFs are only the four reference kernels.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..core import htmlx
from ..core.fetch import route_response
from ..core.text import extract_words
from ..core.urls import absolute_link as _absolute_link
from ..core.urls import try_canonicalize


@pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    """O15: canonicalizer (see SURVEY §2.1). Null = reference ``url_error``."""
    return urls.map(lambda u: try_canonicalize(u) if u is not None else None)


@pandas_udf(T.StringType())
def absolute_link_udf(base: pd.Series, link: pd.Series) -> pd.Series:
    """O22: dirname-based relative resolution (see_crawler_worker.erl:89-107)."""

    def _resolve(pair) -> Optional[str]:
        b, l = pair
        if b is None or l is None:
            return None
        try:
            return _absolute_link(b, l)
        except Exception:
            return None

    return pd.Series(map(_resolve, zip(base, link)))


@pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """O8: see_text:extract_words over a text column (the reference
    kernel, byte-for-byte). Hot paths use ``tokenize_expr`` below; this
    wrapper remains the semantic anchor the fast path is pinned against
    (tests/test_core_text.py::test_tokenize_expr_matches_kernel)."""
    return texts.map(lambda t: extract_words(t) if t is not None else [])


def tokenize_expr(col):
    """O8 as a pure-Catalyst expression — extract_words without Python.

    Same pipeline as the kernel, stage for stage, compiled from the SAME
    pattern strings (core.text.SEPARATOR_PATTERN/SPLIT_PATTERN, valid and
    identical under Python and Java regex):

      replace separator class by " "  ->  split on single whitespace
      (empties kept, like re.split)   ->  drop tokens under 2 UTF-8 bytes
      (octet_length)                  ->  Unicode lowercase.

    The kernel's "lowercase failure drops token" branch is unreachable for
    valid strings in both engines. Whole-stage codegen end to end: no
    Arrow transfer, no Python workers — this is what makes index builds
    and the tokenize-bearing queries JVM-only.
    """
    from ..core.text import SEPARATOR_PATTERN, SPLIT_PATTERN

    stripped = F.regexp_replace(col, SEPARATOR_PATTERN, " ")
    toks = F.split(stripped, SPLIT_PATTERN, -1)
    kept = F.filter(toks, lambda x: F.octet_length(x) >= 2)
    # null text -> [] like the kernel wrapper (not null)
    return F.coalesce(
        F.transform(kept, F.lower), F.array().cast("array<string>")
    )


PARSED_TYPE = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("spans", T.ArrayType(
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),
                    T.StructField("text", T.StringType()),
                    T.StructField("media_ref", T.StringType()),
                    T.StructField("offset", T.IntegerType()),
                ]
            )
        )),
        T.StructField("links", T.ArrayType(T.StringType())),
        # page-level robots directives (htmlx.robots_meta): noindex flag
        # + the followable outlink subset (empty when the page declares
        # nofollow; rel=nofollow anchors excluded). `links` stays the
        # FULL reference-semantics list (see_html.erl:54-78) — consumers
        # opt into the directive-aware subset via CrawlConfig.meta_robots.
        T.StructField("noindex", T.BooleanType()),
        T.StructField("follow_links", T.ArrayType(T.StringType())),
        # rel=canonical declaration (htmlx.canonical_href, RFC 6596)
        T.StructField("canonical", T.StringType()),
    ]
)


def _parse_one(body: Optional[str]):
    if body is None:
        return (None, [], [], False, [], None)
    spans = htmlx.to_spans(body)
    title = next((s[1] for s in spans if s[0] == "title"), None)
    links = [s[2] for s in spans if s[0] == "link"]
    rows = [
        {"kind": k, "text": t, "media_ref": m, "offset": o}
        for (k, t, m, o) in spans
    ]
    tree = htmlx.parse(body)
    noindex, nofollow = htmlx.robots_meta(tree)
    follow = [] if nofollow else htmlx.links_follow(tree)
    return (title, rows, links, noindex, follow, htmlx.canonical_href(tree))


@pandas_udf(PARSED_TYPE)
def parse_html_udf(bodies: pd.Series) -> pd.DataFrame:
    """O18-O21: tolerant HTML parse -> (title, interleaved spans, links)
    + page-level robots directives (noindex, followable links)."""
    parsed = [_parse_one(b) for b in bodies]
    return pd.DataFrame(
        parsed,
        columns=[
            "title", "spans", "links", "noindex", "follow_links", "canonical"
        ],
    )


ROUTED_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


@pandas_udf(ROUTED_TYPE)
def route_response_udf(
    status: pd.Series, content_type: pd.Series,
    body: pd.Series, location: pd.Series,
) -> pd.DataFrame:
    """O17 routing matrix (see_http.erl:26-53) vectorized over fetch results."""
    rows = []
    for s, ct, b, loc in zip(status, content_type, body, location):
        out = route_response(int(s) if pd.notna(s) else None, ct, b, loc)
        rows.append((out.kind, out.body, out.location, out.error))
    return pd.DataFrame(rows, columns=["kind", "body", "location", "error"])


def tokens_from_spans(spans_col):
    """Document word list from the interleaved spans, JVM-side.

    The reference tokenizes see_html:text/1 output — the in-order data nodes
    joined by single spaces (see_html.erl:39-52; see_db_srv.erl:68-71).
    kind='text' spans ARE those data nodes (title children included, since
    they are tree data nodes), so: filter text spans -> concat_ws(' ').
    """
    texts = F.transform(
        F.filter(spans_col, lambda s: s["kind"] == F.lit("text")),
        lambda s: s["text"],
    )
    return F.array_join(texts, " ")


ANCHORS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("href", T.StringType()),
            T.StructField("anchor", T.StringType()),
        ]
    )
)


@pandas_udf(ANCHORS_TYPE)
def anchors_udf(bodies: pd.Series) -> pd.Series:
    """(href, anchor_text) pairs per document (htmlx.links_with_text) —
    the raw material for anchor postings (operators/linkgraph.py)."""
    return pd.Series(
        [
            []
            if b is None
            else [{"href": h, "anchor": a} for h, a in htmlx.links_with_text(htmlx.parse(b))]
            for b in bodies
        ]
    )


@pandas_udf(T.StringType())
def nfc_udf(text: pd.Series) -> pd.Series:
    """Unicode NFC canonical composition (textfilters.normalize_text
    step 1) — the one normalization step Catalyst has no builtin for;
    DuckDB's nfc_normalize reproduces it exactly."""
    import unicodedata

    return text.map(
        lambda s: unicodedata.normalize("NFC", s) if s is not None else None
    )


def word_bucket_values(spark, words) -> list:
    """Driver-side word -> postings bucket ids
    (pmod(xxhash64(word), tables.N_POSTINGS_BUCKETS)) for partition
    pruning via ``SnapshotCatalog.read_parts``. Computed by a tiny
    Spark job so the hash IS Spark's xxhash64 — no Python
    reimplementation to drift from the value the index writer used.
    The words ride as LITERALS in an explode(array(...)) over range(1)
    (the search.py broadcast-query idiom): one codegen-only task, no
    Python-list parallelize / Python-worker round trips on the serving
    hot path. The session is an explicit parameter: callers may run in
    HTTP handler threads where getActiveSession() is unset
    (thread-local)."""
    from pyspark.sql import functions as F

    from ..sources.tables import N_POSTINGS_BUCKETS

    words = sorted(set(words))
    if not words:
        return []
    rows = (
        spark.range(1)
        .select(
            F.explode(F.array(*[F.lit(w) for w in words])).alias("word")
        )
        .select(
            F.pmod(F.xxhash64("word"), F.lit(N_POSTINGS_BUCKETS))
            .cast("int")
            .alias("b")
        )
        .collect()
    )
    return sorted({r["b"] for r in rows})
