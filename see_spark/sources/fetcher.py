"""Fetch stage: I/O-shaped mapInPandas over the checked-out batch (O17).

The reference fetches one URL per RPC poll (see_crawler_worker.erl:33-46);
here a whole round's batch is fetched inside executors, partitioned by host
so per-host connection reuse / rate limiting is local to a task. The sandbox
has no network, so two deterministic fetchers stand in for HTTP (the MIME /
status / redirect routing they feed is the real see_http.erl:26-53 matrix):

- ``FixtureFetcher``: resolves from the broadcast fixture-site dict
  (tests / parity vs the oracle);
- ``SyntheticFetcher``: derives content from the URL hash (bench runs at
  arbitrary scale; generates interleaved text+media docs with outlinks).

A production ``requests``-based fetcher drops into the same mapInPandas
shape — the politeness gate upstream already bounds per-host concurrency.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.fetch import MAX_LENGTH, TEXT_MIMES

FETCH_RESULT_FIELDS = [
    T.StructField("url", T.StringType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("body", T.StringType()),
    T.StructField("redirect_to", T.StringType()),
]


def _fetch_schema(passthrough: T.StructType) -> T.StructType:
    keep = [f for f in passthrough.fields if f.name != "url"]
    return T.StructType([*FETCH_RESULT_FIELDS, *keep])


class FixtureFetcher:
    def __init__(self, spark: SparkSession, site: Dict[str, dict]):
        self._bc = spark.sparkContext.broadcast(site)

    def frame_fn(self):
        """Per-partition pandas transformer (url frames -> fetch-result
        frames). Exposed separately from fetch() so the fused
        fetch+route+parse stage (operators/crawl.py) can compose it into
        ONE Python stage — bodies then never cross the Arrow boundary."""
        site_bc = self._bc

        def _run(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import hashlib

            site = site_bc.value
            for frame in frames:
                if len(frame) == 0:
                    continue
                etags = (
                    frame["if_none_match"]
                    if "if_none_match" in frame.columns
                    else [None] * len(frame)
                )
                rows = []
                for url, etag in zip(frame["url"], etags):
                    if not isinstance(etag, str):  # None / pandas NA
                        etag = None
                    entry = site.get(url)
                    if entry is None:
                        # connection-refused analog -> error outcome
                        rows.append((url, None, None, None, None))
                    elif (
                        etag is not None
                        and entry["status"] == 200
                        and hashlib.md5(
                            (entry["body"] or "").encode()
                        ).hexdigest() == etag
                    ):
                        # conditional revisit hit: validator (md5-of-body
                        # ETag) matches -> 304, no body transferred
                        rows.append((url, 304, entry["content_type"], None, None))
                    else:
                        rows.append(
                            (
                                url,
                                entry["status"],
                                entry["content_type"],
                                entry["body"],
                                entry["redirect_to"],
                            )
                        )
                out = pd.DataFrame(
                    rows,
                    columns=["url", "status", "content_type", "body", "redirect_to"],
                )
                for col in frame.columns:
                    if col != "url":
                        out[col] = frame[col].to_numpy()
                yield out

        return _run

    def fetch(self, batch: DataFrame) -> DataFrame:
        """batch: any DF with a ``url`` column; extra columns pass through.
        Repartitioned by host upstream (checkout already did)."""
        return batch.mapInPandas(
            self.frame_fn(), schema=_fetch_schema(batch.schema)
        )


USER_AGENT = "see-spark (PySpark crawl engine)"


def http_get(
    session, url: str, timeout: float = 10.0, etag: Optional[str] = None
) -> Tuple[Optional[int], Optional[str], Optional[str], Optional[str]]:
    """One raw GET with the reference's fetch semantics
    (/root/reference/apps/crawler/src/see_http.erl:13-24,26-32):

    - redirects NOT followed (the crawler absolutizes + re-queues Location);
    - body read ONLY when content-type's MIME (before ';') is text/html or
      text/plain, streamed and capped at 10 MB — binaries are never pulled;
    - network/protocol failures -> (None, None, None, None), the
      connection-refused analog that routes to the error state.

    Returns (status, content_type, body, redirect_location) — the raw
    four-tuple that ``core.fetch.route_response`` classifies; routing
    policy stays in exactly one place.
    """
    import requests

    headers = {"user-agent": USER_AGENT}
    if etag is not None:
        # conditional revalidation (RFC 9110 s13.1.2): a 304 reply routes
        # to the 'unchanged' outcome and transfers no body
        headers["if-none-match"] = etag
    try:
        resp = session.get(
            url,
            headers=headers,
            allow_redirects=False,
            stream=True,
            timeout=timeout,
        )
    except requests.RequestException:
        return (None, None, None, None)
    try:
        content_type = resp.headers.get("content-type")
        location = resp.headers.get("location")
        body = None
        if resp.status_code == 200 and content_type:
            mime = content_type.split(";", 1)[0].strip()
            if mime in TEXT_MIMES:
                raw = b""
                try:
                    for chunk in resp.iter_content(chunk_size=1 << 16):
                        raw += chunk
                        if len(raw) >= MAX_LENGTH:
                            break
                except requests.RequestException:
                    return (None, None, None, None)
                # Trust the header charset only when the server actually
                # sent one: requests defaults text/* to ISO-8859-1 per the
                # old RFC 2616 rule, which mojibakes the common
                # UTF-8-without-charset page. The reference processes raw
                # bytes as UTF-8 (see_http.erl reads the body verbatim), so
                # UTF-8 is the no-header default here too.
                charset = (
                    resp.encoding
                    if "charset=" in content_type.lower()
                    else "utf-8"
                )
                try:
                    body = raw[:MAX_LENGTH].decode(
                        charset or "utf-8", errors="replace"
                    )
                except LookupError:  # unknown charset token from the server
                    body = raw[:MAX_LENGTH].decode("utf-8", errors="replace")
        return (resp.status_code, content_type, body, location)
    finally:
        resp.close()


class RequestsFetcher:
    """Production HTTP fetcher in the same mapInPandas shape as the
    deterministic fetchers: the checked-out batch arrives host-partitioned
    (checkout repartitions by host), so one requests.Session per task gets
    connection reuse against few hosts, and the politeness gate upstream
    already bounds per-host batch size. Sequential within a task — fetch
    concurrency at scale comes from partition parallelism, which the
    politeness window already shaped.
    """

    def __init__(self, timeout: float = 10.0, proxies: Optional[dict] = None):
        """``proxies``: optional requests-style proxy map (e.g.
        {"http": "http://proxy:3128"}) applied to every task's session —
        the standard deployment shape for crawl fleets behind egress
        proxies, and what lets tests route fetches to a local fixture
        proxy without DNS. When set, environment proxy vars are ignored
        (trust_env False) so behavior is identical on driver and
        executors."""
        self.timeout = timeout
        self.proxies = proxies

    def frame_fn(self):
        timeout = self.timeout
        proxies = self.proxies

        def _run(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import requests

            with requests.Session() as session:
                if proxies:
                    session.trust_env = False
                    session.proxies.update(proxies)
                for frame in frames:
                    if len(frame) == 0:
                        continue
                    etags = (
                        frame["if_none_match"]
                        if "if_none_match" in frame.columns
                        else [None] * len(frame)
                    )
                    rows = [
                        (
                            url,
                            *http_get(
                                session, url, timeout,
                                etag=etag if isinstance(etag, str) else None,
                            ),
                        )
                        for url, etag in zip(frame["url"], etags)
                    ]
                    out = pd.DataFrame(
                        rows,
                        columns=[
                            "url", "status", "content_type", "body", "redirect_to",
                        ],
                    )
                    out["status"] = out["status"].astype("Int32")
                    for col in frame.columns:
                        if col != "url":
                            out[col] = frame[col].to_numpy()
                    yield out

        return _run

    def fetch(self, batch: DataFrame) -> DataFrame:
        return batch.mapInPandas(
            self.frame_fn(), schema=_fetch_schema(batch.schema)
        )


class SyntheticFetcher:
    """Deterministic content from url_hash — unbounded-scale bench fetcher.

    Outcome mix (by hash bucket): ~80% text/html with outlinks, ~10%
    media/binary, ~5% redirect, ~5% error — roughly web-shaped. Bodies are
    token sequences drawn from a fixed vocabulary so the indexer does real
    work; outlinks point at derived URLs on a controlled host set so the
    frontier keeps growing.
    """

    VOCAB = np.array(
        "the of and to in a is that erlang spark crawl frontier index word "
        "page host fetch link media text title query rank score".split()
    )

    def __init__(self, n_hosts: int = 1000, links_per_page: int = 8):
        self.n_hosts = n_hosts
        self.links_per_page = links_per_page

    def frame_fn(self):
        vocab = self.VOCAB
        n_hosts = self.n_hosts
        n_links = self.links_per_page

        def _run(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for frame in frames:
                if len(frame) == 0:
                    continue
                # determinism: use the JVM-computed xxhash64 passed through
                # the batch (Python's hash() is process-salted).
                h = frame["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
                bucket = (h % np.uint64(100)).astype(np.int64)
                statuses = np.where(
                    bucket < 80, 200,
                    np.where(bucket < 90, 200, np.where(bucket < 95, 301, 500)),
                )
                ctypes = np.where(
                    bucket < 80, "text/html",
                    np.where(bucket < 90, "application/octet-stream", None),
                )
                # fully vectorized body synthesis: derive words and links
                # from the hash with modular arithmetic (no per-row RNG)
                n = len(frame)
                n_words, V = 40, len(vocab)
                mults = np.arange(1, n_words + 1, dtype=np.uint64) * np.uint64(
                    0x9E3779B97F4A7C15
                )
                widx = ((h[:, None] * mults[None, :]) % np.uint64(V)).astype(np.int64)
                word_mat = vocab[widx]  # (n, n_words) of str
                lk_mults = np.arange(1, n_links + 1, dtype=np.uint64) * np.uint64(
                    0xC2B2AE3D27D4EB4F
                )
                lk_hash = h[:, None] * lk_mults[None, :]
                lk_host = (lk_hash % np.uint64(n_hosts)).astype(np.int64)
                lk_page = (lk_hash % np.uint64(10**9)).astype(np.int64)
                bodies = np.empty(n, dtype=object)
                redirects = np.empty(n, dtype=object)
                redirects[:] = None
                for row in range(n):  # string assembly only; all math above
                    b = bucket[row]
                    if b < 80:
                        links = "".join(
                            f'<a href="http://h{lk_host[row, j]}.bench/p{lk_page[row, j]}">l</a> '
                            for j in range(n_links)
                        )
                        bodies[row] = (
                            f"<html><title>doc {int(h[row])}</title><body>"
                            f"{' '.join(word_mat[row])} {links}</body></html>"
                        )
                    elif 90 <= b < 95:
                        bodies[row] = None
                        redirects[row] = (
                            f"http://h{int(h[row]) % n_hosts}.bench/p{int(h[row]) % 10**9}"
                        )
                    else:
                        bodies[row] = None
                out = pd.DataFrame(
                    {
                        "url": frame["url"].to_numpy(),
                        "status": pd.array(statuses, dtype="Int32"),
                        "content_type": ctypes,
                        "body": bodies,
                        "redirect_to": redirects,
                    }
                )
                for col in frame.columns:
                    if col != "url":
                        out[col] = frame[col].to_numpy()
                yield out

        return _run

    def fetch(self, batch: DataFrame) -> DataFrame:
        return batch.mapInPandas(
            self.frame_fn(), schema=_fetch_schema(batch.schema)
        )


class PhasedFixtureFetcher(FixtureFetcher):
    """FixtureFetcher over a site that CHANGES between crawl rounds —
    the test vehicle for time-dependent crawl behavior (robots TTL
    refetch, conditional revisits against mutating content).

    ``phases``: list of (from_round, site_dict), ascending; the active
    site for round r is the last phase with from_round <= r. The crawl
    loop calls ``set_round`` at the top of each round (run_crawl does
    this for any fetcher exposing the hook), and ``frame_fn`` — built
    fresh per fetch call — captures the active round's dict, so
    executors always see one consistent site per round."""

    def __init__(self, spark: SparkSession, phases):
        self._phases = sorted(phases, key=lambda p: p[0])
        self._bcs = [
            (start, spark.sparkContext.broadcast(site))
            for start, site in self._phases
        ]
        self._round = 0
        self._bc = self._bcs[0][1]

    def set_round(self, round_no: int) -> None:
        self._round = round_no
        for start, bc in self._bcs:
            if start <= round_no:
                self._bc = bc
