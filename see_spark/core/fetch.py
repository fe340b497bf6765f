"""Fetch-outcome routing, reference-exact (no network in this sandbox).

Reference: apps/crawler/src/see_http.erl (63 LoC):
  * 200 + content-type whose MIME (before ';') is text/html or text/plain
    -> OK text body, capped at 10 MB (:9,11,26-32);
  * 200 + other/missing content-type -> ``binary``  (:26-32);
  * 301/302 -> ``{redirect, Location}``; missing Location -> error (:34-50);
  * any other status -> ``{error, {Code, Headers}}`` (:52-53).
Redirects are NOT followed by the fetcher (:16); the crawler worker
absolutizes and re-queues the target (see_crawler_worker.erl:78-83).

The crawl-state routing of outcomes is see_crawler_worker:visit/2
(see_crawler_worker.erl:63-87).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

TEXT_MIMES = ("text/html", "text/plain")  # see_http.erl:9
MAX_LENGTH = 10_000_000  # 10 MB, see_http.erl:11

KIND_TEXT = "text"
KIND_BINARY = "binary"
KIND_REDIRECT = "redirect"
KIND_ERROR = "error"
# engine addition (no see_http.erl arm — the reference's loop is
# visit-once and never revalidates): 304 Not Modified on a conditional
# revisit (operators/revisit.py). Only reachable when the caller sent a
# validator (If-None-Match).
KIND_UNCHANGED = "unchanged"


@dataclass
class FetchOutcome:
    kind: str                      # text | binary | redirect | error
    body: Optional[str] = None     # for text
    location: Optional[str] = None  # raw Location header, for redirect
    error: Optional[str] = None    # reason, for error


def route_response(
    status: Optional[int],
    content_type: Optional[str],
    body: Optional[str],
    location: Optional[str],
) -> FetchOutcome:
    """Map an HTTP response to the reference's four-way outcome."""
    if status == 200:
        mime = None
        if content_type:
            mime = content_type.split(";", 1)[0].strip()
        if mime in TEXT_MIMES:
            return FetchOutcome(KIND_TEXT, body=(body or "")[:MAX_LENGTH])
        return FetchOutcome(KIND_BINARY)
    if status in (301, 302):
        if location:
            return FetchOutcome(KIND_REDIRECT, location=location)
        return FetchOutcome(KIND_ERROR, error="redirect_without_location")
    if status == 304:
        return FetchOutcome(KIND_UNCHANGED)
    return FetchOutcome(KIND_ERROR, error=f"http_{status}")
