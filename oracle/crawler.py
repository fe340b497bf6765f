"""Pure-Python crawl oracle — the executable reference semantics.

The sandbox has no Erlang runtime, so this single-threaded loop IS the
"reference" the Spark engine must match (SURVEY §7.0): each per-step rule is
individually pinned to the cited Erlang lines, and the scheduling rule is
the one pinned for both engines:

  * rounds; each round checks out, per host, the first ``host_budget``
    unvisited URLs by (depth, seq); the round's visit order is global
    (depth, seq); hosts respect ``min_gap_rounds`` between fetches;
  * URL-seen is first-enqueue-wins (see_db_storage_ets.erl:84-92) with seq
    = global insertion order, links queued in document order within a page
    (see_crawler_worker.erl:73) and pages in visit order within a round;
  * fetch routing = see_http.erl:26-53; redirect target re-queued after
    absolutization (see_crawler_worker.erl:78-83);
  * canonicalize/filter on queue (see_db_srv.erl:83-96);
  * robots prefixes block before fetch (north-rule addition, same rule as
    the engine);
  * leases: a pending URL not reported within ``lease_rounds`` re-enters the
    frontier (see_db_srv.erl:98-105) — exercised only in fault tests.

No pyspark imports; shares the exact kernels from see_spark.core.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set

from see_spark.core import htmlx
from see_spark.core.fetch import route_response
from see_spark.core.robotstxt import parse_robots, parse_sitemap, robots_allowed
from see_spark.core.text import extract_words
from see_spark.core.urls import absolute_link, host_matches, host_of, try_canonicalize


@dataclass
class OracleEntry:
    url: str
    host: str
    depth: int
    seq: int
    state: str = "unvisited"
    detail: Optional[str] = None
    discovered_in_round: int = -1
    fetched_in_round: Optional[int] = None
    fetch_order: Optional[int] = None


@dataclass
class OracleResult:
    frontier: Dict[str, OracleEntry]
    visit_order: List[str]
    docs: Dict[str, dict]          # url -> {title, spans}
    postings: Dict[str, Dict[str, int]]  # word -> {url: term_count}
    doc_len: Dict[str, int]
    rounds: int
    canonical_aliases: List[tuple] = None  # (url, canonical, round)

    @property
    def seen_urls(self) -> Set[str]:
        return set(self.frontier)


def crawl(
    site: Dict[str, dict],
    seeds: List[str],
    domain_filter: Optional[str] = None,
    host_budget: int = 2,
    min_gap_rounds: int = 1,
    robots: Optional[Dict[str, list]] = None,
    max_rounds: int = 100,
    robots_rfc: bool = False,
    robots_agent: str = "see-spark",
    use_sitemaps: bool = False,
    sitemap_waves: int = 3,
    honor_crawl_delay: bool = False,
    seconds_per_round: float = 1.0,
    trap_gate: bool = False,
    trap_max_depth: int = 8,
    trap_max_seg_repeat: int = 3,
    trap_max_url_len: int = 512,
    robots_ttl_rounds: Optional[int] = None,
    url_blocklist_words: tuple = (),
    url_blocklist_domains: tuple = (),
    url_blocklist_threshold: int = 1000,
    reputation_gate: bool = False,
    reputation_min_docs: int = 3,
    reputation_min_avg_milli: int = 10,
    dust_gate: bool = False,
    dust_min_support: int = 2,
    meta_robots: bool = False,
    follow_canonical: bool = False,
) -> OracleResult:
    robots = robots or {}

    def site_at(round_no: int) -> Dict[str, dict]:
        """Site snapshot for a round — ``site`` may be a callable
        (round -> dict) for time-dependent fixtures (engine analogue:
        PhasedFixtureFetcher + run_round's set_round hook)."""
        return site(round_no) if callable(site) else site

    def _is_trap(canon: str) -> bool:
        """Same rule as frontier.trap_stats over the canonical url."""
        import re

        path = re.sub(r"^[a-z]+://[^/]*", "", canon, count=1)
        segs = [s for s in path.split("/") if s]
        if len(segs) > trap_max_depth:
            return True
        if segs and max(segs.count(s) for s in segs) >= trap_max_seg_repeat:
            return True
        return len(canon) > trap_max_url_len

    def _is_blocked(canon: str) -> bool:
        """Same rule as urlfilter.blocklist_keep over the canonical url:
        domain-blocked OR banned-word milli-score >= threshold."""
        import re

        m = re.match(r"^[a-z][a-z0-9+.-]*://([^/?#]+)", canon)
        host = m.group(1) if m else ""
        if any(
            host == d or host.endswith("." + d) for d in url_blocklist_domains
        ):
            return True
        low = canon.lower()
        score = sum(
            g for w, g in url_blocklist_words if w.lower() in low
        )
        return score >= url_blocklist_threshold

    # host-reputation evidence (engine: host_quality table). Increments
    # buffered per round and flushed AFTER the batch loop, so round r's
    # own pages never gate round r's discoveries — matching the engine's
    # stats-as-of-round-start read.
    host_q: Dict[str, list] = {}
    pending_q: list = []

    def _q_milli(text: str) -> int:
        """Integer rational form of textstats.quality_score's composite
        (reputation.doc_quality_milli replica)."""
        toks = text.split(" ")
        n = len(toks)
        rep = n - len(set(toks))
        stop = sum(
            1 for t in toks
            if t in ("the", "a", "of", "and", "to", "in", "is")
        )
        return (1000 * min(n, 200) * (n - rep) * (n + stop)) // (400 * n * n)

    def _is_lowrep(canon: str) -> bool:
        st = host_q.get(host_of(canon))
        return bool(
            st
            and st[0] >= reputation_min_docs
            and st[1] < reputation_min_avg_milli * st[0]
        )

    # DUST alias evidence (engine: rules mined from the docs table at
    # round start — crawl._mine_dust_rules / operators/urlalias.py).
    # Fingerprints buffered per round and flushed AFTER the batch loop
    # (same discipline as host_q), so round r's pages never shape round
    # r's own discoveries.
    pages_fp: Dict[str, str] = {}
    pending_fp: list = []
    dust_rules: set = set()
    # rel=canonical alias ledger (engine: canonical_aliases table)
    canonical_aliases: list = []

    def _span_fp(spans) -> str:
        """crawl._span_fingerprint replica: md5 over (kind, text,
        media_ref) triples, '\x1e' within a span, '\x1f' between."""
        import hashlib

        joined = "\x1f".join(
            "\x1e".join((s[0] or "", s[1] or "", s[2] or "")) for s in spans
        )
        return hashlib.md5(joined.encode("utf-8")).hexdigest()

    def _url_parts(u):
        """urlalias.split_url replica (same regexes)."""
        import re

        m = re.match(r"^([a-z][a-z0-9+.-]*)://([^/?#]+)([^?#]*)", u)
        if not m:
            return None
        qs = ""
        if "?" in u:
            qm = re.search(r"\?([^#]*)", u)
            qs = qm.group(1) if qm else ""
        return m.group(1), m.group(2), m.group(3), qs

    def _mine_dust() -> set:
        """urlalias.mine_param_rules replica over pages_fp: strippable
        (host, param) pairs — support >= dust_min_support, zero
        counterexamples. Targets keyed by (host, path, qs) may hold
        several fps (scheme is NOT part of the engine's join key)."""
        target: Dict[tuple, list] = {}
        occs = []
        for url, fp in pages_fp.items():
            p = _url_parts(url)
            if p is None:
                continue
            _, host, path, qs = p
            target.setdefault((host, path, qs), []).append(fp)
            if qs:
                ps = qs.split("&")
                for i, kv in enumerate(ps):
                    occs.append((
                        host, path, kv.split("=")[0],
                        "&".join(ps[:i] + ps[i + 1:]), fp,
                    ))
        stats: Dict[tuple, list] = {}
        for host, path, key, residual, fp in occs:
            for t in target.get((host, path, residual), ()):
                st = stats.setdefault((host, key), [0, 0])
                st[0 if t == fp else 1] += 1
        return {
            hk for hk, (ev, cex) in stats.items()
            if ev >= dust_min_support and cex == 0
        }

    def _dust_alias(canon: str) -> str:
        """urlalias.apply_param_rules replica: drop strippable params
        (survivor order preserved, '?' dropped when nothing survives,
        unparseable URLs pass through)."""
        p = _url_parts(canon)
        if p is None or not p[3]:
            return canon
        scheme, host, path, qs = p
        kept = [
            kv for kv in qs.split("&")
            if (host, kv.split("=")[0]) not in dust_rules
        ]
        return scheme + "://" + host + path + (
            ("?" + "&".join(kept)) if kept else ""
        )
    # RFC 9309 mode: robots rules come from the site's own
    # http://host/robots.txt bodies (parsed once per host with the SAME
    # kernel the engine's vectorized parse uses), full allow/disallow
    # longest-match precedence instead of prefix-only. Robots fetches are
    # out-of-band: never queued, never in visit order or the seen set —
    # matching crawl._refresh_robots_rfc.
    _rfc_cache: Dict[str, dict] = {}
    _rfc_fetched_round: Dict[str, int] = {}

    def _fetch_robots(host: str, round_no: int) -> None:
        entry = site_at(round_no).get(f"http://{host}/robots.txt")
        if entry is not None and entry["status"] == 200 and entry["body"]:
            _rfc_cache[host] = parse_robots(entry["body"], agent=robots_agent)
        else:
            _rfc_cache[host] = {"allow": [], "disallow": [],
                                "crawl_delay": None, "sitemaps": []}
        _rfc_fetched_round[host] = round_no

    def refresh_robots(round_no: int) -> None:
        """Engine parity (_refresh_robots_rfc): the round a host has
        unvisited URLs, fetch its robots if never fetched — or if the
        cached copy is >= robots_ttl_rounds old (TTL mode)."""
        for h in sorted(
            {e.host for e in frontier.values() if e.state == "unvisited"}
        ):
            if h not in _rfc_cache:
                _fetch_robots(h, round_no)
            elif (
                robots_ttl_rounds is not None
                and _rfc_fetched_round[h] <= round_no - robots_ttl_rounds
            ):
                _fetch_robots(h, round_no)

    def rfc_rules(host: str, round_no: int = 0) -> dict:
        if host not in _rfc_cache:
            _fetch_robots(host, round_no)
        return _rfc_cache[host]

    def host_gap_rounds(host: str, round_no: int) -> int:
        """Effective checkout gap (matching crawl.run_round's host_gap):
        max(min_gap_rounds, ceil(crawl_delay / seconds_per_round))."""
        if not (robots_rfc and honor_crawl_delay):
            return min_gap_rounds
        cd = rfc_rules(host, round_no).get("crawl_delay")
        if cd is None:
            return min_gap_rounds
        import math

        return max(min_gap_rounds, math.ceil(cd / seconds_per_round))

    # sitemap mode (matching crawl._sitemap_candidates): when a host first
    # has unvisited URLs, its robots' Sitemap: entries are fetched —
    # breadth-first over <sitemapindex> nesting up to sitemap_waves waves,
    # each sitemap at most once ever (failed fetches count as fetched) —
    # and extracted page URLs queue at depth 0 at END of round, after the
    # round's link discoveries, in (wave, sitemap-url lexicographic, loc
    # position) order. Sitemap fetches never enter visit order or the
    # URL-seen set.
    _robots_hosts_seen: Set[str] = set()
    _sitemaps_fetched: Set[str] = set()

    def sitemap_wave_pages(round_no: int) -> List[str]:
        hosts_now = {
            e.host for e in frontier.values() if e.state == "unvisited"
        }
        new_hosts = hosts_now - _robots_hosts_seen
        _robots_hosts_seen.update(hosts_now)
        wave_urls = sorted(
            {
                sm
                for h in new_hosts
                for sm in rfc_rules(h, round_no).get("sitemaps", [])
            }
            - _sitemaps_fetched
        )
        pages: List[str] = []
        for _wave in range(sitemap_waves):
            if not wave_urls:
                break
            nested = set()
            for sm in wave_urls:  # lexicographic == engine's sm_idx order
                _sitemaps_fetched.add(sm)
                entry = site_at(round_no).get(sm)
                if entry is None or entry["status"] != 200 or not entry["body"]:
                    continue
                parsed = parse_sitemap(entry["body"])
                pages.extend(parsed["urls"])  # document order == pos
                nested.update(parsed["sitemaps"])
            wave_urls = sorted(nested - _sitemaps_fetched)
        return pages
    frontier: Dict[str, OracleEntry] = {}
    next_seq = 0
    visit_order: List[str] = []
    docs: Dict[str, dict] = {}
    postings: Dict[str, Dict[str, int]] = {}
    doc_len: Dict[str, int] = {}
    host_last_round: Dict[str, int] = {}

    def queue(raw_url: str, depth: int, round_no: int, gate: bool = False) -> str:
        """see_db_srv:queue/1 three-way outcome (erl :83-96). ``gate``:
        apply the trap gate (engine: _apply_trap_gate runs on DISCOVERED
        candidates — links, redirect targets, sitemap pages — never on
        operator-supplied seeds)."""
        nonlocal next_seq
        canon = try_canonicalize(raw_url)
        if canon is None:
            return "url_error"
        if not host_matches(canon, domain_filter):
            return "filter_mismatch"
        if gate and dust_gate:
            # engine: _apply_dust_alias runs after canonicalize+filter,
            # before the trap/blocklist/reputation gates and URL-seen
            canon = _dust_alias(canon)
        if gate and trap_gate and _is_trap(canon):
            return "trap"
        if (
            gate
            and (url_blocklist_words or url_blocklist_domains)
            and _is_blocked(canon)
        ):
            return "blocked"
        if gate and reputation_gate and _is_lowrep(canon):
            return "lowrep"
        if canon in frontier:  # add-if-absent no-op (ets :84-92)
            return "ok"
        frontier[canon] = OracleEntry(
            url=canon, host=host_of(canon), depth=depth, seq=next_seq,
            discovered_in_round=round_no,
        )
        next_seq += 1
        return "ok"

    for seed in seeds:
        queue(seed, 0, -1)

    rounds = 0
    for round_no in range(max_rounds):
        if dust_gate:
            # evidence-as-of-round-start (engine: docs table read before
            # the round's fetches commit)
            dust_rules = _mine_dust()
        if robots_rfc:
            refresh_robots(round_no)
        sitemap_pages: List[str] = []
        if robots_rfc and use_sitemaps:
            sitemap_pages = sitemap_wave_pages(round_no)
        # robots gate (same rule as engine's robots_block / robots_gate_rfc)
        for entry in frontier.values():
            if entry.state != "unvisited":
                continue
            path = entry.url.split(entry.host, 1)[1]
            blocked = False
            if robots_rfc:
                r = rfc_rules(entry.host, round_no)
                blocked = not robots_allowed(path, r["allow"], r["disallow"])
            else:
                rules = robots.get(entry.host)
                blocked = bool(rules) and any(path.startswith(p) for p in rules)
            if blocked:
                entry.state = "robots_blocked"
                entry.detail = "robots_disallow"
        # checkout: per-host top host_budget by (depth, seq), gap-gated
        per_host: Dict[str, List[OracleEntry]] = {}
        for entry in sorted(
            (e for e in frontier.values() if e.state == "unvisited"),
            key=lambda e: (e.depth, e.seq),
        ):
            last = host_last_round.get(entry.host)
            if last is not None and round_no - last < host_gap_rounds(
                    entry.host, round_no):
                continue
            bucket = per_host.setdefault(entry.host, [])
            if len(bucket) < host_budget:
                bucket.append(entry)
        batch = sorted(
            (e for bucket in per_host.values() for e in bucket),
            key=lambda e: (e.depth, e.seq),
        )
        if not batch:
            if sitemap_pages:
                # zero checkout but sitemap seeding discovered URLs — the
                # crawl continues (mirrors run_round's early-return branch)
                rounds = round_no + 1
                for u in sitemap_pages:
                    queue(u, 0, round_no, gate=True)
                continue
            if any(e.state == "unvisited" for e in frontier.values()):
                # idle politeness wait: unvisited URLs remain but every
                # host is inside its gap window (min_gap_rounds > 1 or
                # crawl-delay) — mirrors metrics.gap_waiting
                continue
            break
        rounds = round_no + 1
        for entry in batch:
            host_last_round[entry.host] = round_no

        for entry in batch:
            entry.fetch_order = len(visit_order)
            entry.fetched_in_round = round_no
            visit_order.append(entry.url)
            resp = site_at(round_no).get(entry.url)
            if resp is None:
                outcome = route_response(None, None, None, None)
            else:
                outcome = route_response(
                    resp["status"], resp["content_type"],
                    resp["body"], resp["redirect_to"],
                )
            if outcome.kind == "text":
                spans = htmlx.to_spans(outcome.body or "")
                title = next((s[1] for s in spans if s[0] == "title"), None)
                entry.state = "visited"
                docs[entry.url] = {"title": title, "spans": spans}
                noindex = nofollow_pg = False
                if meta_robots:
                    tree = htmlx.parse(outcome.body or "")
                    noindex, nofollow_pg = htmlx.robots_meta(tree)
                if not noindex:
                    words = extract_words(
                        " ".join(s[1] for s in spans if s[0] == "text")
                    )
                    # re-index: drop old postings (ets :145-175)
                    for word_docs in postings.values():
                        word_docs.pop(entry.url, None)
                    doc_len[entry.url] = len(words)
                    for word in words:
                        postings.setdefault(word, {}).setdefault(entry.url, 0)
                        postings[word][entry.url] += 1
                if reputation_gate:
                    pending_q.append((
                        entry.host,
                        _q_milli(" ".join(s[1] for s in spans if s[0] == "text")),
                    ))
                if dust_gate:
                    pending_fp.append((entry.url, _span_fp(spans)))
                if meta_robots:
                    links = (
                        [] if nofollow_pg
                        else htmlx.links_follow(htmlx.parse(outcome.body or ""))
                    )
                else:
                    links = [s[2] for s in spans if s[0] == "link"]
                for link in links:
                    queue(
                        absolute_link(entry.url, link),
                        entry.depth + 1, round_no, gate=True,
                    )
                if follow_canonical:
                    canon = htmlx.canonical_href(
                        htmlx.parse(outcome.body or "")
                    )
                    if canon is not None:
                        # page metadata, enqueued LAST within the page's
                        # discoveries (crawl.py canonical_links link_pos)
                        target = absolute_link(entry.url, canon)
                        canonical_aliases.append(
                            (entry.url, target, round_no)
                        )
                        queue(target, entry.depth + 1, round_no, gate=True)
            elif outcome.kind == "binary":
                entry.state = "binary"
                docs[entry.url] = {
                    "title": None,
                    "spans": [("media", None, entry.url, 0)],
                }
                if dust_gate:
                    pending_fp.append((
                        entry.url, _span_fp([("media", None, entry.url, 0)]),
                    ))
            elif outcome.kind == "redirect":
                target = absolute_link(entry.url, outcome.location)
                entry.state = "redirect"
                entry.detail = target
                queue(target, entry.depth + 1, round_no, gate=True)
            else:
                entry.state = "error"
                entry.detail = outcome.error

        # sitemap-extracted URLs enqueue AFTER the round's link
        # discoveries (engine: link_rank base 2^61 sorts them last in the
        # same first-enqueue-wins batch)
        for u in sitemap_pages:
            queue(u, 0, round_no, gate=True)

        # flush this round's quality evidence AFTER every discovery of
        # the round was gated (engine: host_quality committed at round
        # end, read at next round's start)
        for h, q in pending_q:
            st = host_q.setdefault(h, [0, 0])
            st[0] += 1
            st[1] += q
        pending_q = []
        for u, fp in pending_fp:
            pages_fp[u] = fp
        pending_fp = []

    return OracleResult(
        frontier=frontier, visit_order=visit_order, docs=docs,
        postings=postings, doc_len=doc_len, rounds=rounds,
        canonical_aliases=canonical_aliases,
    )
