"""robots.txt parser (RFC 9309) — pure kernel, no Spark imports.

The reference has NO robots support (its scheduler is a degenerate poll
loop, apps/crawler/src/see_crawler_worker.erl:33-46); the north rule adds
a robots cache gating fetch batches. Round-2 built the gate over a
pre-parsed ``robots(host, disallow)`` dimension; this module closes the
remaining gap — turning FETCHED robots.txt bodies into that dimension —
with the real public semantics:

  - group selection: the group whose ``User-agent`` token is the LONGEST
    match for our agent wins; ``*`` is the fallback group; multiple
    user-agent lines stack onto one group (RFC 9309 §2.2.1);
  - rule precedence: the matching rule with the LONGEST path pattern wins;
    tie between allow and disallow of equal length -> allow (§2.2.2);
  - patterns: ``*`` wildcard and ``$`` end-anchor (§2.2.3);
  - empty ``Disallow:`` = allow-all; unknown directives ignored;
  - extensions: ``Crawl-delay`` (seconds; non-standard but universal) and
    ``Sitemap:`` lines (absolute URLs, host-independent) are surfaced for
    the politeness gate and seed ingestion.

Everything is deterministic string work, usable both vectorized (Arrow
batches in the robots-refresh UDF) and in the pytest oracle.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple


def parse_robots(body: str, agent: str = "see-spark") -> dict:
    """Parse one robots.txt body for ``agent``.

    Returns ``{"allow": [...], "disallow": [...], "crawl_delay":
    float|None, "sitemaps": [...]}`` where allow/disallow keep the
    selected group's patterns verbatim (original order).
    """
    agent = agent.lower()
    groups: List[Tuple[List[str], List[Tuple[str, str]], Optional[float]]] = []
    cur_agents: List[str] = []
    cur_rules: List[Tuple[str, str]] = []
    cur_delay: Optional[float] = None
    in_group_header = False  # consecutive user-agent lines stack
    sitemaps: List[str] = []

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_group_header:
                flush()
                in_group_header = True
            cur_agents.append(val.lower())
        elif key == "sitemap":
            # host-independent per RFC 9309 §2.3; never closes a group
            if val:
                sitemaps.append(val)
        elif key in ("allow", "disallow"):
            in_group_header = False
            cur_rules.append((key, val))
        elif key == "crawl-delay":
            in_group_header = False
            try:
                cur_delay = float(val)
            except ValueError:
                pass
        else:
            in_group_header = False
    flush()

    # longest user-agent token that is a substring-prefix match of ours
    best, best_len = None, -1
    for agents, rules, delay in groups:
        for tok in agents:
            if tok == "*":
                if best_len < 0:
                    best, best_len = (rules, delay), 0
            elif agent.startswith(tok) and len(tok) > best_len:
                best, best_len = (rules, delay), len(tok)
    if best is None:
        return {"allow": [], "disallow": [], "crawl_delay": None,
                "sitemaps": sitemaps}
    rules, delay = best
    return {
        "allow": [v for k, v in rules if k == "allow" and v],
        "disallow": [v for k, v in rules if k == "disallow" and v],
        "crawl_delay": delay,
        "sitemaps": sitemaps,
    }


def _pattern_to_regex(pattern: str) -> "re.Pattern":
    out = []
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    for part in body.split("*"):
        out.append(re.escape(part))
    rx = ".*".join(out)
    return re.compile("^" + rx + ("$" if anchored else ""))


def robots_allowed(path: str, allow: List[str], disallow: List[str]) -> bool:
    """RFC 9309 §2.2.2 precedence: longest matching pattern wins; a
    length-tie resolves to allow; no match -> allowed."""
    best_len, best_allow = -1, True
    for verdict, patterns in ((True, allow), (False, disallow)):
        for p in patterns:
            if _pattern_to_regex(p).match(path):
                # spec length = octets of the pattern itself
                plen = len(p)
                if plen > best_len or (plen == best_len and verdict):
                    best_len, best_allow = plen, verdict
    return best_allow


# --------------------------------------------------------------------------
# sitemap XML (sitemaps.org protocol) — <urlset><url><loc> and
# <sitemapindex><sitemap><loc>; tolerant regex extraction (real-world
# sitemaps are frequently malformed XML, so we extract rather than
# validate — the canonicalizer downstream rejects garbage URLs anyway).
# --------------------------------------------------------------------------

_LOC = re.compile(r"<loc>\s*([^<]+?)\s*</loc>", re.IGNORECASE)
_ESC = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&apos;": "'"}


def parse_sitemap(body: str) -> dict:
    """Extract page URLs and nested sitemap URLs from a sitemap document.

    Returns ``{"urls": [...], "sitemaps": [...]}`` — nested entries (from
    a <sitemapindex>) go to "sitemaps", plain <urlset> entries to "urls".
    """
    urls, subs = [], []
    is_index = "<sitemapindex" in body.lower()
    for m in _LOC.finditer(body):
        loc = m.group(1)
        for esc, ch in _ESC.items():
            loc = loc.replace(esc, ch)
        (subs if is_index else urls).append(loc)
    return {"urls": urls, "sitemaps": subs}
