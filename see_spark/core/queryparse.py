"""Query-language parser for the structured search entry (engine
addition — the reference's see_web.erl:36-45 accepts only a flat word
list; this grammar composes the engine's full ranking family from one
string, Lucene/pg-style).

Grammar (pinned; see operators/search.py:search_query for semantics):

  "tok tok"   exact phrase — GATE: every phrase must occur
  -tok        exclusion — GATE: the doc must not contain the word
  title:tok   title-field term — SCORER: adds weighted title tf·idf
  tok~        fuzzy term — SCORER: Levenshtein<=1 expansion, discounted
  tok         plain term — conjunctive AND, multiset (duplicates score
              multiply, the reference's rule)

All raw tokens pass through the pinned engine tokenizer
(core/text.extract_words), so case, separators and byte-length guards
behave exactly like indexing did; a modifier whose token tokenizes to
nothing is dropped. Pure kernel: no pyspark imports (shared by the Spark
operator, tests, and any oracle)."""

from __future__ import annotations

import re
from typing import Dict, List

from .text import extract_words

_PHRASE_RE = re.compile(r'"([^"]*)"')


def parse_query(q: str) -> Dict[str, list]:
    """Parse to {"terms", "phrases", "title", "exclude", "fuzzy"}.

    Phrases are extracted first (quotes may contain spaces); the
    remainder splits on whitespace and each piece is classified by its
    modifier. Unterminated quotes leave the tail as plain tokens."""
    out: Dict[str, list] = {
        "terms": [], "phrases": [], "title": [], "exclude": [], "fuzzy": [],
    }

    def _phrase(m) -> str:
        toks = extract_words(m.group(1))
        if toks:
            out["phrases"].append(toks)
        return " "

    rest = _PHRASE_RE.sub(_phrase, q or "")
    for raw in rest.split():
        if raw.startswith("-") and len(raw) > 1:
            out["exclude"].extend(extract_words(raw[1:]))
        elif raw.lower().startswith("title:"):
            out["title"].extend(extract_words(raw[len("title:"):]))
        elif raw.endswith("~") and len(raw) > 1:
            out["fuzzy"].extend(extract_words(raw[:-1]))
        else:
            out["terms"].extend(extract_words(raw))
    return out


def _counts(tokens: List[str]) -> Dict[str, int]:
    c: Dict[str, int] = {}
    for t in tokens:
        c[t] = c.get(t, 0) + 1
    return c
