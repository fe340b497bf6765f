"""TF-IDF scoring math, reference-exact.

Reference: apps/db/src/see_rank_tfidf.erl (15 LoC):
  * tf(word, page) = count(word in page_words) / len(page_words)   (:8-11)
  * idf(word)      = ln(page_count / (1 + df(word)))               (:13-15)
      - page_count counts ALL frontier rows, including unvisited /
        binary / error pages (apps/db/src/see_db_storage_ets.erl:133-134
        has no state filter) — IDF can be NEGATIVE
        (golden: apps/db/test/see_rank_tfidf_test.erl:18-25 asserts ln(1/2)).
  * rank(page, query_words) = sum over query tokens WITH duplicates of
    tf*idf (:5-6) — a repeated query word scores twice
    (see_db_srv_test.erl:193,212).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence


def tf(word: str, page_words: Sequence[str]) -> float:
    if not page_words:
        return 0.0
    return sum(1 for w in page_words if w == word) / len(page_words)


def idf(page_count: int, df: int) -> float:
    return math.log(page_count / (1 + df))


def rank(
    query_words: Sequence[str],
    page_words: Sequence[str],
    page_count: int,
    df_by_word: Dict[str, int],
) -> float:
    """Σ over query tokens (with multiplicity) of tf·idf."""
    total = 0.0
    for word in query_words:
        total += tf(word, page_words) * idf(page_count, df_by_word.get(word, 0))
    return total


def top_k(scored: List[tuple], k: int = 100) -> List[tuple]:
    """Descending score, deterministic tie-break by url ascending.

    The reference sorts negated scores with a stable keysort and truncates to
    MAX_RESULTS=100 (see_db_srv.erl:21,110-112); its tie order is an
    unspecified set-iteration artifact, so we pin url-ascending (SURVEY §7.0).
    ``scored`` rows are ``(url, title, score)``.
    """
    return sorted(scored, key=lambda r: (-r[2], r[0]))[:k]
