"""Tokenizer with the reference's exact normalization semantics.

Reference: apps/db/src/see_text.erl (31 LoC) —
  * strip_nonalpha_characters (see_text.erl:13-14): the separator class
    ``[@!#$%^&*()\\-_=+\\]\\[\\\\{}|;:\\"',.<>/?]`` is replaced by a single
    space, globally.  Note what is NOT a separator: `` ` `` ``~`` digits,
    and any non-ASCII character.
  * split_to_words (see_text.erl:17-18): split on single occurrences of
    ``[ \\t\\n\\r]`` (consecutive separators yield empty tokens, later
    dropped by the length guard).
  * process_word (see_text.erl:21-30): tokens with **byte size** < 2 are
    dropped (a 1-byte ASCII char is dropped but a 2-byte UTF-8 char like
    ``ż`` is KEPT); survivors are Unicode-lowercased; tokens whose
    lowercasing fails are dropped.

Goldens: apps/db/test/see_text_test.erl:4-18.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Union

Iodata = Union[str, Iterable["Iodata"]]

# see_text.erl:13 — exact separator class, replaced by " " globally.
# Exported as the SOURCE pattern strings: the Catalyst fast path
# (functions.udfs.tokenize_expr) compiles the same strings under Java
# regex, and the character class is valid and identical in both engines.
SEPARATOR_PATTERN = r"[@!#$%^&*()\-_=+\]\[\\{}|;:\"',.<>/?]"
SPLIT_PATTERN = r"[ \t\n\r]"

_SEPARATORS = re.compile(SEPARATOR_PATTERN)

# see_text.erl:18 — split on single whitespace chars (no run-collapsing).
_SPLIT = re.compile(SPLIT_PATTERN)


def flatten_iodata(data: Iodata) -> str:
    """Erlang iodata (arbitrarily nested lists of binaries) -> one string.

    Mirrors how re:replace/re:split accept iodata in see_text.erl; the
    eunit golden ``[<<"aa">>, [<<"bb">>]] -> [<<"aabb">>]``
    (see_text_test.erl:7) shows nesting concatenates with no separator.
    """
    if isinstance(data, str):
        return data
    return "".join(flatten_iodata(part) for part in data)


def extract_words(data: Iodata) -> List[str]:
    """see_text:extract_words/1 (see_text.erl:6-9)."""
    text = flatten_iodata(data)
    stripped = _SEPARATORS.sub(" ", text)
    words = _SPLIT.split(stripped)
    out: List[str] = []
    for word in words:
        # see_text.erl:21 — byte size of the UTF-8 encoding, not char count.
        if len(word.encode("utf-8")) < 2:
            continue
        try:
            out.append(word.lower())
        except Exception:  # see_text.erl:26-29 — lowercase failure drops token
            continue
    return out
