"""URL canonicalization + relative-link resolution, reference-exact.

Reference behaviors reimplemented (NOT a port — a pinned-semantics rewrite):

* ``canonicalize`` = see_db_srv:parse_url/1 (apps/db/src/see_db_srv.erl:125-134)
  composed with the queue() unparse (see_db_srv.erl:83-89):
    percent-decode -> normalize (default http:// scheme, default root path,
    lowercase host, drop default port, re-percent-encode with LOWERCASE hex)
    -> simplify_path -> drop #fragment (query string KEPT).
  Goldens: apps/db/test/see_db_srv_test.erl:78-136 (no-scheme default,
  root-path add, fragment drop, ``..``/``//`` collapse,
  ``Strona_główna -> Strona_g%c5%82%c3%b3wna``, ``www:wrong:url`` -> error).

* ``simplify_path`` = see_db_srv:simplify_path/2 (see_db_srv.erl:137-165) —
  the exact 9-clause state machine (collapse ``//``, resolve ``..`` incl.
  above-root and relative-start edge cases).

* ``absolute_link`` = see_crawler_worker:absolute_link/2 + join_paths/2
  (apps/crawler/src/see_crawler_worker.erl:89-107): links already carrying a
  ``scheme://`` pass through verbatim; otherwise resolve against the
  **dirname** of the base path (Erlang filename:dirname semantics, which
  collapse duplicate slashes) and DROP the base's query string.  This is
  deliberately NOT urllib.parse.urljoin — golden at
  apps/crawler/test/see_crawler_worker_test.erl:101-159 expects
  ``bar/relative/link`` from base path ``//bar/sub.html``.

* ``host_matches`` = see_db_srv:filter_url/2 (see_db_srv.erl:167-176):
  regex *search* against the netloc (host[:port]).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional
_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://")
_ABS_LINK_RE = re.compile(r"[^/]+://")  # see_crawler_worker.erl:92

_DEFAULT_PORTS = {"http": 80, "https": 443}

# RFC 3986 pchar set — what hackney_url's partial_pathencode leaves bare.
# The golden keeps ':' and '_' unencoded and encodes UTF-8 bytes lowercase.
_PATH_SAFE = frozenset(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    b"-._~!$&'()*+,;=:@/%"
)
_QS_SAFE = _PATH_SAFE | frozenset(b"?=")


@dataclass
class ParsedUrl:
    scheme: str
    host: str
    port: Optional[int]
    path: str
    qs: str  # without leading '?'; '' means no query

    @property
    def netloc(self) -> str:
        if self.port is None or _DEFAULT_PORTS.get(self.scheme) == self.port:
            return self.host
        return f"{self.host}:{self.port}"

    def unparse(self) -> str:
        url = f"{self.scheme}://{self.netloc}{self.path}"
        if self.qs:
            url += "?" + self.qs
        return url


class UrlError(ValueError):
    """Raised where the reference's catch(...) yields ``error``."""


def _percent_decode(url: str) -> str:
    """hackney_url:urldecode — decode %XX byte escapes (see_db_srv.erl:127).

    Arbitrary decoded bytes survive via surrogateescape so that re-encoding
    at normalize time round-trips them. Implemented over surrogateescape
    bytes rather than urllib's unquote_to_bytes: the reference is a pure
    byte pipeline, and a canonical URL can legitimately carry a raw
    non-UTF-8 byte (e.g. ``%a0`` decodes into the HOST, which — unlike
    path/qs — is never re-percent-encoded). unquote_to_bytes utf-8-STRICT
    encodes its input first, so re-canonicalizing such a URL raised and
    broke the idempotence invariant the crawl requeue path depends on
    (hypothesis counterexample ``%a0``; pinned in test_properties.py).
    Same malformed-escape rule as unquote_to_bytes: ``%`` without two hex
    digits passes through verbatim.
    """
    hexdigits = b"0123456789abcdefABCDEF"
    try:
        raw = url.encode("utf-8", errors="surrogateescape")
        out = bytearray()
        i, n = 0, len(raw)
        while i < n:
            if (
                raw[i] == 0x25  # '%'
                and i + 2 < n
                and raw[i + 1] in hexdigits
                and raw[i + 2] in hexdigits
            ):
                out.append(int(raw[i + 1:i + 3], 16))
                i += 3
            else:
                out.append(raw[i])
                i += 1
        return bytes(out).decode("utf-8", errors="surrogateescape")
    except Exception as exc:  # pragma: no cover - defensive
        raise UrlError(str(exc))


def _percent_encode(text: str, safe: frozenset) -> str:
    out = []
    for byte in text.encode("utf-8", errors="surrogateescape"):
        if byte in safe:
            out.append(chr(byte))
        else:
            out.append("%%%02x" % byte)  # lowercase hex, per the golden
    return "".join(out)


def split_url(url: str, default_scheme: str = "http") -> ParsedUrl:
    """Minimal hackney-style URL split (no normalization).

    No ``scheme://`` -> prepend ``http://`` (see_db_srv_test.erl:79-84).
    Invalid port -> UrlError (``www:wrong:url`` golden, :92-97).
    """
    m = _SCHEME_RE.match(url)
    if m:
        scheme = m.group(1).lower()
        rest = url[m.end():]
    else:
        scheme = default_scheme
        rest = url
    if scheme not in ("http", "https"):
        raise UrlError(f"unsupported scheme: {scheme}")

    # netloc runs until the first '/', '?' or '#'
    idx = len(rest)
    for ch in "/?#":
        pos = rest.find(ch)
        if pos != -1:
            idx = min(idx, pos)
    netloc, tail = rest[:idx], rest[idx:]

    if "@" in netloc:  # userinfo is dropped by hackney's unparse for http
        netloc = netloc.rsplit("@", 1)[1]
    if ":" in netloc:
        host, _, port_s = netloc.rpartition(":")
        if not port_s.isdigit():
            raise UrlError(f"invalid port in {url!r}")
        port: Optional[int] = int(port_s)
    else:
        host, port = netloc, None
    if not host:
        raise UrlError(f"empty host in {url!r}")

    # split tail into path / qs / fragment
    frag = ""
    if "#" in tail:
        tail, frag = tail.split("#", 1)
    qs = ""
    if "?" in tail:
        tail, qs = tail.split("?", 1)
    del frag  # fragment is always discarded (see_db_srv.erl:131-133)
    return ParsedUrl(scheme=scheme, host=host, port=port, path=tail, qs=qs)


def simplify_path(path: str) -> str:
    """Exact port of the see_db_srv:simplify_path/2 clause machine
    (see_db_srv.erl:137-165).  The accumulator alternates path parts and
    ``/`` markers; traced against goldens at see_db_srv_test.erl:109-120:
      ``/foo/bar/bar/../../bar/../baz/`` -> ``/foo/baz/``
      ``/bar/../baz/page.html`` -> ``/baz/page.html``
    """
    parts = path.split("/")
    acc: list = []  # reversed: most-recent first, like the Erlang lists
    for part in parts:
        if part == "":
            if acc and acc[0] == "/":
                continue  # collapse duplicate slash (erl :143-144)
            acc.insert(0, "/")  # :146-147
        elif part == "..":
            if len(acc) == 2 and acc[1] == "/":
                acc = ["/"]  # :149-150 pop-to-root
            elif len(acc) >= 2 and acc[1] == "/":
                acc = acc[2:]  # :152-153 pop part+slash
            elif len(acc) == 1:
                acc = ["/"]  # :155-156 relative start
            elif not acc:
                acc = ["/"]  # :158-159 above root
            else:  # pragma: no cover — unreachable with alternating acc
                acc = acc[1:]
        else:
            if not acc:
                acc = [part]  # :161-162
            elif acc[0] == "/":
                acc.insert(0, part)  # :164-165
            else:
                acc[0:0] = [part, "/"]  # :167-168 (insert separator)
    return "".join(reversed(acc))


def canonicalize(url: str) -> str:
    """Full queue()-path canonicalization; raises UrlError on invalid URL.

    percent-decode (see_db_srv.erl:127) -> split/normalize -> lowercase host,
    default scheme+path, drop default port -> re-encode path+qs with
    lowercase hex -> simplify_path -> drop fragment -> unparse
    (see_db_srv.erl:83-89,125-134).
    """
    decoded = _percent_decode(url)
    parsed = split_url(decoded)
    parsed.host = parsed.host.lower()
    path = parsed.path or "/"
    path = simplify_path(path)
    parsed.path = _percent_encode(path, _PATH_SAFE)
    parsed.qs = _percent_encode(parsed.qs, _QS_SAFE) if parsed.qs else ""
    out = parsed.unparse()
    # Engine deviation (documented): the reference is a byte pipeline and
    # would keep a host carrying raw non-UTF-8 bytes (e.g. '%a0' decodes
    # to byte 0xa0 in the HOST, which — unlike path/qs — is never
    # re-percent-encoded). This engine's columns are UTF-8 strings and a
    # surrogate-escaped byte cannot cross the Arrow boundary, so such
    # URLs are url_error at queue time. This also keeps canonicalize a
    # fixpoint (hypothesis counterexample '%a0', pinned in
    # test_properties.py).
    try:
        out.encode("utf-8")
    except UnicodeEncodeError:
        raise UrlError(f"non-utf8 bytes in canonical url {out!r}")
    return out


def try_canonicalize(url: str) -> Optional[str]:
    """Canonicalize, or None where the reference replies ``url_error``."""
    try:
        return canonicalize(url)
    except UrlError:
        return None
    except Exception:
        return None


def host_of(url: str) -> str:
    """Netloc (host[:port]) of a canonical URL — the politeness/filter key."""
    return split_url(url).netloc


def host_matches(url: str, domain_filter: Optional[str]) -> bool:
    """see_db_srv:filter_url/2 (see_db_srv.erl:167-176): regex search on
    netloc; no filter -> match."""
    if domain_filter is None:
        return True
    return re.search(domain_filter, host_of(url)) is not None


def _dirname(path: str) -> str:
    """Erlang filename:dirname/1 semantics: split collapses duplicate
    slashes, then drop the last component.
      dirname("//bar/sub.html") -> "/bar"; dirname("/") -> "/";
      dirname("foo") -> "."
    """
    absolute = path.startswith("/")
    segs = [s for s in path.split("/") if s != ""]
    segs = segs[:-1]
    if absolute:
        return "/" + "/".join(segs) if segs else "/"
    return "/".join(segs) if segs else "."


def absolute_link(base_url: str, link: str) -> str:
    """see_crawler_worker:absolute_link/2 (see_crawler_worker.erl:89-107).

    Already-absolute links (``scheme://`` anywhere before a slash) pass
    through verbatim; otherwise resolve against dirname(base path), DROP the
    base query string.  Goldens: see_crawler_worker_test.erl:101-159.
    """
    if _ABS_LINK_RE.search(link):
        return link
    base = split_url(base_url)
    if link.startswith("/"):
        new_path = link  # join_paths absolute branch (erl :101-105)
    else:
        dirname = _dirname(base.path or "/")
        new_path = dirname + link if dirname.endswith("/") else dirname + "/" + link
    base.path = new_path
    base.qs = ""  # qs = <<>> (erl :96)
    return base.unparse()
