"""Tolerant HTML -> tree -> (title, text, links, spans), reference-exact.

Reference: apps/crawler/src/see_html.erl (95 LoC) — a mochiweb token stream
folded into ``{Tag, Attrs, Children}`` with deliberate recovery rules:

* whitespace-only data tokens are dropped (see_html.erl:18-19);
* an end tag closes ONLY the innermost open element with the same name; a
  non-matching end tag is discarded (see_html.erl:30-34);
* at EOF every still-open element folds into its parent (see_html.erl:12-16);
* comments / doctype / processing instructions are skipped (:36-37);
* a valueless attribute carries its own name as value (mochiweb convention),
  which is why ``<a href>`` is NOT a link (see_html.erl:63-69, golden at
  apps/crawler/test/see_html_test.erl:19-21).

Extraction semantics:
* ``text``: in-order data nodes joined by single spaces (see_html.erl:39-52);
* ``title``: depth-first FIRST <title> subtree's text (see_html.erl:80-95);
* ``links``: pre-order; an <a>'s href is emitted at the tag position, then
  its children are scanned (nested links still found) (see_html.erl:54-78).

``to_spans`` flattens the tree into the interleaved span sequence prescribed
by BASELINE.json's input_hint: one row per data node / link / media ref with
``(kind, text, media_ref, offset)`` where offset is the 0-based document-order
sequence number.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import List, Optional, Tuple, Union

Node = Union[str, "Element"]


@dataclass
class Element:
    tag: str
    attrs: List[Tuple[str, str]]
    children: List[Node] = field(default_factory=list)


class _TreeBuilder(HTMLParser):
    """html.parser tokens folded with see_html:parse_tokens/2 rules."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: List[Element] = [Element("root", [])]

    @staticmethod
    def _fix_attrs(attrs) -> List[Tuple[str, str]]:
        # mochiweb represents a valueless attr as {Name, Name}.
        return [(k, k if v is None else v) for k, v in attrs]

    def handle_starttag(self, tag, attrs):
        # html.parser folds the '/' of `<t attr=val/>` into the unquoted
        # value and reports a plain start tag; mochiweb tokenizes it as a
        # singleton with value 'val'. Recover mochiweb's reading.
        raw = self.get_starttag_text() or ""
        if raw.endswith("/>"):
            attrs = list(attrs)
            if attrs and attrs[-1][1] is not None and attrs[-1][1].endswith("/"):
                attrs[-1] = (attrs[-1][0], attrs[-1][1][:-1])
            self.handle_startendtag(tag, attrs)
            return
        self.stack.append(Element(tag, self._fix_attrs(attrs)))

    def handle_startendtag(self, tag, attrs):  # <empty attr=val/>
        self.stack[-1].children.append(Element(tag, self._fix_attrs(attrs)))

    def handle_endtag(self, tag):
        # close only the innermost element when names match (:30-31);
        # stray end tags are dropped (:33-34).
        if len(self.stack) > 1 and self.stack[-1].tag == tag:
            closed = self.stack.pop()
            self.stack[-1].children.append(closed)

    def handle_data(self, data):
        if data.strip() == "":  # {data,_,true} skipped (:18-19)
            return
        self.stack[-1].children.append(data)

    # skipped token kinds (:36-37)
    def handle_comment(self, data):
        pass

    def handle_decl(self, decl):
        pass

    def handle_pi(self, data):
        pass

    def finish(self) -> Element:
        # EOF folds every open element into its parent (:12-16)
        while len(self.stack) > 1:
            closed = self.stack.pop()
            self.stack[-1].children.append(closed)
        return self.stack[0]


def parse(content: str) -> Element:
    """see_html:parse/1 (see_html.erl:9-10)."""
    builder = _TreeBuilder()
    builder.feed(content)
    builder.close()
    return builder.finish()


def _iter_data(node: Node, out: List[str]) -> None:
    if isinstance(node, str):
        out.append(node)
        return
    for child in node.children:
        _iter_data(child, out)


def text_parts(tree: Node) -> List[str]:
    """In-order data nodes; join with ' ' for the tokenizable text
    (see_html.erl:39-52 interleaves <<" ">> separators)."""
    out: List[str] = []
    _iter_data(tree, out)
    return out


def text(tree: Node) -> str:
    return " ".join(text_parts(tree))


def title(tree: Node) -> Optional[str]:
    """Depth-first first <title> subtree -> its text (see_html.erl:80-95).
    Returns None when no title exists (reference yields [])."""
    found = _find_title(tree)
    if found is None:
        return None
    return text(found)


def _find_title(node: Node) -> Optional[Element]:
    if isinstance(node, str):
        return None
    if node.tag == "title":
        return node
    for child in node.children:
        got = _find_title(child)
        if got is not None:
            return got
    return None


def links(tree: Node) -> List[str]:
    """Pre-order href collection (see_html.erl:54-78): emit an <a>'s FIRST
    href attr at the tag position unless missing or valueless, then scan its
    children."""
    out: List[str] = []
    _collect_links(tree, out)
    return out


def _collect_links(node: Node, out: List[str]) -> None:
    if isinstance(node, str):
        return
    if node.tag == "a":
        for name, value in node.attrs:
            if name == "href":
                if value != "href":  # valueless attr -> skipped (:66-67)
                    out.append(value)
                break
    for child in node.children:
        _collect_links(child, out)


def to_spans(content: str) -> List[Tuple[str, Optional[str], Optional[str], int]]:
    """Interleaved span sequence ``(kind, text, media_ref, offset)``.

    kind='title' first when present, then document-order 'text' spans (one
    per data node, see_html.erl:39-52 order), then each link as kind='link'
    with media_ref=href at its document position relative to other links.
    Media documents are represented upstream (fetch router) as a single
    kind='media' span. Offsets are the 0-based emit sequence.
    """
    tree = parse(content)
    spans: List[Tuple[str, Optional[str], Optional[str], int]] = []
    offset = 0
    doc_title = title(tree)
    if doc_title is not None:
        spans.append(("title", doc_title, None, offset))
        offset += 1
    for part in text_parts(tree):
        spans.append(("text", part, None, offset))
        offset += 1
    for href in links(tree):
        spans.append(("link", None, href, offset))
        offset += 1
    return spans


def links_with_text(tree: Node) -> List[Tuple[str, str]]:
    """Pre-order (href, anchor_text) pairs — exactly the hrefs links()
    emits (same first-href / valueless-attr rules, nested links still
    scanned), each paired with its <a> subtree's text. Engine addition:
    the reference collects hrefs only (see_html.erl:54-78); anchor text is
    the standard extra signal a web-scale indexer attributes to the link
    TARGET (anchor postings, operators/linkgraph.py)."""
    out: List[Tuple[str, str]] = []
    _collect_links_text(tree, out)
    return out


def _collect_links_text(node: Node, out: List[Tuple[str, str]]) -> None:
    if isinstance(node, str):
        return
    if node.tag == "a":
        for name, value in node.attrs:
            if name == "href":
                if value != "href":
                    out.append((value, text(node)))
                break
    for child in node.children:
        _collect_links_text(child, out)


# block-level segmentation (engine addition: boilerplate removal) --------

BLOCK_TAGS = frozenset(
    {
        "html", "body", "div", "section", "article", "header", "footer",
        "nav", "aside", "main", "p", "h1", "h2", "h3", "h4", "h5", "h6",
        "ul", "ol", "li", "dl", "dt", "dd", "table", "tr", "td", "th",
        "blockquote", "pre", "form", "fieldset", "hr", "br", "title",
    }
)


def blocks(content: str) -> List[Tuple[int, str, int, int]]:
    """Segment a document into text blocks at block-level tag boundaries —
    the input unit of jusText-style boilerplate classification
    (operators/content.py). Engine addition on top of the reference's
    flat text model (see_html.erl:39-52): the same tolerant tree, but
    data nodes accumulate into a block that is flushed whenever a
    block-level element opens or closes.

    Returns ``(block_id, text, n_chars, n_link_chars)`` per non-empty
    block in document order: text = the block's data nodes joined with
    ' ' (the reference's separator convention), n_chars = total data-node
    characters (separators excluded), n_link_chars = the subset inside
    <a> subtrees — the numerator of jusText's link density.
    """
    tree = parse(content)
    out: List[Tuple[str, int, int]] = []
    parts: List[str] = []
    counts = [0, 0]  # chars, link chars

    def flush() -> None:
        if parts:
            out.append((" ".join(parts), counts[0], counts[1]))
        parts.clear()
        counts[0] = 0
        counts[1] = 0

    def walk(node: Node, in_link: bool) -> None:
        if isinstance(node, str):
            parts.append(node)
            counts[0] += len(node)
            if in_link:
                counts[1] += len(node)
            return
        is_block = node.tag in BLOCK_TAGS
        if is_block:
            flush()
        for child in node.children:
            walk(child, in_link or node.tag == "a")
        if is_block:
            flush()

    walk(tree, False)
    flush()
    return [(i, t, c, lc) for i, (t, c, lc) in enumerate(out)]


# page-level robots directives (engine addition) --------------------------

def robots_meta(tree: Node) -> Tuple[bool, bool]:
    """Page-level robots directives ``(noindex, nofollow)`` from
    ``<meta name="robots" content="...">`` tags — the REP page-level
    layer (Google/Bing documented semantics; robots.txt is the
    host-level layer, core/robotstxt.py). Name match is
    case-insensitive; content is a comma-separated token list, tokens
    trimmed and casefolded; ``none`` means both directives; multiple
    robots metas OR together (the restrictive union, the documented
    conflict rule). ``index``/``follow``/``all`` tokens are the default
    and carry no information. Valueless attrs (parser maps them to
    value==name) contribute nothing."""
    noindex = False
    nofollow = False

    def _scan(node) -> None:
        nonlocal noindex, nofollow
        if isinstance(node, str):
            return
        if node.tag == "meta":
            attrs = {}
            for k, v in node.attrs:
                if k not in attrs:
                    attrs[k] = v
            if attrs.get("name", "").strip().lower() == "robots":
                toks = [
                    t.strip().lower()
                    for t in (attrs.get("content") or "").split(",")
                ]
                if "noindex" in toks or "none" in toks:
                    noindex = True
                if "nofollow" in toks or "none" in toks:
                    nofollow = True
        for child in node.children:
            _scan(child)

    _scan(tree)
    return noindex, nofollow


def links_follow(tree: Node) -> List[str]:
    """Pre-order hrefs like ``links()`` (same first-href-attr /
    valueless-attr rules, nested anchors still scanned), but anchors
    whose ``rel`` attribute contains the ``nofollow`` token
    (space-separated, case-insensitive — the HTML rel token-list rule)
    are excluded. This is the page's FOLLOWABLE outlink list, what a
    meta-robots-aware crawler enqueues."""
    out: List[str] = []
    _collect_links_follow(tree, out)
    return out


def _collect_links_follow(node: Node, out: List[str]) -> None:
    if isinstance(node, str):
        return
    if node.tag == "a":
        href = None
        href_seen = False
        rel = None
        for name, value in node.attrs:
            if name == "href" and not href_seen:
                href_seen = True
                if value != "href":  # valueless attr -> skipped
                    href = value
            elif name == "rel" and rel is None:
                rel = value
        if href is not None and "nofollow" not in (rel or "").lower().split():
            out.append(href)
    for child in node.children:
        _collect_links_follow(child, out)


def canonical_href(tree: Node) -> Optional[str]:
    """First ``<link rel=canonical href=...>`` target (RFC 6596) — the
    publisher's preferred-URL declaration, pre-order first-wins like
    ``links()``; the rel attribute is an HTML token list (space
    separated, case-insensitive), valueless href attrs are skipped.
    Returns None when the page declares no canonical."""
    found: List[str] = []

    def _scan(node) -> None:
        if isinstance(node, str) or found:
            return
        if node.tag == "link":
            href = None
            href_seen = False
            rel = None
            for name, value in node.attrs:
                if name == "href" and not href_seen:
                    href_seen = True
                    if value != "href":
                        href = value
                elif name == "rel" and rel is None:
                    rel = value
            if href is not None and "canonical" in (rel or "").lower().split():
                found.append(href)
                return
        for child in node.children:
            _scan(child)

    _scan(tree)
    return found[0] if found else None
