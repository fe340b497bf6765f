"""HTML parse/text/title/links goldens, 1:1 from
apps/crawler/test/see_html_test.erl:4-21."""

from see_spark.core.htmlx import Element, links, parse, text_parts, title, to_spans


def test_parse_html():
    content = (
        "lorem <!doctype html>ipsum<b foo='bar'> dolor </b> <empty attr=val/>"
        " <p> sit <i> amet</i> <? xxx ?> <!-- aaa --> </xx>"
    )
    tree = parse(content)
    assert tree.tag == "root"
    assert tree.children == [
        "lorem ",
        "ipsum",
        Element("b", [("foo", "bar")], [" dolor "]),
        Element("empty", [("attr", "val")], []),
        Element("p", [], [" sit ", Element("i", [], [" amet"])]),
    ]


def test_text():
    tree = parse("lorem<p foo=bar> <p>ipsum</p>dolor</p>sit amet")
    # reference interleaves single-space separators (see_html.erl:39-52)
    assert text_parts(tree) == ["lorem", "ipsum", "dolor", "sit amet"]


def test_title():
    tree = parse(
        "lorem <title foo=bar>this is<p>title</p></title> ipsum"
        " <title>not title</title>"
    )
    assert title(tree) == "this is title"


def test_links():
    tree = parse(
        "<html><a href=url1>link1</a></html> <a href='url2'>link2</a>"
        " <a>bad link</a> <a href>bad link</a>"
    )
    assert links(tree) == ["url1", "url2"]


def test_no_title_is_none():
    assert title(parse("<p>no title here</p>")) is None


def test_to_spans_interleaving():
    spans = to_spans(
        "<title>T</title><p>hello</p><a href='u1'>x</a><img/>world"
    )
    kinds = [s[0] for s in spans]
    offsets = [s[3] for s in spans]
    assert kinds == ["title", "text", "text", "text", "text", "link"]
    assert offsets == list(range(len(spans)))
    assert spans[0][1] == "T"
    assert [s[2] for s in spans if s[0] == "link"] == ["u1"]
