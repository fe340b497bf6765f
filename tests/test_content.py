"""Boilerplate removal (core/htmlx.blocks + operators/content.py):
kernel segmentation goldens, link-char attribution, jusText label rules
incl. the context-sensitive neighbor vote, end-to-end extraction over
Spark, and partitioning invariance."""

from __future__ import annotations

from see_spark.core.htmlx import blocks
from see_spark.operators.content import (
    block_stats,
    classify_blocks,
    extract_content,
)

PAGE = (
    "<html><head><title>My Page</title></head><body>"
    "<div><a href=x>nav one</a> <a href=y>nav two</a></div>"
    "<p>the story of a little cat and a big dog is told in the middle of "
    "a quiet town and it is a fine tale of the sort readers enjoy</p>"
    "<p>short note</p>"
    "<p>the end of the tale is near and it is a good end to a good story "
    "told well in the town of the cat and the dog by the fire</p>"
    "<div><a href=z>footer link</a></div>"
    "</body></html>"
)


def test_kernel_segmentation_and_link_chars():
    out = blocks(PAGE)
    texts = [t for _, t, _, _ in out]
    assert texts[0] == "My Page"
    # nav block: all data chars inside <a>
    nav = next(r for r in out if "nav one" in r[1])
    _, t, n_chars, n_link = nav
    assert n_link == len("nav one") + len("nav two")
    # whitespace-only data nodes are dropped by the tolerant parser, so
    # every remaining char of this block is link text
    assert n_chars == n_link
    # paragraph blocks carry zero link chars
    story = next(r for r in out if "little cat" in r[1])
    assert story[3] == 0
    # block ids are dense and ordered
    assert [r[0] for r in out] == list(range(len(out)))


def test_kernel_tolerant_garbage():
    assert blocks("") == []
    assert blocks("plain text, no tags") == [
        (0, "plain text, no tags", 19, 0)
    ]
    out = blocks("<p>unclosed <a href=q>link")
    assert any("unclosed" in r[1] for r in out)


def test_classify_rules(spark):
    rows = [
        # (doc, block, text, n_chars, n_link_chars)
        (1, 0, "menu menu menu", 14, 14),            # link density 1 -> bad
        (1, 1, " ".join(["the"] * 25), 99, 0),        # long+stopwordy -> good
        (1, 2, "tiny", 4, 0),                         # short, between goods?
        (1, 3, " ".join(["of"] * 25), 74, 0),         # good
        (1, 4, "a mid length sentence here now", 30, 0),  # neargood
        (1, 5, "x y z w v u t s", 15, 15),            # bad (density 1)
        (2, 0, "only one lonely block here ok", 29, 0),   # neargood, no good nbr
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, block_id long, text string, n_chars long, n_link_chars long"
    )
    got = {(r.doc_id, r.block_id): r for r in classify_blocks(df).collect()}
    assert got[(1, 0)].label == "bad"
    assert got[(1, 1)].label == "good"
    # short between two goods -> good (both-neighbor rule)
    assert got[(1, 2)].ctx_label == "short" and got[(1, 2)].label == "good"
    assert got[(1, 3)].label == "good"
    # neargood with a good prev neighbor -> good (one-neighbor rule)
    assert got[(1, 4)].ctx_label == "neargood" and got[(1, 4)].label == "good"
    assert got[(1, 5)].label == "bad"
    # neargood with NO decided neighbor -> bad (boundary default)
    assert got[(2, 0)].label == "bad"


def test_end_to_end_extraction(spark):
    good_story = (
        "the story of a little cat and a big dog is told in the middle of "
        "a quiet town and it is a fine tale of the sort readers enjoy"
    )
    df = spark.createDataFrame([(7, PAGE)], ["doc_id", "body"])
    out = extract_content(df).collect()
    assert len(out) == 1
    r = out[0]
    assert good_story in r.content
    assert "nav one" not in r.content
    assert "footer link" not in r.content
    assert r.n_good_blocks >= 2 and r.n_blocks > r.n_good_blocks


def test_partitioning_invariance(spark):
    docs = [(i, PAGE) for i in range(6)]
    base = sorted(
        map(tuple, extract_content(spark.createDataFrame(docs, ["doc_id", "body"]).repartition(1)).collect())
    )
    got = sorted(
        map(tuple, extract_content(spark.createDataFrame(docs, ["doc_id", "body"]).repartition(5)).collect())
    )
    assert got == base


def test_block_stats_schema(spark):
    df = spark.createDataFrame([(1, PAGE)], ["doc_id", "body"])
    out = block_stats(df)
    assert out.columns == ["doc_id", "block_id", "text", "n_chars", "n_link_chars"]
    rows = out.collect()
    assert [r.block_id for r in sorted(rows, key=lambda r: r.block_id)] == list(
        range(len(rows))
    )
