"""WARC source/sink: spec framing, kernel round-trip, Spark round-trip,
byte-reproducibility across parallelism."""

import gzip
import hashlib

import pytest

from see_spark.sources.warc import (
    build_warc_file,
    deterministic_record_id,
    parse_http_response,
    parse_warc,
    read_warc,
    read_warc_file,
    response_record,
    warcinfo_record,
    write_warc,
)

DATE = "2026-01-01T00:00:00Z"


# ---------------------------------------------------------------- kernels

def test_response_record_framing():
    rec = response_record(
        "http://a.com/x", 200, "text/html", b"<b>hi</b>", DATE
    )
    # version line + CRLF header block + blank line + body + CRLF CRLF
    assert rec.startswith(b"WARC/1.0\r\n")
    assert rec.endswith(b"\r\n\r\n")
    head, _, rest = rec.partition(b"\r\n\r\n")
    assert b"WARC-Type: response" in head
    assert b"WARC-Target-URI: http://a.com/x" in head
    # Content-Length counts the HTTP payload exactly
    length = int(
        [l for l in head.split(b"\r\n") if l.startswith(b"Content-Length")][0]
        .split(b":")[1]
    )
    assert rest[:-4][:length] == rest[:-4]  # full body present
    http = parse_http_response(rest[:-4])
    assert http["status"] == 200
    assert http["content_type"] == "text/html"
    assert http["body"] == b"<b>hi</b>"


def test_record_id_deterministic_and_distinct():
    a = deterministic_record_id("http://a.com", DATE)
    assert a == deterministic_record_id("http://a.com", DATE)
    assert a != deterministic_record_id("http://b.com", DATE)
    assert a.startswith("<urn:uuid:") and a.endswith(">")


def test_parse_warc_body_containing_warc_magic():
    # framing must follow Content-Length, not content sniffing
    tricky = b"line1\r\n\r\nWARC/1.0\r\nfake: x\r\n\r\n"
    rec = response_record("http://t.com", 200, "text/plain", tricky, DATE)
    parsed = parse_warc(warcinfo_record(DATE, "f.warc") + rec)
    assert len(parsed) == 2
    http = parse_http_response(parsed[1]["body"])
    assert http["body"] == tricky


def test_kernel_roundtrip_multimember_gzip():
    rows = [
        {"url": "http://a.com/1", "status": 200, "content_type": "text/html",
         "body": "hello <a href=x>l</a>", "redirect_to": None},
        {"url": "http://a.com/2", "status": 302, "content_type": None,
         "body": "", "redirect_to": "http://a.com/3"},
        {"url": "http://b.com/ż", "status": 404, "content_type": "text/plain",
         "body": "zażółć", "redirect_to": None},
    ]
    blob = build_warc_file(rows, "t.warc.gz", DATE)
    # multi-member gzip: each record its own member => >=4 gzip magics
    assert blob.count(b"\x1f\x8b") >= 4
    back = read_warc_file(blob)
    assert [(r["url"], r["status"], r["content_type"], r["body"], r["redirect_to"])
            for r in back] == [
        ("http://a.com/1", 200, "text/html", "hello <a href=x>l</a>", None),
        ("http://a.com/2", 302, None, "", "http://a.com/3"),
        ("http://b.com/ż", 404, "text/plain", "zażółć", None),
    ]
    # uncompressed .warc also parses
    assert len(read_warc_file(gzip.decompress(blob))) == 3


def test_build_is_byte_reproducible():
    rows = [{"url": f"http://h{i}.com/", "status": 200,
             "content_type": "text/html", "body": f"doc {i}"} for i in range(20)]
    assert build_warc_file(rows, "x.warc.gz", DATE) == build_warc_file(
        rows, "x.warc.gz", DATE
    )


# ---------------------------------------------------------------- spark

@pytest.fixture(scope="module")
def fetched(spark):
    rows = [
        (f"http://host{i % 7}.example/p{i}", 200 if i % 5 else 302,
         "text/html" if i % 3 else "image/png",
         f"body of page {i} with words w{i} w{i+1}" if i % 5 else "",
         None if i % 5 else f"http://host{i % 7}.example/target{i}")
        for i in range(97)
    ]
    return spark.createDataFrame(
        rows, "url string, status int, content_type string, body string, redirect_to string"
    )


def test_spark_roundtrip(spark, fetched, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("warc") / "archive")
    manifest = write_warc(fetched, out, DATE, n_files=4).collect()
    assert sum(m.n_records for m in manifest) == 97
    assert len(manifest) <= 4
    back = read_warc(spark, out)
    orig = {tuple(r) for r in fetched.collect()}
    got = {
        (r.url, r.status, r.content_type, r.body, r.redirect_to)
        for r in back.collect()
    }
    assert got == orig


def test_spark_write_deterministic_across_partitioning(spark, fetched, tmp_path_factory):
    base = tmp_path_factory.mktemp("warcdet")
    hashes = []
    for i, parts in enumerate((1, 13)):
        out = str(base / f"a{i}")
        m = write_warc(fetched.repartition(parts), out, DATE, n_files=3).collect()
        hashes.append(sorted((r.file, r.sha256) for r in m))
    assert hashes[0] == hashes[1]
