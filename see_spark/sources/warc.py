"""WARC (Web ARChive, ISO 28500 / WARC/1.0) source + sink.

The reference keeps fetched bodies only transiently (the crawler worker
hands the parsed text to the db and drops the raw response,
apps/crawler/src/see_crawler_worker.erl:63-87).  A production crawl at
10^10-URL scale archives the raw fetch stream instead — WARC is the
public interchange format every large crawl corpus (Common Crawl, IA)
uses, so the engine gets a first-class WARC sink for fetch results and a
WARC source that re-materializes the same rows.

Format notes (public spec, WARC/1.0):
  - a record = version line ``WARC/1.0`` + named headers + CRLF CRLF +
    Content-Length body octets + CRLF CRLF;
  - ``response`` records carry ``Content-Type:
    application/http;msgtype=response`` and the payload is a full HTTP/1.1
    response block (status line, headers, body);
  - a ``warcinfo`` record leads each file;
  - ``.warc.gz`` compresses EACH RECORD as its own gzip member so readers
    can split at member boundaries; Python's gzip handles multi-member
    streams transparently on read.

Scale design:
  - the sink assigns every row to a numbered output file by
    ``pmod(xxhash64(url), n_files)`` and writes one file per group via
    ``applyInPandas`` — file CONTENT is a pure function of (rows, date),
    independent of partitioning/parallelism (rows are sorted by url inside
    each file), so archives are byte-reproducible across cluster sizes;
  - the source reads via the ``binaryFile`` datasource (one task per
    file); parallelism = number of archive files, which the sink sizes via
    ``n_files`` (production: target ~1 GiB per file, the Common Crawl
    convention);
  - everything heavy runs executor-side over Arrow batches — the driver
    never sees record payloads.

Determinism: WARC-Date is a caller-supplied ISO instant (crawl-round
metadata, never wall clock) and WARC-Record-ID is a urn:uuid derived from
md5(target-uri + date), so re-running a round re-creates identical bytes.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from typing import Iterable, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CRLF = b"\r\n"

_REASONS = {
    200: "OK",
    301: "Moved Permanently",
    302: "Found",
    404: "Not Found",
    500: "Internal Server Error",
}


# --------------------------------------------------------------------------
# pure kernels (no Spark) — reused by the vectorized sink/source UDFs and
# directly unit-testable against the spec framing
# --------------------------------------------------------------------------

def deterministic_record_id(target_uri: str, date: str) -> str:
    """urn:uuid record id as a pure function of (uri, date)."""
    h = hashlib.md5(f"{target_uri}\x00{date}".encode("utf-8")).hexdigest()
    return (
        f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def _record(warc_type: str, headers: List[tuple], body: bytes) -> bytes:
    out = [b"WARC/1.0", CRLF]
    for k, v in headers:
        out += [k.encode("ascii"), b": ", str(v).encode("utf-8"), CRLF]
    out += [b"Content-Length: ", str(len(body)).encode("ascii"), CRLF]
    out += [CRLF, body, CRLF, CRLF]
    return b"".join(out)


def warcinfo_record(date: str, filename: str, software: str = "see-spark") -> bytes:
    body = (
        f"software: {software}\r\nformat: WARC File Format 1.0\r\n"
    ).encode("utf-8")
    return _record(
        "warcinfo",
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", deterministic_record_id("warcinfo:" + filename, date)),
            ("WARC-Date", date),
            ("WARC-Filename", filename),
            ("Content-Type", "application/warc-fields"),
        ],
        body,
    )


def response_record(
    url: str,
    status: int,
    content_type: Optional[str],
    body: bytes,
    date: str,
    redirect_to: Optional[str] = None,
) -> bytes:
    """A WARC ``response`` record whose payload is the HTTP response block."""
    reason = _REASONS.get(int(status), "Unknown")
    http = [f"HTTP/1.1 {int(status)} {reason}".encode("ascii"), CRLF]
    if content_type:
        http += [b"Content-Type: ", content_type.encode("utf-8"), CRLF]
    if redirect_to:
        http += [b"Location: ", redirect_to.encode("utf-8"), CRLF]
    http += [b"Content-Length: ", str(len(body)).encode("ascii"), CRLF, CRLF, body]
    payload = b"".join(http)
    return _record(
        "response",
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", deterministic_record_id(url, date)),
            ("WARC-Date", date),
            ("WARC-Target-URI", url),
            ("WARC-Payload-Digest", "sha1:" + hashlib.sha1(body).hexdigest()),
            ("Content-Type", "application/http;msgtype=response"),
        ],
        payload,
    )


def parse_warc(data: bytes) -> List[dict]:
    """Parse a (decompressed) WARC byte stream into record dicts.

    Exact-framing parser: walks Content-Length boundaries, never splits on
    body content (bodies may themselves contain blank lines / ``WARC/1.0``
    strings). Unknown record types are surfaced, not dropped, so callers
    can filter.
    """
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = data.index(CRLF + CRLF, pos)
        head = data[pos:head_end].decode("utf-8")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line at offset {pos}: {lines[0]!r}")
        headers = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        body_start = head_end + 4
        body = data[body_start : body_start + length]
        pos = body_start + length + 4  # trailing CRLF CRLF
        records.append({"headers": headers, "body": body})
    return records


def parse_http_response(payload: bytes) -> dict:
    """Split an ``application/http;msgtype=response`` payload."""
    head_end = payload.index(CRLF + CRLF)
    head = payload[:head_end].decode("utf-8", errors="replace")
    lines = head.split("\r\n")
    status = int(lines[0].split(" ", 2)[1])
    hdrs = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        hdrs[k.strip().lower()] = v.strip()
    return {
        "status": status,
        "content_type": hdrs.get("content-type"),
        "redirect_to": hdrs.get("location"),
        "body": payload[head_end + 4 :],
    }


def build_warc_file(rows: Iterable[dict], filename: str, date: str) -> bytes:
    """warcinfo + one response record per row, each its own gzip member.

    ``rows`` must already be in the caller's pinned order (the sink sorts
    by url); mtime=0 and fixed filename in the gzip header keep the bytes
    reproducible.
    """
    out = io.BytesIO()

    def member(raw: bytes) -> None:
        buf = io.BytesIO()
        with gzip.GzipFile(filename="", mode="wb", fileobj=buf, mtime=0) as gz:
            gz.write(raw)
        out.write(buf.getvalue())

    member(warcinfo_record(date, filename))
    for r in rows:
        body = r.get("body") or ""
        if isinstance(body, str):
            body = body.encode("utf-8")
        member(
            response_record(
                r["url"],
                int(r["status"]),
                r.get("content_type"),
                body,
                date,
                r.get("redirect_to"),
            )
        )
    return out.getvalue()


def read_warc_file(data: bytes) -> List[dict]:
    """Decompress + parse one .warc.gz (or plain .warc) into fetch rows."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    rows = []
    for rec in parse_warc(data):
        if rec["headers"].get("warc-type") != "response":
            continue
        http = parse_http_response(rec["body"])
        rows.append(
            {
                "url": rec["headers"]["warc-target-uri"],
                "status": http["status"],
                "content_type": http["content_type"],
                "body": http["body"].decode("utf-8", errors="replace"),
                "redirect_to": http["redirect_to"],
                "warc_date": rec["headers"]["warc-date"],
                "record_id": rec["headers"]["warc-record-id"],
            }
        )
    return rows


# --------------------------------------------------------------------------
# Spark sink / source
# --------------------------------------------------------------------------

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

READ_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("redirect_to", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("file", T.StringType()),
    ]
)


def write_warc(
    fetched: DataFrame,
    path: str,
    date: str,
    n_files: int = 8,
) -> DataFrame:
    """Archive fetch results (url, status, content_type, body[, redirect_to])
    as ``{path}/part-NNNNN.warc.gz``; returns the manifest DataFrame.

    One ``applyInPandas`` group per output file: the groupBy shuffles each
    file's rows to one task, which writes its file and emits a manifest
    row — no driver materialization, no cross-file coordination. File
    membership/content depend only on (url set, date, n_files).
    """
    import os

    import pandas as pd

    os.makedirs(path, exist_ok=True)
    cols = [c for c in ("url", "status", "content_type", "body", "redirect_to")
            if c in fetched.columns]
    src = fetched.select(*cols).withColumn(
        "_file_no", F.pmod(F.xxhash64("url"), F.lit(int(n_files)))
    )

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        file_no = int(pdf["_file_no"].iloc[0])
        name = f"part-{file_no:05d}.warc.gz"
        # null-safety: a failed fetch has null status/content_type/body
        # (pandas renders them NaN) — archive it as status 0, empty body,
        # so the archive still covers EVERY attempted URL
        pdf = pdf.astype(object).where(pd.notnull(pdf), None)
        rows = pdf.sort_values("url").to_dict("records")
        for r in rows:
            if r.get("status") is None:
                r["status"] = 0
        blob = build_warc_file(rows, name, date)
        full = os.path.join(path, name)
        with open(full, "wb") as f:
            f.write(blob)
        return pd.DataFrame(
            [
                {
                    "file": name,
                    "n_records": len(rows),
                    "n_bytes": len(blob),
                    "sha256": hashlib.sha256(blob).hexdigest(),
                }
            ]
        )

    return src.groupBy("_file_no").applyInPandas(_write, schema=MANIFEST_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC source: one binaryFile task per archive file, parsed in Arrow
    batches executor-side. Column-prunes nothing (a WARC file is one blob);
    size files at write time for parallelism."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path + "/*.warc*")

    def _parse(frames):
        import os

        for pdf in frames:
            out = []
            for _, row in pdf.iterrows():
                fname = os.path.basename(row["path"])
                for rec in read_warc_file(bytes(row["content"])):
                    rec["file"] = fname
                    out.append(rec)
            yield pd.DataFrame(
                out,
                columns=[f.name for f in READ_SCHEMA.fields],
            )

    return files.select("path", "content").mapInPandas(_parse, schema=READ_SCHEMA)
