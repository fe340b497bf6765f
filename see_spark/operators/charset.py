"""Charset sniffing for fetched bodies — the WHATWG-ish precedence chain.

The reference decodes everything as UTF-8 (its Erlang binaries pass
through unmodified; see_html tokenizes bytes); the production fetcher
(sources/fetcher.py:http_get) already distrusts the transport default
(requests' ISO-8859-1 fallback) and uses the header charset only when
the server actually sent one. This operator is the AUDIT/ROUTING side
of that policy at corpus scale: given the stored raw evidence — the
Content-Type header, the first bytes (hex), and a lossy ASCII
projection of the prefix — classify every document's encoding with the
standard precedence:

  1. **BOM** (authoritative): EF BB BF -> utf-8; FF FE -> utf-16le;
     FE FF -> utf-16be. A BOM beats everything (WHATWG encoding spec).
  2. **meta tag**: <meta charset=X> or the http-equiv content=...
     charset=X form, matched case-insensitively in the prefix.
  3. **header**: charset= parameter in Content-Type.
  4. **default**: utf-8 (the modern web default; NOT latin-1).

Everything is row-local Catalyst (substring/regexp on the stored
columns — no Python, no decode round-trip), so the pass is scan-bound
at 10^10 docs and exactly reproducible in SQL for the oracle. Charset
names are lowercased and unquoted; x-user-defined etc. pass through
verbatim (policy of what to DO with odd charsets lives downstream).

Returns (doc_id, charset, charset_source) with source in
('bom', 'meta', 'header', 'default').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# charset= value: letters/digits/dot/dash/underscore/colon, optionally quoted
_META_RE = r'<meta[^>]*charset\s*=\s*["\']?([a-zA-Z0-9._:-]+)'
_HEADER_RE = r'charset\s*=\s*["\']?([a-zA-Z0-9._:-]+)'


def charset_sniff(
    docs: DataFrame,
    id_col: str = "doc_id",
    header_col: str = "content_type",
    hex_col: str = "body_prefix_hex",
    text_col: str = "body_prefix",
) -> DataFrame:
    """See module doc. ``hex_col`` is the lowercased hex of the first
    raw bytes (the crawl stores it alongside the decoded body for
    exactly this kind of re-audit); ``text_col`` is the lossy ASCII
    projection used only for the meta-tag regex."""
    hexpfx = F.lower(F.col(hex_col))
    bom = (
        F.when(hexpfx.startswith("efbbbf"), F.lit("utf-8"))
        .when(hexpfx.startswith("fffe"), F.lit("utf-16le"))
        .when(hexpfx.startswith("feff"), F.lit("utf-16be"))
        .otherwise(F.lit(""))
    )
    meta = F.lower(F.regexp_extract(F.lower(F.col(text_col)), _META_RE, 1))
    header = F.lower(
        F.regexp_extract(F.lower(F.coalesce(F.col(header_col), F.lit(""))),
                         _HEADER_RE, 1)
    )
    charset = (
        F.when(bom != "", bom)
        .when(meta != "", meta)
        .when(header != "", header)
        .otherwise(F.lit("utf-8"))
    )
    source = (
        F.when(bom != "", F.lit("bom"))
        .when(meta != "", F.lit("meta"))
        .when(header != "", F.lit("header"))
        .otherwise(F.lit("default"))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        charset.alias("charset"),
        source.alias("charset_source"),
    )
