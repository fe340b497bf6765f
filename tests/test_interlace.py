"""Interlaced image decode: Adam7 PNG (RFC 2083 §2.6/§8.2) and four-pass
GIF (GIF89a appendix E). The golden contract: an interlaced encode of a
fixture decodes byte-identical to its non-interlaced twin (both encoders
are lossless filter-0/literal-LZW, so both equal the source pixels) —
the de-interleave is a pure permutation and any off-by-one in the pass
grid breaks exactness somewhere across the size sweep (sizes below 8
exercise empty Adam7 passes; odd sizes exercise the ceil pass
dimensions)."""

from __future__ import annotations

import numpy as np
import pytest

from see_spark.core.gif import decode_gif, encode_gif
from see_spark.core.png import decode_png, encode_png

SIZES = [(1, 1), (1, 9), (9, 1), (2, 3), (3, 5), (7, 7), (8, 8),
         (13, 17), (16, 16), (31, 23)]


@pytest.mark.parametrize("h,w", SIZES)
@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_adam7_matches_plain_twin(h, w, ch):
    rng = np.random.default_rng(h * 100 + w + ch)
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    plain = decode_png(encode_png(img, interlace=0))
    inter = decode_png(encode_png(img, interlace=1))
    assert np.array_equal(plain, img.reshape(h, w, ch))
    assert np.array_equal(inter, plain)


def test_png_adam7_gradient_structure():
    """Non-random pin: a coordinate gradient decodes positionally exact
    (catches a pass-scatter transpose that a permutation-closed random
    roundtrip could in principle survive)."""
    h, w = 21, 13
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = (y, x, (7 * y + 3 * x) % 256)
    assert np.array_equal(decode_png(encode_png(img, interlace=1)), img)


def test_png_interlaced_truncated_stream_raises():
    img = np.random.default_rng(0).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    payload = encode_png(img, interlace=1)
    import struct, zlib

    # rebuild with the last pass's scanlines missing from the zlib stream
    pos = 8
    chunks = {}
    order = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        chunks.setdefault(tag, b"")
        chunks[tag] += payload[pos + 8:pos + 8 + length]
        order.append(tag)
        pos += 12 + length
    raw = zlib.decompress(chunks[b"IDAT"])
    cut = zlib.compress(raw[: len(raw) - (16 * 3 + 1)])  # drop one scanline

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    rebuilt = (
        payload[:8]
        + chunk(b"IHDR", chunks[b"IHDR"])
        + chunk(b"IDAT", cut)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(rebuilt)


@pytest.mark.parametrize("h,w", [(1, 4), (2, 3), (3, 3), (4, 4), (8, 5),
                                 (13, 7), (16, 16), (29, 5)])
def test_gif_interlace_matches_plain_twin(h, w):
    rng = np.random.default_rng(h * 37 + w)
    idx = rng.integers(0, 8, size=(h, w), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    plain = decode_gif(encode_gif(idx, pal))
    inter = decode_gif(encode_gif(idx, pal, interlace=True))
    assert np.array_equal(plain, pal[idx])
    assert np.array_equal(inter, plain)


def test_gif_interlace_row_identity():
    """Row-gradient pin: display row y carries palette index y%8 after
    de-interleave, for a height covering all four passes."""
    h, w = 19, 3
    idx = (np.arange(h) % 8).astype(np.uint8)[:, None].repeat(w, axis=1)
    pal = np.arange(24, dtype=np.uint8).reshape(8, 3)
    out = decode_gif(encode_gif(idx, pal, interlace=True))
    assert np.array_equal(out, pal[idx])


def test_image_features_decodes_interlaced_rows(spark):
    """Operator-level: interlaced PNG and GIF payloads route as DECODED
    (width/height/pixel stats), not decode_error."""
    from see_spark.operators.multimodal import image_features

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (10, 6), dtype=np.uint8)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [
            ("png_i", "image", bytes(encode_png(img, interlace=1))),
            ("gif_i", "image", bytes(encode_gif(idx, pal, interlace=True))),
        ],
        "media_id string, kind string, payload binary",
    )
    out = {r["media_id"]: r for r in image_features(media).collect()}
    assert out["png_i"]["decode_error"] is None
    assert (out["png_i"]["width"], out["png_i"]["height"]) == (9, 12)
    assert out["png_i"]["pixel_mean"] == pytest.approx(float(img.mean()))
    assert out["gif_i"]["decode_error"] is None
    assert (out["gif_i"]["width"], out["gif_i"]["height"]) == (6, 10)
    assert out["gif_i"]["pixel_mean"] == pytest.approx(float(pal[idx].mean()))
