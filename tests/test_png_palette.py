"""Indexed-color, sub-byte, gray+alpha, and tRNS PNG decode (RFC 2083
§4.1.2 PLTE, §4.2.1 tRNS, §2.3 sub-byte MSB-first sample packing) — the
color types a real web corpus's icon/logo PNGs actually use. Contract as
everywhere in the codec family: each exotic fixture's decode equals the
straightforward numpy expansion of its source arrays, across interlace
methods and a size sweep, and out-of-subset/malformed inputs raise
ValueError."""

from __future__ import annotations

import numpy as np
import pytest

from see_spark.core.png import (
    decode_png,
    encode_png,
    encode_png_gray,
    encode_png_palette,
)


@pytest.mark.parametrize("interlace", [0, 1])
@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (8, 8), (13, 17), (23, 9)])
def test_palette8_roundtrip(h, w, interlace):
    rng = np.random.default_rng(h * 31 + w + interlace)
    idx = rng.integers(0, 16, (h, w), dtype=np.uint8)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    out = decode_png(encode_png_palette(idx, pal, interlace=interlace))
    assert np.array_equal(out, pal[idx])


@pytest.mark.parametrize("interlace", [0, 1])
@pytest.mark.parametrize("depth", [1, 2, 4])
def test_palette_subbyte_roundtrip(depth, interlace):
    """Sub-byte indices pack MSB-first with per-scanline pad bits; odd
    widths exercise the pad-bit discard, Adam7 exercises per-pass
    restriding."""
    rng = np.random.default_rng(depth * 7 + interlace)
    idx = rng.integers(0, 1 << depth, (11, 13), dtype=np.uint8)
    pal = rng.integers(0, 256, (1 << depth, 3), dtype=np.uint8)
    out = decode_png(
        encode_png_palette(idx, pal, depth=depth, interlace=interlace)
    )
    assert np.array_equal(out, pal[idx])


def test_palette_trns_alpha_table():
    """tRNS for type 3: per-entry alpha, entries past the table opaque."""
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 8, (9, 9), dtype=np.uint8)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    out = decode_png(encode_png_palette(idx, pal, trns=[0, 100, 200]))
    assert out.shape == (9, 9, 4)
    alpha = np.full(8, 255, np.uint8)
    alpha[:3] = [0, 100, 200]
    assert np.array_equal(out[:, :, :3], pal[idx])
    assert np.array_equal(out[:, :, 3], alpha[idx])


@pytest.mark.parametrize("interlace", [0, 1])
@pytest.mark.parametrize("depth", [1, 2, 4])
def test_gray_subbyte_upscales_exactly(depth, interlace):
    """255/(2^d - 1) is an exact integer for d in 1/2/4, so sub-byte
    gray decode is exact: 1-bit -> {0, 255}, 2-bit -> {0, 85, 170, 255},
    4-bit -> multiples of 17."""
    rng = np.random.default_rng(depth + 10 * interlace)
    g = rng.integers(0, 1 << depth, (10, 7), dtype=np.uint8)
    out = decode_png(encode_png_gray(g, depth, interlace=interlace))
    assert out.shape == (10, 7, 1)
    assert np.array_equal(out[:, :, 0], g * (255 // ((1 << depth) - 1)))


def test_gray_alpha_roundtrip():
    rng = np.random.default_rng(8)
    ga = rng.integers(0, 256, (12, 5, 2), dtype=np.uint8)
    for interlace in (0, 1):
        assert np.array_equal(decode_png(encode_png(ga, interlace=interlace)), ga)


def test_rgb_transparent_color_key():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
    img[3, 4] = img[0, 0] = [255, 255, 255]
    out = decode_png(encode_png(img, transparent=(255, 255, 255)))
    assert out.shape == (8, 8, 4)
    assert out[3, 4, 3] == 0 and out[0, 0, 3] == 0
    # every non-key pixel opaque
    key = (img == [255, 255, 255]).all(axis=2)
    assert np.array_equal(out[:, :, 3] == 0, key)


def test_gray_transparent_key_compares_raw_sample():
    """The tRNS key holds the RAW file-depth sample (compared before the
    255/(2^d-1) upscale)."""
    g = np.array([[0, 7, 15], [7, 7, 1]], dtype=np.uint8)
    out = decode_png(encode_png_gray(g, 4, transparent=7))
    assert out.shape == (2, 3, 2)
    assert np.array_equal(out[:, :, 1] == 0, g == 7)
    assert out[0, 2, 0] == 255  # 15 * 17


def test_missing_plte_raises():
    # palette IHDR but no PLTE chunk: build via encoder then strip PLTE
    import struct, zlib

    payload = encode_png_palette(
        np.zeros((2, 2), np.uint8), np.zeros((1, 3), np.uint8)
    )
    pos, parts = 8, [payload[:8]]
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        if tag != b"PLTE":
            parts.append(payload[pos:pos + 12 + length])
        pos += 12 + length
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(b"".join(parts))


def test_index_beyond_palette_raises():
    idx = np.full((2, 2), 5, np.uint8)
    pal = np.zeros((8, 3), np.uint8)
    payload = bytearray(encode_png_palette(idx, pal))
    # shrink the PLTE to 4 entries by rebuilding
    import struct, zlib

    small = encode_png_palette(np.zeros((2, 2), np.uint8), pal[:4])
    # splice: IHDR+PLTE(4) from small, IDAT from payload
    def chunks(b):
        pos, out = 8, {}
        while pos + 8 <= len(b):
            (length,) = struct.unpack(">I", b[pos:pos + 4])
            tag = b[pos + 4:pos + 8]
            out.setdefault(tag, []).append(b[pos:pos + 12 + length])
            pos += 12 + length
        return out

    c_small, c_big = chunks(small), chunks(bytes(payload))
    spliced = (
        b"\x89PNG\r\n\x1a\n"
        + c_small[b"IHDR"][0]
        + c_small[b"PLTE"][0]
        + b"".join(c_big[b"IDAT"])
        + c_small[b"IEND"][0]
    )
    with pytest.raises(ValueError, match="palette index"):
        decode_png(spliced)


@pytest.mark.parametrize("interlace", [0, 1])
@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_16bit_decodes_to_high_bytes(ch, interlace):
    """Depth-16 samples decode with the standard high-byte 16->8 display
    conversion, across all four direct color types and both interlace
    methods."""
    from see_spark.core.png import encode_png_16

    rng = np.random.default_rng(ch * 5 + interlace)
    img = rng.integers(0, 65536, (11, 7, ch), dtype=np.uint16)
    out = decode_png(encode_png_16(img, interlace=interlace))
    assert out.dtype == np.uint8
    assert np.array_equal(out, (img >> 8).astype(np.uint8))


def test_16bit_trns_compares_full_precision():
    """Two 16-bit colors sharing high bytes must not alias in the tRNS
    transparent-color key (compared at raw precision, not post-convert)."""
    from see_spark.core.png import encode_png_16

    img = np.zeros((2, 2, 3), dtype=np.uint16)
    img[0, 0] = [0x1234, 1, 2]
    img[0, 1] = [0x1299, 1, 2]  # same high bytes, different low byte
    out = decode_png(encode_png_16(img, transparent=(0x1234, 1, 2)))
    assert out.shape == (2, 2, 4)
    assert out[0, 0, 3] == 0 and out[0, 1, 3] == 255


def test_16bit_palette_still_rejected():
    # depth 16 is illegal for palette color (RFC 2083 table in §4.1.1)
    import struct, zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )
    payload = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", b"\x00" * 3)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(payload)


def test_image_features_decodes_palette_rows(spark):
    """Operator-level: indexed and sub-byte payloads route as decoded."""
    from see_spark.operators.multimodal import image_features

    rng = np.random.default_rng(11)
    idx = rng.integers(0, 4, (10, 8), dtype=np.uint8)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    g = rng.integers(0, 2, (6, 6), dtype=np.uint8)
    media = spark.createDataFrame(
        [
            ("pal", "image", bytes(encode_png_palette(idx, pal, depth=2))),
            ("g1", "image", bytes(encode_png_gray(g, 1))),
        ],
        "media_id string, kind string, payload binary",
    )
    out = {r["media_id"]: r for r in image_features(media).collect()}
    assert out["pal"]["decode_error"] is None
    assert (out["pal"]["width"], out["pal"]["height"], out["pal"]["n_channels"]) == (8, 10, 3)
    assert out["pal"]["pixel_mean"] == pytest.approx(float(pal[idx].mean()))
    assert out["g1"]["decode_error"] is None
    assert out["g1"]["pixel_mean"] == pytest.approx(float((g * 255).mean()))
