"""4-component Adobe JPEG decode (print-workflow CMYK/YCCK streams, the
kind Photoshop exports onto the real web): APP14 ColorTransform routing
(0 = stored inverted-CMYK planes, 2 = YCCK), the libjpeg-consumer
display composite R = S_c*S_k/255, full-precision scan machinery reuse,
and the honest refusal when APP14 is absent (CMYK polarity would be a
guess)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from see_spark.core.jpeg import decode_jpeg, encode_jpeg


def _expected_rgb(stored: np.ndarray) -> np.ndarray:
    """The documented display composite over STORED (inverted) CMYK."""
    sk = stored[:, :, 3].astype(np.float64)
    return np.clip(
        np.round(stored[:, :, :3].astype(np.float64) * sk[:, :, None] / 255.0),
        0, 255,
    ).astype(np.uint8)


@pytest.mark.parametrize("transform", [0, 2])
def test_solid_cmyk_roundtrip_exact(transform):
    solid = np.zeros((16, 24, 4), np.uint8)
    solid[:, :] = [200, 120, 80, 220]
    dec = decode_jpeg(encode_jpeg(solid, quality=95, adobe_transform=transform))
    assert dec.shape == (16, 24, 3)
    err = np.abs(dec.astype(int) - _expected_rgb(solid).astype(int)).max()
    assert err <= 2


@pytest.mark.parametrize("transform", [0, 2])
def test_random_cmyk_within_codec_tolerance(transform):
    rng = np.random.default_rng(transform)
    img = rng.integers(60, 200, (24, 32, 4), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95, adobe_transform=transform))
    mae = np.abs(dec.astype(int) - _expected_rgb(img).astype(int)).mean()
    assert mae < 12


def test_four_component_without_app14_raises():
    solid = np.full((8, 8, 4), 128, np.uint8)
    payload = bytearray(encode_jpeg(solid, quality=90, adobe_transform=0))
    i = payload.find(b"\xff\xee")
    assert i > 0
    seglen = struct.unpack(">H", payload[i + 2:i + 4])[0]
    del payload[i:i + 2 + seglen]
    with pytest.raises(ValueError, match="APP14"):
        decode_jpeg(bytes(payload))


def test_zero_k_plane_is_black():
    """K stored as 0 (full black under the inverted convention) must
    composite to black regardless of CMY."""
    img = np.zeros((8, 8, 4), np.uint8)
    img[:, :, :3] = 255
    dec = decode_jpeg(encode_jpeg(img, quality=95, adobe_transform=0))
    assert int(dec.max()) <= 2


def test_encode_requires_declared_transform():
    with pytest.raises(ValueError, match="adobe_transform"):
        encode_jpeg(np.zeros((8, 8, 4), np.uint8))


def test_three_component_paths_unchanged():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=92))
    assert dec.shape == img.shape


def test_image_features_decodes_cmyk_rows(spark):
    from see_spark.operators.multimodal import image_features

    solid = np.zeros((10, 12, 4), np.uint8)
    solid[:, :] = [250, 40, 90, 200]
    media = spark.createDataFrame(
        [
            ("ycck", "image", bytes(encode_jpeg(solid, quality=95, adobe_transform=2))),
            ("cmyk", "image", bytes(encode_jpeg(solid, quality=95, adobe_transform=0))),
        ],
        "media_id string, kind string, payload binary",
    )
    out = {r["media_id"]: r for r in image_features(media).collect()}
    want_mean = float(_expected_rgb(solid).mean())
    for k in ("ycck", "cmyk"):
        assert out[k]["decode_error"] is None
        assert (out[k]["width"], out[k]["height"], out[k]["n_channels"]) == (12, 10, 3)
        assert abs(out[k]["pixel_mean"] - want_mean) < 2.0
