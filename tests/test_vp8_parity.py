"""Behavioral conformance of the clean-room VP8 decoder against the
system libwebp (skipped where libwebp is absent): every stream must
decode to bit-identical Y/U/V planes in BOTH directions —

- forward: libwebp-encoded images (segments, normal loop filter,
  B_PRED, the full token surface as a production encoder emits it)
  decoded by sources/vp8.py;
- reverse: streams from this module's minimal encoder — including
  knob settings libwebp's encoder never produces (simple filter,
  nonzero sharpness, 2/4/8 token partitions, skip coding) — decoded
  by libwebp.

This cross-check also validates the mechanical table transcription in
sources/vp8_tables.py (see tools/extract_vp8_tables.py)."""

from __future__ import annotations

import numpy as np
import pytest

from hortacloud_importer_spark.sources.vp8 import (
    decode_vp8,
    encode_vp8,
    encode_webp_lossy,
)

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from libwebp_ref import decode_yuv, encode_rgb, load, vp8_chunk  # noqa: E402

LIB = load()

pytestmark = pytest.mark.skipif(LIB is None, reason="libwebp not present")


def _image(kind: str, h: int, w: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "noise":
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if kind == "grad":
        return np.stack(
            [(yy * 5) % 256, (xx * 7) % 256, (xx * 3 + yy * 2) % 256], -1
        ).astype(np.uint8)
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :, 0] = (yy * 9) % 256
    img[: h // 2 or 1, :, 1] = rng.integers(0, 256, (h // 2 or 1, w))
    img[:, : w // 3 or 1, 2] = 255
    return img


@pytest.mark.parametrize("kind", ["noise", "grad", "mixed"])
@pytest.mark.parametrize("size", [(16, 16), (33, 17), (64, 64), (80, 48)])
@pytest.mark.parametrize("quality", [10.0, 50.0, 90.0])
def test_forward_parity_libwebp_encoded(kind, size, quality):
    h, w = size
    img = _image(kind, h, w, seed=h * 7 + w + int(quality))
    data = encode_rgb(LIB, img, quality)
    ry, ru, rv = decode_yuv(LIB, data)
    my, mu, mv = decode_vp8(vp8_chunk(data))
    np.testing.assert_array_equal(ry, my)
    np.testing.assert_array_equal(ru, mu)
    np.testing.assert_array_equal(rv, mv)


def test_forward_parity_tiny_and_odd_sizes():
    for h, w in ((1, 1), (3, 7), (15, 15), (17, 31)):
        img = _image("noise", h, w, seed=h * 100 + w)
        data = encode_rgb(LIB, img, 75.0)
        ry, ru, rv = decode_yuv(LIB, data)
        my, mu, mv = decode_vp8(vp8_chunk(data))
        np.testing.assert_array_equal(ry, my)
        np.testing.assert_array_equal(ru, mu)
        np.testing.assert_array_equal(rv, mv)


@pytest.mark.parametrize("filter_type,filter_level,sharpness", [
    (0, 0, 0),       # unfiltered
    (0, 25, 0),      # normal filter
    (0, 63, 3),      # normal, max level, sharpness
    (1, 18, 0),      # simple filter (libwebp's encoder never emits it)
    (1, 40, 6),      # simple + sharpness
])
@pytest.mark.parametrize("n_partitions", [1, 4])
def test_reverse_parity_own_encoder(filter_type, filter_level, sharpness,
                                    n_partitions):
    rng = np.random.default_rng(filter_level * 8 + sharpness + n_partitions)
    vals = rng.integers(16, 236, (3, 4)).astype(np.uint8)
    yl = np.zeros((3, 4, 16, 16), np.int64)
    mask = rng.random(yl.shape) < 0.2
    yl[mask] = rng.integers(-60, 61, int(mask.sum()))
    webp = encode_webp_lossy(
        vals, filter_type=filter_type, filter_level=filter_level,
        sharpness=sharpness, n_partitions=n_partitions, use_skip=True,
        y_levels=yl,
    )
    ry, ru, rv = decode_yuv(LIB, webp)
    my, mu, mv = decode_vp8(vp8_chunk(webp))
    np.testing.assert_array_equal(ry, my)
    np.testing.assert_array_equal(ru, mu)
    np.testing.assert_array_equal(rv, mv)


def test_token_category_extremes_roundtrip_via_libwebp():
    """Large quantized levels exercise cat3..cat6 extra-bit decoding;
    libwebp must agree bit-for-bit."""
    vals = np.full((2, 2), 128, np.uint8)
    yl = np.zeros((2, 2, 16, 16), np.int64)
    yl[0, 0, 0, 1:5] = (5, 19, 67, 800)   # cat1, cat4, cat6 bases
    yl[1, 1, 5, 1:4] = (-2048, 34, -66)   # cat6 max magnitude
    webp = encode_webp_lossy(vals, y_levels=yl)
    ry, ru, rv = decode_yuv(LIB, webp)
    my, mu, mv = decode_vp8(vp8_chunk(webp))
    np.testing.assert_array_equal(ry, my)
    np.testing.assert_array_equal(ru, mu)
    np.testing.assert_array_equal(rv, mv)
