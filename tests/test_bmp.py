"""Clean-room BMP codec (sources/bmp.py): hand-built headers,
roundtrips across depths/strides, row-order variants, and gates."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hortacloud_importer_spark.sources.bmp import (
    BmpParseError,
    decode_bmp,
    encode_bmp,
)


def test_hand_built_24bit_decodes():
    """A 2x2 24-bit BMP assembled byte-by-byte: BGR order on disk,
    bottom-up rows, 4-byte row padding (2*3=6 -> stride 8)."""
    rows = (
        bytes([255, 0, 0, 0, 255, 0, 0, 0])  # bottom row: blue, green + pad
        + bytes([0, 0, 255, 255, 255, 255, 0, 0])  # top row: red, white + pad
    )
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(rows), 0, 0, 0, 0)
    out = decode_bmp(hdr + info + rows)
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out[0, 0], [255, 0, 0])  # red (file stored BGR)
    assert np.array_equal(out[0, 1], [255, 255, 255])
    assert np.array_equal(out[1, 0], [0, 0, 255])
    assert np.array_equal(out[1, 1], [0, 255, 0])


def test_top_down_negative_height():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    enc = bytearray(encode_bmp(img))
    h = struct.unpack_from("<i", enc, 22)[0]
    struct.pack_into("<i", enc, 22, -h)  # flip to top-down
    body_at = struct.unpack_from("<I", enc, 10)[0]
    stride = ((3 * 3 + 3) & ~3)
    rows = bytes(enc[body_at:])
    flipped = rows[stride:] + rows[:stride]  # reverse the two rows
    out = decode_bmp(bytes(enc[:body_at]) + flipped)
    assert np.array_equal(out, img)


@pytest.mark.parametrize("w", [1, 3, 7, 64])
def test_roundtrip_24bit_strides(w):
    rng = np.random.default_rng(w)
    img = rng.integers(0, 256, (5, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_roundtrip_32bit_and_paletted():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (9, 13, 4), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (17, 29), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(idx, pal)), pal[idx])


def test_gates_and_corruption():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    good = bytearray(encode_bmp(img))
    with pytest.raises(BmpParseError, match="not a BMP"):
        decode_bmp(b"XX" + bytes(good[2:]))
    with pytest.raises(BmpParseError, match="truncated"):
        decode_bmp(bytes(good[:-8]))
    bad = bytearray(good)
    struct.pack_into("<I", bad, 30, 1)  # BI_RLE8
    with pytest.raises(BmpParseError, match="compression"):
        decode_bmp(bytes(bad))
    bad = bytearray(good)
    struct.pack_into("<H", bad, 28, 4)  # 4-bit depth
    with pytest.raises(BmpParseError, match="not supported"):
        decode_bmp(bytes(bad))


def test_multimodal_kernel_routes_bmp():
    from hortacloud_importer_spark.operators.multimodal import _decode_one

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    arr = _decode_one("bmp", encode_bmp(img), {})
    assert arr.shape == (1, 6, 8, 3)
    assert np.array_equal(arr[0], img)
