"""Clean-room netpbm codec (sources/pnm.py): hand-built headers,
all six magics, 8/16-bit, comments, corruption, and the kernel route."""

from __future__ import annotations

import random

import numpy as np
import pytest

from hortacloud_importer_spark.sources.pnm import (
    PnmParseError,
    decode_pnm,
    encode_pnm,
)


def test_hand_built_p5_with_comments():
    data = b"P5 # gray\n# another comment\n3 2\n255\n" + bytes(
        [0, 128, 255, 1, 2, 3]
    )
    out = decode_pnm(data)
    assert out.shape == (2, 3, 1) and out.dtype == np.uint8
    assert out[0, 1, 0] == 128 and out[1, 2, 0] == 3


def test_hand_built_p1_and_p4_bitmaps():
    # P1 ASCII: 1 = black -> 0; whitespace between digits is optional
    out = decode_pnm(b"P1\n3 1\n1 0 1\n")
    assert out[0, :, 0].tolist() == [0, 255, 0]
    out = decode_pnm(b"P1\n3 1\n101\n")
    assert out[0, :, 0].tolist() == [0, 255, 0]
    # P4 packed MSB-first, rows byte-aligned: 0b10100000 -> 1,0,1
    out = decode_pnm(b"P4\n3 1\n" + bytes([0b10100000]))
    assert out[0, :, 0].tolist() == [0, 255, 0]


def test_p2_p3_ascii():
    out = decode_pnm(b"P2\n2 2\n15\n0 5 10 15\n")
    assert out[1, 1, 0] == 15
    out = decode_pnm(b"P3\n1 1\n255\n1 2 3\n")
    assert out[0, 0].tolist() == [1, 2, 3]


@pytest.mark.parametrize("ascii_format", [False, True])
@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_roundtrips(ascii_format, channels, dtype):
    rng = np.random.default_rng(7)
    hi = 256 if dtype == np.uint8 else 65536
    img = rng.integers(0, hi, (9, 7, channels)).astype(dtype)
    out = decode_pnm(encode_pnm(img, ascii_format=ascii_format))
    assert out.dtype == dtype
    assert np.array_equal(out, img)


def test_16bit_is_big_endian_on_disk():
    img = np.array([[0x0102]], dtype=np.uint16)
    enc = encode_pnm(img)
    assert enc.endswith(b"\x01\x02")
    assert decode_pnm(enc)[0, 0, 0] == 0x0102


def test_corruption_and_fuzz():
    for bad in (
        b"",
        b"P7\n1 1\n255\n\x00",
        b"P5\n0 1\n255\n",
        b"P5\n2 2\n255\n\x00",  # truncated
        b"P2\n1 1\n15\n99\n",  # sample > maxval
        b"P5\n99999 99999\n255\n",  # bomb guard
    ):
        with pytest.raises(PnmParseError):
            decode_pnm(bad)
    rng = np.random.default_rng(3)
    payload = encode_pnm(rng.integers(0, 256, (12, 12, 3), dtype=np.uint8))
    rnd = random.Random(0x9E7)
    for trial in range(600):
        b = bytearray(payload)
        mode = trial % 3
        if mode == 0:
            b = b[: rnd.randrange(len(b))]
        elif mode == 1:
            for _ in range(rnd.randrange(1, 5)):
                b[rnd.randrange(len(b))] = rnd.randrange(256)
        else:
            at = rnd.randrange(len(b))
            b[at : at + 8] = bytes(rnd.randrange(256) for _ in range(8))
        try:
            decode_pnm(bytes(b))
        except PnmParseError:
            pass


def test_multimodal_kernel_routes_pnm():
    from hortacloud_importer_spark.operators.multimodal import _decode_one

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    arr = _decode_one("ppm", encode_pnm(img), {})
    assert arr.shape == (1, 6, 8, 3)
    assert np.array_equal(arr[0], img)
