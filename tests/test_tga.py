"""Clean-room TGA codec (sources/tga.py): hand-built headers for the
variants the encoder doesn't emit (palette, 16-bit), roundtrips over
types 2/3/10/11, RLE packet grammar, probe, fuzz, kernel route."""

from __future__ import annotations

import random
import struct
import zlib

import numpy as np
import pytest

from hortacloud_importer_spark.sources.tga import (
    TgaParseError,
    decode_tga,
    encode_tga,
    tga_probe,
)


@pytest.mark.parametrize("rle", [False, True])
@pytest.mark.parametrize("top_down", [False, True])
@pytest.mark.parametrize("shape", [(7, 9), (12, 5, 3), (6, 8, 4)])
def test_roundtrips(shape, rle, top_down):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    want = img if img.ndim == 3 else img[:, :, None]
    out = decode_tga(encode_tga(img, rle=rle, top_down=top_down))
    assert np.array_equal(out, want)


def test_rle_packet_grammar_hand_built():
    """Type 11 (RLE gray) assembled by hand: a 5-pixel run packet
    then a 3-pixel raw packet, bottom-up single row."""
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 11, 0, 0, 0, 0, 0, 8, 1, 8, 0)
    payload = bytes([0x80 | 4, 7]) + bytes([2, 1, 2, 3])
    out = decode_tga(hdr + payload)
    assert out[0, :, 0].tolist() == [7, 7, 7, 7, 7, 1, 2, 3]


def test_hand_built_palette_and_16bit():
    # type 1: 8-bit indices into a 24-bit BGR color map, first=2
    pal = bytes([10, 20, 30, 40, 50, 60])  # entries 2,3 as BGR
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 1, 1, 2, 2, 24, 0, 0, 2, 1, 8, 0x20)
    out = decode_tga(hdr + pal + bytes([2, 3]))
    assert np.array_equal(out[0, 0], [30, 20, 10])  # BGR -> RGB
    assert np.array_equal(out[0, 1], [60, 50, 40])
    # type 2, 16-bit ARRRRRGG GGGBBBBB: pure red / pure blue
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 2, 1, 16, 0x20)
    red = 0x1F << 10
    blue = 0x1F
    out = decode_tga(hdr + struct.pack("<HH", red, blue))
    assert np.array_equal(out[0, 0], [255, 0, 0])
    assert np.array_equal(out[0, 1], [0, 0, 255])


def test_probe_matches_decode():
    rng = np.random.default_rng(5)
    for shape in [(7, 9), (4, 6, 3), (5, 5, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        enc = encode_tga(img, rle=True)
        h, w, c = tga_probe(enc)
        assert decode_tga(enc).shape == (h, w, c)


def test_corruption_and_fuzz():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    for bad in (
        b"",
        b"\x00" * 17,
        encode_tga(img)[:40],
        struct.pack("<BBBHHBHHHHBB", 0, 0, 7, 0, 0, 0, 0, 0, 2, 2, 8, 0),
    ):
        with pytest.raises(TgaParseError):
            decode_tga(bad)
    for rle in (False, True):
        payload = encode_tga(img, rle=rle)
        rnd = random.Random(zlib.crc32(f"tga{rle}".encode()))
        for trial in range(500):
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
                decode_tga(bytes(b))
            except TgaParseError:
                pass
            try:
                tga_probe(bytes(b))
            except TgaParseError:
                pass


def test_multimodal_kernel_routes_tga():
    from hortacloud_importer_spark.operators.multimodal import (
        _decode_one,
        _probe_one,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    arr = _decode_one("tga", encode_tga(img, rle=True), {})
    assert arr.shape == (1, 6, 8, 3)
    assert np.array_equal(arr[0], img)
    meta = _probe_one("tga", encode_tga(img), {})
    assert (meta["height"], meta["width"], meta["channels"]) == (6, 8, 3)
