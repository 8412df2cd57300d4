"""Library-independent VP8 tests: exact encoder/decoder roundtrips,
the boolean-coder pair, container dispatch, and the corruption
contract (named errors only, under seeded fuzz)."""

from __future__ import annotations

import numpy as np
import pytest

from hortacloud_importer_spark.sources.vp8 import (
    Vp8ParseError,
    _Bool,
    _BoolEnc,
    decode_vp8,
    encode_vp8,
    encode_webp_lossy,
    yuv_to_rgb,
)
from hortacloud_importer_spark.sources.webp import WebpParseError, decode_webp


def test_bool_coder_roundtrip():
    rng = np.random.default_rng(5)
    probs = rng.integers(1, 255, 4000)
    bits = rng.integers(0, 2, 4000)
    enc = _BoolEnc()
    for b, p in zip(bits, probs):
        enc.put(int(b), int(p))
    data = enc.flush()
    dec = _Bool(data)
    got = [dec.get(int(p)) for p in probs]
    assert got == [int(b) for b in bits]


def test_const_mb_roundtrip_exact():
    """q_index 0 + filter level 0: per-MB constants survive the whole
    bool-encode -> token -> dequant -> iWHT -> iDCT -> DC_PRED chain
    bit-perfectly (the closed-form oracle construction)."""
    rng = np.random.default_rng(9)
    for shape in ((1, 1), (2, 2), (4, 4), (3, 5)):
        vals = rng.integers(16, 236, shape).astype(np.uint8)
        y, u, v = decode_vp8(encode_vp8(vals))
        assert np.array_equal(y, np.repeat(np.repeat(vals, 16, 0), 16, 1))
        assert (u == 128).all() and (v == 128).all()


def test_decode_webp_dispatches_lossy():
    vals = np.array([[100, 200], [50, 150]], np.uint8)
    rgb = decode_webp(encode_webp_lossy(vals))
    assert rgb.shape == (32, 32, 3)
    # gray stream: R == G == B == BT.601 expansion of luma
    assert (rgb[..., 0] == rgb[..., 1]).all()
    g = (298 * (100 - 16) + 128) >> 8
    assert rgb[0, 0, 0] == g


def test_yuv_to_rgb_gray_closed_form():
    y = np.arange(16, 236, dtype=np.uint8).reshape(20, 11)
    u = np.full((10, 6), 128, np.uint8)
    v = np.full((10, 6), 128, np.uint8)
    rgb = yuv_to_rgb(y, u, v)
    want = np.clip((298 * (y.astype(int) - 16) + 128) >> 8, 0, 255)
    for c in range(3):
        assert np.array_equal(rgb[..., c], want)


def test_interframe_and_bad_start_code_gate():
    vals = np.array([[100]], np.uint8)
    chunk = bytearray(encode_vp8(vals))
    chunk[0] |= 1  # frame-type bit -> interframe
    with pytest.raises(Vp8ParseError, match="interframe"):
        decode_vp8(bytes(chunk))
    chunk = bytearray(encode_vp8(vals))
    chunk[3] = 0x00
    with pytest.raises(Vp8ParseError, match="start code"):
        decode_vp8(bytes(chunk))


def test_vp8x_still_image_routes_to_inner_chunk():
    import struct

    vals = np.array([[77]], np.uint8)
    inner = encode_vp8(vals)
    if len(inner) & 1:
        inner_p = inner + b"\0"
    else:
        inner_p = inner
    vp8x = bytes([0, 0, 0, 0]) + struct.pack("<I", 15)[:3] + struct.pack("<I", 15)[:3]
    payload = (
        b"WEBP"
        + b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
        + b"VP8 " + struct.pack("<I", len(inner)) + inner_p
    )
    data = b"RIFF" + struct.pack("<I", len(payload)) + payload
    rgb = decode_webp(data)
    assert rgb.shape == (16, 16, 3)
    # the animation flag routes the still API to decode_webp_frames
    bad = bytearray(data)
    bad[20] = 0x02
    with pytest.raises(WebpParseError, match="decode_webp_frames"):
        decode_webp(bytes(bad))
    # the alpha flag alone (no ALPH chunk present) is informative —
    # the still decodes opaque through the inner VP8 chunk
    flagged = bytearray(data)
    flagged[20] = 0x10
    assert np.array_equal(decode_webp(bytes(flagged)), rgb)


def _mutations(payload: bytes, n: int, seed: int):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        buf = bytearray(payload)
        kind = rng.integers(0, 3)
        if kind == 0 and len(buf) > 12:
            buf = buf[: int(rng.integers(10, len(buf)))]
        elif kind == 1:
            for _ in range(int(rng.integers(1, 6))):
                buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        else:
            pos = int(rng.integers(0, len(buf)))
            buf[pos] ^= 1 << int(rng.integers(0, 8))
        yield bytes(buf)


def test_vp8_corruption_contract_fuzz():
    """Arbitrary corruption either decodes (resilient-tail semantics,
    like the reference decoder) or raises the NAMED parse error —
    never IndexError/struct.error/OverflowError."""
    rng = np.random.default_rng(0x7E8)
    vals = rng.integers(16, 236, (2, 3)).astype(np.uint8)
    yl = np.zeros((2, 3, 16, 16), np.int64)
    yl[rng.random(yl.shape) < 0.1] = 7
    payload = encode_webp_lossy(vals, filter_level=20, y_levels=yl)
    for mutated in _mutations(payload, 300, seed=0x51AB):
        try:
            decode_webp(mutated)
        except WebpParseError:
            pass
