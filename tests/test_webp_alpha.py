"""WebP ALPH alpha-sidecar decode (sources/webp.py::_decode_alph):
raw + lossless compression, all four filters, animation blending,
and libwebp conformance — including the lossless streams with >8
code-length symbols that pinned down the _ORDER slot bug."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hortacloud_importer_spark.sources.webp import (
    WebpParseError,
    decode_webp,
    decode_webp_frames,
    encode_webp_alpha,
)

from tests import libwebp_ref

_LIB = libwebp_ref.load()
needs_libwebp = pytest.mark.skipif(_LIB is None, reason="libwebp absent")


def _mb_vals():
    # 2x2 macroblocks -> 32x32 frame; constants survive q_index 0
    return np.array([[40, 90], [140, 200]], dtype=np.uint8)


def _alpha_plane():
    y, x = np.mgrid[0:32, 0:32]
    return ((x * 7 + y * 3) % 256).astype(np.uint8)


@pytest.mark.parametrize("filt", [0, 1, 2, 3])
def test_raw_alph_filters_round_trip(filt):
    alpha = _alpha_plane()
    blob = encode_webp_alpha(_mb_vals(), alpha, filt=filt)
    got = decode_webp(blob)
    assert got.shape == (32, 32, 4)
    assert np.array_equal(got[:, :, 3], alpha)
    # the lossy luma constants survive exactly at q_index 0
    g = got[:16, :16, 1]
    assert (g == g[0, 0]).all()


def test_alph_constant_and_extreme_planes():
    for alpha in (
        np.zeros((32, 32), np.uint8),
        np.full((32, 32), 255, np.uint8),
    ):
        for filt in (0, 3):
            got = decode_webp(
                encode_webp_alpha(_mb_vals(), alpha, filt=filt)
            )
            assert np.array_equal(got[:, :, 3], alpha)


def test_stills_keep_alpha_through_frames_api():
    """decode_webp_frames must surface RGBA for ALPH-paired lossy
    stills and VP8L RGBA stills, matching the single-image API —
    the multimodal decode path routes through the frames API."""
    from hortacloud_importer_spark.sources.webp import encode_webp

    alpha = _alpha_plane()
    blob = encode_webp_alpha(_mb_vals(), alpha, filt=0)
    still = decode_webp(blob)
    frames = decode_webp_frames(blob)
    assert frames.shape == (1,) + still.shape and still.shape[2] == 4
    assert np.array_equal(frames[0], still)

    rng = np.random.default_rng(67)
    rgba = rng.integers(0, 256, (8, 9, 4), dtype=np.uint8)
    blob = encode_webp(rgba)
    frames = decode_webp_frames(blob)
    assert frames.shape == (1, 8, 9, 4)
    assert np.array_equal(frames[0], decode_webp(blob))


def test_alph_errors_are_named():
    alpha = _alpha_plane()
    blob = bytearray(encode_webp_alpha(_mb_vals(), alpha, filt=0))
    i = blob.find(b"ALPH")
    # reserved bits set
    b = bytearray(blob)
    b[i + 8] |= 0xC0
    with pytest.raises(WebpParseError, match="reserved ALPH"):
        decode_webp(bytes(b))
    # invalid compression method
    b = bytearray(blob)
    b[i + 8] = 0x02
    with pytest.raises(WebpParseError, match="compression method"):
        decode_webp(bytes(b))
    # truncated raw plane
    b = bytearray(blob)
    b[i + 4 : i + 8] = struct.pack("<I", 10)
    with pytest.raises(WebpParseError):
        decode_webp(bytes(b[: i + 8 + 10]) + blob[blob.find(b"VP8 ") :])


def test_anim_frames_with_alpha_blend():
    """ANMF frames carrying ALPH sidecars alpha-blend onto the canvas
    (integer over-blend, round-half-up)."""
    from hortacloud_importer_spark.sources.vp8 import encode_vp8

    alpha = np.full((32, 32), 128, np.uint8)
    vp8 = encode_vp8(_mb_vals())
    alph = bytes([0]) + alpha.tobytes()
    sub = (
        b"ALPH" + struct.pack("<I", len(alph)) + alph
        + (b"\x00" if len(alph) & 1 else b"")
        + b"VP8 " + struct.pack("<I", len(vp8)) + vp8
        + (b"\x00" if len(vp8) & 1 else b"")
    )
    anmf = (
        (0).to_bytes(3, "little") + (0).to_bytes(3, "little")
        + (31).to_bytes(3, "little") + (31).to_bytes(3, "little")
        + (100).to_bytes(3, "little") + bytes([0x00])  # blend on
        + sub
    )
    vp8x = bytes([0x12, 0, 0, 0]) + (31).to_bytes(3, "little") + (
        31
    ).to_bytes(3, "little")
    anim = bytes([50, 60, 70, 255]) + struct.pack("<H", 0)
    inner = (
        b"WEBP"
        + b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
        + b"ANIM" + struct.pack("<I", len(anim)) + anim
        + b"ANMF" + struct.pack("<I", len(anmf)) + anmf
    )
    blob = b"RIFF" + struct.pack("<I", len(inner)) + inner
    frames = decode_webp_frames(blob)
    assert frames.shape == (1, 32, 32, 3)
    # reference: the still decode of the same subchunks, hand-blended
    still = decode_webp(
        b"RIFF" + struct.pack("<I", 4 + len(sub)) + b"WEBP" + sub
    )
    bg = np.array([70, 60, 50], np.uint8)  # ANIM stores BGRA
    a = still[:, :, 3:].astype(np.uint16)
    want = (
        a * still[:, :, :3].astype(np.uint16)
        + (255 - a) * np.broadcast_to(bg, (32, 32, 3)).astype(np.uint16)
        + 127
    ) // 255
    assert np.array_equal(frames[0], want.astype(np.uint8))


# ------------------------------------------- libwebp conformance


@needs_libwebp
def test_lossless_parity_vs_libwebp():
    """libwebp's own VP8L encoder output decodes bit-identically —
    covering complex code-length codes (the 12+-slot order), meta
    prefix groups, color cache, and real transform choices."""
    rng = np.random.default_rng(59)
    base = np.zeros((64, 80, 3), np.uint8)
    base[:, :, 0] = (np.arange(80)[None, :] * 3) % 256
    base[:, :, 1] = (np.arange(64)[:, None] * 5) % 256
    base[:, :, 2] = 128
    noisy = (
        base.astype(int) + rng.integers(0, 8, base.shape)
    ).clip(0, 255).astype(np.uint8)
    for img in (base, rng.integers(0, 256, (48, 48, 3), np.uint8), noisy):
        blob = libwebp_ref.encode_lossless(_LIB, img)
        mine = decode_webp(blob)
        ref = libwebp_ref.decode_rgba(_LIB, blob)
        if mine.shape[2] == 3:
            assert np.array_equal(mine, ref[:, :, :3])
            assert (ref[:, :, 3] == 255).all()
        else:
            assert np.array_equal(mine, ref)


@needs_libwebp
def test_lossless_rgba_parity_vs_libwebp():
    y, x = np.mgrid[0:64, 0:80]
    base = np.zeros((64, 80, 3), np.uint8)
    base[:, :, 0] = (x * 3) % 256
    base[:, :, 1] = (y * 5) % 256
    base[:, :, 2] = 128
    rgba = np.dstack([base, ((x * 7 + y) % 256).astype(np.uint8)])
    blob = libwebp_ref.encode_lossless(_LIB, rgba)
    mine = decode_webp(blob)
    ref = libwebp_ref.decode_rgba(_LIB, blob)
    assert mine.shape == (64, 80, 4)
    assert np.array_equal(mine, ref)


@needs_libwebp
def test_lossy_alpha_parity_vs_libwebp():
    """WebPEncodeRGBA emits VP8 + a lossless-compressed ALPH chunk
    (possibly filtered); the decoded alpha plane must be bit-exact.
    RGB is compared per-channel loosely only because libwebp's RGBA
    output path uses the fancy chroma upsampler (the YUV-plane parity
    for the VP8 payload itself is pinned in test_vp8_parity)."""
    y, x = np.mgrid[0:64, 0:80]
    rgba = np.zeros((64, 80, 4), np.uint8)
    rgba[:, :, 0] = (x * 3) % 256
    rgba[:, :, 1] = (y * 5) % 256
    rgba[:, :, 2] = 128
    rgba[:, :, 3] = ((x * 7 + y) % 256).astype(np.uint8)
    blob = libwebp_ref.encode_rgba(_LIB, rgba, 75.0)
    mine = decode_webp(blob)
    ref = libwebp_ref.decode_rgba(_LIB, blob)
    assert mine.shape == (64, 80, 4)
    assert np.array_equal(mine[:, :, 3], ref[:, :, 3])
    assert np.array_equal(mine[:, :, 3], rgba[:, :, 3])  # alpha lossless


def test_alph_fuzz_raises_named_error_only():
    import random

    payload = encode_webp_alpha(_mb_vals(), _alpha_plane(), filt=3)
    rnd = random.Random(0xA1F)
    for trial in range(400):
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
            decode_webp(bytes(b))
        except WebpParseError:
            pass
