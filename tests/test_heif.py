"""Optional libheif binding (sources/heif.py): real HEVC/AV1 pixel
decode when the system library is present (it is in this container:
libheif 1.15 + de265/dav1d/x265/aom), the honest gate when absent,
and the decode_isobmff routing between the two."""

from __future__ import annotations

import numpy as np
import pytest

from hortacloud_importer_spark.sources import heif as H
from hortacloud_importer_spark.sources.isobmff import (
    IsobmffParseError,
    decode_isobmff,
    isobmff_probe,
)

needs_libheif = pytest.mark.skipif(
    H.load_libheif() is None, reason="libheif absent"
)


def _test_image(h=64, w=48, alpha=False):
    yy, xx = np.mgrid[0:h, 0:w]
    chans = [
        (yy * 3 + xx) % 256,
        (xx * 5) % 256,
        (yy * 2 + xx * 7) % 256,
    ]
    if alpha:
        chans.append((yy + xx) % 2 * 255)
    return np.stack(chans, axis=-1).astype(np.uint8)


@needs_libheif
@pytest.mark.parametrize("codec", ["hevc", "av1"])
def test_lossless_roundtrip_bounded(codec):
    """Lossless HEVC/AV1 at chroma 4:4:4: the only residual error is
    libheif's RGB<->YCbCr integer conversion — bounded to a couple of
    codes, never structural."""
    img = _test_image()
    try:
        blob = H.encode_heif(img, codec=codec, lossless=True)
    except IsobmffParseError as exc:
        pytest.skip(f"{codec} encoder unavailable: {exc}")
    out = H.decode_heif(blob)
    assert out.shape == img.shape
    diff = np.abs(out.astype(np.int16) - img.astype(np.int16))
    assert diff.max() <= 4, f"max diff {diff.max()}"
    # container brand + probe dimensions agree with the pixels
    kind, ph, pw, *_ = isobmff_probe(blob)
    assert (kind, ph, pw) == ("image", 64, 48)


@needs_libheif
def test_alpha_channel_survives():
    img = _test_image(alpha=True)
    try:
        blob = H.encode_heif(img, codec="hevc", lossless=True)
    except IsobmffParseError as exc:
        pytest.skip(f"hevc encoder unavailable: {exc}")
    out = H.decode_heif(blob)
    assert out.shape[2] == 4
    # alpha is coded as its own (lossless) auxiliary image
    assert np.array_equal(out[:, :, 3], img[:, :, 3])


@needs_libheif
def test_decode_isobmff_routes_heif_to_binding():
    img = _test_image(32, 32)
    try:
        blob = H.encode_heif(img, codec="hevc", lossless=True)
    except IsobmffParseError as exc:
        pytest.skip(f"hevc encoder unavailable: {exc}")
    frames = decode_isobmff(blob)
    assert frames.shape == (1, 32, 32, 3)


def test_gate_when_binding_absent(monkeypatch):
    """Without libheif the old honest gate is byte-for-byte intact."""
    monkeypatch.setattr(H, "load_libheif", lambda: None)
    with pytest.raises(NotImplementedError, match="libheif"):
        H.decode_heif(b"whatever")
    # decode_isobmff converts that into its own named gate
    import struct

    def box(t, p=b""):
        return struct.pack(">I", len(p) + 8) + t + p

    def full(t, p):
        return box(t, b"\x00" * 4 + p)

    ispe = full(b"ispe", struct.pack(">II", 8, 6))
    blob = (
        box(b"ftyp", b"heic\x00\x00\x00\x00mif1")
        + full(b"meta", box(b"iprp", box(b"ipco", ispe)))
    )
    monkeypatch.setattr(
        "hortacloud_importer_spark.sources.heif.load_libheif",
        lambda: None,
    )
    with pytest.raises(NotImplementedError, match="codec binding"):
        decode_isobmff(blob)


@needs_libheif
def test_corrupt_payloads_raise_named_error_only():
    img = _test_image(24, 24)
    try:
        base = H.encode_heif(img, codec="hevc", lossless=True)
    except IsobmffParseError as exc:
        pytest.skip(f"hevc encoder unavailable: {exc}")
    rng = np.random.default_rng(73)
    for _ in range(120):
        b = bytearray(base)
        mode = rng.integers(0, 3)
        if mode == 0:
            b = b[: int(rng.integers(1, len(b)))]
        elif mode == 1:
            i = int(rng.integers(0, len(b)))
            b[i] ^= 1 << int(rng.integers(0, 8))
        else:
            i = int(rng.integers(0, len(b)))
            b[i : i + 4] = bytes(rng.integers(0, 256, 4).tolist())
        try:
            H.decode_heif(bytes(b))
        except (IsobmffParseError, NotImplementedError):
            pass  # named errors only — libheif failures are renamed
