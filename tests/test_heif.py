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


# ------------------------------- hvc1/av01 MP4 video tracks via libheif


def _video_fixture(codec: str, n: int = 3, h: int = 64, w: int = 64):
    """n libheif-encoded stills -> (mp4 bytes, [expected frames]).
    CTU-aligned dims so the coded tile equals the display image and
    frame comparisons are exact."""
    from hortacloud_importer_spark.sources.isobmff import (
        build_video_mp4,
        heif_primary_item_payload,
    )

    stills, expected = [], []
    for f in range(n):
        img = np.roll(_test_image(h, w), f * 7, axis=1)
        try:
            blob = H.encode_heif(img, codec=codec, lossless=True)
        except IsobmffParseError as exc:
            pytest.skip(f"{codec} encoder unavailable: {exc}")
        stills.append(blob)
        expected.append(H.decode_heif(blob))
    parts = [heif_primary_item_payload(s) for s in stills]
    item_type, cfg, cw, ch, _ = parts[0]
    fourcc = b"hvc1" if item_type == b"hvc1" else b"av01"
    mp4 = build_video_mp4(fourcc, cfg, cw, ch, [p[4] for p in parts])
    return mp4, expected


@needs_libheif
@pytest.mark.parametrize("codec", ["hevc", "av1"])
def test_video_track_sync_samples_decode_via_libheif(codec):
    """hvc1/av01 MP4 track samples decode through the SAME binding as
    HEIC/AVIF stills (each sync sample rewrapped byte-identical as a
    still), bit-exact against the still-route decode."""
    from hortacloud_importer_spark.sources.isobmff import (
        decode_isobmff_video,
        isobmff_probe,
        isobmff_video_configs,
    )

    mp4, expected = _video_fixture(codec)
    kind, ph, pw, _c, nf, _r = isobmff_probe(mp4)
    assert (kind, nf) == ("video", 3)
    cfgs = isobmff_video_configs(mp4)
    assert len(cfgs) == 1
    frames = decode_isobmff_video(mp4)
    assert frames.shape[0] == 3
    for f, exp in enumerate(expected):
        assert np.array_equal(frames[f], exp), f
    # the top-level decode chain routes video -> mjpeg -> hevc/av1
    assert np.array_equal(decode_isobmff(mp4), frames)


@needs_libheif
def test_video_track_non_aligned_dims_crop_top_left():
    """Non-CTU-aligned stills pad the coded tile; the MP4-route frame
    carries the padded tile whose top-left crop is the display image
    (real-world hvc1 tracks instead carry SPS conformance cropping,
    which libheif applies inside the decode)."""
    from hortacloud_importer_spark.sources.isobmff import (
        build_video_mp4,
        decode_isobmff_video,
        heif_primary_item_payload,
    )

    img = _test_image(32, 48)
    try:
        blob = H.encode_heif(img, codec="hevc", lossless=True)
    except IsobmffParseError as exc:
        pytest.skip(f"hevc encoder unavailable: {exc}")
    exp = H.decode_heif(blob)
    item_type, cfg, cw, ch, sample = heif_primary_item_payload(blob)
    frames = decode_isobmff_video(
        build_video_mp4(b"hvc1", cfg, cw, ch, [sample])
    )
    assert np.array_equal(frames[0][:32, :48], exp)


@needs_libheif
def test_video_track_decodes_only_sync_samples():
    """Non-sync samples (delta frames) are skipped — only samples the
    stss marks sync decode standalone."""
    from hortacloud_importer_spark.sources.isobmff import (
        build_video_mp4,
        decode_isobmff_video,
        heif_primary_item_payload,
    )
    import struct as _s

    mp4, expected = _video_fixture("hevc")
    # splice an stss marking only samples 1 and 3 sync
    stss = (
        _s.pack(">I", 24) + b"stss" + b"\x00" * 4
        + _s.pack(">III", 2, 1, 3)
    )
    i = mp4.find(b"stco") - 4
    size_pos = mp4.find(b"stbl") - 4
    stbl_size = _s.unpack(">I", mp4[size_pos : size_pos + 4])[0]
    out = bytearray(mp4[:i] + stss + mp4[i:])
    out[size_pos : size_pos + 4] = _s.pack(">I", stbl_size + len(stss))
    # grow every ancestor box (moov/trak/mdia/minf) + fix stco offset
    for tag in (b"moov", b"trak", b"mdia", b"minf"):
        p = out.find(tag) - 4
        sz = _s.unpack(">I", out[p : p + 4])[0]
        out[p : p + 4] = _s.pack(">I", sz + len(stss))
    sp = out.find(b"stco") + 4 + 4 + 4
    off = _s.unpack(">I", out[sp : sp + 4])[0]
    out[sp : sp + 4] = _s.pack(">I", off + len(stss))
    frames = decode_isobmff_video(bytes(out))
    assert frames.shape[0] == 2
    assert np.array_equal(frames[0], expected[0])
    assert np.array_equal(frames[1], expected[2])


def test_video_track_gate_without_binding(monkeypatch):
    """When libheif is absent the hvc1 route raises the SAME honest
    gate decode_isobmff always raised."""
    from hortacloud_importer_spark.sources import heif as heif_mod
    from hortacloud_importer_spark.sources.isobmff import (
        build_video_mp4,
        decode_isobmff_video,
    )

    fake_cfg = (8 + 5).to_bytes(4, "big") + b"hvcC" + bytes(5)
    mp4 = build_video_mp4(b"hvc1", fake_cfg, 16, 16, [b"\x00" * 10])
    monkeypatch.setattr(heif_mod, "load_libheif", lambda: None)
    with pytest.raises(NotImplementedError, match="libheif"):
        decode_isobmff_video(mp4)
