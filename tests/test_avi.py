"""Clean-room AVI container (sources/avi.py): RIFF structure pinned
against the spec, DIB byte-exact and MJPG near-lossless roundtrips,
and the multimodal kernel/frame-sampling route."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hortacloud_importer_spark.sources.avi import (
    AviParseError,
    decode_avi,
    encode_avi,
)


def test_encoder_writes_spec_shaped_riff():
    """Walk the emitted bytes with plain struct math (not the
    decoder): RIFF/AVI magic, declared sizes, hdrl/avih frame count
    and dims, strh stream type, movi chunk ids, idx1 presence."""
    fr = np.arange(2 * 4 * 6, dtype=np.uint8).reshape(2, 4, 6)
    data = encode_avi(fr, codec="DIB", fps=5)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    (riff_size,) = struct.unpack("<I", data[4:8])
    assert 8 + riff_size == len(data)
    # first LIST is hdrl; its first chunk is avih
    assert data[12:16] == b"LIST" and data[20:24] == b"hdrl"
    assert data[24:28] == b"avih"
    avih = data[32:]
    usec, _, _, flags, total = struct.unpack("<IIIII", avih[:20])
    assert usec == 200_000 and total == 2 and flags & 0x10
    w, h = struct.unpack("<II", avih[32:40])
    assert (w, h) == (6, 4)
    assert b"vids" in data and b"00db" in data and b"idx1" in data


@pytest.mark.parametrize("w", [3, 7, 32])
def test_dib_rgb_roundtrip_byte_exact(w):
    rng = np.random.default_rng(w)
    fr = rng.integers(0, 256, (4, 6, w, 3), dtype=np.uint8)
    out = decode_avi(encode_avi(fr, codec="DIB"))
    assert out.shape == (4, 6, w, 3)
    assert np.array_equal(out, fr)


def test_dib_gray_palette_roundtrip():
    rng = np.random.default_rng(2)
    g = rng.integers(0, 256, (3, 5, 9), dtype=np.uint8)
    out = decode_avi(encode_avi(g, codec="DIB"))
    assert out.shape == (3, 5, 9, 3)  # gray palette replicates to RGB
    for c in range(3):
        assert np.array_equal(out[..., c], g)


def test_mjpg_roundtrip_through_t81_decoder():
    yy, xx = np.mgrid[0:32, 0:48]
    sm = ((yy * 3 + xx * 2) % 200).astype(np.uint8)
    fr = np.stack([np.roll(sm, f, axis=1) for f in range(5)])
    out = decode_avi(encode_avi(fr, codec="MJPG"))
    assert out.shape == (5, 32, 48, 1)
    assert np.abs(out[..., 0].astype(int) - fr.astype(int)).max() <= 2


def test_audio_chunks_skipped():
    """An interleaved '01wb' audio chunk inside movi is ignored by
    the video frame collector."""
    fr = np.zeros((2, 4, 4), dtype=np.uint8)
    data = encode_avi(fr, codec="DIB")
    movi_at = data.index(b"movi")
    audio = b"01wb" + struct.pack("<I", 6) + b"\x00" * 6
    patched = bytearray(data)
    patched[movi_at + 4 : movi_at + 4] = audio
    # fix the movi LIST size and the RIFF size
    (lsize,) = struct.unpack("<I", patched[movi_at - 4 : movi_at])
    struct.pack_into("<I", patched, movi_at - 4, lsize + len(audio))
    struct.pack_into("<I", patched, 4, len(patched) - 8)
    out = decode_avi(bytes(patched))
    assert out.shape == (2, 4, 4, 3)


def test_corrupt_and_gated_streams_raise():
    fr = np.zeros((2, 4, 4), dtype=np.uint8)
    good = encode_avi(fr, codec="DIB")
    with pytest.raises(AviParseError, match="not a RIFF"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(AviParseError):
        decode_avi(good[:40])
    # unknown video codec fourcc gates with a named error
    bad = bytearray(good)
    at = bad.index(b"vids") + 4
    bad[at : at + 4] = b"H264"
    with pytest.raises(AviParseError, match="not supported"):
        decode_avi(bytes(bad))


def test_multimodal_kernel_routes_avi():
    from hortacloud_importer_spark.operators.multimodal import _decode_one

    rng = np.random.default_rng(17)
    fr = rng.integers(0, 256, (3, 8, 10, 3), dtype=np.uint8)
    arr = _decode_one("avi", encode_avi(fr, codec="DIB"), {})
    assert arr.shape == (3, 8, 10, 3)
    assert np.array_equal(arr, fr)


def test_frame_sampling_over_real_video(spark):
    """sample_frames (the 1->N UDTF) over an actual AVI payload:
    stride-2 sampling of a 5-frame clip yields frames 0, 2, 4 with
    re-keyed media ids."""
    from hortacloud_importer_spark.operators.multimodal import (
        media_features,
        sample_frames,
    )

    rng = np.random.default_rng(19)
    fr = rng.integers(0, 256, (5, 6, 6, 3), dtype=np.uint8)
    payload = encode_avi(fr, codec="DIB")
    media = spark.createDataFrame(
        [(7, "video", "avi", bytearray(payload), (6, 6, 3, 0, 5))],
        "media_id long, kind string, format string, payload binary, "
        "meta struct<height:int,width:int,channels:int,"
        "sample_rate:int,n_frames:int>",
    )
    rows = media_features(sample_frames(media, 2)).collect()
    got = {r["media_id"]: r["mean_intensity"] for r in rows}
    assert set(got) == {7000, 7002, 7004}
    for fi in (0, 2, 4):
        assert got[7000 + fi] == pytest.approx(float(fr[fi].mean()))
