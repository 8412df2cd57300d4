"""Clean-room WAV codec (sources/wav.py): RIFF chunk walk, PCM and
float decode, sign extension, EXTENSIBLE resolution, honest gates —
the K4 audio leg of the multimodal column model."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hortacloud_importer_spark.sources.wav import (
    WavParseError,
    decode_wav,
    encode_wav,
)


def _container(fmt_body: bytes, pcm: bytes) -> bytes:
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt_body))
        + fmt_body
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_pcm_roundtrips_all_widths():
    rng = np.random.default_rng(0)
    s16 = rng.integers(-32768, 32767, (1000, 2)).astype(np.int16)
    out, rate = decode_wav(encode_wav(s16, rate=44100))
    assert rate == 44100 and np.array_equal(out, s16.astype(np.int32))

    s8 = rng.integers(0, 255, 500).astype(np.uint8)
    out, _ = decode_wav(encode_wav(s8))
    assert out.dtype == np.uint8 and np.array_equal(out[:, 0], s8)

    s32 = rng.integers(-(2**31), 2**31 - 1, 100).astype(np.int32)
    out, _ = decode_wav(encode_wav(s32))
    assert np.array_equal(out[:, 0], s32)

    f = rng.normal(0, 0.3, (300, 1)).astype(np.float32)
    out, _ = decode_wav(encode_wav(f))
    assert out.dtype == np.float32 and np.array_equal(out, f)


def test_24bit_sign_extension():
    vals = np.array(
        [0, 1, -1, 8388607, -8388608, 123456, -123456], dtype=np.int32
    )
    pcm = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    out, rate = decode_wav(_container(fmt, pcm))
    assert rate == 8000
    assert np.array_equal(out[:, 0], vals)


def test_extensible_subformat_resolves():
    fmt = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
        + struct.pack("<HHI", 22, 16, 0)
        + struct.pack("<H", 1)
        + b"\x00" * 14
    )
    pcm = np.array([5, -5, 100], dtype="<i2").tobytes()
    out, _ = decode_wav(_container(fmt, pcm))
    assert np.array_equal(out[:, 0], [5, -5, 100])


def test_gates_and_malformed():
    with pytest.raises(WavParseError, match="RIFF"):
        decode_wav(b"nope")
    # mu-law (tag 7) now DECODES (G.711 expander); code 0x00 is the
    # most-negative mu-law codeword
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    out, _ = decode_wav(_container(fmt, b"\x00\x00"))
    assert out.ravel().tolist() == [-32124, -32124]
    # IMA ADPCM (tag 0x11) stays a named gate (stateful bitstream)
    fmt = struct.pack("<HHIIHH", 0x11, 1, 8000, 4000, 256, 8)
    with pytest.raises(WavParseError, match="tag 17"):
        decode_wav(_container(fmt, b"\x00" * 8))
    # missing data chunk
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 1, 8000, 16000, 2, 16
    )
    with pytest.raises(WavParseError, match="no data"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    # odd-length chunk word alignment: a 3-byte LIST chunk pads to 4
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    pcm = np.array([7, -7], dtype="<i2").tobytes()
    body = (
        b"WAVE"
        + b"LIST"
        + struct.pack("<I", 3)
        + b"abc\x00"  # pad byte
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )
    out, _ = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert np.array_equal(out[:, 0], [7, -7])


def test_media_kernel_decodes_wav():
    from hortacloud_importer_spark.operators.multimodal import _decode_one

    s = np.array([[100, -100], [7, 8]], dtype=np.int16)
    arr = _decode_one(
        "wav",
        encode_wav(s, rate=8000),
        {"height": 1, "width": 2, "channels": 2,
         "sample_rate": 8000, "n_frames": 1},
    )
    assert arr.shape == (1, 1, 2, 2)
    assert np.array_equal(arr[0, 0], s.astype(np.int32))


def test_truncated_and_degenerate_payloads():
    """Round-8 review: mid-sample truncation trims to whole samples;
    an empty data chunk yields zero features (no reduction crash);
    NaN float samples and full-scale INT32_MIN bin safely."""
    import pandas as pd

    from hortacloud_importer_spark.operators.multimodal import _decode_one

    s = np.arange(-50, 50, dtype=np.int16)
    out, _ = decode_wav(encode_wav(s)[:-1])
    assert len(out) == 99  # last (truncated) sample dropped

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    empty = _container(fmt, b"")
    arr = _decode_one(
        "wav", empty,
        {"height": 1, "width": 0, "channels": 1,
         "sample_rate": 8000, "n_frames": 1},
    )
    assert arr.shape == (1, 1, 0, 1)

    # drive the feature kernel directly over degenerate payloads
    from hortacloud_importer_spark.operators import multimodal as mm

    nan_wav = encode_wav(
        np.array([0.1, np.nan, -0.5], dtype=np.float32)
    )
    full_scale = encode_wav(np.array([-(2**31), 5], dtype=np.int32))
    meta = {"height": 1, "width": 3, "channels": 1,
            "sample_rate": 8000, "n_frames": 1}
    pdf = pd.DataFrame(
        [
            {"media_id": 0, "kind": "audio", "format": "wav",
             "payload": empty, "meta": meta},
            {"media_id": 1, "kind": "audio", "format": "wav",
             "payload": nan_wav, "meta": meta},
            {"media_id": 2, "kind": "audio", "format": "wav",
             "payload": full_scale, "meta": meta},
        ]
    )
    # reuse the kernel body through a tiny stand-in for mapInPandas
    feats_fn = None

    class _Probe:
        def mapInPandas(self, fn, schema):
            nonlocal feats_fn
            feats_fn = fn
            return None

    mm.media_features(_Probe())
    rows = pd.concat(list(feats_fn(iter([pdf]))))
    assert list(rows["n_bytes"]) == [0, 3, 2]
    assert rows.iloc[0]["min_intensity"] == 0
    assert sum(rows.iloc[1]["hist16"]) == 3  # NaN landed in a bin
    assert rows.iloc[2]["min_intensity"] == -(2**31)


def test_g711_expanders_match_scalar_restatement_and_anchors():
    """The vectorized A-law/mu-law tables must equal a per-value
    scalar restatement of G.711's segment arithmetic, and hit the
    published range anchors (mu-law: two zero codes, +/-32124 at the
    extremes; A-law: +/-8 smallest, +/-32256 largest)."""
    from hortacloud_importer_spark.sources.wav import (
        _ALAW2LIN,
        _ULAW2LIN,
    )

    def ulaw2lin(c):
        u = ~c & 0xFF
        t = ((u & 0x0F) << 3) + 0x84
        t <<= (u & 0x70) >> 4
        return (0x84 - t) if (u & 0x80) else (t - 0x84)

    def alaw2lin(c):
        a = c ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if (a & 0x80) else -t

    assert [int(x) for x in _ULAW2LIN] == [ulaw2lin(c) for c in range(256)]
    assert [int(x) for x in _ALAW2LIN] == [alaw2lin(c) for c in range(256)]
    assert _ULAW2LIN[0xFF] == 0 and _ULAW2LIN[0x7F] == 0
    assert _ULAW2LIN[0x00] == -32124 and _ULAW2LIN[0x80] == 32124
    assert _ALAW2LIN[0x55] == -8 and _ALAW2LIN[0xD5] == 8
    assert _ALAW2LIN[0x2A] == -32256 and _ALAW2LIN[0xAA] == 32256


def test_g711_wav_round_trip_and_gates():
    from hortacloud_importer_spark.sources.wav import (
        _ALAW2LIN,
        _ULAW2LIN,
        WavParseError,
        decode_wav,
        encode_wav,
        wav_probe,
    )

    rng = np.random.default_rng(41)
    codes = rng.integers(0, 256, (777, 2), dtype=np.uint8)
    for law, lut in (("alaw", _ALAW2LIN), ("ulaw", _ULAW2LIN)):
        blob = encode_wav(codes, rate=8000, g711=law)
        out, rate = decode_wav(blob)
        assert rate == 8000 and out.shape == (777, 2)
        assert out.dtype == np.int32
        assert np.array_equal(out, lut[codes].astype(np.int32)), law
        assert wav_probe(blob) == (777, 2, 8000)
    with pytest.raises(WavParseError, match="uint8"):
        encode_wav(codes.astype(np.int16), g711="ulaw")
    with pytest.raises(WavParseError, match="alaw"):
        encode_wav(codes, g711="g722")
    # a 16-bit stream claiming the mu-law tag is malformed, not decoded
    blob = bytearray(encode_wav(codes.astype(np.int16).ravel()))
    i = blob.find(b"fmt ") + 8
    blob[i : i + 2] = (7).to_bytes(2, "little")  # tag -> mu-law
    with pytest.raises(WavParseError, match="8-bit"):
        decode_wav(bytes(blob))
