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
    # IMA ADPCM (tag 0x11) decodes since round 12, but only in its
    # real 4-bit form — a nonsense bit width still raises by name
    fmt = struct.pack("<HHIIHH", 0x11, 1, 8000, 4000, 256, 8)
    with pytest.raises(WavParseError, match="IMA ADPCM.*4-bit"):
        decode_wav(_container(fmt, b"\x00" * 8))
    # Microsoft ADPCM (tag 2) stays a named gate: its coefficient
    # table has no independent in-container verification reference
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 4000, 256, 4)
    with pytest.raises(WavParseError, match="tag 2"):
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
        def select(self, *cols):
            # media_features narrows its input columns (guide §4.1)
            return self

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


def test_ima_step_table_structural_invariants():
    """The 89-entry IMA step table is a transcribed published
    constant; these invariants catch transposition/typo classes the
    behavioral audioop cross-check below then seals completely."""
    from hortacloud_importer_spark.sources.wav import (
        _IMA_INDEX_ADJ, _IMA_STEPS,
    )

    t = _IMA_STEPS.astype(np.int64)
    assert len(t) == 89
    assert t[0] == 7 and t[-1] == 32767
    assert (np.diff(t) > 0).all(), "step table must be strictly increasing"
    ratios = t[1:] / t[:-1]
    assert ratios.min() > 1.05 and ratios.max() < 1.16, (
        "every step is ~1.1x the previous"
    )
    assert _IMA_INDEX_ADJ.tolist() == [-1, -1, -1, -1, 2, 4, 6, 8]


def test_ima_core_matches_stdlib_audioop():
    """INDEPENDENT verification of the table and state machine: the
    stdlib audioop module (CPython Modules/audioop.c, Python <= 3.12)
    implements the identical Intel/DVI ADPCM decoder. Every initial
    index 0..88 seeds a decode of a pseudorandom nibble stream, so
    every table entry and both clamps are exercised behaviorally."""
    audioop = pytest.importorskip("audioop")
    from hortacloud_importer_spark.sources.wav import ima_adpcm_core

    rng = np.random.default_rng(2024)
    for idx0 in range(89):
        pred0 = int(rng.integers(-32768, 32768))
        nibs = rng.integers(0, 16, 64, dtype=np.uint8)
        # audioop reads the HIGH nibble of each byte first
        packed = bytes(
            (int(nibs[i]) << 4) | int(nibs[i + 1])
            for i in range(0, len(nibs), 2)
        )
        want_b, _state = audioop.adpcm2lin(packed, 2, (pred0, idx0))
        want = np.frombuffer(want_b, dtype="<i2").astype(np.int32)
        got, _, _ = ima_adpcm_core(nibs, pred0, idx0)
        assert np.array_equal(got, want), f"diverged at index0={idx0}"


def test_ima_wav_roundtrip_mono_stereo():
    """decode(encode_wav_ima(x)) must equal the ENCODER's own
    reconstruction exactly (the quantizer mirrors the decoder), and
    track a smooth signal within ADPCM quantization error."""
    from hortacloud_importer_spark.sources.wav import (
        decode_wav, encode_wav_ima, wav_probe,
    )

    t = np.arange(2000)
    mono = (
        12000 * np.sin(t / 9.0) + 300 * np.sin(t / 2.0)
    ).astype(np.int16)
    blob = encode_wav_ima(mono, rate=16000, block_samples=505)
    out, rate = decode_wav(blob)
    assert rate == 16000 and out.shape == (2000, 1)
    assert out.dtype == np.int32
    # block-leading samples are verbatim
    assert np.array_equal(out[::505, 0], mono[::505].astype(np.int32))
    err = out[:, 0] - mono.astype(np.int32)
    rms_sig = float(np.sqrt(np.mean(mono.astype(np.float64) ** 2)))
    rms_err = float(np.sqrt(np.mean(err.astype(np.float64) ** 2)))
    assert rms_err < rms_sig / 10, (rms_err, rms_sig)
    assert wav_probe(blob) == (2000, 1, 16000)

    stereo = np.stack(
        [mono, (7000 * np.cos(t / 5.0)).astype(np.int16)], axis=1
    )
    blob = encode_wav_ima(stereo, rate=8000, block_samples=9)
    out, rate = decode_wav(blob)
    assert out.shape == (2000, 2) and rate == 8000
    for ch in range(2):
        err = out[:, ch] - stereo[:, ch].astype(np.int32)
        rms_sig = float(
            np.sqrt(np.mean(stereo[:, ch].astype(np.float64) ** 2))
        )
        assert float(np.sqrt(np.mean(err.astype(np.float64) ** 2))) < (
            rms_sig / 8
        )
    assert wav_probe(blob) == (2000, 2, 8000)


def test_ima_codeword_fixture_matches_core_and_audioop():
    """The codeword fixture writer (the ADPCM analog of
    encode_wav(g711=...)) must decode to exactly the core's output
    for the given nibble stream and initial state — and, when the
    stdlib reference is present, to audioop's."""
    from hortacloud_importer_spark.sources.wav import (
        decode_wav, encode_wav_ima_codewords, ima_adpcm_core, wav_probe,
    )

    nibs = [(i * 7 + 3) % 16 for i in range(96)]
    pred0, idx0 = -1234, 30
    blob = encode_wav_ima_codewords(nibs, pred0, idx0, rate=8000)
    out, rate = decode_wav(blob)
    core, _, _ = ima_adpcm_core(np.array(nibs, np.uint8), pred0, idx0)
    want = np.concatenate([[pred0], core]).astype(np.int32)
    assert rate == 8000
    assert np.array_equal(out[:, 0], want)
    assert wav_probe(blob) == (97, 1, 8000)
    audioop = pytest.importorskip("audioop")
    packed = bytes(
        (nibs[i] << 4) | nibs[i + 1] for i in range(0, len(nibs), 2)
    )
    ref_b, _ = audioop.adpcm2lin(packed, 2, (pred0, idx0))
    ref = np.frombuffer(ref_b, dtype="<i2").astype(np.int32)
    assert np.array_equal(out[1:, 0], ref)


def test_ima_error_contract_and_truncation():
    from hortacloud_importer_spark.sources.wav import (
        WavParseError, decode_wav, encode_wav_ima,
        encode_wav_ima_codewords,
    )

    # header index out of range raises by name
    blob = bytearray(encode_wav_ima_codewords([0] * 8, 0, 0))
    i = blob.find(b"data") + 8 + 2  # block header index byte
    blob[i] = 89
    with pytest.raises(WavParseError, match="index 89"):
        decode_wav(bytes(blob))
    # block align too small for the channel headers raises by name
    fmt = struct.pack("<HHIIHHHH", 0x11, 2, 8000, 4000, 4, 4, 2, 9)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 8) + b"\x00" * 8
    )
    with pytest.raises(WavParseError, match="block align"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    # a truncated final block decodes its whole data words only
    full = encode_wav_ima(
        np.arange(505 + 101, dtype=np.int16), block_samples=505
    )
    out_full, _ = decode_wav(full)
    cut = bytearray(full)
    dpos = cut.find(b"data")
    (dlen,) = struct.unpack("<I", cut[dpos + 4 : dpos + 8])
    # strip deep into the final block's REAL samples (the first ~200
    # trailing bytes are pad nibbles the fact chunk trims anyway)
    drop = 230
    cut[dpos + 4 : dpos + 8] = struct.pack("<I", dlen - drop)
    cut = cut[: len(cut) - drop]
    out_cut, _ = decode_wav(bytes(cut))
    assert out_cut.shape[0] < out_full.shape[0]
    assert np.array_equal(out_cut, out_full[: out_cut.shape[0]])
    # malformed encoder inputs: block_samples must be 1 mod 8 (whole
    # 4-byte nibble words) — 11 is odd but would tear a data word
    with pytest.raises(WavParseError, match="1 mod 8"):
        encode_wav_ima(np.zeros(8, np.int16), block_samples=4)
    with pytest.raises(WavParseError, match="1 mod 8"):
        encode_wav_ima(np.zeros(100, np.int16), block_samples=11)
    with pytest.raises(WavParseError, match="int16"):
        encode_wav_ima(np.zeros(8, np.int32))
    with pytest.raises(WavParseError, match="multiple of 8"):
        encode_wav_ima_codewords([1, 2, 3], 0, 0)


def test_ima_spb_zero_rejected_by_probe_and_decode():
    """wSamplesPerBlock=0 is malformed: probe used to report 0 frames
    while decode still emitted one header sample per block (ADVICE
    r12). Both must now reject it with the named error."""
    from hortacloud_importer_spark.sources.wav import (
        encode_wav_ima, wav_probe,
    )

    mono = np.zeros(100, np.int16)
    blob = bytearray(encode_wav_ima(mono, rate=8000, block_samples=9))
    p = blob.find(b"fmt ")
    assert p > 0
    blob[p + 8 + 18 : p + 8 + 20] = struct.pack("<H", 0)
    for fn in (wav_probe, decode_wav):
        with pytest.raises(WavParseError, match="wSamplesPerBlock"):
            fn(bytes(blob))
