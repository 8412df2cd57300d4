"""Clean-room WAV (RIFF/WAVE) codec for the multimodal audio hook
(SURVEY.md §2.K4).

The media model treats audio as an opaque binary payload with typed
metadata; until now only raw PCM bytes (``raw8``) decoded. WAV is the
container real audio corpora actually arrive in, and its format is
fully public (the RIFF/WAVE layout from the Microsoft/IBM multimedia
programming specification): a ``RIFF``/``WAVE`` header followed by
tagged chunks, of which ``fmt `` carries the sample layout and
``data`` the PCM frames.

Scope: integer PCM (format tag 1), IEEE float (tag 3), and ITU-T
G.711 A-law (tag 6) / mu-law (tag 7) — 8-bit unsigned / 16-bit /
24-bit / 32-bit signed little-endian for PCM, any channel count and
sample rate; WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) resolves through
its SubFormat GUID. The G.711 expanders are computed from the
closed-form segment arithmetic (G.711's companding is a formula, not
a committee table — mu-law: invert the byte, magnitude
(2*mantissa + 33) << exponent rebiased by 33 quantization steps of 8;
A-law: XOR 0x55, segment 0 linear, higher segments dyadic), so no
transcription risk exists. Compressed formats that DO need fixed
tables or bit-stream state (ADPCM, MP3-in-WAV) still raise
:class:`WavParseError` naming the tag — the same honest-gate
contract as every codec in this repo.

Decode returns ``(samples, channels)`` int32/float32 plus the sample
rate; the encoder is the fixture/writer dual. Both run per-file
inside executor kernels (``mapInPandas``), the same granularity as
the image codecs.
"""

from __future__ import annotations

import struct

import numpy as np


class WavParseError(ValueError):
    pass


_PCM_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}
# first 2 bytes of the EXTENSIBLE SubFormat GUID = the format tag
_TAG_PCM, _TAG_FLOAT, _TAG_EXTENSIBLE = 1, 3, 0xFFFE
_TAG_ALAW, _TAG_ULAW = 6, 7


def _g711_expand_tables() -> tuple[np.ndarray, np.ndarray]:
    """(alaw_to_linear, ulaw_to_linear) int16 code->sample maps,
    computed from the ITU-T G.711 segment formulas (no literal
    tables). Mu-law: codeword is the bitwise NOT of
    sign|exponent|mantissa where magnitude+33steps quantizes to
    (2*mantissa+33) << exponent in units of 8 (bias 0x84). A-law:
    codeword XORs 0x55; segment 0 is linear at step 16 (+8 midpoint),
    segments 1..7 prepend the implicit leading 1 and double."""
    codes = np.arange(256)
    # mu-law expand
    u = ~codes & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t = t << ((u >> 4) & 0x07)
    ulaw = np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)
    # A-law expand
    a = codes ^ 0x55
    seg = (a >> 4) & 0x07
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    alaw = np.where(a & 0x80, t, -t).astype(np.int16)
    return alaw, ulaw


_ALAW2LIN, _ULAW2LIN = _g711_expand_tables()


def wav_probe(data: bytes) -> tuple[int, int, int]:
    """(n_samples, n_channels, sample_rate) from the fmt/data chunk
    headers only — no sample conversion."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavParseError("not a RIFF/WAVE stream")
    pos, end = 12, len(data)
    fmt = None
    data_len = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"fmt ":
            if clen < 16 or pos + 24 > end:
                raise WavParseError("fmt chunk shorter than 16 bytes")
            _tag, nch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", data[pos + 8 : pos + 24]
            )
            fmt = (nch, rate, bits)
        elif cid == b"data":
            data_len = min(clen, end - pos - 8)
        pos += 8 + clen + (clen & 1)
    if fmt is None:
        raise WavParseError("no fmt chunk")
    if data_len is None:
        raise WavParseError("no data chunk")
    nch, rate, bits = fmt
    if nch < 1 or bits % 8 or not bits:
        raise WavParseError(f"bad fmt ({nch} channels, {bits}-bit)")
    return data_len // (bits // 8) // nch, nch, rate


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n_samples, n_channels) array, sample_rate).

    8-bit PCM returns uint8 (its native unsigned form), 16/24/32-bit
    PCM return int32, float returns float32 — no level shifting or
    normalization, callers get raw sample values.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavParseError("not a RIFF/WAVE stream")
    pos, end = 12, len(data)
    fmt = None
    pcm = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen and cid != b"data":
            # a truncated final data chunk is common in the wild and
            # is trimmed to whole samples below; short metadata is not
            raise WavParseError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise WavParseError("fmt chunk shorter than 16 bytes")
            tag, nch, rate, _brate, _balign, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag == _TAG_EXTENSIBLE:
                if clen < 26:
                    raise WavParseError("EXTENSIBLE fmt without SubFormat")
                (tag,) = struct.unpack("<H", body[24:26])
            fmt = (tag, nch, rate, bits)
        elif cid == b"data":
            pcm = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None:
        raise WavParseError("no fmt chunk")
    if pcm is None:
        raise WavParseError("no data chunk")
    tag, nch, rate, bits = fmt
    if nch < 1:
        raise WavParseError("zero channels")
    if bits % 8 or not bits:
        raise WavParseError(f"{bits}-bit samples unsupported")
    # trim a mid-sample truncation to whole samples (every width)
    pcm = pcm[: len(pcm) - len(pcm) % (bits // 8)]
    if tag == _TAG_FLOAT:
        if bits != 32:
            raise WavParseError(f"float WAV must be 32-bit, not {bits}")
        arr = np.frombuffer(pcm, dtype="<f4").astype(np.float32)
    elif tag == _TAG_PCM:
        if bits == 24:
            b = np.frombuffer(pcm, dtype=np.uint8)
            b = b.reshape(-1, 3).astype(np.int32)
            arr = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            arr = (arr << 8) >> 8  # sign-extend 24 -> 32
        elif bits in _PCM_DTYPES:
            arr = np.frombuffer(pcm, dtype=_PCM_DTYPES[bits])
            if bits != 8:
                arr = arr.astype(np.int32)
        else:
            raise WavParseError(f"{bits}-bit PCM unsupported")
    elif tag in (_TAG_ALAW, _TAG_ULAW):
        if bits != 8:
            raise WavParseError(
                f"G.711 WAV must be 8-bit, not {bits}"
            )
        lut = _ALAW2LIN if tag == _TAG_ALAW else _ULAW2LIN
        arr = lut[np.frombuffer(pcm, dtype=np.uint8)].astype(np.int32)
    else:
        raise WavParseError(
            f"WAV format tag {tag} needs an audio codec (PCM, "
            "IEEE-float, and G.711 A-law/mu-law decode built in)"
        )
    n = len(arr) - len(arr) % nch
    return arr[:n].reshape(-1, nch), rate


def encode_wav(
    samples: np.ndarray, rate: int = 16000, g711: str | None = None
) -> bytes:
    """(n[, channels]) uint8/int16/int32/float32 -> WAV bytes — the
    fixture/writer dual of :func:`decode_wav`. ``g711="alaw"|"ulaw"``
    writes uint8 samples as G.711 CODEWORDS (format tag 6/7) rather
    than unsigned PCM — every byte value is a valid codeword, so
    fixture generators emit codes directly."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise WavParseError("samples must be (n,) or (n, channels)")
    n, nch = samples.shape
    if g711 is not None:
        if g711 not in ("alaw", "ulaw"):
            raise WavParseError(f"g711 must be alaw|ulaw, not {g711!r}")
        if samples.dtype != np.uint8:
            raise WavParseError("G.711 codewords must be uint8")
        tag = _TAG_ALAW if g711 == "alaw" else _TAG_ULAW
        bits, raw = 8, samples.astype(np.uint8)
    elif samples.dtype == np.uint8:
        tag, bits, raw = _TAG_PCM, 8, samples.astype(np.uint8)
    elif samples.dtype == np.int16:
        tag, bits, raw = _TAG_PCM, 16, samples.astype("<i2")
    elif samples.dtype == np.int32:
        tag, bits, raw = _TAG_PCM, 32, samples.astype("<i4")
    elif samples.dtype == np.float32:
        tag, bits, raw = _TAG_FLOAT, 32, samples.astype("<f4")
    else:
        raise WavParseError(f"unsupported sample dtype {samples.dtype}")
    pcm = raw.tobytes()
    balign = nch * bits // 8
    fmt = struct.pack("<HHIIHH", tag, nch, rate, rate * balign, balign, bits)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
