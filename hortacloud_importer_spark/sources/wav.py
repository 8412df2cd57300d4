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
transcription risk exists.

IMA/DVI ADPCM (format tag 0x11) decodes too: its 89-entry step-size
table is a fixed published constant (IMA Digital Audio Focus and
Technical Working Groups, "Recommended Practices for Enhancing
Digital Audio Compatibility in Multimedia Systems", 1992 — the same
table CPython ships in Modules/audioop.c), NOT derivable from a
closed form, so unlike G.711 a transcription risk DOES exist here.
What lifts the round-10/11 gate for this one codec is that an
independent in-container reference exists: the stdlib ``audioop``
module (Python <= 3.12) implements the identical Intel/DVI state
machine, and tests/test_wav.py cross-checks every table entry and
state transition against it behaviorally. Compressed formats that
need committee tables WITHOUT any independent in-container
verification reference (MP3-in-WAV, and Microsoft ADPCM tag 2 with
its coefficient pairs... tag 2 also has no reference here) still
raise :class:`WavParseError` naming the tag — the same honest-gate
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
_TAG_IMA_ADPCM = 0x11

# IMA/DVI ADPCM step-size table (IMA Recommended Practices 1992; the
# identical constant CPython ships in Modules/audioop.c). The values
# approximate 1.1^n growth but are NOT round(prev * 1.1) — they are a
# fixed published table. tests/test_wav.py verifies every entry
# behaviorally against the stdlib audioop reference and pins the
# structural invariants (89 entries, 7 -> 32767, per-step ratio).
_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
        19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
        50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
        130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
        337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
        876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
        5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
        15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)
# index adjustment per magnitude (low 3 bits of the nibble)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def ima_adpcm_core(
    nibbles, pred: int, index: int
) -> tuple[np.ndarray, int, int]:
    """Decode one nibble sequence with the IMA/DVI ADPCM state
    machine -> (int32 samples, final predictor, final index). One
    output sample per nibble; the caller supplies the block header's
    initial predictor/index. Reconstruction per nibble d with step s:
    diff = s/8 + (d&1)s/4 + (d&2)s/2 + (d&4)s (integer shifts), sign
    bit d&8 subtracts; predictor clamps to int16, index moves by the
    adjustment table and clamps to [0, 88]. This is the exact update
    rule of the IMA 1992 reference and of audioop.adpcm2lin."""
    steps, adj = _IMA_STEPS, _IMA_INDEX_ADJ
    out = np.empty(len(nibbles), dtype=np.int32)
    pred = int(pred)
    index = int(index)
    for j, nib in enumerate(nibbles):
        nib = int(nib)
        step = int(steps[index])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        if pred < -32768:
            pred = -32768
        elif pred > 32767:
            pred = 32767
        index += int(adj[nib & 7])
        if index < 0:
            index = 0
        elif index > 88:
            index = 88
        out[j] = pred
    return out, pred, index


def _decode_ima_adpcm(
    pcm: bytes, nch: int, balign: int, spb: int
) -> np.ndarray:
    """IMA ADPCM ``data`` chunk -> (n_samples, n_channels) int32.
    Block layout (Microsoft WAVE_FORMAT_IMA_ADPCM): per channel a
    4-byte header (int16 predictor = the block's FIRST output sample,
    uint8 step index, reserved byte), then 4-byte data words
    interleaved channel by channel, low nibble first within a byte.
    ``spb`` = samples per block (header sample included); trailing
    pad nibbles beyond it are ignored, and a truncated final block
    decodes to whatever whole data words it holds."""
    if balign < 4 * nch:
        raise WavParseError(
            f"IMA ADPCM block align {balign} cannot hold {nch} "
            "channel headers"
        )
    chans: list[list[np.ndarray]] = [[] for _ in range(nch)]
    for off in range(0, len(pcm), balign):
        block = pcm[off : off + balign]
        if len(block) < 4 * nch:
            break  # trailing fragment without full headers
        nib_chan: list[np.ndarray] = []
        preds, idxs = [], []
        for c in range(nch):
            p, i0, _rsvd = struct.unpack_from("<hBB", block, 4 * c)
            if i0 > 88:
                raise WavParseError(
                    f"IMA ADPCM block header index {i0} out of range"
                )
            preds.append(p)
            idxs.append(i0)
        data = np.frombuffer(block, dtype=np.uint8)[4 * nch :]
        usable = len(data) - len(data) % (4 * nch)
        words = data[:usable].reshape(-1, nch, 4)
        for c in range(nch):
            bs = words[:, c, :].reshape(-1)
            nibs = np.empty(bs.size * 2, dtype=np.uint8)
            nibs[0::2] = bs & 0x0F
            nibs[1::2] = bs >> 4
            nibs = nibs[: max(spb - 1, 0)]
            dec, _, _ = ima_adpcm_core(nibs, preds[c], idxs[c])
            chans[c].append(
                np.concatenate([np.array([preds[c]], np.int32), dec])
            )
    if not chans[0]:
        return np.zeros((0, nch), dtype=np.int32)
    cols = [np.concatenate(parts) for parts in chans]
    return np.stack(cols, axis=1)


def encode_wav_ima(
    samples: np.ndarray, rate: int = 16000, block_samples: int = 505
) -> bytes:
    """(n[, channels]) int16 -> IMA ADPCM WAV bytes (format tag 0x11)
    — the fixture/writer dual of the tag-0x11 decode path. Standard
    encoder: the block's first sample seeds the predictor; each later
    sample quantizes its delta with the mirrored successive-
    approximation loop, so decode(encode(x)) tracks x within the
    step-size quantization error. ``block_samples`` must be 1 mod 8
    and >= 9 (1 header sample + nibbles packing into whole 4-byte
    data words, which is how the interleaver writes them)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2 or samples.dtype != np.int16:
        raise WavParseError("IMA ADPCM encoder needs (n[, ch]) int16")
    if block_samples < 9 or (block_samples - 1) % 8:
        # 1 header sample + nibbles packing into WHOLE 4-byte data
        # words: the interleave below writes words of 8 nibbles
        raise WavParseError(
            "block_samples must be 1 mod 8 and >= 9 (one header "
            "sample plus whole 4-byte nibble words)"
        )
    n, nch = samples.shape
    balign = 4 * nch + (block_samples - 1) // 2 * nch
    steps, adj = _IMA_STEPS, _IMA_INDEX_ADJ
    blocks = []
    idx = [0] * nch
    for off in range(0, n, block_samples):
        seg = samples[off : off + block_samples]
        hdr = bytearray()
        payload_nibs = []
        for c in range(nch):
            pred = int(seg[0, c])
            hdr += struct.pack("<hBB", pred, idx[c], 0)
            nibs = []
            for s in seg[1:, c]:
                step = int(steps[idx[c]])
                diff = int(s) - pred
                nib = 8 if diff < 0 else 0
                if diff < 0:
                    diff = -diff
                vpdiff = step >> 3
                if diff >= step:
                    nib |= 4
                    diff -= step
                    vpdiff += step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                    vpdiff += step >> 1
                if diff >= step >> 2:
                    nib |= 1
                    vpdiff += step >> 2
                pred = pred - vpdiff if nib & 8 else pred + vpdiff
                pred = max(-32768, min(32767, pred))
                idx[c] = max(0, min(88, idx[c] + int(adj[nib & 7])))
                nibs.append(nib)
            nibs += [0] * (block_samples - 1 - len(nibs))
            payload_nibs.append(nibs)
        body = bytearray(hdr)
        # 4-byte words per channel, interleaved; low nibble first
        per_ch_bytes = (block_samples - 1) // 2
        for word in range(0, per_ch_bytes, 4):
            for c in range(nch):
                for b in range(4):
                    base = (word + b) * 2
                    lo = payload_nibs[c][base]
                    hi = payload_nibs[c][base + 1]
                    body.append(lo | (hi << 4))
        blocks.append(bytes(body))
    pcm = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHHH",
        _TAG_IMA_ADPCM,
        nch,
        rate,
        rate * balign // block_samples,
        balign,
        4,
        2,
        block_samples,
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<II", 4, n)
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_ima_codewords(
    nibbles, pred0: int, index0: int, rate: int = 8000
) -> bytes:
    """Mono IMA ADPCM WAV carrying a GIVEN nibble stream (one block
    per 2*(block capacity) nibbles is not needed here: the stream is
    padded to whole 4-byte words and written as ONE block) with a
    chosen initial predictor/index — the fixture generator for
    oracle-exact codeword-level tests, the ADPCM analog of
    encode_wav(g711=...) emitting raw codes."""
    nibbles = [int(x) & 0xF for x in nibbles]
    if len(nibbles) % 8:
        raise WavParseError(
            "codeword fixture needs a multiple of 8 nibbles "
            "(whole 4-byte data words)"
        )
    if not -32768 <= pred0 <= 32767 or not 0 <= index0 <= 88:
        raise WavParseError("bad initial predictor/index")
    body = bytearray(struct.pack("<hBB", pred0, index0, 0))
    for i in range(0, len(nibbles), 2):
        body.append(nibbles[i] | (nibbles[i + 1] << 4))
    balign = len(body)
    spb = len(nibbles) + 1
    fmt = struct.pack(
        "<HHIIHHHH", _TAG_IMA_ADPCM, 1, rate, rate * balign // spb,
        balign, 4, 2, spb,
    )
    wav = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<II", 4, spb)
        + b"data"
        + struct.pack("<I", len(body))
        + bytes(body)
    )
    return b"RIFF" + struct.pack("<I", len(wav)) + wav


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
    fact_frames = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"fact" and clen >= 4 and pos + 12 <= end:
            (fact_frames,) = struct.unpack("<I", data[pos + 8 : pos + 12])
        if cid == b"fmt ":
            if clen < 16 or pos + 24 > end:
                raise WavParseError("fmt chunk shorter than 16 bytes")
            tag, nch, rate, _br, balign, bits = struct.unpack(
                "<HHIIHH", data[pos + 8 : pos + 24]
            )
            if tag == _TAG_EXTENSIBLE and clen >= 26 and pos + 34 <= end:
                # resolve the SubFormat tag exactly like decode_wav —
                # probe and decode must agree on the codec
                (tag,) = struct.unpack("<H", data[pos + 32 : pos + 34])
            spb = None
            if clen >= 20 and pos + 28 <= end:
                (spb,) = struct.unpack("<H", data[pos + 26 : pos + 28])
            fmt = (tag, nch, rate, bits, balign, spb)
        elif cid == b"data":
            data_len = min(clen, end - pos - 8)
        pos += 8 + clen + (clen & 1)
    if fmt is None:
        raise WavParseError("no fmt chunk")
    if data_len is None:
        raise WavParseError("no data chunk")
    tag, nch, rate, bits, balign, spb = fmt
    if nch < 1:
        raise WavParseError(f"bad fmt ({nch} channels)")
    if tag == _TAG_IMA_ADPCM:
        if bits != 4 or balign < 4 * nch:
            raise WavParseError(
                f"bad IMA ADPCM fmt ({bits}-bit, align {balign})"
            )
        capacity = (balign - 4 * nch) * 2 // nch + 1
        if spb is None:
            spb = capacity
        if spb < 1:
            # wSamplesPerBlock=0 is malformed: decode would still emit
            # the per-block header sample, so probe and decode frame
            # counts would diverge on the same bytes — reject instead
            raise WavParseError("IMA fmt wSamplesPerBlock must be >= 1")
        full, rem = divmod(data_len, balign)
        # a full block yields min(spb, capacity) samples — fmt may
        # claim a wSamplesPerBlock the block geometry cannot hold,
        # and decode only emits what the data words contain
        n = full * min(spb, capacity)
        if rem >= 4 * nch:
            usable = (rem - 4 * nch) - (rem - 4 * nch) % (4 * nch)
            n += 1 + min(usable * 2 // nch, spb - 1)
        if fact_frames is not None:
            n = min(n, fact_frames)
        return n, nch, rate
    if bits % 8 or not bits:
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
    fact_frames = None
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
            tag, nch, rate, _brate, balign, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag == _TAG_EXTENSIBLE:
                if clen < 26:
                    raise WavParseError("EXTENSIBLE fmt without SubFormat")
                (tag,) = struct.unpack("<H", body[24:26])
            spb = None
            if clen >= 20:
                (spb,) = struct.unpack("<H", body[18:20])
            fmt = (tag, nch, rate, bits, balign, spb)
        elif cid == b"data":
            pcm = body
        elif cid == b"fact" and clen >= 4:
            (fact_frames,) = struct.unpack("<I", body[:4])
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None:
        raise WavParseError("no fmt chunk")
    if pcm is None:
        raise WavParseError("no data chunk")
    tag, nch, rate, bits, balign, spb = fmt
    if nch < 1:
        raise WavParseError("zero channels")
    if tag == _TAG_IMA_ADPCM:
        if bits != 4:
            raise WavParseError(
                f"IMA ADPCM WAV must be 4-bit, not {bits}"
            )
        if spb is None:
            # derive from the block geometry (header sample included)
            spb = (balign - 4 * nch) * 2 // nch + 1
        if spb < 1:
            # keep decode consistent with wav_probe's rejection
            raise WavParseError("IMA fmt wSamplesPerBlock must be >= 1")
        arr = _decode_ima_adpcm(pcm, nch, balign, spb)
        if fact_frames is not None:
            # fact carries the true frame count: the final block's
            # pad nibbles decode past it and are trimmed here
            arr = arr[:fact_frames]
        return arr, rate
    if tag not in (_TAG_PCM, _TAG_FLOAT, _TAG_ALAW, _TAG_ULAW):
        # name gated codec tags BEFORE the width check: an ADPCM/MP3
        # stream's 4-bit (or 0-bit) width is not the actionable error
        raise WavParseError(
            f"WAV format tag {tag} needs an audio codec (PCM, "
            "IEEE-float, G.711 A-law/mu-law, and IMA ADPCM decode "
            "built in)"
        )
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
