"""Clean-room MPEG audio (MP3) header probe for the multimodal
metadata hook (SURVEY.md §2.K4).

Crawl audio is overwhelmingly MP3; the crawl pipeline's first pass is
a header scan (duration / rate / channel layout to route and budget
the corpus), not a decode. This module walks the frame headers of an
MPEG-1 / MPEG-2 / MPEG-2.5 Layer I/II/III stream — the bit layout is
public (ISO/IEC 11172-3 §2.4.1 and the 13818-3 LSF extension):

    AAAAAAAA AAABBCCD EEEEFFGH IIJJKLMM
    A sync (11 set bits)      B version  C layer    D protection
    E bitrate index           F sample-rate index   G padding
    I channel mode            (rest: private/mode-ext/copyright/
                               original/emphasis — not needed here)

Per-frame byte length and samples-per-frame follow from the version/
layer tables, so an exact frame count, sample count, and duration
come from header arithmetic alone — O(n_frames) byte math, no
entropy decode. ID3v2 prefix tags (syncsafe length) and ID3v1
trailing tags are skipped; VBR streams (per-frame bitrate changes)
walk naturally. Free-format streams (bitrate index 0) raise the
named gate, as does anything after the headers: full sample decode
needs the polyphase/MDCT chain and is out of scope — the honest
``NotImplementedError`` contract every gated codec here follows.

No reference parity: the reference repo contains no MP3 handling
(SURVEY.md §2.K4 extension row).
"""

from __future__ import annotations


class Mp3ParseError(ValueError):
    pass


MAX_FRAMES = 1 << 22  # ~4M frames ≈ 29h of 44.1kHz audio

# kbps tables indexed [version-group][layer][bitrate_index 1..14]
_BITRATES_V1 = {
    1: (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2: (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    3: (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
}
_BITRATES_V2 = {
    1: (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    2: (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3: (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_RATES = {
    3: (44100, 48000, 32000),   # MPEG-1   (version bits 11)
    2: (22050, 24000, 16000),   # MPEG-2   (version bits 10)
    0: (11025, 12000, 8000),    # MPEG-2.5 (version bits 00)
}


def _skip_id3v2(data: bytes) -> int:
    """Offset of the first audio byte past an optional ID3v2 tag."""
    if len(data) >= 10 and data[:3] == b"ID3":
        size = 0
        for b in data[6:10]:
            if b & 0x80:
                raise Mp3ParseError("ID3v2 size byte has the high bit set")
            size = (size << 7) | b
        footer = 10 if data[5] & 0x10 else 0
        end = 10 + size + footer
        if end > len(data):
            raise Mp3ParseError("ID3v2 tag overruns the payload")
        return end
    return 0


def _frame_header(data: bytes, pos: int) -> tuple[int, int, int, int, int]:
    """Parse the 4-byte header at ``pos`` ->
    (frame_bytes, samples_per_frame, sample_rate, channels, kbps)."""
    b0, b1, b2, b3 = data[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        raise Mp3ParseError(f"no frame sync at byte {pos}")
    version = (b1 >> 3) & 0x3
    if version == 1:
        raise Mp3ParseError("reserved MPEG version bits")
    layer_bits = (b1 >> 1) & 0x3
    if layer_bits == 0:
        raise Mp3ParseError("reserved layer bits")
    layer = 4 - layer_bits  # 1/2/3 = Layer I/II/III
    br_idx = (b2 >> 4) & 0xF
    if br_idx == 0:
        raise Mp3ParseError(
            "free-format stream (bitrate index 0) needs a frame-size "
            "scan this probe does not implement"
        )
    if br_idx == 15:
        raise Mp3ParseError("invalid bitrate index 15")
    sr_idx = (b2 >> 2) & 0x3
    if sr_idx == 3:
        raise Mp3ParseError("reserved sample-rate index")
    padding = (b2 >> 1) & 0x1
    mode = (b3 >> 6) & 0x3
    channels = 1 if mode == 3 else 2

    table = _BITRATES_V1 if version == 3 else _BITRATES_V2
    kbps = table[layer][br_idx - 1]
    rate = _RATES[version][sr_idx]
    if layer == 1:
        spf = 384
        nbytes = (12 * kbps * 1000 // rate + padding) * 4
    elif layer == 2:
        spf = 1152
        nbytes = 144 * kbps * 1000 // rate + padding
    else:  # Layer III: LSF versions halve the frame
        spf = 1152 if version == 3 else 576
        factor = 144 if version == 3 else 72
        nbytes = factor * kbps * 1000 // rate + padding
    if nbytes < 4:
        raise Mp3ParseError("frame length collapses below the header")
    return nbytes, spf, rate, channels, kbps


def mp3_probe(data: bytes) -> tuple[int, int, int, int]:
    """(n_samples, n_channels, sample_rate, n_frames) from a full
    frame-header walk — exact for CBR and VBR alike; no audio decode.
    """
    if len(data) < 4:
        raise Mp3ParseError("shorter than one frame header")
    pos = _skip_id3v2(data)
    end = len(data)
    # an ID3v1 tag is a fixed 128-byte trailer
    if end - pos >= 128 and data[end - 128 : end - 125] == b"TAG":
        end = end - 128
    n_frames = 0
    n_samples = 0
    rate0 = channels0 = None
    while pos < end:
        if end - pos < 4:
            raise Mp3ParseError(
                f"{end - pos} trailing bytes are not a frame"
            )
        nbytes, spf, rate, channels, _ = _frame_header(data, pos)
        if pos + nbytes > end:
            raise Mp3ParseError(f"frame at {pos} overruns the payload")
        if rate0 is None:
            rate0, channels0 = rate, channels
        elif rate != rate0 or channels != channels0:
            raise Mp3ParseError(
                "sample rate / channel mode changes mid-stream"
            )
        n_frames += 1
        n_samples += spf
        if n_frames > MAX_FRAMES:
            raise Mp3ParseError("frame count exceeds the cap")
        pos += nbytes
    if n_frames == 0:
        raise Mp3ParseError("no audio frames")
    return n_samples, channels0, rate0, n_frames


def mp3_bitrate_stats(data: bytes) -> tuple[int, int, bool]:
    """(min_kbps, max_kbps, is_vbr) — the routing metadata a corpus
    budgeter wants next after :func:`mp3_probe`."""
    pos = _skip_id3v2(data)
    end = len(data)
    if end - pos >= 128 and data[end - 128 : end - 125] == b"TAG":
        end -= 128
    lo = hi = None
    while pos < end:
        if end - pos < 4:
            raise Mp3ParseError("trailing bytes are not a frame")
        nbytes, _, _, _, kbps = _frame_header(data, pos)
        if pos + nbytes > end:
            raise Mp3ParseError(f"frame at {pos} overruns the payload")
        lo = kbps if lo is None else min(lo, kbps)
        hi = kbps if hi is None else max(hi, kbps)
        pos += nbytes
    if lo is None:
        raise Mp3ParseError("no audio frames")
    return lo, hi, lo != hi


def decode_mp3(data: bytes):
    """Full sample decode needs the subband-synthesis / MDCT chain —
    an honest codec-binding gate, same contract as decode_isobmff.

    Why this stays a gate rather than a clean-room decode (assessed
    deliberately): unlike FLAC (RFC 9639 — every table algorithmic)
    or the T.800/T.81 entropy coders (state machines reproducible
    from the spec text), conformant MPEG audio decode requires
    committee-designed NUMERIC constant tables with no derivation:
    the 512-tap synthesis window (ISO 11172-3 Table 3-B.3) for every
    layer, the Layer II bit-allocation tables (B.2a-d), and the 34
    Layer III Huffman code tables (B.7). This container has no
    independent reference to verify a transcription against (no
    mpg123/libmad/ffmpeg/minimp3, no Java MP3 SPI, nothing in the
    retrieved public snippets), and an own-encoder round trip cannot
    catch a mistranscribed constant — encoder and decoder would share
    the error and pass while producing nonconforming PCM on real
    files. Shipping a silently wrong decode is worse than this gate;
    the exact frame walk (mp3_probe / mp3_bitrate_stats) covers the
    crawl pipeline's metadata pass."""
    mp3_probe(data)  # validates the container before gating
    raise NotImplementedError(
        "MP3 sample decode needs an audio codec binding; the header "
        "probe (mp3_probe) covers metadata extraction"
    )


def encode_mp3_headers(
    n_frames: int,
    rate: int = 44100,
    kbps: int | list = 128,
    channels: int = 2,
    version: int = 3,
    layer: int = 3,
    id3v2_bytes: int = 0,
    id3v1: bool = False,
) -> bytes:
    """Fixture builder: a syntactically valid MPEG audio stream whose
    frame payloads are deterministic filler — the probe only reads
    headers, so golden tests exercise the real layout without a
    psychoacoustic encoder. ``kbps`` may be a list (one per frame)
    to build VBR streams."""
    if version not in (0, 2, 3):
        raise Mp3ParseError(f"version bits {version} invalid")
    rates = _RATES[version]
    if rate not in rates:
        raise Mp3ParseError(f"rate {rate} invalid for version {version}")
    sr_idx = rates.index(rate)
    table = _BITRATES_V1 if version == 3 else _BITRATES_V2
    kbps_list = kbps if isinstance(kbps, list) else [kbps] * n_frames
    if len(kbps_list) != n_frames:
        raise Mp3ParseError("kbps list length != n_frames")
    out = bytearray()
    if id3v2_bytes:
        body = bytes(id3v2_bytes)
        size = id3v2_bytes
        ss = bytes(
            (size >> s) & 0x7F for s in (21, 14, 7, 0)
        )
        out += b"ID3" + bytes([4, 0, 0]) + ss + body
    for f, k in enumerate(kbps_list):
        br_idx = table[layer].index(k) + 1
        padding = f % 2 if version == 3 and rate == 44100 else 0
        b1 = 0xE0 | (version << 3) | ((4 - layer) << 1) | 1
        b2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
        b3 = (0x3 if channels == 1 else 0x0) << 6
        if layer == 1:
            nbytes = (12 * k * 1000 // rate + padding) * 4
        else:
            factor = 144 if (version == 3 or layer == 2) else 72
            nbytes = factor * k * 1000 // rate + padding
        frame = bytearray([0xFF, b1, b2, b3])
        fill = bytes((f * 31 + i * 7) & 0xFF for i in range(nbytes - 4))
        frame += fill
        out += frame
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)
