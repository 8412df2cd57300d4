"""Clean-room ADTS (AAC transport) header probe for the multimodal
metadata hook (SURVEY.md §2.K4).

Raw ``.aac`` crawl audio is ADTS: a sequence of frames, each with a
fixed 7-byte header (9 with CRC) whose layout is public (ISO/IEC
13818-7 §6.2 / 14496-3):

    AAAAAAAA AAAABCCD EEFFFFGH HHIJKLMM MMMMMMMM MMMOOOOO OOOOOOPP
    A sync (12 set bits)   B MPEG id       C layer (00)
    D protection_absent    E profile       F sampling-frequency idx
    G private              H channel config
    M frame length (13 bits, header included)
    O buffer fullness      P raw-data-blocks-in-frame - 1

Each raw data block decodes to 1024 samples, so the frame walk gives
exact sample counts and duration from header arithmetic alone — the
same metadata-first posture as sources/mp3.py. Sample decode needs
the AAC filterbank and stays a named codec gate.

No reference parity: the reference repo contains no AAC handling
(SURVEY.md §2.K4 extension row).
"""

from __future__ import annotations


class AdtsParseError(ValueError):
    pass


MAX_FRAMES = 1 << 22

_RATES = (
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350,
)


def _frame_header(data: bytes, pos: int) -> tuple[int, int, int, int, int]:
    """-> (frame_bytes, n_blocks, sample_rate, channels, profile)."""
    if pos + 7 > len(data):
        raise AdtsParseError(f"truncated ADTS header at {pos}")
    b = data[pos : pos + 7]
    if b[0] != 0xFF or (b[1] & 0xF0) != 0xF0:
        raise AdtsParseError(f"no ADTS sync at byte {pos}")
    if (b[1] >> 1) & 0x3:
        raise AdtsParseError("ADTS layer bits must be 00")
    protection_absent = b[1] & 0x1
    profile = (b[2] >> 6) & 0x3
    sf_idx = (b[2] >> 2) & 0xF
    if sf_idx >= len(_RATES):
        raise AdtsParseError(f"reserved sampling-frequency index {sf_idx}")
    channels = ((b[2] & 0x1) << 2) | ((b[3] >> 6) & 0x3)
    if channels == 0:
        raise AdtsParseError(
            "channel configuration 0 (PCE-coded) is not supported"
        )
    length = ((b[3] & 0x3) << 11) | (b[4] << 3) | ((b[5] >> 5) & 0x7)
    n_blocks = (b[6] & 0x3) + 1
    min_len = 7 if protection_absent else 9
    if length < min_len:
        raise AdtsParseError(f"frame length {length} below the header")
    return length, n_blocks, _RATES[sf_idx], channels, profile


def adts_probe(data: bytes) -> tuple[int, int, int, int]:
    """(n_samples, n_channels, sample_rate, n_frames) from a full
    frame-header walk — 1024 samples per raw data block, no decode."""
    if len(data) < 7:
        raise AdtsParseError("shorter than one ADTS header")
    pos = 0
    # ID3v2 tags appear on .aac files too (same syncsafe layout)
    if data[:3] == b"ID3" and len(data) >= 10:
        size = 0
        for v in data[6:10]:
            if v & 0x80:
                raise AdtsParseError("ID3v2 size byte has the high bit set")
            size = (size << 7) | v
        pos = 10 + size + (10 if data[5] & 0x10 else 0)
        if pos > len(data):
            raise AdtsParseError("ID3v2 tag overruns the payload")
    n_frames = 0
    n_samples = 0
    rate0 = ch0 = None
    while pos < len(data):
        length, n_blocks, rate, channels, _ = _frame_header(data, pos)
        if pos + length > len(data):
            raise AdtsParseError(f"frame at {pos} overruns the payload")
        if rate0 is None:
            rate0, ch0 = rate, channels
        elif rate != rate0 or channels != ch0:
            raise AdtsParseError(
                "sample rate / channel config changes mid-stream"
            )
        n_frames += 1
        n_samples += 1024 * n_blocks
        if n_frames > MAX_FRAMES:
            raise AdtsParseError("frame count exceeds the cap")
        pos += length
    if n_frames == 0:
        raise AdtsParseError("no ADTS frames")
    return n_samples, ch0, rate0, n_frames


def decode_adts(data: bytes):
    """AAC sample decode needs the spectral/filterbank chain — an
    honest codec-binding gate, same contract as decode_mp3."""
    adts_probe(data)  # validates the container before gating
    raise NotImplementedError(
        "AAC sample decode needs an audio codec binding; the header "
        "probe (adts_probe) covers metadata extraction"
    )


def encode_adts_headers(
    n_frames: int,
    rate: int = 44100,
    channels: int = 2,
    profile: int = 1,
    payload_bytes: int = 200,
    n_blocks: int = 1,
    with_crc: bool = False,
) -> bytes:
    """Fixture builder: syntactically valid ADTS frames with
    deterministic filler payloads — the probe reads headers only."""
    if rate not in _RATES:
        raise AdtsParseError(f"rate {rate} is not an ADTS table rate")
    if not 1 <= channels <= 7:
        raise AdtsParseError(f"channel configuration {channels}")
    if not 1 <= n_blocks <= 4:
        raise AdtsParseError(f"raw-data-block count {n_blocks}")
    sf_idx = _RATES.index(rate)
    out = bytearray()
    hdr_len = 9 if with_crc else 7
    for f in range(n_frames):
        length = hdr_len + payload_bytes
        b = bytearray(hdr_len)
        b[0] = 0xFF
        b[1] = 0xF0 | (0 << 3) | (0 << 1) | (0 if with_crc else 1)
        b[2] = (profile << 6) | (sf_idx << 2) | ((channels >> 2) & 0x1)
        b[3] = ((channels & 0x3) << 6) | ((length >> 11) & 0x3)
        b[4] = (length >> 3) & 0xFF
        b[5] = ((length & 0x7) << 5) | 0x1F  # fullness high bits
        b[6] = 0xFC | (n_blocks - 1)
        out += b
        out += bytes((f * 13 + i * 7) & 0xFF for i in range(payload_bytes))
    return bytes(out)
