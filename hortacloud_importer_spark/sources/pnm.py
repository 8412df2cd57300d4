"""Clean-room netpbm (PGM/PPM/PBM) codec.

§2.K4: netpbm is the lingua franca of classic ML image datasets and
scientific tool output (P5 grayscale / P6 RGB are what `convert`,
OpenCV samples, and countless academic corpora ship). The format is
a public one-page spec; supporting it costs little and removes a
binding for another slice of real-world data:

- P2/P3 (ASCII) and P5/P6 (binary) gray/RGB, maxval 1..65535
  (binary 16-bit is big-endian per spec), ``#`` comments anywhere in
  the header;
- P1/P4 bitmaps decode to 0/255 grayscale (P4 is MSB-first packed).

Arbitrary corruption raises :class:`PnmParseError` (the named-error
contract the skip-on-error media kernel relies on), and declared
dimensions hit the same decompression-bomb guard as the other
codecs. Output is ``(h, w, 1|3)`` uint8/uint16.
"""

from __future__ import annotations

import numpy as np


class PnmParseError(ValueError):
    pass


# max w*h*samples a header may declare (decompression-bomb guard)
MAX_SAMPLES = 1 << 28


def _header_tokens(data: bytes, count: int) -> tuple[list[int], int]:
    """Read ``count`` whitespace-separated integer tokens after the
    magic, skipping ``#`` comments; returns (values, offset past the
    single whitespace byte that terminates the header)."""
    vals: list[int] = []
    pos = 2
    n = len(data)
    while len(vals) < count:
        while pos < n and data[pos] in b" \t\r\n":
            pos += 1
        if pos < n and data[pos : pos + 1] == b"#":
            while pos < n and data[pos] not in b"\r\n":
                pos += 1
            continue
        start = pos
        while pos < n and data[pos] in b"0123456789":
            pos += 1
        if pos == start:
            raise PnmParseError("malformed netpbm header token")
        vals.append(int(data[start:pos]))
    if pos >= n or data[pos] not in b" \t\r\n":
        raise PnmParseError("netpbm header not whitespace-terminated")
    return vals, pos + 1


def pnm_probe(data: bytes) -> tuple[int, int, int]:
    """(height, width, channels) from the header tokens only."""
    if len(data) < 2 or data[0:1] != b"P" or data[1] not in b"123456":
        raise PnmParseError("not a netpbm stream")
    kind = data[1] - ord("0")
    channels = 3 if kind in (3, 6) else 1
    vals, _ = _header_tokens(data, 2 if kind in (1, 4) else 3)
    if vals[0] <= 0 or vals[1] <= 0:
        raise PnmParseError(f"bad dimensions {vals[0]}x{vals[1]}")
    return vals[1], vals[0], channels


def decode_pnm(data: bytes) -> np.ndarray:
    """netpbm bytes -> (h, w, c) uint8/uint16."""
    if len(data) < 2 or data[0:1] != b"P" or data[1] not in b"123456":
        raise PnmParseError("not a netpbm stream")
    kind = data[1] - ord("0")
    channels = 3 if kind in (3, 6) else 1
    bitmap = kind in (1, 4)
    n_head = 2 if bitmap else 3
    vals, pos = _header_tokens(data, n_head)
    w, h = vals[0], vals[1]
    maxval = 1 if bitmap else vals[2]
    if w <= 0 or h <= 0:
        raise PnmParseError(f"bad dimensions {w}x{h}")
    if not 1 <= maxval <= 65535:
        raise PnmParseError(f"maxval {maxval} outside 1..65535")
    if w * h * channels > MAX_SAMPLES:
        raise PnmParseError(
            f"{w}x{h}x{channels} exceeds the {MAX_SAMPLES}-sample decode guard"
        )
    dtype = np.uint8 if maxval < 256 else np.uint16
    count = w * h * channels

    if kind in (2, 3):  # ASCII samples
        tokens = data[pos:].split()
        if len(tokens) < count:
            raise PnmParseError(
                f"ASCII netpbm has {len(tokens)} samples, needs {count}"
            )
        try:
            arr = np.array(tokens[:count], dtype=np.int64)
        except ValueError as exc:
            raise PnmParseError(f"non-numeric ASCII sample: {exc}") from exc
    elif kind == 1:  # ASCII bitmap: 1 = black; whitespace is optional
        bits = bytes(c for c in data[pos:] if c in (0x30, 0x31))
        if len(bits) < count:
            raise PnmParseError("ASCII bitmap has too few samples")
        arr = np.frombuffer(bits[:count], dtype=np.uint8) - ord("0")
        arr = (1 - arr.astype(np.int64)) * 255  # 1 = black -> 0
        maxval = 255
    elif kind == 4:  # packed bitmap, rows byte-aligned, MSB first
        row_bytes = (w + 7) // 8
        need = row_bytes * h
        if len(data) - pos < need:
            raise PnmParseError("packed bitmap truncated")
        rows = np.frombuffer(
            data[pos : pos + need], dtype=np.uint8
        ).reshape(h, row_bytes)
        bits = np.unpackbits(rows, axis=1)[:, :w]
        arr = ((1 - bits.astype(np.int64)) * 255).ravel()
        maxval = 255
    else:  # P5/P6 binary
        sample_bytes = 1 if maxval < 256 else 2
        need = count * sample_bytes
        if len(data) - pos < need:
            raise PnmParseError(
                f"binary netpbm truncated ({len(data) - pos} of {need} bytes)"
            )
        raw = data[pos : pos + need]
        if sample_bytes == 1:
            arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
        else:  # 16-bit samples are big-endian per spec
            arr = np.frombuffer(raw, dtype=">u2").astype(np.int64)
    if arr.max(initial=0) > maxval:
        raise PnmParseError("sample value exceeds declared maxval")
    if arr.min(initial=0) < 0:
        raise PnmParseError("negative sample value")
    return arr.astype(dtype).reshape(h, w, channels)


def encode_pnm(img: np.ndarray, ascii_format: bool = False) -> bytes:
    """(h, w) or (h, w, 1|3) uint8/uint16 -> P2/P3 (ascii) or P5/P6
    (binary) bytes."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in (1, 3):
        raise PnmParseError(f"netpbm holds 1 or 3 channels, not {c}")
    if img.dtype == np.uint8:
        maxval = 255
    elif img.dtype == np.uint16:
        maxval = 65535
    else:
        raise PnmParseError(f"unsupported dtype {img.dtype}")
    if ascii_format:
        magic = b"P2" if c == 1 else b"P3"
        body = b"\n".join(
            b" ".join(str(v).encode() for v in row)
            for row in img.reshape(h, w * c)
        )
        return magic + b"\n%d %d\n%d\n" % (w, h, maxval) + body + b"\n"
    magic = b"P5" if c == 1 else b"P6"
    payload = (
        img.astype(">u2").tobytes() if maxval == 65535 else img.tobytes()
    )
    return magic + b"\n%d %d\n%d\n" % (w, h, maxval) + payload
