"""Clean-room GIF decoder/encoder (GIF87a/GIF89a, the public format
of virtually every animated image in a web crawl).

Motivation (§2.K4): the multimodal hook is pitched at LLM training
corpora, and GIF is one of the three dominant crawl image formats
next to JPEG and PNG — both of which already decode clean-room
(sources/jpeg.py, sources/png.py). This module completes the set so
``media_features`` runs over a mixed jpeg/png/gif crawl with no
binding. It is also the only built-in format that carries REAL
multi-frame payloads, so video-style frame sampling (``sample_frames``)
exercises against genuine animation data instead of synthetic stacks.

Scope — the full still/animated baseline:

- 87a and 89a headers, global + local color tables, interlaced and
  sequential frames, arbitrary frame rectangles within the logical
  screen;
- LZW with variable code width, deferred clear codes, and the 4096
  dictionary cap;
- 89a graphic-control extensions: transparency and disposal methods
  0/1 (draw over), 2 (restore to background), 3 (restore to
  previous) — frames composite onto the logical screen exactly as a
  browser renders them;
- other extensions (comment, application, plain text) are skipped by
  their sub-block framing.

Out of scope, gated with :class:`GifParseError`: truncated or
malformed streams (there is no "lenient mode" — corrupt web payloads
should be counted, not silently mis-decoded).

Decoded output is ``(n_frames, height, width, 3)`` uint8 RGB over
the logical screen. The encoder exists for spec-shaped fixtures and
roundtrip tests; it writes a global color table, optional interlace,
and per-frame graphic-control extensions.
"""

from __future__ import annotations

import struct

import numpy as np


class GifParseError(ValueError):
    pass


# Decompression-bomb guards for skip-on-error crawl kernels: a few
# corrupt header bytes must not demand a 12 GiB canvas (65535^2 RGB)
# or an unbounded frame list before the LZW data is even touched.
# 64 Mpx/frame and 128 Mpx total are far beyond any real GIF.
MAX_PIXELS = 1 << 26
MAX_TOTAL_PIXELS = 1 << 27

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate length-prefixed sub-blocks until the 0 terminator."""
    chunks = []
    n = len(data)
    while True:
        if pos >= n:
            raise GifParseError("truncated sub-block chain")
        size = data[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > n:
            raise GifParseError("truncated sub-block payload")
        chunks.append(data[pos : pos + size])
        pos += size


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-variant LZW: codes packed LSB-first, CLEAR/EOI codes,
    width grows to 12 bits, dictionary capped at 4096 (deferred
    clears allowed — the dictionary simply stops growing)."""
    if not 2 <= min_code_size <= 11:
        raise GifParseError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    singles = [bytes([i]) for i in range(clear)]

    # spec-initialized as if a CLEAR had been read (encoders usually
    # open with one, but it is not mandatory); the two placeholders
    # stand in for the CLEAR/EOI code slots
    table: list[bytes] = singles + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    out: list[bytes] = []
    total = 0
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise GifParseError("LZW stream ended without EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = singles + [b"", b""]  # CLEAR/EOI placeholders
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise GifParseError(f"LZW code {code} out of range")
        out.append(entry)
        total += len(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == 1 << width and width < 12:
                width += 1
        prev = entry
        if total >= n_pixels:
            break
    pixels = b"".join(out)
    if len(pixels) < n_pixels:
        raise GifParseError(
            f"LZW produced {len(pixels)} pixels, frame needs {n_pixels}"
        )
    return pixels[:n_pixels]


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    rows = [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]
    out = np.empty_like(idx)
    out[np.asarray(rows, dtype=np.int64)] = idx
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> (n_frames, height, width, 3) uint8 RGB frames
    composited over the logical screen with 89a disposal semantics."""
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise GifParseError("not a GIF87a/GIF89a stream")
    width, height, packed, bg_index, _aspect = struct.unpack(
        "<HHBBB", data[6:13]
    )
    if width == 0 or height == 0:
        raise GifParseError("zero-sized logical screen")
    if width * height > MAX_PIXELS:
        raise GifParseError(
            f"logical screen {width}x{height} exceeds the "
            f"{MAX_PIXELS}-pixel decode guard"
        )
    pos = 13
    gct: np.ndarray | None = None
    if packed & 0x80:
        n_colors = 2 << (packed & 0x07)
        end = pos + 3 * n_colors
        if end > len(data):
            raise GifParseError("truncated global color table")
        gct = np.frombuffer(data[pos:end], dtype=np.uint8).reshape(-1, 3)
        pos = end

    if gct is not None and bg_index < len(gct):
        bg_rgb = gct[bg_index]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (height, width, 3)).copy()
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0

    while True:
        if pos >= len(data):
            raise GifParseError("stream ended without trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise GifParseError("truncated extension block")
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9:  # graphic control
                if len(body) < 4:
                    raise GifParseError("short graphic control extension")
                flags = body[0]
                disposal = (flags >> 2) & 0x7
                transparent = body[3] if flags & 0x1 else None
            # comment/application/plain-text: framing-skipped above
            continue
        if block != 0x2C:
            raise GifParseError(f"unknown block introducer 0x{block:02x}")

        if pos + 9 > len(data):
            raise GifParseError("truncated image descriptor")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if fw == 0 or fh == 0 or left + fw > width or top + fh > height:
            raise GifParseError("frame rectangle outside the logical screen")
        palette = gct
        if fpacked & 0x80:
            n_colors = 2 << (fpacked & 0x07)
            end = pos + 3 * n_colors
            if end > len(data):
                raise GifParseError("truncated local color table")
            palette = np.frombuffer(data[pos:end], dtype=np.uint8).reshape(-1, 3)
            pos = end
        if palette is None:
            raise GifParseError("frame has neither local nor global color table")
        if pos >= len(data):
            raise GifParseError("missing LZW minimum code size")
        min_code = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = np.frombuffer(
            _lzw_decode(lzw, min_code, fw * fh), dtype=np.uint8
        ).reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)
        if idx.max() >= len(palette):
            raise GifParseError("pixel index outside the color table")

        if (len(frames) + 1) * width * height > MAX_TOTAL_PIXELS:
            raise GifParseError(
                f"animation exceeds the {MAX_TOTAL_PIXELS}-pixel "
                "total decode guard"
            )
        saved = None
        if disposal == 3:
            saved = canvas[top : top + fh, left : left + fw].copy()
        rgb = palette[idx]
        region = canvas[top : top + fh, left : left + fw]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = bg_rgb
        elif disposal == 3:
            canvas[top : top + fh, left : left + fw] = saved
        transparent = None
        disposal = 0

    if not frames:
        raise GifParseError("GIF contains no image frames")
    return np.stack(frames)


def gif_probe(data: bytes) -> tuple[int, int, int]:
    """(height, width, n_frames) from the block structure only — the
    sub-block length framing lets the walk skip every LZW byte run
    without decoding, so a crawl metadata pass costs header reads."""
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise GifParseError("not a GIF87a/GIF89a stream")
    width, height, packed = struct.unpack("<HHB", data[6:11])
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    frames = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            pos += 1
            _, pos = _sub_blocks(data, pos)
        elif block == 0x2C:
            if pos + 9 > len(data):
                raise GifParseError("truncated image descriptor")
            fpacked = data[pos + 8]
            pos += 9
            if fpacked & 0x80:
                pos += 3 * (2 << (fpacked & 0x07))
            pos += 1  # LZW minimum code size
            _, pos = _sub_blocks(data, pos)
            frames += 1
        else:
            raise GifParseError(f"unknown block introducer 0x{block:02x}")
    if frames == 0:
        raise GifParseError("GIF contains no image frames")
    return height, width, frames


# ------------------------------------------------------------ encoder


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Standard GIF LZW encoder: starts with CLEAR, grows the code
    width, re-CLEARs at the 4096 cap, ends with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            # width grows when the just-assigned code reaches
            # 2**width: the emit above happened first, so this keeps
            # the encoder in lockstep with decoders that bump after
            # their table length hits 2**width (e.g. the giflib
            # convention the decoder below follows)
            if next_code == 1 << width and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _blockify(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    transparent: int | None = None,
    disposal: int = 0,
) -> bytes:
    """(n_frames, h, w) palette indices + (n, 3) palette -> GIF89a
    bytes. Fixture writer: global color table only, one graphic
    control extension per frame when 89a features are requested."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 2:
        frames = frames[None, ...]
    nf, h, w = frames.shape
    palette = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    depth = max(1, int(np.ceil(np.log2(len(palette)))))
    n_colors = 1 << depth
    table = np.zeros((n_colors, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += table.tobytes()
    min_code = max(2, depth)
    for f in range(nf):
        if transparent is not None or disposal:
            flags = (disposal & 0x7) << 2 | (1 if transparent is not None else 0)
            out += bytes([0x21, 0xF9, 4, flags, 0, 0, transparent or 0, 0])
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        idx = frames[f]
        if interlace:
            rows = [
                r
                for start, step in _INTERLACE_PASSES
                for r in range(start, h, step)
            ]
            idx = idx[np.asarray(rows, dtype=np.int64)]
        out += bytes([min_code])
        out += _blockify(_lzw_encode(idx.tobytes(), min_code))
    out += b"\x3b"
    return bytes(out)
