"""Clean-room AVI video container (RIFF 'AVI ') for the multimodal
video hook.

§2.K4 pitches the engine at LLM training corpora, where video rows
are "opaque binary + typed metadata + frame sampling". Until now the
video path ran on synthetic raw8 stacks and GIF animations; this
module adds a REAL video container so ``sample_frames`` /
``media_features`` exercise end-to-end against actual video files.
The RIFF layout is the public Microsoft multimedia spec (the same
chunk grammar sources/wav.py already parses for WAVE), and the two
in-scope codecs reuse decoders this repo already has:

- ``MJPG`` streams: every ``00dc`` chunk is a complete baseline JPEG
  frame, decoded by the clean-room T.81 decoder (sources/jpeg.py) —
  motion-JPEG is what microscopes, webcams, and capture cards write;
- ``DIB `` (uncompressed) streams: every ``00db`` chunk is a
  bottom-up BGR(A)/gray bitmap described by the stream-format
  BITMAPINFOHEADER — byte-exact, which gives the driver oracle a
  closed form.

Interleaved audio streams ('01wb' etc.) are skipped by chunk
framing. Out of scope, gated with :class:`AviParseError`: any other
video FourCC (cinepak/indeo/h264/...), multiple video streams, RLE
bitmaps, and palettized (<16-bit) DIB frames.

Decoded output is ``(n_frames, height, width, channels)`` uint8.
The encoder writes spec-shaped fixtures: RIFF/hdrl/strl/movi/idx1
with either MJPG (via encode_jpeg_gray) or DIB frames.
"""

from __future__ import annotations

import struct

import numpy as np


class AviParseError(ValueError):
    pass


def _chunks(data: bytes, pos: int, end: int):
    """Iterate (fourcc, payload_start, payload_size) with RIFF word
    alignment; LIST chunks are yielded as ('LIST:<type>', ...) over
    their inner payload."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if body + size > end:
            raise AviParseError(
                f"chunk {fourcc!r} overruns its parent ({size} bytes)"
            )
        yield fourcc, body, size
        pos = body + size + (size & 1)


def decode_avi(data: bytes) -> np.ndarray:
    """AVI bytes -> (n_frames, h, w, c) uint8 video frames."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviParseError("not a RIFF/AVI stream")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(len(data), 8 + riff_size)

    handler = None
    strf: bytes | None = None
    width = height = 0
    frames: list[bytes] = []
    stream_no = 0
    video_stream: int | None = None

    def walk(pos: int, stop: int) -> None:
        nonlocal handler, strf, width, height, stream_no, video_stream
        for fourcc, body, size in _chunks(data, pos, stop):
            if fourcc == b"LIST":
                walk(body + 4, body + size)  # skip the list type tag
            elif fourcc == b"avih":
                if size < 40:
                    raise AviParseError("short avih header")
                width, height = struct.unpack(
                    "<II", data[body + 32 : body + 40]
                )
            elif fourcc == b"strh":
                if size < 8:
                    raise AviParseError("short strh header")
                fcc_type = data[body : body + 4]
                if fcc_type == b"vids":
                    if video_stream is not None:
                        raise AviParseError(
                            "multiple video streams are not supported"
                        )
                    video_stream = stream_no
                    handler = data[body + 4 : body + 8]
                stream_no += 1
            elif fourcc == b"strf":
                if video_stream == stream_no - 1 and strf is None:
                    strf = data[body : body + size]
            elif len(fourcc) == 4 and fourcc[2:4] in (b"dc", b"db"):
                idx = int(fourcc[:2]) if fourcc[:2].isdigit() else -1
                if idx == video_stream:
                    frames.append(data[body : body + size])

    walk(12, end)
    if video_stream is None:
        raise AviParseError("no 'vids' stream in hdrl")
    if not frames:
        raise AviParseError("no video frame chunks in movi")

    tag = bytes(handler or b"").upper()
    if tag == b"MJPG":
        from hortacloud_importer_spark.sources.jpeg import decode_jpeg

        decoded = [decode_jpeg(f) for f in frames]
        shapes = {d.shape for d in decoded}
        if len(shapes) != 1:
            raise AviParseError(f"MJPG frame shapes differ: {sorted(shapes)}")
        return np.stack(decoded)
    if tag in (b"DIB ", b"\x00\x00\x00\x00", b""):
        if strf is None or len(strf) < 40:
            raise AviParseError("DIB stream without a BITMAPINFOHEADER strf")
        w, h = struct.unpack("<ii", strf[4:12])
        bpp = struct.unpack("<H", strf[14:16])[0]
        (compression,) = struct.unpack("<I", strf[16:20])
        if compression != 0:
            raise AviParseError(
                f"DIB compression {compression} is not supported (BI_RGB only)"
            )
        if bpp not in (8, 24, 32):
            raise AviParseError(f"{bpp}-bit DIB frames are not supported")
        top_down = h < 0
        h = abs(h)
        if w <= 0 or h == 0:
            raise AviParseError(f"bad DIB dimensions {w}x{h}")
        palette = None
        if bpp == 8:
            (n_colors,) = struct.unpack("<I", strf[32:36])
            n_colors = n_colors or 256
            if len(strf) < 40 + 4 * n_colors:
                raise AviParseError("truncated DIB color table in strf")
            quads = np.frombuffer(
                strf[40 : 40 + 4 * n_colors], dtype=np.uint8
            )
            palette = quads.reshape(-1, 4)[:, 2::-1]  # BGRX -> RGB
        c = bpp // 8
        stride = (w * c + 3) & ~3
        out = []
        for f in frames:
            if len(f) < stride * h:
                raise AviParseError("truncated DIB frame")
            rows = np.frombuffer(f[: stride * h], dtype=np.uint8).reshape(
                h, stride
            )[:, : w * c]
            if not top_down:
                rows = rows[::-1]
            if palette is not None:
                if rows.max(initial=0) >= len(palette):
                    raise AviParseError("DIB index outside the color table")
                out.append(palette[rows])
                continue
            img = rows.reshape(h, w, c)
            if c == 3:
                img = img[:, :, ::-1]  # BGR -> RGB
            elif c == 4:
                img = img[:, :, [2, 1, 0, 3]]
            out.append(img)
        return np.ascontiguousarray(np.stack(out))
    raise AviParseError(
        f"video codec {tag!r} is not supported (MJPG and DIB are)"
    )


def avi_probe(data: bytes) -> tuple[int, int, int]:
    """(height, width, n_frames) from the avih main header only."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviParseError("not a RIFF/AVI stream")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(len(data), 8 + riff_size)
    stack = [(12, end)]
    while stack:
        pos, stop = stack.pop()
        for fourcc, body, size in _chunks(data, pos, stop):
            if fourcc == b"LIST":
                stack.append((body + 4, body + size))
            elif fourcc == b"avih":
                if size < 40:
                    raise AviParseError("short avih header")
                total = struct.unpack("<I", data[body + 16 : body + 20])[0]
                w, h = struct.unpack("<II", data[body + 32 : body + 40])
                return h, w, total
    raise AviParseError("no avih header")


# ------------------------------------------------------------ encoder


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi(frames: np.ndarray, codec: str = "DIB", fps: int = 10) -> bytes:
    """(n, h, w) gray or (n, h, w, 3) RGB uint8 -> AVI bytes.
    ``codec="DIB"`` writes uncompressed bottom-up bitmaps (byte-exact
    roundtrip); ``codec="MJPG"`` writes one baseline JPEG per frame
    via the clean-room encoder (grayscale input only)."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        frames = frames[..., None]
    nf, h, w, c = frames.shape
    codec = codec.upper()
    if codec == "MJPG":
        from hortacloud_importer_spark.sources.jpeg import encode_jpeg_gray

        if c != 1:
            raise AviParseError("MJPG fixture encoder writes grayscale only")
        payloads = [encode_jpeg_gray(frames[i, :, :, 0]) for i in range(nf)]
        handler, fcc, bpp = b"MJPG", b"00dc", 24
        strf_size = 0
    elif codec == "DIB":
        if c not in (1, 3):
            raise AviParseError(f"DIB encoder takes gray or RGB, got c={c}")
        bpp = 8 if c == 1 else 24
        stride = (w * c + 3) & ~3
        payloads = []
        for i in range(nf):
            img = frames[i]
            img = img[:, :, ::-1] if c == 3 else img
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, : w * c] = img[::-1].reshape(h, w * c)
            payloads.append(rows.tobytes())
        handler, fcc = b"DIB ", b"00db"
        strf_size = stride * h
    else:
        raise AviParseError(f"unknown fixture codec {codec!r}")

    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        max_bytes * fps,  # max bytes per second
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        nf,
        0,  # initial frames
        1,  # streams
        max_bytes,
        w,
        h,
        0,
        0,
        0,
        0,
    )
    strh = (
        b"vids"
        + handler
        # flags, priority, language, initialFrames, scale, rate,
        # start, length, suggestedBufferSize, quality, sampleSize
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, nf, max_bytes, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    # DIB frames are gray-as-8bpp only in the palette sense; write
    # 8-bit with a gray palette or 24-bit BGR
    if codec == "DIB" and bpp == 8:
        pal = bytes(
            b for i in range(256) for b in (i, i, i, 0)
        )
    else:
        pal = b""
    strf = (
        struct.pack(
            "<IiiHHIIiiII",
            40,
            w,
            h,
            1,
            bpp,
            0,
            strf_size,
            0,
            0,
            256 if pal else 0,
            0,
        )
        + pal
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(_chunk(fcc, p) for p in payloads)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to the movi list type)
    idx = bytearray()
    off = 4
    for p in payloads:
        idx += fcc + struct.pack("<III", 0x10, off, len(p))
        off += 8 + len(p) + (len(p) & 1)
    body = hdrl + movi + _chunk(b"idx1", bytes(idx))
    return _chunk(b"RIFF", b"AVI " + body)
