"""Clean-room BMP (Windows bitmap) decoder/encoder.

§2.K4: rounds out the bindingless image set (jpeg/png/gif/tiff/jp2)
with the uncompressed interchange format screenshots and legacy
datasets arrive in. Scope is the BITMAPINFOHEADER baseline that
covers real-world BMPs:

- "BM" file header with explicit pixel-data offset;
- 40-byte (or larger, e.g. V4/V5) info headers, 8-bit paletted,
  24-bit BGR, and 32-bit BGRA pixels, BI_RGB (uncompressed) only;
- bottom-up (positive height) and top-down (negative height) row
  order; rows padded to 4-byte boundaries.

RLE4/RLE8/bitfields compression and sub-8-bit depths gate with
:class:`BmpParseError` — they are vanishingly rare in crawled data
and a named error keeps corrupt payloads countable.

Decoded output is ``(height, width, channels)`` uint8 with channels
in RGB/RGBA order (BMP stores BGR on disk; the decoder swaps).
"""

from __future__ import annotations

import struct

import numpy as np


class BmpParseError(ValueError):
    pass


def bmp_probe(data: bytes) -> tuple[int, int, int]:
    """(height, width, channels) from the info header only."""
    if len(data) < 30 or data[:2] != b"BM":
        raise BmpParseError("not a BMP stream")
    width, height = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    if width <= 0 or height == 0:
        raise BmpParseError(f"bad dimensions {width}x{height}")
    if bpp not in (8, 24, 32):
        raise BmpParseError(f"{bpp}-bit BMP is not supported (8/24/32 are)")
    return abs(height), width, 3 if bpp == 8 else bpp // 8


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, c) uint8, RGB(A) channel order."""
    if len(data) < 54 or data[:2] != b"BM":
        raise BmpParseError("not a BMP stream")
    (pix_offset,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise BmpParseError(
            f"BITMAPCOREHEADER ({hdr_size} bytes) is not supported"
        )
    width, height = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if planes != 1:
        raise BmpParseError(f"planes={planes} (must be 1)")
    if compression != 0:
        raise BmpParseError(
            f"BMP compression {compression} is not supported (BI_RGB only)"
        )
    if bpp not in (8, 24, 32):
        raise BmpParseError(f"{bpp}-bit BMP is not supported (8/24/32 are)")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise BmpParseError(f"bad dimensions {width}x{height}")

    palette = None
    if bpp == 8:
        (n_colors,) = struct.unpack("<I", data[46:50])
        n_colors = n_colors or 256
        pal_start = 14 + hdr_size
        pal_end = pal_start + 4 * n_colors
        if pal_end > len(data):
            raise BmpParseError("truncated color table")
        # BGRX quads on disk -> (n, 3) RGB
        quads = np.frombuffer(data[pal_start:pal_end], dtype=np.uint8)
        palette = quads.reshape(-1, 4)[:, 2::-1]

    row_bytes = (width * bpp + 7) // 8
    stride = (row_bytes + 3) & ~3
    need = pix_offset + stride * height
    if need > len(data):
        raise BmpParseError(
            f"pixel data truncated ({len(data)} bytes, need {need})"
        )
    rows = np.frombuffer(
        data[pix_offset : pix_offset + stride * height], dtype=np.uint8
    ).reshape(height, stride)[:, :row_bytes]
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        idx = rows
        if idx.max(initial=0) >= len(palette):
            raise BmpParseError("pixel index outside the color table")
        return np.ascontiguousarray(palette[idx])
    c = bpp // 8
    img = rows.reshape(height, width, c)
    if c == 3:
        return np.ascontiguousarray(img[:, :, ::-1])  # BGR -> RGB
    # BGRA -> RGBA
    return np.ascontiguousarray(img[:, :, [2, 1, 0, 3]])


def encode_bmp(img: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """(h, w) indices + palette -> 8-bit BMP, or (h, w, 3|4) RGB(A)
    -> 24/32-bit BMP. Fixture writer: BITMAPINFOHEADER, bottom-up,
    BI_RGB."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        if palette is None:
            raise BmpParseError("8-bit encode needs a palette")
        bpp, c = 8, 1
        h, w = img.shape
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        c = img.shape[2]
        bpp = 8 * c
        h, w = img.shape[:2]
    else:
        raise BmpParseError(f"unsupported array shape {img.shape}")
    row_bytes = (w * bpp + 7) // 8
    stride = (row_bytes + 3) & ~3
    pal_bytes = b""
    n_colors = 0
    if bpp == 8:
        pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
        n_colors = len(pal)
        quads = np.zeros((n_colors, 4), dtype=np.uint8)
        quads[:, :3] = pal[:, ::-1]  # RGB -> BGRX
        pal_bytes = quads.tobytes()
    pix_offset = 14 + 40 + len(pal_bytes)
    body = np.zeros((h, stride), dtype=np.uint8)
    if bpp == 8:
        body[:, :row_bytes] = img[::-1]
    else:
        swapped = img[:, :, [2, 1, 0]] if c == 3 else img[:, :, [2, 1, 0, 3]]
        body[:, :row_bytes] = swapped[::-1].reshape(h, row_bytes)
    out = bytearray(b"BM")
    out += struct.pack("<IHHI", pix_offset + body.size, 0, 0, pix_offset)
    out += struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, body.size, 2835, 2835, n_colors, 0
    )
    out += pal_bytes
    out += body.tobytes()
    return bytes(out)
