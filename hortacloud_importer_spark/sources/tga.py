"""Clean-room TGA (Truevision TARGA) codec.

§2.K4: TGA is the interchange format of game-asset and graphics
datasets (textures, renders, scan dumps). The format is a public
18-byte header plus optional palette and pixel data; scope covers
what real files are:

- image types 1/9 (color-mapped), 2/10 (truecolor BGR/BGRA), 3/11
  (grayscale), the 8+ variants RLE-compressed with the 1-bit
  packet grammar;
- 8/16/24/32-bit pixels (16-bit is ARRRRRGG GGGBBBBB little-endian),
  palettes of 24/32-bit entries with a first-entry offset;
- bottom-up (default) and top-down (descriptor bit 5) row order,
  an ID field skipped by its declared length.

Corruption raises :class:`TgaParseError` (the named-error contract),
and declared dimensions hit the decompression-bomb guard. Output is
``(h, w, 1|3|4)`` uint8.
"""

from __future__ import annotations

import struct

import numpy as np


class TgaParseError(ValueError):
    pass


# max w*h*channels a header may declare (decompression-bomb guard)
MAX_SAMPLES = 1 << 28


def _expand16(pix: np.ndarray) -> np.ndarray:
    """(n,) uint16 ARRRRRGG GGGBBBBB -> (n, 3) uint8 RGB (5-bit
    channels scaled to 8 bits by the standard (v << 3) | (v >> 2))."""
    r = ((pix >> 10) & 0x1F).astype(np.uint8)
    g = ((pix >> 5) & 0x1F).astype(np.uint8)
    b = (pix & 0x1F).astype(np.uint8)
    out = np.stack([r, g, b], axis=-1)
    return (out << 3) | (out >> 2)


def _rle_expand(data: bytes, pos: int, n_pixels: int, bpp_bytes: int) -> bytes:
    """TARGA RLE: packet header bit 7 selects run (repeat the next
    pixel count times) vs raw (count literal pixels); count = low 7
    bits + 1. Runs never officially cross... rows, but real encoders
    do, so the expansion is row-agnostic."""
    out = bytearray()
    want = n_pixels * bpp_bytes
    n = len(data)
    while len(out) < want:
        if pos >= n:
            raise TgaParseError("RLE stream truncated")
        header = data[pos]
        pos += 1
        count = (header & 0x7F) + 1
        if header & 0x80:
            if pos + bpp_bytes > n:
                raise TgaParseError("RLE run pixel truncated")
            out += data[pos : pos + bpp_bytes] * count
            pos += bpp_bytes
        else:
            need = count * bpp_bytes
            if pos + need > n:
                raise TgaParseError("RLE raw packet truncated")
            out += data[pos : pos + need]
            pos += need
    if len(out) > want:
        raise TgaParseError("RLE expands past the image size")
    return bytes(out)


def decode_tga(data: bytes) -> np.ndarray:
    """TGA bytes -> (h, w, c) uint8, RGB(A)/grayscale channel order."""
    if len(data) < 18:
        raise TgaParseError("shorter than a TGA header")
    (
        id_len,
        cmap_type,
        img_type,
        cmap_first,
        cmap_len,
        cmap_bits,
        _x0,
        _y0,
        w,
        h,
        bpp,
        desc,
    ) = struct.unpack("<BBBHHBHHHHBB", data[:18])
    rle = img_type >= 8
    base_type = img_type - 8 if rle else img_type
    if base_type not in (1, 2, 3):
        raise TgaParseError(f"TGA image type {img_type} is not supported")
    if w == 0 or h == 0:
        raise TgaParseError(f"bad dimensions {w}x{h}")
    if w * h * 4 > MAX_SAMPLES:
        raise TgaParseError(
            f"{w}x{h} exceeds the {MAX_SAMPLES}-sample decode guard"
        )
    pos = 18 + id_len

    palette = None
    if cmap_type == 1:
        if cmap_bits not in (24, 32):
            raise TgaParseError(
                f"{cmap_bits}-bit color-map entries are not supported"
            )
        entry = cmap_bits // 8
        end = pos + cmap_len * entry
        if end > len(data):
            raise TgaParseError("truncated color map")
        quads = np.frombuffer(data[pos:end], dtype=np.uint8).reshape(-1, entry)
        # BGR(A) on disk -> RGB(A)
        palette = (
            quads[:, [2, 1, 0]] if entry == 3 else quads[:, [2, 1, 0, 3]]
        )
        pos = end
    elif cmap_type != 0:
        raise TgaParseError(f"color map type {cmap_type} is not supported")

    if base_type == 1:
        if palette is None:
            raise TgaParseError("color-mapped image without a color map")
        if bpp not in (8, 16):
            raise TgaParseError(f"{bpp}-bit palette indices unsupported")
    elif base_type == 2:
        if bpp not in (16, 24, 32):
            raise TgaParseError(f"{bpp}-bit truecolor unsupported")
    else:  # grayscale
        if bpp != 8:
            raise TgaParseError(f"{bpp}-bit grayscale unsupported")
    pix_bytes = bpp // 8
    n_pixels = w * h

    if rle:
        raw = _rle_expand(data, pos, n_pixels, pix_bytes)
    else:
        need = n_pixels * pix_bytes
        if pos + need > len(data):
            raise TgaParseError(
                f"pixel data truncated ({len(data) - pos} of {need} bytes)"
            )
        raw = data[pos : pos + need]

    if base_type == 1:
        if pix_bytes == 1:
            idx = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
        else:
            idx = np.frombuffer(raw, dtype="<u2").astype(np.int64)
        idx -= cmap_first
        if idx.min(initial=0) < 0 or idx.max(initial=0) >= len(palette):
            raise TgaParseError("palette index outside the color map")
        img = palette[idx].reshape(h, w, -1)
    elif base_type == 3:
        img = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 1)
    elif bpp == 16:
        img = _expand16(np.frombuffer(raw, dtype="<u2")).reshape(h, w, 3)
    else:
        c = pix_bytes
        img = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, c)
        img = img[:, :, [2, 1, 0]] if c == 3 else img[:, :, [2, 1, 0, 3]]
    if not desc & 0x20:  # bottom-up unless the top-down bit is set
        img = img[::-1]
    return np.ascontiguousarray(img)


def tga_probe(data: bytes) -> tuple[int, int, int]:
    """(height, width, channels) from the 18-byte header only."""
    if len(data) < 18:
        raise TgaParseError("shorter than a TGA header")
    img_type, cmap_bits = data[2], data[7]
    w, h, bpp = struct.unpack("<HHB", data[12:17])
    base_type = img_type - 8 if img_type >= 8 else img_type
    if base_type not in (1, 2, 3):
        raise TgaParseError(f"TGA image type {img_type} is not supported")
    if w == 0 or h == 0:
        raise TgaParseError(f"bad dimensions {w}x{h}")
    if base_type == 3:
        c = 1
    elif base_type == 1:
        c = 4 if cmap_bits == 32 else 3
    else:
        c = 4 if bpp == 32 else 3
    return h, w, c


def encode_tga(
    img: np.ndarray, rle: bool = False, top_down: bool = False
) -> bytes:
    """(h, w), (h, w, 3) or (h, w, 4) uint8 -> type 3/2 (or 11/10
    with ``rle=True``) TGA bytes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in (1, 3, 4):
        raise TgaParseError(f"unsupported channel count {c}")
    base_type = 3 if c == 1 else 2
    bpp = 8 * c
    desc = 0x20 if top_down else 0
    if c == 4:
        desc |= 8  # alpha depth
    body = img if top_down else img[::-1]
    if c == 3:
        body = body[:, :, [2, 1, 0]]
    elif c == 4:
        body = body[:, :, [2, 1, 0, 3]]
    flat = body.reshape(-1, c)
    if rle:
        payload = bytearray()
        i = 0
        n = len(flat)
        while i < n:
            run = 1
            while (
                run < 128
                and i + run < n
                and (flat[i + run] == flat[i]).all()
            ):
                run += 1
            if run > 1:
                payload.append(0x80 | (run - 1))
                payload += flat[i].tobytes()
                i += run
            else:
                start = i
                i += 1
                while (
                    i < n
                    and i - start < 128
                    and (i + 1 >= n or not (flat[i] == flat[i - 1]).all())
                ):
                    i += 1
                payload.append(i - start - 1)
                payload += flat[start:i].tobytes()
        payload = bytes(payload)
        base_type += 8
    else:
        payload = flat.tobytes()
    hdr = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, base_type, 0, 0, 0, 0, 0, w, h, bpp, desc
    )
    return hdr + payload
