"""Minimal clean-room TIFF 6.0 reader (SURVEY §2.A1/A2 front door).

The reference's entire ingestion path is TIFF page decode
(slice_to_dask_array / stack_to_dask_array, tiff2octree.py:653-691,
628-651): a directory of single-page slice TIFFs, or one multi-page
z-stack per channel. This module implements the baseline-TIFF subset
those rendered stacks actually use — uncompressed (Compression=1),
striped, grayscale or contiguous multi-sample, 8/16-bit unsigned —
straight from the public TIFF 6.0 structure: byte-order header, IFD
entry walk, strip concatenation. Compressed TIFFs still require a
codec library (tifffile/imageio, absent here — probe in FIXTURES.md)
and raise ``TiffParseError``.

Spark-side use: ``binaryFile`` scan -> ``decode_tiff`` inside a
``mapInPandas`` kernel (operators/multimodal.py routes ``format in
('tiff', 'tif')`` here when tifffile/imageio are missing), so whole
files move as Arrow-batched binary and pages decode on executors.
"""

from __future__ import annotations

import struct

import numpy as np

# IFD entry field types -> byte width (TIFF 6.0 §2).
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d"}

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_SAMPLE_FORMAT = 339


class TiffParseError(ValueError):
    pass


def _read_values(data: bytes, ec: str, ftype: int, count: int, raw: bytes) -> list:
    size = _TYPE_SIZE.get(ftype)
    if size is None or ftype not in _TYPE_FMT:
        raise TiffParseError(f"unsupported IFD field type {ftype}")
    total = size * count
    if total <= 4:
        payload = raw[:total]
    else:
        (offset,) = struct.unpack(ec + "I", raw)
        payload = data[offset : offset + total]
    return list(struct.unpack(ec + str(count) + _TYPE_FMT[ftype], payload))


def _parse_ifd(data: bytes, ec: str, pos: int) -> tuple[dict[int, list], int]:
    (n_entries,) = struct.unpack_from(ec + "H", data, pos)
    entries: dict[int, list] = {}
    for i in range(n_entries):
        tag, ftype, count = struct.unpack_from(ec + "HHI", data, pos + 2 + 12 * i)
        raw = data[pos + 2 + 12 * i + 8 : pos + 2 + 12 * i + 12]
        try:
            entries[tag] = _read_values(data, ec, ftype, count, raw)
        except TiffParseError:
            continue  # ignore exotic tags we don't need
    (next_ifd,) = struct.unpack_from(ec + "I", data, pos + 2 + 12 * n_entries)
    return entries, next_ifd


def _decode_page(data: bytes, ec: str, ifd: dict[int, list]) -> np.ndarray:
    compression = ifd.get(_TAG_COMPRESSION, [1])[0]
    if compression != 1:
        raise TiffParseError(
            f"compression {compression} needs a codec library (tifffile/"
            "imageio — absent in this container, see FIXTURES.md); only "
            "uncompressed baseline TIFF is built in"
        )
    width = ifd[_TAG_WIDTH][0]
    length = ifd[_TAG_LENGTH][0]
    spp = ifd.get(_TAG_SAMPLES_PER_PIXEL, [1])[0]
    bits = ifd.get(_TAG_BITS, [8])
    if len(set(bits)) != 1 or bits[0] not in (8, 16):
        raise TiffParseError(f"unsupported BitsPerSample {bits}")
    if ifd.get(_TAG_SAMPLE_FORMAT, [1])[0] != 1:
        raise TiffParseError("only unsigned-integer samples supported")
    dtype = np.dtype(("<" if ec == "<" else ">") + ("u1" if bits[0] == 8 else "u2"))
    offsets = ifd[_TAG_STRIP_OFFSETS]
    counts = ifd[_TAG_STRIP_COUNTS]
    payload = b"".join(
        data[off : off + cnt] for off, cnt in zip(offsets, counts)
    )
    expect = width * length * spp * (bits[0] // 8)
    if len(payload) < expect:
        raise TiffParseError(f"truncated strips: {len(payload)} < {expect}")
    arr = np.frombuffer(payload[:expect], dtype=dtype).reshape(length, width, spp)
    return arr.astype(dtype.newbyteorder("="))


def decode_tiff(data: bytes) -> np.ndarray:
    """bytes -> (pages, height, width, samples) uint8/uint16 array."""
    if len(data) < 8:
        raise TiffParseError("file shorter than a TIFF header")
    if data[:2] == b"II":
        ec = "<"
    elif data[:2] == b"MM":
        ec = ">"
    else:
        raise TiffParseError(f"bad byte-order mark {data[:2]!r}")
    (magic,) = struct.unpack_from(ec + "H", data, 2)
    if magic != 42:
        raise TiffParseError(f"bad TIFF magic {magic}")
    (pos,) = struct.unpack_from(ec + "I", data, 4)
    pages = []
    while pos:
        ifd, pos = _parse_ifd(data, ec, pos)
        pages.append(_decode_page(data, ec, ifd))
        if len(pages) > 65536:
            raise TiffParseError("IFD chain too long (cyclic?)")
    if not pages:
        raise TiffParseError("no IFDs")
    if len({p.shape for p in pages}) != 1:
        raise TiffParseError("pages differ in shape")
    return np.stack(pages)


def encode_tiff(pages: np.ndarray) -> bytes:
    """Write (pages, h, w[, samples]) uint8/uint16 as an uncompressed
    little-endian multi-page TIFF — the test/fixture dual of
    :func:`decode_tiff` (round-trip asserted against hand-built golden
    bytes in tests/test_tiff.py, so writer bugs can't mask reader
    bugs)."""
    if pages.ndim == 3:
        pages = pages[..., None]
    npages, h, w, spp = pages.shape
    if pages.dtype not in (np.uint8, np.uint16):
        raise ValueError("uint8/uint16 only")
    bits = pages.dtype.itemsize * 8
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", 8)  # first IFD right after the header
    entry = lambda tag, ftype, count, value: struct.pack(  # noqa: E731
        "<HHI4s",
        tag,
        ftype,
        count,
        value if isinstance(value, bytes) else struct.pack("<I", value)[:4],
    )
    pos = 8
    for pi in range(npages):
        strip = pages[pi].astype("<u1" if bits == 8 else "<u2").tobytes()
        n = 8
        ifd_size = 2 + n * 12 + 4
        strip_off = pos + ifd_size
        next_ifd = strip_off + len(strip) if pi < npages - 1 else 0
        out += struct.pack("<H", n)
        out += entry(_TAG_WIDTH, 4, 1, w)
        out += entry(_TAG_LENGTH, 4, 1, h)
        out += entry(_TAG_BITS, 3, 1, struct.pack("<HH", bits, 0))
        out += entry(_TAG_COMPRESSION, 3, 1, struct.pack("<HH", 1, 0))
        out += entry(_TAG_STRIP_OFFSETS, 4, 1, strip_off)
        out += entry(_TAG_SAMPLES_PER_PIXEL, 3, 1, struct.pack("<HH", spp, 0))
        out += entry(_TAG_ROWS_PER_STRIP, 4, 1, h)
        out += entry(_TAG_STRIP_COUNTS, 4, 1, len(strip))
        out += struct.pack("<I", next_ifd)
        out += strip
        pos = next_ifd if next_ifd else pos + ifd_size + len(strip)
    return bytes(out)
