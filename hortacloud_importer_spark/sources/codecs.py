"""Clean-room chunk/side-file codec layer (SURVEY §2.A3/A8).

Closes the codec gates that previously limited the N5/Zarr chunk
readers to raw/gzip/zlib and left the reference's ``.ktx.lz4``
side-compression absent. Every format here is a public spec, decoded
with the container's batteries (pyarrow's bundled lz4/zstd/snappy
codecs, stdlib zlib/bz2/lzma) — no new dependencies:

- **LZ4 frame** (the ``.lz4`` file format): the reference's dev-only
  KTX side-compression shells out to ``LZ4.exe``
  (ktx_from_rendered_tiff.py:565-583), which writes LZ4 frames;
  ``pyarrow.Codec("lz4")`` speaks exactly that format.
- **lz4-java block stream** (N5's ``lz4`` compression type): the
  saalfeldlab N5 Java stack wraps chunks in
  ``net.jpountz.lz4.LZ4BlockOutputStream`` — per-block
  ``LZ4Block`` magic + token + LE32 compressed/decompressed lengths
  + xxhash32 checksum. Read path decodes the blocks (checksum NOT
  verified — xxh32 per 64 KiB block in Python would dominate decode;
  lengths and magic are validated instead). The write path exists for
  test fixtures and roundtrips.
- **numcodecs LZ4** (Zarr ``{"id": "lz4"}``): LE32 uncompressed size
  prefix + one raw LZ4 block.
- **c-blosc1 container** (Zarr's DEFAULT compressor,
  ``{"id": "blosc", "cname": "lz4", ...}``): 16-byte header, block
  index, per-block split streams, byte-shuffle filter. The header is
  self-describing (typesize, flags, inner codec), so decode needs no
  metadata beyond the payload. Inner codecs
  blosclz/lz4/zlib/zstd/snappy and both shuffle filters (byte and
  bit) are supported — blosclz via the clean-room FastLZ-family
  decoder below, bit-shuffle via a vectorized bit-matrix transpose.
- **zstd / bzip2 / xz-lzma / gzip / zlib**: self-framed, dispatched
  to pyarrow / stdlib.

The dispatch entry points are :func:`n5_decompress` (N5
``compression.type``) and :func:`zarr_decompress` (numcodecs id).
"""

from __future__ import annotations

import bz2
import gzip
import lzma
import struct
import zlib

import numpy as np


class CodecError(ValueError):
    pass


def _pa_codec(name: str):
    import pyarrow as pa

    return pa.Codec(name)


# ---------------------------------------------------------------- lz4


def lz4_frame_compress(data: bytes) -> bytes:
    """LZ4 frame (.lz4 file format) — what ``LZ4.exe``/``lz4`` CLI
    produce and consume."""
    return _pa_codec("lz4").compress(data, asbytes=True)


def _pa_stream_decompress(data: bytes, compression: str) -> bytes:
    """Frame formats carry (or imply) their own length; pyarrow's
    one-shot Codec.decompress demands the size up front, but its
    decompressing input stream does not."""
    import pyarrow as pa

    with pa.input_stream(pa.BufferReader(data), compression=compression) as f:
        return f.read()


def lz4_frame_decompress(data: bytes) -> bytes:
    return _pa_stream_decompress(data, "lz4")


def _lz4_block_compress(data: bytes) -> bytes:
    return _pa_codec("lz4_raw").compress(data, asbytes=True)


def _lz4_block_decompress(data: bytes, decompressed_size: int) -> bytes:
    try:
        return _pa_codec("lz4_raw").decompress(
            data, decompressed_size, asbytes=True
        )
    except (OSError, ValueError) as exc:  # pyarrow's corruption errors
        raise CodecError(f"corrupt LZ4 block: {exc}") from exc


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 (public xxHash spec) — only used to stamp checksums when
    WRITING lz4-java block streams for fixtures/roundtrips; the read
    path does not verify (see module docstring)."""
    P1, P2, P3, P4, P5 = (
        2654435761,
        2246822519,
        3266489917,
        668265263,
        374761393,
    )
    M = 0xFFFFFFFF

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & M

    n, i = len(data), 0
    if n >= 16:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i <= n - 16:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 4 * j : i + 4 * j + 4], "little")
                v = (v + lane * P2) & M
                v = (rotl(v, 13) * P1) & M
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 16
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i <= n - 4:
        h = (h + int.from_bytes(data[i : i + 4], "little") * P3) & M
        h = (rotl(h, 17) * P4) & M
        i += 4
    while i < n:
        h = (h + data[i] * P5) & M
        h = (rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 15
    h = (h * P2) & M
    h ^= h >> 13
    h = (h * P3) & M
    h ^= h >> 16
    return h


_CRC32C_TABLES: list[list[int]] | None = None


def _crc32c_tables() -> list[list[int]]:
    """Slicing-by-8 lookup tables for the Castagnoli CRC (polynomial
    0x1EDC6F41, reflected 0x82F63B78 — the crc32c of iSCSI, ext4, and
    the Zarr v3 ``crc32c`` codec). zlib.crc32 uses the IEEE 802.3
    polynomial, so it can't be reused; the tables make the Python
    loop process 8 bytes per iteration."""
    global _CRC32C_TABLES
    if _CRC32C_TABLES is None:
        t0 = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ (0x82F63B78 if c & 1 else 0)
            t0.append(c)
        tables = [t0]
        for _ in range(7):
            prev = tables[-1]
            tables.append([(prev[i] >> 8) ^ t0[prev[i] & 0xFF] for i in range(256)])
        _CRC32C_TABLES = tables
    return _CRC32C_TABLES


def crc32c(data: bytes, crc: int = 0) -> int:
    """CRC-32C (Castagnoli) — crc32c(b"123456789") == 0xE3069283."""
    t0, t1, t2, t3, t4, t5, t6, t7 = _crc32c_tables()
    crc ^= 0xFFFFFFFF
    n8 = len(data) - len(data) % 8
    i = 0
    while i < n8:
        b = crc ^ int.from_bytes(data[i : i + 4], "little")
        crc = (
            t7[b & 0xFF]
            ^ t6[(b >> 8) & 0xFF]
            ^ t5[(b >> 16) & 0xFF]
            ^ t4[(b >> 24) & 0xFF]
            ^ t3[data[i + 4]]
            ^ t2[data[i + 5]]
            ^ t1[data[i + 6]]
            ^ t0[data[i + 7]]
        )
        i += 8
    for j in range(n8, len(data)):
        crc = (crc >> 8) ^ t0[(crc ^ data[j]) & 0xFF]
    return crc ^ 0xFFFFFFFF


_LZ4J_MAGIC = b"LZ4Block"
_LZ4J_RAW = 0x10
_LZ4J_LZ4 = 0x20
_LZ4J_SEED = 0x9747B28C
_LZ4J_HEADER = len(_LZ4J_MAGIC) + 1 + 4 + 4 + 4


def lz4java_block_compress(data: bytes, block_size: int = 1 << 16) -> bytes:
    """lz4-java ``LZ4BlockOutputStream`` framing (what N5's ``lz4``
    compression wraps chunks in). Fixture/roundtrip writer."""
    if block_size < 1 << 10 or block_size > 1 << 25:
        raise CodecError(f"lz4-java block size {block_size} out of range")
    level = max(0, (block_size - 1).bit_length() - 10)
    out = bytearray()
    for off in range(0, len(data), block_size):
        chunk = data[off : off + block_size]
        comp = _lz4_block_compress(chunk)
        if len(comp) < len(chunk):
            token, payload = _LZ4J_LZ4 | level, comp
        else:
            token, payload = _LZ4J_RAW | level, chunk
        check = xxh32(chunk, _LZ4J_SEED) & 0x0FFFFFFF
        out += _LZ4J_MAGIC
        out += struct.pack("<BII", token, len(payload), len(chunk))
        out += struct.pack("<I", check)
        out += payload
    out += _LZ4J_MAGIC + struct.pack("<BIII", _LZ4J_RAW | level, 0, 0, 0)
    return bytes(out)


def lz4java_block_decompress(data: bytes, verify: bool = False) -> bytes:
    """``verify=True`` additionally checks each block's xxh32 checksum
    (seed 0x9747B28C, low 28 bits — lz4-java's convention). Opt-in:
    the pure-Python xxh32 costs more than the LZ4 decode itself, so
    the default trusts the length/magic validation."""
    out = bytearray()
    pos = 0
    while True:
        if pos == len(data):
            # streams written without the explicit end mark (lz4-java
            # tolerates EOF at a block boundary)
            return bytes(out)
        hdr = data[pos : pos + _LZ4J_HEADER]
        if len(hdr) < _LZ4J_HEADER or hdr[: len(_LZ4J_MAGIC)] != _LZ4J_MAGIC:
            raise CodecError(
                f"lz4-java stream: bad block header at offset {pos}"
            )
        token, clen, dlen, check = struct.unpack(
            "<BIII", hdr[len(_LZ4J_MAGIC) :]
        )
        pos += _LZ4J_HEADER
        if dlen == 0 and clen == 0:
            return bytes(out)
        payload = data[pos : pos + clen]
        if len(payload) != clen:
            raise CodecError("lz4-java stream: truncated block payload")
        pos += clen
        method = token & 0xF0
        if method == _LZ4J_RAW:
            if clen != dlen:
                raise CodecError("lz4-java stream: raw block length mismatch")
            block = payload
        elif method == _LZ4J_LZ4:
            block = _lz4_block_decompress(payload, dlen)
        else:
            raise CodecError(
                f"lz4-java stream: unknown compression method 0x{method:x}"
            )
        if verify:
            got = xxh32(block, _LZ4J_SEED) & 0x0FFFFFFF
            if got != check & 0x0FFFFFFF:
                raise CodecError(
                    f"lz4-java stream: xxh32 mismatch on block at "
                    f"offset {pos - clen - _LZ4J_HEADER} "
                    f"(stored {check & 0x0FFFFFFF:#09x}, computed {got:#09x})"
                )
        out += block


def numcodecs_lz4_compress(data: bytes) -> bytes:
    """numcodecs ``LZ4`` (Zarr ``{"id": "lz4"}``): LE32 uncompressed
    size prefix + one raw LZ4 block."""
    return struct.pack("<I", len(data)) + _lz4_block_compress(data)


def numcodecs_lz4_decompress(data: bytes) -> bytes:
    if len(data) < 4:
        raise CodecError("numcodecs-lz4 payload shorter than its size prefix")
    (dlen,) = struct.unpack("<I", data[:4])
    return _lz4_block_decompress(data[4:], dlen)


# ----------------------------------------------------------- blosclz

_BLOSCLZ_MAX_DIST = 8191  # short-form match window (13-bit distance)
_BLOSCLZ_MAX_FAR = 8192 + 65535  # far-form escape adds a 16-bit offset


def blosclz_decompress(data: bytes, dlen: int) -> bytes:
    """Clean-room blosclz stream decoder (c-blosc's built-in
    FastLZ-family codec; the format is fixed by the public c-blosc1
    container spec). Token grammar, driven by each control byte's top
    3 bits:

    - ``ctrl < 32``: literal run — copy ``ctrl + 1`` input bytes.
      The very first control byte is always a literal run and only
      its low 5 bits are significant.
    - ``ctrl >= 32``: match of ``(ctrl >> 5) + 2`` bytes at distance
      ``((ctrl & 31) << 8) + next + 1``. A top field of 7 switches to
      the long form: extension bytes each add their value to the
      length (continuing while an extension byte is 255, so a run of
      255s followed by a sub-255 terminator encodes any length). A
      distance byte of 255 under a maxed high field (``ctrl & 31 ==
      31``) is the far-match escape: two more big-endian bytes carry
      ``distance - 8192``.

    Matches may overlap their own output (RLE-style), so the copy
    grows left-to-right, doubling the copied span each pass instead
    of looping per byte.
    """
    if dlen == 0:
        return b""
    out = bytearray()
    n = len(data)
    if n == 0:
        raise CodecError("blosclz: empty stream")
    pos = 0
    ctrl = data[pos] & 31
    pos += 1
    first = True
    while True:
        if first or ctrl < 32:
            run = (ctrl & 31) + 1
            if pos + run > n:
                raise CodecError("blosclz: truncated literal run")
            out += data[pos : pos + run]
            pos += run
        else:
            length = (ctrl >> 5) + 2
            if ctrl >> 5 == 7:
                length = 9
                while True:
                    if pos >= n:
                        raise CodecError("blosclz: truncated length extension")
                    code = data[pos]
                    pos += 1
                    length += code
                    if code != 255:
                        break
            if pos >= n:
                raise CodecError("blosclz: truncated match distance")
            code = data[pos]
            pos += 1
            if code == 255 and ctrl & 31 == 31:
                if pos + 2 > n:
                    raise CodecError("blosclz: truncated far-match offset")
                dist = 8192 + (data[pos] << 8) + data[pos + 1]
                pos += 2
            else:
                dist = ((ctrl & 31) << 8) + code + 1
            if dist > len(out):
                raise CodecError(
                    f"blosclz: match distance {dist} exceeds {len(out)} "
                    "decoded bytes"
                )
            start = len(out) - dist
            while length > 0:
                span = min(length, len(out) - start)
                out += out[start : start + span]
                length -= span
            if len(out) > dlen:
                raise CodecError("blosclz: output overruns declared size")
        first = False
        if len(out) == dlen:
            if pos != n:
                raise CodecError(
                    f"blosclz: {n - pos} trailing bytes after full output"
                )
            return bytes(out)
        if pos >= n:
            raise CodecError(
                f"blosclz decoded {len(out)} bytes, wanted {dlen}"
            )
        ctrl = data[pos]
        pos += 1


def blosclz_compress(data: bytes) -> bytes:
    """Greedy blosclz encoder (fixtures, roundtrips, and a working
    blosc-container write path): hash-table match finder over 4-byte
    prefixes, literal runs of <=32, short- and far-form distances.
    Every construct emitted is one the decoder above accepts, and the
    format is the public one, so c-blosc decodes the output too."""
    n = len(data)
    if n == 0:
        return b""
    out = bytearray()
    table: dict[bytes, int] = {}
    lit_start = 0
    i = 0

    def flush_literals(end: int) -> None:
        nonlocal out
        s = lit_start
        while s < end:
            run = min(32, end - s)
            out.append(run - 1)
            out += data[s : s + run]
            s += run

    # a match needs 3+ bytes of lookahead and can't start at 0
    while i + 4 <= n:
        if i == 0:
            table[data[0:4]] = 0
            i = 1
            continue
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > _BLOSCLZ_MAX_FAR:
            i += 1
            continue
        length = 4
        limit = n - i
        while length < limit and data[cand + length] == data[i + length]:
            length += 1
        dist = i - cand
        flush_literals(i)
        lit = length
        d = dist - 1
        if dist <= _BLOSCLZ_MAX_DIST:
            hi, rest = d >> 8, [d & 0xFF]
        else:
            far = dist - 8192
            hi, rest = 31, [255, far >> 8, far & 0xFF]
        if lit <= 8:
            out.append(((lit - 2) << 5) | hi)
        else:
            out.append((7 << 5) | hi)
            rem = lit - 9
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out += bytes(rest)
        i += length
        lit_start = i
    flush_literals(n)
    return bytes(out)


# --------------------------------------------------------- bitshuffle


def bitshuffle(block: bytes, typesize: int) -> bytes:
    """Bit-transpose filter (blosc ``shuffle=BITSHUFFLE``): view the
    block as ``n`` elements of ``typesize`` bytes and group bit ``k``
    of byte ``b`` of every element into bit-plane ``b*8 + k``, each
    plane packing its ``n`` bits LSB-first. Pure reshape/transpose
    over numpy's little-endian packbits — no Python loop. Applies
    only when the block is a whole number of 8-element groups; the
    caller falls back to a plain copy otherwise (mirroring c-blosc's
    per-block divisibility rule)."""
    group = 8 * typesize
    if len(block) % group:
        raise CodecError(
            f"bitshuffle needs a multiple of {group} bytes, got {len(block)}"
        )
    arr = np.frombuffer(block, dtype=np.uint8).reshape(-1, typesize)
    bits = np.unpackbits(arr, axis=1, bitorder="little")  # (n, 8*typesize)
    return np.packbits(bits.T, axis=1, bitorder="little").tobytes()


def bit_unshuffle(block: bytes, typesize: int) -> bytes:
    group = 8 * typesize
    if len(block) % group:
        raise CodecError(
            f"bit-unshuffle needs a multiple of {group} bytes, got {len(block)}"
        )
    planes = np.frombuffer(block, dtype=np.uint8).reshape(8 * typesize, -1)
    bits = np.unpackbits(planes, axis=1, bitorder="little")  # (8*t, n)
    return np.packbits(bits.T, axis=1, bitorder="little").tobytes()


# -------------------------------------------------------------- blosc

_BLOSC_BLOSCLZ = 0
_BLOSC_LZ4 = 1
_BLOSC_SNAPPY = 2
_BLOSC_ZLIB = 3
_BLOSC_ZSTD = 4
_BLOSC_CNAME = {"blosclz": 0, "lz4": 1, "lz4hc": 1, "snappy": 2, "zlib": 3, "zstd": 4}
_BLOSC_MAX_OVERHEAD = 16
_BLOSC_MIN_BUFFERSIZE = 128
_BLOSC_MAX_SPLITS = 16
_F_BYTE_SHUFFLE = 0x1
_F_MEMCPY = 0x2
_F_BIT_SHUFFLE = 0x4


def _blosc_inner_decompress(comp: bytes, dlen: int, compcode: int) -> bytes:
    try:
        if compcode == _BLOSC_BLOSCLZ:
            return blosclz_decompress(comp, dlen)
        if compcode == _BLOSC_LZ4:
            return _lz4_block_decompress(comp, dlen)
        if compcode == _BLOSC_ZLIB:
            return zlib.decompress(comp)
        if compcode == _BLOSC_ZSTD:
            return _pa_codec("zstd").decompress(comp, dlen, asbytes=True)
        if compcode == _BLOSC_SNAPPY:
            return _pa_codec("snappy").decompress(comp, dlen, asbytes=True)
    except CodecError:
        raise
    except (OSError, ValueError, zlib.error) as exc:
        # pyarrow raises OSError, zlib its own error — corrupt chunks
        # must surface as the ONE named error skip-kernels catch
        raise CodecError(f"corrupt blosc stream: {exc}") from exc
    raise CodecError(
        f"blosc inner codec code {compcode!r} is not supported "
        "(blosclz/lz4/zlib/zstd/snappy are)"
    )


def _blosc_inner_compress(raw: bytes, compcode: int) -> bytes:
    if compcode == _BLOSC_BLOSCLZ:
        return blosclz_compress(raw)
    if compcode == _BLOSC_LZ4:
        return _lz4_block_compress(raw)
    if compcode == _BLOSC_ZLIB:
        return zlib.compress(raw)
    if compcode == _BLOSC_ZSTD:
        return _pa_codec("zstd").compress(raw, asbytes=True)
    if compcode == _BLOSC_SNAPPY:
        return _pa_codec("snappy").compress(raw, asbytes=True)
    raise CodecError(f"unsupported blosc inner codec code {compcode}")


def _byte_shuffle(block: bytes, typesize: int) -> bytes:
    """c-blosc byte shuffle: [all 1st bytes][all 2nd bytes]... over
    the portion divisible by typesize; the remainder tails unchanged."""
    n = len(block) - len(block) % typesize
    head = np.frombuffer(block[:n], dtype=np.uint8)
    shuf = head.reshape(-1, typesize).T.tobytes()
    return shuf + block[n:]


def _byte_unshuffle(block: bytes, typesize: int) -> bytes:
    n = len(block) - len(block) % typesize
    head = np.frombuffer(block[:n], dtype=np.uint8)
    unshuf = head.reshape(typesize, -1).T.tobytes()
    return unshuf + block[n:]


def _blosc_split(compcode: int, typesize: int, blocksize: int) -> bool:
    """c-blosc1 ``split_block``: blosclz/lz4 streams split into one
    stream per byte lane when small enough. The decoder verifies the
    primary choice and falls back (see _blosc_parse_block), so a
    c-blosc version with a different split heuristic still decodes."""
    return (
        compcode in (_BLOSC_BLOSCLZ, _BLOSC_LZ4)
        and typesize <= _BLOSC_MAX_SPLITS
        and blocksize // max(typesize, 1) >= _BLOSC_MIN_BUFFERSIZE
    )


def _blosc_parse_block(
    data: bytes, start: int, bsize: int, nstreams: int, compcode: int
) -> tuple[bytes, int]:
    """Parse one block at ``start`` assuming ``nstreams`` split
    streams -> (decoded bytes, end offset of the last stream). The
    end offset lets the caller verify a candidate stream count
    against the next block's start — a stored-uncompressed stream
    (csize==want) can otherwise 'parse' under the wrong nstreams and
    return wrong bytes silently."""
    out = bytearray()
    pos = start
    neblock = bsize // nstreams
    sizes = [neblock] * nstreams
    sizes[-1] = bsize - neblock * (nstreams - 1)
    for want in sizes:
        if pos + 4 > len(data):
            raise CodecError("blosc block: truncated stream header")
        (csize,) = struct.unpack("<i", data[pos : pos + 4])
        pos += 4
        if csize < 0 or pos + csize > len(data):
            raise CodecError(f"blosc block: bad stream size {csize}")
        comp = data[pos : pos + csize]
        pos += csize
        if csize == want:
            out += comp  # stored uncompressed
        else:
            dec = _blosc_inner_decompress(comp, want, compcode)
            if len(dec) != want:
                raise CodecError(
                    f"blosc stream decompressed to {len(dec)}, wanted {want}"
                )
            out += dec
    return bytes(out), pos


def blosc_decompress(data: bytes) -> bytes:
    """One c-blosc1 container (a Zarr default-compressor chunk) ->
    raw bytes. Self-describing: typesize/filters/inner codec all come
    from the 16-byte header."""
    if len(data) < _BLOSC_MAX_OVERHEAD:
        raise CodecError("blosc container shorter than its header")
    version, _versionlz, flags, typesize = data[0], data[1], data[2], data[3]
    nbytes, blocksize, cbytes = struct.unpack("<iii", data[4:16])
    if version < 1 or nbytes < 0 or cbytes < _BLOSC_MAX_OVERHEAD:
        raise CodecError(
            f"corrupt blosc header (version={version}, nbytes={nbytes})"
        )
    if cbytes > len(data):
        raise CodecError("blosc container truncated")
    if nbytes == 0:
        return b""
    if flags & _F_MEMCPY:
        if cbytes != nbytes + _BLOSC_MAX_OVERHEAD:
            raise CodecError("blosc memcpy container length mismatch")
        return bytes(data[16 : 16 + nbytes])
    compcode = (flags >> 5) & 0x7
    typesize = max(1, typesize)
    if blocksize <= 0:
        raise CodecError(f"corrupt blosc blocksize {blocksize}")
    nblocks = (nbytes + blocksize - 1) // blocksize
    idx_end = 16 + 4 * nblocks
    if len(data) < idx_end:
        raise CodecError("blosc container: truncated block index")
    bstarts = struct.unpack(f"<{nblocks}i", data[16:idx_end])
    out = bytearray()
    shuffle = bool(flags & _F_BYTE_SHUFFLE)
    # c-blosc writes blocks back-to-back, so each block's streams end
    # exactly where the next block starts (or at cbytes for the last
    # in file order) — the boundary that disambiguates the split count
    ordered = sorted(bstarts)
    for j, start in enumerate(bstarts):
        nxt = next((s for s in ordered if s > start), cbytes)
        bsize = min(blocksize, nbytes - j * blocksize)
        leftover = bsize != blocksize or bsize % typesize
        want_split = _blosc_split(compcode, typesize, blocksize) and not leftover
        candidates = (typesize, 1) if want_split else (1, typesize)
        block = None
        provisional: bytes | None = None
        err: Exception | None = None
        for nstreams in candidates:
            if nstreams > 1 and bsize % nstreams:
                continue
            try:
                cand, end = _blosc_parse_block(
                    data, start, bsize, nstreams, compcode
                )
            except CodecError as exc:
                err = exc
                continue
            if end == nxt:
                block = cand  # consumed exactly to the next boundary
                break
            if provisional is None:
                provisional = cand
        if block is None:
            # no candidate landed on the boundary (e.g. a writer that
            # pads between blocks): trust the primary split heuristic's
            # parse rather than a wrong-count one that merely didn't raise
            block = provisional
        if block is None:
            raise err if err is not None else CodecError("blosc: empty block")
        if flags & _F_BIT_SHUFFLE:
            # c-blosc skips the bit filter on blocks that aren't a
            # whole number of 8-element groups (the final leftover)
            if len(block) % (8 * typesize) == 0:
                block = bit_unshuffle(block, typesize)
        elif shuffle:
            block = _byte_unshuffle(block, typesize)
        out += block
    if len(out) != nbytes:
        raise CodecError(f"blosc decoded {len(out)} bytes, header says {nbytes}")
    return bytes(out)


def blosc_compress(
    data: bytes,
    typesize: int = 1,
    cname: str = "lz4",
    shuffle: bool | str = True,
    blocksize: int = 0,
) -> bytes:
    """c-blosc1 container writer (fixtures, roundtrips, and a working
    Zarr-default-compressor write path). Follows the same split rule
    the decoder verifies, so output parses under c-blosc semantics.
    ``shuffle`` is False, True (byte shuffle), or ``"bit"``."""
    if cname not in _BLOSC_CNAME:
        raise CodecError(f"unknown blosc cname {cname!r}")
    compcode = _BLOSC_CNAME[cname]
    typesize = max(1, typesize)
    bitshuf = shuffle == "bit"
    nbytes = len(data)
    version_header = bytes([2, 1])
    if nbytes == 0:
        return (
            version_header
            + bytes([0, typesize])
            + struct.pack("<iii", 0, 0, _BLOSC_MAX_OVERHEAD)
        )
    if blocksize <= 0:
        blocksize = min(nbytes, 1 << 18)
    grain = 8 * typesize if bitshuf else typesize
    blocksize -= blocksize % grain
    blocksize = max(blocksize, grain)
    nblocks = (nbytes + blocksize - 1) // blocksize
    if bitshuf:
        filter_flag = _F_BIT_SHUFFLE
    elif shuffle:
        filter_flag = _F_BYTE_SHUFFLE
    else:
        filter_flag = 0
    flags = (compcode << 5) | filter_flag
    body = bytearray()
    bstarts = []
    base = 16 + 4 * nblocks
    for j in range(nblocks):
        raw = data[j * blocksize : (j + 1) * blocksize]
        bsize = len(raw)
        if bitshuf:
            if bsize % (8 * typesize) == 0:
                raw = bitshuffle(raw, typesize)
        elif shuffle:
            raw = _byte_shuffle(raw, typesize)
        leftover = bsize != blocksize or bsize % typesize
        if _blosc_split(compcode, typesize, blocksize) and not leftover:
            nstreams = typesize
        else:
            nstreams = 1
        neblock = bsize // nstreams
        sizes = [neblock] * nstreams
        sizes[-1] = bsize - neblock * (nstreams - 1)
        bstarts.append(base + len(body))
        off = 0
        for want in sizes:
            stream = raw[off : off + want]
            off += want
            comp = _blosc_inner_compress(stream, compcode)
            if len(comp) >= want:
                body += struct.pack("<i", want) + stream
            else:
                body += struct.pack("<i", len(comp)) + comp
    cbytes = base + len(body)
    if cbytes >= nbytes + _BLOSC_MAX_OVERHEAD:
        # compression did not pay: memcpy container (what c-blosc does)
        return (
            version_header
            + bytes([_F_MEMCPY, typesize])
            + struct.pack("<iii", nbytes, blocksize, nbytes + _BLOSC_MAX_OVERHEAD)
            + data
        )
    return (
        version_header
        + bytes([flags, typesize])
        + struct.pack("<iii", nbytes, blocksize, cbytes)
        + struct.pack(f"<{nblocks}i", *bstarts)
        + bytes(body)
    )


# ----------------------------------------------------------- dispatch


def n5_decompress(payload: bytes, codec: str, verify: bool = False) -> bytes:
    """N5 ``compression.type`` dispatch — the full standard N5 codec
    set (saalfeldlab/n5 spec): raw, gzip (+useZlib handled upstream
    as 'zlib'), bzip2, lz4 (lz4-java block stream), xz. ``verify``
    opts into the lz4-java per-block xxh32 check; gzip/zlib/bzip2/xz
    carry their own integrity checks that the stdlib verifies."""
    if codec in ("raw", "null", "none"):
        return payload
    try:
        if codec == "gzip":
            return gzip.decompress(payload)
        if codec == "zlib":
            return zlib.decompress(payload)
        if codec == "bzip2":
            return bz2.decompress(payload)
        if codec == "lz4":
            return lz4java_block_decompress(payload, verify=verify)
        if codec == "xz":
            return lzma.decompress(payload)
    except CodecError:
        raise
    except (OSError, EOFError, ValueError, zlib.error, lzma.LZMAError) as exc:
        raise CodecError(f"corrupt {codec} N5 chunk: {exc}") from exc
    raise CodecError(
        f"unsupported N5 compression type {codec!r} "
        "(raw/gzip/zlib/bzip2/lz4/xz are built in)"
    )


def zarr_decompress(payload: bytes, codec: str) -> bytes:
    """Zarr-v2 numcodecs-id dispatch: blosc (the default), lz4, zstd,
    gzip, zlib, bz2, lzma/xz, raw."""
    if codec in ("raw", "null", "none"):
        return payload
    try:
        if codec == "blosc":
            return blosc_decompress(payload)
        if codec == "lz4":
            return numcodecs_lz4_decompress(payload)
        if codec == "zstd":
            # numcodecs Zstd writes standard frames; stream-decode so
            # frames without a content-size field also work
            return _pa_stream_decompress(payload, "zstd")
        if codec == "gzip":
            return gzip.decompress(payload)
        if codec == "zlib":
            return zlib.decompress(payload)
        if codec == "bz2":
            return bz2.decompress(payload)
        if codec in ("lzma", "xz"):
            return lzma.decompress(payload)
    except CodecError:
        raise
    except (OSError, EOFError, ValueError, zlib.error, lzma.LZMAError) as exc:
        raise CodecError(f"corrupt {codec} Zarr chunk: {exc}") from exc
    raise CodecError(
        f"unsupported Zarr compressor id {codec!r} "
        "(blosc/lz4/zstd/gzip/zlib/bz2/lzma are built in)"
    )
