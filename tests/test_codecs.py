"""Chunk/side-file codec layer (sources/codecs.py): LZ4 frame,
lz4-java block streams (N5), numcodecs LZ4, the c-blosc1 container
(Zarr's default compressor), xxh32, and the per-container dispatch.

All formats are public specs; fixtures below are built byte-by-byte
from those specs (xxh32 is additionally pinned to the published
xxHash test vectors), so a format drift in the implementation fails
against spec-shaped bytes, not just its own roundtrip."""

from __future__ import annotations

import bz2
import gzip
import lzma
import struct
import zlib

import numpy as np
import pytest

from hortacloud_importer_spark.sources import codecs as C


def test_xxh32_published_vectors():
    # xxHash reference test vectors (Cyan4973/xxHash)
    assert C.xxh32(b"") == 0x02CC5D05
    assert C.xxh32(b"a") == 0x550D7456


def test_xxh32_seed_and_lengths():
    rng = np.random.default_rng(7)
    # structural: all length classes (16+ lanes, 4-byte tail, 1-byte
    # tail) produce stable 32-bit values and differ by seed
    for n in (0, 1, 3, 4, 15, 16, 17, 63, 1024):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        h0, h1 = C.xxh32(data, 0), C.xxh32(data, 1)
        assert 0 <= h0 <= 0xFFFFFFFF
        if n:
            assert h0 != h1


def test_lz4_frame_roundtrip_and_magic():
    data = b"the quick brown fox " * 1000
    enc = C.lz4_frame_compress(data)
    assert enc[:4] == b"\x04\x22\x4d\x18"  # LZ4 frame magic
    assert C.lz4_frame_decompress(enc) == data


def test_lz4java_roundtrip_multi_block_and_raw_blocks():
    rng = np.random.default_rng(11)
    cases = [
        b"",
        b"abc",
        b"Z" * 300_000,  # compressible, spans >4 blocks at 64 KiB
        bytes(rng.integers(0, 256, 200_000, dtype=np.uint8)),  # raw blocks
    ]
    for data in cases:
        enc = C.lz4java_block_compress(data, block_size=1 << 16)
        assert C.lz4java_block_decompress(enc) == data


def test_lz4java_stream_shape_matches_spec():
    """Byte-level frame check against the lz4-java stream layout:
    per-block 'LZ4Block' magic + token + LE32 lengths."""
    data = b"x" * 100
    enc = C.lz4java_block_compress(data, block_size=1 << 16)
    assert enc[:8] == b"LZ4Block"
    token, clen, dlen = struct.unpack("<BII", enc[8:17])
    assert token & 0xF0 in (0x10, 0x20)
    assert token & 0x0F == 6  # 64 KiB block size -> level 6
    assert dlen == 100
    # end mark: zero lengths
    assert enc[-12:] == struct.pack("<III", 0, 0, 0)
    # truncated stream fails with a clear error
    with pytest.raises(C.CodecError, match="truncated|header"):
        C.lz4java_block_decompress(enc[: len(enc) - 13] + b"\x01")


def test_lz4java_tolerates_missing_end_mark():
    data = b"hello world" * 50
    enc = C.lz4java_block_compress(data)
    no_end = enc[: len(enc) - (8 + 13)]
    assert C.lz4java_block_decompress(no_end) == data


def test_numcodecs_lz4_roundtrip_and_prefix():
    data = b"zarr chunk " * 500
    enc = C.numcodecs_lz4_compress(data)
    (dlen,) = struct.unpack("<I", enc[:4])
    assert dlen == len(data)
    assert C.numcodecs_lz4_decompress(enc) == data
    with pytest.raises(C.CodecError):
        C.numcodecs_lz4_decompress(b"\x01")


@pytest.mark.parametrize("cname", ["blosclz", "lz4", "zlib", "zstd", "snappy"])
@pytest.mark.parametrize("typesize", [1, 2, 4])
@pytest.mark.parametrize("shuffle", [True, False, "bit"])
def test_blosc_roundtrip(cname, typesize, shuffle):
    rng = np.random.default_rng(13)
    for n in (0, 1, 100, 4096, 70_001):
        data = bytes(rng.integers(0, 40, n, dtype=np.uint8))
        enc = C.blosc_compress(
            data, typesize=typesize, cname=cname, shuffle=shuffle,
            blocksize=1 << 14,
        )
        assert C.blosc_decompress(enc) == data


def test_blosc_header_fields_match_spec():
    data = np.arange(4096, dtype="<u2").tobytes()
    enc = C.blosc_compress(data, typesize=2, cname="lz4", shuffle=True)
    # 16-byte header: version, versionlz, flags, typesize, then LE32
    # nbytes / blocksize / cbytes
    assert enc[0] >= 1
    flags, typesize = enc[2], enc[3]
    assert flags & 0x1  # byte-shuffle flag
    assert (flags >> 5) & 0x7 == 1  # lz4 compressor code
    assert typesize == 2
    nbytes, blocksize, cbytes = struct.unpack("<iii", enc[4:16])
    assert nbytes == len(data) and cbytes == len(enc)
    assert 0 < blocksize <= nbytes


def test_blosc_memcpy_container():
    rng = np.random.default_rng(17)
    data = bytes(rng.integers(0, 256, 10_000, dtype=np.uint8))
    enc = C.blosc_compress(data, typesize=2, cname="lz4")
    assert enc[2] & 0x2  # memcpy flag: compression did not pay
    assert len(enc) == len(data) + 16
    assert C.blosc_decompress(enc) == data


def test_blosc_hand_built_container_decodes():
    """Decode a container assembled BY HAND from the c-blosc1 format
    doc (single block, single stream, zlib inner, no shuffle) — the
    decoder must accept spec-shaped bytes it did not itself write."""
    raw = b"spec-shaped blosc payload " * 10
    comp = zlib.compress(raw)
    body = struct.pack("<i", len(comp)) + comp
    hdr = bytes([2, 1, 3 << 5, 1]) + struct.pack(
        "<iii", len(raw), len(raw), 16 + 4 + len(body)
    )
    container = hdr + struct.pack("<i", 20) + body
    assert C.blosc_decompress(container) == raw


def test_blosc_split_streams_hand_built():
    """Split-block layout: typesize streams, each its own LE32 size +
    lz4 block, assembled per the c-blosc split rule, with byte
    shuffle applied per block."""
    import pyarrow as pa

    typesize = 2
    n = 1024  # one block, 512 elements -> split (blocksize/typesize >= 128)
    raw = np.arange(n // typesize, dtype="<u2").tobytes()
    shuffled = np.frombuffer(raw, dtype=np.uint8).reshape(-1, typesize).T.tobytes()
    neblock = n // typesize
    body = b""
    for s in range(typesize):
        stream = shuffled[s * neblock : (s + 1) * neblock]
        comp = pa.Codec("lz4_raw").compress(stream, asbytes=True)
        if len(comp) >= neblock:
            comp = stream
        body += struct.pack("<i", len(comp)) + comp
    hdr = bytes([2, 1, (1 << 5) | 0x1, typesize]) + struct.pack(
        "<iii", n, n, 16 + 4 + len(body)
    )
    container = hdr + struct.pack("<i", 20) + body
    assert C.blosc_decompress(container) == raw


def test_blosc_corrupt_containers_raise():
    with pytest.raises(C.CodecError):
        C.blosc_decompress(b"\x02\x01")  # truncated header
    # a blosclz stream that runs out of input before the declared size
    body = struct.pack("<i", 3) + b"\x01\x02\x03"
    with pytest.raises(C.CodecError, match="blosclz"):
        C.blosc_decompress(
            bytes([2, 1, 0, 1])
            + struct.pack("<iii", 10, 10, 16 + 4 + len(body))
            + struct.pack("<i", 20)
            + body
        )


# ------------------------------------------------------------ blosclz


def test_blosclz_hand_built_streams():
    """Token streams assembled BY HAND from the blosclz grammar
    (FastLZ family, fixed by the public c-blosc1 format): a format
    drift fails against spec-shaped bytes, not just a roundtrip."""
    # literal run only: first ctrl's low 5 bits = run length - 1
    assert C.blosclz_decompress(bytes([2, 65, 66, 67]), 3) == b"ABC"
    # short match: ctrl 001xxxxx -> len (ctrl>>5)+2 = 3, dist ofs+code+1
    s = bytes([1, 65, 66, (1 << 5) | 0, 1])  # 'AB' then 3 bytes at dist 2
    assert C.blosclz_decompress(s, 5) == b"ABABA"
    # long match: top field 7, one extension byte; len = 9 + ext
    s = bytes([1, 97, 98, (7 << 5) | 0, 1, 1])  # 'ab' + 10 bytes at dist 2
    assert C.blosclz_decompress(s, 12) == b"ab" * 6
    # 255-chained extension: len = 9 + 255 + 0 = 264
    s = bytes([0, 120, (7 << 5) | 0, 255, 0, 0])  # 'x' + 264 at dist 1
    assert C.blosclz_decompress(s, 265) == b"x" * 265
    # far match: hi field 31 + code 255 escape, 16-bit extra offset
    prefix = b"Z" + b"." * 8191  # put the target 8192 back
    lits = bytearray([0, ord("Z")])
    for i in range(0, 8191, 32):
        run = min(32, 8191 - i)
        lits += bytes([run - 1]) + b"." * run
    far = bytes([(1 << 5) | 31, 255, 0, 0])  # len 3, dist 8192+0
    out = C.blosclz_decompress(bytes(lits) + far, len(prefix) + 3)
    assert out == prefix + b"Z.."


def test_blosclz_roundtrip_payload_shapes():
    rng = np.random.default_rng(29)
    payloads = [
        b"",
        b"a",
        b"abc" * 1000,
        bytes(range(256)) * 40,
        bytes(rng.integers(0, 256, 10_000, dtype=np.uint8)),  # incompressible
        b"\x00" * 100_000,
        bytes(rng.integers(0, 4, 50_000, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 9_000, dtype=np.uint8)) * 12,  # far matches
    ]
    for p in payloads:
        enc = C.blosclz_compress(p)
        assert C.blosclz_decompress(enc, len(p)) == p


def test_blosclz_errors():
    with pytest.raises(C.CodecError, match="truncated literal"):
        C.blosclz_decompress(bytes([5, 1, 2]), 6)
    with pytest.raises(C.CodecError, match="distance"):
        # match at dist 4 with only 1 decoded byte
        C.blosclz_decompress(bytes([0, 65, (1 << 5) | 0, 3]), 4)
    with pytest.raises(C.CodecError, match="trailing"):
        C.blosclz_decompress(bytes([0, 65, 0, 66]), 1)
    with pytest.raises(C.CodecError, match="wanted"):
        C.blosclz_decompress(bytes([0, 65]), 9)


# --------------------------------------------------------- bitshuffle


def test_bitshuffle_pinned_plane_layout():
    """Pin the bit-plane layout: plane b*8+k holds bit k of byte b of
    every element, bits packed LSB-first (the bitshuffle library's
    scalar reference ordering, which blosc's BITSHUFFLE uses)."""
    # 8 one-byte elements, all with bit 0 set -> plane 0 = 0xFF
    assert C.bitshuffle(bytes([1] * 8), 1) == bytes([0xFF] + [0] * 7)
    # alternating elements -> plane 0 packs 0b01010101 (elem 0 = LSB)
    assert C.bitshuffle(bytes([1, 0] * 4), 1) == bytes([0b01010101] + [0] * 7)
    # typesize 2: bit 0 of byte 1 lands in plane 8
    elems = np.array([0x0100] * 8, dtype="<u2").tobytes()
    out = C.bitshuffle(elems, 2)
    assert out[8] == 0xFF and sum(out) == 0xFF


def test_bitshuffle_involution_and_gate():
    rng = np.random.default_rng(31)
    for t in (1, 2, 4, 8):
        raw = bytes(rng.integers(0, 256, 8 * t * 37, dtype=np.uint8))
        assert C.bit_unshuffle(C.bitshuffle(raw, t), t) == raw
    with pytest.raises(C.CodecError, match="multiple"):
        C.bitshuffle(b"\x00" * 12, 2)


def test_blosc_bitshuffle_leftover_block_unfiltered():
    """The final block of a bit-shuffled container that is not a
    whole number of 8-element groups is stored unfiltered (c-blosc's
    per-block divisibility rule) — roundtrip across that boundary."""
    rng = np.random.default_rng(37)
    data = bytes(rng.integers(0, 9, 4096 + 13, dtype=np.uint8))
    enc = C.blosc_compress(
        data, typesize=2, cname="blosclz", shuffle="bit", blocksize=4096
    )
    assert enc[2] & 0x4  # bit-shuffle flag set
    assert C.blosc_decompress(enc) == data


def test_fuzzed_containers_raise_codec_error_only():
    """At 100 TB, bit-rotted chunks are a certainty; every container
    decode confronted with ARBITRARY corruption must succeed or raise
    CodecError — never a raw pyarrow OSError / zlib.error a
    skip-on-error reader could not distinguish from an engine bug.
    Seeded and bounded for determinism."""
    import random

    rng = np.random.default_rng(5)
    data = bytes(rng.integers(0, 40, 60_000, dtype=np.uint8))
    cases = [
        ("blosc-lz4", C.blosc_compress(data, typesize=2), C.blosc_decompress),
        (
            "blosc-blosclz-bit",
            C.blosc_compress(data, typesize=2, cname="blosclz", shuffle="bit"),
            C.blosc_decompress,
        ),
        (
            "blosc-zstd",
            C.blosc_compress(data, typesize=4, cname="zstd"),
            C.blosc_decompress,
        ),
        ("lz4java", C.lz4java_block_compress(data), C.lz4java_block_decompress),
        (
            "numcodecs-lz4",
            C.numcodecs_lz4_compress(data),
            C.numcodecs_lz4_decompress,
        ),
    ]
    for name, payload, decode in cases:
        rnd = random.Random(zlib.crc32(name.encode()))
        for trial in range(800):
            b = bytearray(payload)
            mode = trial % 3
            if mode == 0:
                b = b[: rnd.randrange(len(b))]
            elif mode == 1:
                for _ in range(rnd.randrange(1, 5)):
                    b[rnd.randrange(len(b))] = rnd.randrange(256)
            else:
                at = rnd.randrange(len(b))
                b[at : at + 8] = bytes(rnd.randrange(256) for _ in range(8))
            try:
                decode(bytes(b))
            except C.CodecError:
                pass
    # dispatch level: corrupt payloads under every codec id
    for codec in ("gzip", "zlib", "bzip2", "lz4", "xz"):
        with pytest.raises(C.CodecError):
            C.n5_decompress(b"\x13\x37" * 40, codec)
    for codec in ("blosc", "lz4", "zstd", "gzip", "zlib", "bz2", "lzma"):
        with pytest.raises(C.CodecError):
            C.zarr_decompress(b"\x13\x37" * 40, codec)


def test_n5_dispatch_full_codec_set():
    data = b"n5 chunk payload " * 100
    cases = {
        "raw": data,
        "gzip": gzip.compress(data),
        "zlib": zlib.compress(data),
        "bzip2": bz2.compress(data),
        "xz": lzma.compress(data),
        "lz4": C.lz4java_block_compress(data),
    }
    for codec, payload in cases.items():
        assert C.n5_decompress(payload, codec) == data, codec
    with pytest.raises(C.CodecError, match="unsupported"):
        C.n5_decompress(data, "brotli")


def test_zarr_dispatch_full_codec_set():
    data = np.arange(2000, dtype="<u2").tobytes()
    import pyarrow as pa

    cases = {
        "raw": data,
        "blosc": C.blosc_compress(data, typesize=2, cname="lz4"),
        "lz4": C.numcodecs_lz4_compress(data),
        "zstd": pa.Codec("zstd").compress(data, asbytes=True),
        "gzip": gzip.compress(data),
        "zlib": zlib.compress(data),
        "bz2": bz2.compress(data),
        "lzma": lzma.compress(data),
    }
    for codec, payload in cases.items():
        assert C.zarr_decompress(payload, codec) == data, codec
    with pytest.raises(C.CodecError, match="unsupported"):
        C.zarr_decompress(data, "brotli")



def test_crc32c_known_vectors():
    """Castagnoli CRC against published check values (RFC 3720 /
    the universal "123456789" check word)."""
    assert C.crc32c(b"") == 0
    assert C.crc32c(b"123456789") == 0xE3069283
    # iSCSI test vector: 32 bytes of zeros
    assert C.crc32c(bytes(32)) == 0x8A9136AA
    # and an incremental == one-shot equivalence across a split
    data = bytes(range(256)) * 5
    # crc chaining: crc32c(a+b) == crc32c(b, crc=crc32c(a))
    assert C.crc32c(data) == C.crc32c(data[100:], crc=C.crc32c(data[:100]))


def test_lz4java_verify_checksums():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes()
    stream = C.lz4java_block_compress(data, block_size=1 << 16)
    assert C.lz4java_block_decompress(stream, verify=True) == data
    # flip one payload byte in the middle of the stream
    tampered = bytearray(stream)
    tampered[len(stream) // 2] ^= 0x10
    with pytest.raises(C.CodecError, match="xxh32|lz4|length"):
        C.lz4java_block_decompress(bytes(tampered), verify=True)
