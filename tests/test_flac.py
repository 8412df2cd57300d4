"""Clean-room FLAC codec (sources/flac.py): hand-assembled golden
bitstreams (independent of the fixture encoder), encoder/decoder
round-trips over every subframe type / stereo mode / partition order /
bit depth, CRC cross-checks against bit-by-bit reference
implementations, MD5 verification, and the crawl corruption contract.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from hortacloud_importer_spark.sources.flac import (
    FlacParseError,
    decode_flac,
    encode_flac,
    flac_probe,
)


def _crc8_ref(data: bytes) -> int:
    """Bit-by-bit CRC-8 (poly x^8+x^2+x+1), independent of the
    module's table build."""
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16_ref(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = (
                ((c << 1) ^ 0x8005) & 0xFFFF
                if c & 0x8000
                else (c << 1) & 0xFFFF
            )
    return c


def _streaminfo(rate, nch, bps, total, block=4096, md5=b"\x00" * 16):
    packed = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | total
    body = (
        struct.pack(">HH", block, block)
        + b"\x00" * 6
        + packed.to_bytes(8, "big")
        + md5
    )
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


class _Bits:
    """Tiny MSB-first bit assembler local to the test — golden frames
    are built WITHOUT the module's _BitWriter so a shared layout bug
    can't self-validate."""

    def __init__(self):
        self.s = ""

    def put(self, v, n):
        self.s += format(v & ((1 << n) - 1), f"0{n}b")

    def bytes(self):
        s = self.s + "0" * (-len(self.s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _golden_constant_frame():
    """One frame, 8 samples mono 8-bit, CONSTANT value -5, built bit
    by bit from the spec's tables."""
    hdr = _Bits()
    hdr.put(0x3FFE, 14)  # sync
    hdr.put(0, 1)  # reserved
    hdr.put(0, 1)  # fixed blocking
    hdr.put(0b0110, 4)  # block size: 8-bit at end of header
    hdr.put(0b0100, 4)  # 8 kHz
    hdr.put(0, 4)  # 1 channel
    hdr.put(0b001, 3)  # 8 bits per sample
    hdr.put(0, 1)  # reserved
    hdr.put(0, 8)  # frame number 0 (single-byte coded form)
    hdr.put(7, 8)  # block size - 1
    hbytes = hdr.bytes()
    body = _Bits()
    body.put(0, 1)  # subframe pad
    body.put(0, 6)  # CONSTANT
    body.put(0, 1)  # no wasted bits
    body.put(-5, 8)  # the constant, two's complement
    frame = hbytes + bytes([_crc8_ref(hbytes)]) + body.bytes()
    return frame + _crc16_ref(frame).to_bytes(2, "big")


def test_golden_constant_stream_decodes():
    blob = _streaminfo(8000, 1, 8, 8, block=8) + _golden_constant_frame()
    out, rate = decode_flac(blob)
    assert rate == 8000
    assert out.shape == (8, 1)
    assert (out == -5).all()
    assert flac_probe(blob) == (8, 1, 8000, 8)


def test_golden_fixed_order1_rice():
    """FIXED order 1, one Rice partition with k=0: signal 3,4,6,9
    (residuals 1,2,3 -> folded 2,4,6 -> unary 001 00001 0000001)."""
    hdr = _Bits()
    hdr.put(0x3FFE, 14)
    hdr.put(0, 2)
    hdr.put(0b0110, 4)  # 8-bit block size field
    hdr.put(0b0100, 4)  # 8 kHz
    hdr.put(0, 4)
    hdr.put(0b001, 3)  # 8 bps
    hdr.put(0, 1)
    hdr.put(0, 8)
    hdr.put(3, 8)  # block size 4
    hbytes = hdr.bytes()
    body = _Bits()
    body.put(0, 1)
    body.put(0b001001, 6)  # FIXED order 1
    body.put(0, 1)
    body.put(3, 8)  # warm-up sample
    body.put(0b00, 2)  # residual method 0 (4-bit Rice)
    body.put(0, 4)  # partition order 0
    body.put(0, 4)  # k = 0
    for folded in (2, 4, 6):
        body.put(1, folded + 1)  # unary: <folded> zeros then a 1
    frame = hbytes + bytes([_crc8_ref(hbytes)]) + body.bytes()
    frame += _crc16_ref(frame).to_bytes(2, "big")
    blob = _streaminfo(8000, 1, 8, 4, block=4) + frame
    out, _ = decode_flac(blob)
    assert out[:, 0].tolist() == [3, 4, 6, 9]


def test_empty_first_partition_is_rejected():
    """ADVICE r10: RFC 9639 requires (block size >> partition order)
    STRICTLY greater than the predictor order — a partitioned residual
    whose first partition holds zero samples is nonconforming and must
    raise, not decode. FIXED order 2, block 4, partition order 1:
    psize == order == 2."""
    hdr = _Bits()
    hdr.put(0x3FFE, 14)
    hdr.put(0, 2)
    hdr.put(0b0110, 4)  # 8-bit block size field
    hdr.put(0b0100, 4)  # 8 kHz
    hdr.put(0, 4)
    hdr.put(0b001, 3)  # 8 bps
    hdr.put(0, 1)
    hdr.put(0, 8)
    hdr.put(3, 8)  # block size 4
    hbytes = hdr.bytes()
    body = _Bits()
    body.put(0, 1)
    body.put(0b001010, 6)  # FIXED order 2
    body.put(0, 1)
    body.put(3, 8)  # warm-up
    body.put(4, 8)  # warm-up
    body.put(0b00, 2)  # residual method 0
    body.put(1, 4)  # partition order 1 -> psize 2 == order: invalid
    body.put(0, 4)  # k = 0 (first partition, zero samples)
    body.put(0, 4)  # k = 0 (second partition)
    for folded in (2, 4):
        body.put(1, folded + 1)
    frame = hbytes + bytes([_crc8_ref(hbytes)]) + body.bytes()
    frame += _crc16_ref(frame).to_bytes(2, "big")
    blob = _streaminfo(8000, 1, 8, 4, block=4) + frame
    with pytest.raises(FlacParseError, match="partition"):
        decode_flac(blob)


def test_crc_tables_match_bitwise_reference():
    from hortacloud_importer_spark.sources.flac import _crc8, _crc16

    rng = np.random.default_rng(3)
    for n in (1, 7, 64, 300):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert _crc8(data) == _crc8_ref(data)
        assert _crc16(data) == _crc16_ref(data)


def test_roundtrip_every_subframe_type():
    rng = np.random.default_rng(11)
    for sub in (
        "constant", "verbatim", "fixed:0", "fixed:1", "fixed:2",
        "fixed:3", "fixed:4", "lpc",
    ):
        sig = (
            np.full(500, 123, np.int64)
            if sub == "constant"
            else rng.integers(-4000, 4000, 500).astype(np.int64)
        )
        blob = encode_flac(
            sig, rate=8000, bits=16, block_size=192, subframe=sub
        )
        out, rate = decode_flac(blob)
        assert rate == 8000
        assert np.array_equal(out[:, 0], sig), sub


def test_roundtrip_stereo_decorrelation_modes():
    rng = np.random.default_rng(13)
    st = rng.integers(-30000, 30000, (3000, 2)).astype(np.int64)
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        blob = encode_flac(
            st, rate=44100, bits=16, block_size=576, stereo=mode
        )
        assert np.array_equal(decode_flac(blob)[0], st), mode


def test_roundtrip_partition_orders_and_rice2():
    rng = np.random.default_rng(17)
    sig = rng.integers(-5000, 5000, 4096).astype(np.int64)
    for po in (0, 1, 3, 4):
        for method in (0, 1):
            blob = encode_flac(
                sig, rate=48000, bits=16, block_size=4096,
                partition_order=po, rice_method=method,
            )
            assert np.array_equal(decode_flac(blob)[0][:, 0], sig)


def test_roundtrip_bit_depths_and_escape_partitions():
    rng = np.random.default_rng(19)
    for bits in (8, 12, 16, 20, 24, 32):
        hi = 1 << (bits - 1)
        sig = rng.integers(-hi, hi, 700).astype(np.int64)
        blob = encode_flac(sig, rate=11025, bits=bits, block_size=200)
        out, _ = decode_flac(blob)
        assert np.array_equal(out[:, 0], sig), bits


def test_roundtrip_wasted_bits_and_multichannel():
    rng = np.random.default_rng(23)
    sig = (rng.integers(-100, 100, 1000) << 3).astype(np.int64)
    blob = encode_flac(sig, rate=22050, bits=16, wasted=3, block_size=256)
    assert np.array_equal(decode_flac(blob)[0][:, 0], sig)
    mc = rng.integers(-500, 500, (600, 8)).astype(np.int64)
    blob = encode_flac(mc, rate=16000, bits=16, block_size=192)
    assert np.array_equal(decode_flac(blob)[0], mc)


def test_variable_blocking_and_rate_fields():
    rng = np.random.default_rng(29)
    sig = rng.integers(-1000, 1000, 2500).astype(np.int64)
    blob = encode_flac(
        sig, rate=96000, bits=16, block_size=1024, variable_blocking=True
    )
    assert np.array_equal(decode_flac(blob)[0][:, 0], sig)
    assert flac_probe(blob) == (2500, 1, 96000, 16)
    # odd rate -> 16-bit Hz header field; streaminfo-coded rate
    assert decode_flac(encode_flac(sig, rate=12345, bits=16))[1] == 12345
    blob = encode_flac(sig, rate=44100, bits=16, sr_code_mode="streaminfo")
    assert decode_flac(blob)[1] == 44100


def test_md5_guards_the_decode():
    rng = np.random.default_rng(31)
    sig = rng.integers(-1000, 1000, 600).astype(np.int64)
    blob = bytearray(encode_flac(sig, rate=8000, bits=16, block_size=256))
    # STREAMINFO's md5 occupies the last 16 bytes of the 34-byte block
    md5_off = 8 + 18
    want = hashlib.md5(
        sig.astype("<i2").tobytes()
    ).digest()
    assert bytes(blob[md5_off : md5_off + 16]) == want
    blob[md5_off] ^= 0xFF
    with pytest.raises(FlacParseError, match="MD5"):
        decode_flac(bytes(blob))


def test_metadata_blocks_are_skipped_by_length():
    rng = np.random.default_rng(37)
    sig = rng.integers(-50, 50, 300).astype(np.int64)
    blob = encode_flac(sig, rate=8000, bits=16, block_size=192)
    # splice PADDING + VORBIS_COMMENT blocks between STREAMINFO and
    # the frames; STREAMINFO's last-block flag moves to the comment
    si_end = 8 + 34
    head = bytearray(blob[:si_end])
    head[4] &= 0x7F  # STREAMINFO no longer last
    pad = bytes([1]) + (10).to_bytes(3, "big") + b"\x00" * 10
    comment = b"x" * 12
    vc = bytes([0x80 | 4]) + len(comment).to_bytes(3, "big") + comment
    spliced = bytes(head) + pad + vc + blob[si_end:]
    assert np.array_equal(decode_flac(spliced)[0][:, 0], sig)


def test_corrupt_streams_raise_named_error_only():
    rng = np.random.default_rng(41)
    sig = rng.integers(-2000, 2000, (400, 2)).astype(np.int64)
    base = encode_flac(sig, rate=44100, bits=16, block_size=192,
                       stereo="mid_side")
    for _ in range(300):
        b = bytearray(base)
        mode = rng.integers(0, 3)
        if mode == 0:
            b = b[: int(rng.integers(1, len(b)))]
        elif mode == 1:
            i = int(rng.integers(0, len(b)))
            b[i] ^= 1 << int(rng.integers(0, 8))
        else:
            i = int(rng.integers(0, len(b)))
            b[i : i + 4] = bytes(rng.integers(0, 256, 4).tolist())
        try:
            decode_flac(bytes(b))
        except FlacParseError:
            pass  # the ONLY acceptable failure type


def test_frame_crcs_catch_single_bit_flips():
    """Every single-bit flip inside the audio frames must be caught
    (CRC-8/CRC-16/MD5/sync), never silently decoded to wrong PCM."""
    rng = np.random.default_rng(43)
    sig = rng.integers(-300, 300, 192).astype(np.int64)
    base = encode_flac(sig, rate=8000, bits=16, block_size=192)
    frames_start = 8 + 34
    for byte in range(frames_start, len(base)):
        b = bytearray(base)
        b[byte] ^= 0x10
        try:
            out, _ = decode_flac(bytes(b))
        except FlacParseError:
            continue
        raise AssertionError(f"flip at byte {byte} decoded silently")


def test_encoder_rejects_out_of_contract_input():
    with pytest.raises(FlacParseError, match="range"):
        encode_flac(np.array([1 << 20]), bits=16)
    with pytest.raises(FlacParseError, match="channels"):
        encode_flac(np.zeros((4, 9), np.int64))
    with pytest.raises(FlacParseError, match="stereo"):
        encode_flac(np.zeros(16, np.int64), stereo="mid_side")
    with pytest.raises(FlacParseError, match="bits"):
        encode_flac(np.zeros(16, np.int64), bits=7)


def test_media_kernels_route_flac(spark):
    from pyspark.sql import functions as F

    from hortacloud_importer_spark.operators.multimodal import (
        media_features,
        media_probe,
    )

    rng = np.random.default_rng(47)
    rows = []
    for i in range(3):
        sig = rng.integers(-2000, 2000, 256 * (i + 1)).astype(np.int64)
        rows.append(
            (i, "audio", "flac",
             bytearray(encode_flac(sig, rate=16000, bits=16)))
        )
    media = spark.createDataFrame(
        rows, "media_id long, kind string, format string, payload binary"
    ).withColumn(
        "meta",
        F.expr(
            "named_struct('height', 0, 'width', 0, 'channels', 0,"
            " 'sample_rate', 0, 'n_frames', 0)"
        ),
    )
    probed = {r["media_id"]: r for r in media_probe(media).collect()}
    for i in range(3):
        assert probed[i]["width"] == 256 * (i + 1)
        assert probed[i]["sample_rate"] == 16000
        assert probed[i]["channels"] == 1
    feats = media_features(media).collect()
    assert len(feats) == 3
