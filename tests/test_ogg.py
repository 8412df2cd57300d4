"""Ogg container walker (sources/ogg.py): RFC 3533 page layout, the
Vorbis/Opus/FLAC id-header mappings, the FLAC-in-Ogg REAL sample
decode, and the named-error corruption contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hortacloud_importer_spark.sources.flac import decode_flac, encode_flac
from hortacloud_importer_spark.sources.ogg import (
    OggParseError,
    decode_ogg,
    encode_ogg_flac,
    encode_ogg_opus_headers,
    encode_ogg_vorbis_headers,
    ogg_flac_to_native,
    ogg_page_crc,
    ogg_pages,
    ogg_probe,
    write_ogg_pages,
)


def _crc32_bitwise(data: bytes) -> int:
    """Independent bitwise RFC 3533 §6 CRC (poly 0x04C11DB7, init 0,
    no reflection, no final xor) to pin the table build."""
    crc = 0
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) if crc & 0x80000000 else crc << 1
            crc &= 0xFFFFFFFF
    return crc


def test_page_crc_matches_bitwise_reference():
    rng = np.random.default_rng(3)
    for n in (0, 1, 27, 300):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert ogg_page_crc(data) == _crc32_bitwise(data)


def test_golden_hand_built_page():
    """A hand-assembled one-page stream parses: header fields land
    where RFC 3533 puts them and the lacing splits packets."""
    segs = b"hello" + b"world!!"
    hdr = (
        b"OggS" + bytes([0, 0x06])  # BOS | EOS
        + struct.pack("<qIII", 12, 0xABCD, 0, 0)
        + bytes([2, 5, 7])
    )
    page = bytearray(hdr + segs)
    page[22:26] = struct.pack("<I", ogg_page_crc(bytes(page)))
    pages = ogg_pages(bytes(page))
    assert len(pages) == 1
    htype, granule, serial, pageseq, out_segs, lacing = pages[0]
    assert htype == 0x06
    assert granule == 12
    assert serial == 0xABCD
    assert pageseq == 0
    assert out_segs == [b"hello", b"world!!"]


def test_vorbis_probe_golden():
    blob = encode_ogg_vorbis_headers(
        10, rate=44100, channels=2, samples_per_packet=1024
    )
    assert ogg_probe(blob) == ("vorbis", 10240, 2, 44100, 10)
    blob = encode_ogg_vorbis_headers(
        4, rate=8000, channels=1, samples_per_packet=512
    )
    assert ogg_probe(blob) == ("vorbis", 2048, 1, 8000, 4)


def test_opus_probe_golden_excludes_preskip():
    blob = encode_ogg_opus_headers(
        5, channels=1, preskip=312, samples_per_packet=960
    )
    # granulepos runs at 48 kHz and INCLUDES pre-skip; the duration
    # reported must exclude it (RFC 7845 §5.1)
    assert ogg_probe(blob) == ("opus", 4800, 1, 48000, 5)


def test_flac_in_ogg_real_decode_and_native_round_trip():
    rng = np.random.default_rng(7)
    pcm = rng.integers(-2000, 2000, (512, 2)).astype(np.int64)
    native = encode_flac(
        pcm, rate=16000, bits=16, block_size=192, stereo="mid_side"
    )
    blob = encode_ogg_flac(native)
    # 512 samples at block 192 -> 3 frames -> 3 audio packets
    assert ogg_probe(blob) == ("flac", 512, 2, 16000, 3)
    out, rate = decode_ogg(blob)
    assert rate == 16000
    assert np.array_equal(out, pcm)
    # the reassembled native stream decodes (MD5 verified inside)
    assert np.array_equal(decode_flac(ogg_flac_to_native(blob))[0], pcm)


def test_packets_span_pages_and_lacing_boundaries():
    """A 700-byte packet laces as 255+255+190; with max_segs=2 it
    spans pages with the continuation flag set, and a packet whose
    length is an exact multiple of 255 gets its 0-lacing terminator."""
    pkt_big = bytes((i * 11) & 0xFF for i in range(700))
    pkt_exact = bytes((i * 5) & 0xFF for i in range(510))
    head = b"OpusHead" + struct.pack("<BBHIhB", 1, 2, 0, 48000, 0, 0)
    tags = b"OpusTags" + struct.pack("<I", 1) + b"x" + struct.pack("<I", 0)
    blob = write_ogg_pages(
        [head, tags, pkt_big, pkt_exact],
        [0, 0, 960, 1920],
        max_segs=2,
    )
    pages = ogg_pages(blob)
    assert len(pages) > 2
    # at least one page carries the continuation flag
    assert any(p[0] & 0x01 for p in pages[1:])
    assert ogg_probe(blob) == ("opus", 1920, 2, 48000, 2)
    # the packets reassemble byte-exactly
    from hortacloud_importer_spark.sources.ogg import (
        _single_stream_packets,
    )

    packets, _g, _last = _single_stream_packets(pages)
    assert packets == [head, tags, pkt_big, pkt_exact]


def test_multiplexed_chained_and_unknown_codecs_gate_by_name():
    a = encode_ogg_vorbis_headers(2)
    b = encode_ogg_opus_headers(2)
    # chained with DIFFERENT codecs: named gate
    with pytest.raises(OggParseError, match="chained"):
        ogg_probe(a + b)
    # grouped: a second stream's BOS spliced mid-link (between pages
    # of a multi-page stream) surfaces as the named BOS-placement
    # error (true multiplexing is refused)
    big = encode_ogg_vorbis_headers(300)  # > 255 segments: multi-page
    pbig = ogg_pages(big)
    assert len(pbig) > 1
    b2 = write_ogg_pages(
        [b"OpusHead" + struct.pack("<BBHIhB", 1, 2, 0, 48000, 0, 0)],
        [0],
        serial=0x9999,
    )
    first_page_len = 27 + len(pbig[0][5]) + sum(pbig[0][5])
    with pytest.raises(OggParseError, match="BOS|grouped"):
        ogg_probe(big[:first_page_len] + b2 + big[first_page_len:])
    # unknown codec id
    blob = write_ogg_pages([b"\x8fZZZZZZZ" + bytes(8)], [0])
    with pytest.raises(OggParseError, match="unrecognized"):
        ogg_probe(blob)
    # theora / speex: named gates
    blob = write_ogg_pages([b"\x80theora" + bytes(34)], [0])
    with pytest.raises(OggParseError, match="theora"):
        ogg_probe(blob)
    blob = write_ogg_pages([b"Speex   " + bytes(72)], [0])
    with pytest.raises(OggParseError, match="speex"):
        ogg_probe(blob)


def test_chained_streams_aggregate_and_decode():
    """RFC 3533 chained streams (complete BOS..EOS links
    concatenated): the probe sums samples/packets across uniform
    links, and FLAC-in-Ogg chains decode to gaplessly concatenated
    PCM; mid-chain parameter changes gate by name."""
    a = encode_ogg_vorbis_headers(4, rate=44100, channels=2,
                                  samples_per_packet=1024)
    b = encode_ogg_vorbis_headers(6, rate=44100, channels=2,
                                  samples_per_packet=1024)
    assert ogg_probe(a + b) == ("vorbis", 10240, 2, 44100, 10)
    # rate change mid-chain: named error
    c = encode_ogg_vorbis_headers(2, rate=8000, channels=2)
    with pytest.raises(OggParseError, match="chained"):
        ogg_probe(a + c)
    rng = np.random.default_rng(17)
    p1 = rng.integers(-999, 999, (256, 2)).astype(np.int64)
    p2 = rng.integers(-999, 999, (128, 2)).astype(np.int64)
    f1 = encode_ogg_flac(encode_flac(p1, rate=16000, bits=16,
                                     block_size=128))
    f2 = encode_ogg_flac(encode_flac(p2, rate=16000, bits=16,
                                     block_size=128))
    assert ogg_probe(f1 + f2) == ("flac", 384, 2, 16000, 3)
    pcm, rate = decode_ogg(f1 + f2)
    assert rate == 16000
    assert np.array_equal(pcm, np.concatenate([p1, p2]))


def test_crc_catches_single_bit_flips_in_headers():
    blob = encode_ogg_vorbis_headers(3)
    # flip one bit in every page-header byte: CRC (or a field check)
    # must catch each — never a silent mis-parse into different totals
    base = ogg_probe(blob)
    pos = 0
    header_bytes = []
    while pos < len(blob):
        nsegs = blob[pos + 26]
        header_bytes.extend(range(pos, pos + 27 + nsegs))
        body = sum(blob[pos + 27 : pos + 27 + nsegs])
        pos += 27 + nsegs + body
    for byte in header_bytes:
        b = bytearray(blob)
        b[byte] ^= 0x04
        try:
            assert ogg_probe(bytes(b)) == base
        except OggParseError:
            continue
        raise AssertionError(f"flip at header byte {byte} mis-parsed")


def test_corrupt_streams_raise_named_error_only():
    rng = np.random.default_rng(11)
    pcm = rng.integers(-500, 500, 256).astype(np.int64)
    bases = [
        encode_ogg_vorbis_headers(4),
        encode_ogg_opus_headers(4),
        encode_ogg_flac(encode_flac(pcm, rate=8000, bits=16)),
    ]
    from hortacloud_importer_spark.sources.flac import FlacParseError

    for base in bases:
        for _ in range(200):
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
                decode_ogg(bytes(b))
            except (OggParseError, FlacParseError, NotImplementedError):
                pass  # the named contract (flac payload errors included)


def test_media_kernels_route_ogg(spark):
    from pyspark.sql import functions as F

    from hortacloud_importer_spark.operators.multimodal import (
        media_features,
        media_probe,
    )

    rng = np.random.default_rng(13)
    pcm = rng.integers(-2000, 2000, (256, 2)).astype(np.int64)
    rows = [
        (0, "audio", "ogg",
         bytearray(encode_ogg_vorbis_headers(6, rate=22050, channels=2))),
        (1, "audio", "opus",
         bytearray(encode_ogg_opus_headers(3, channels=1, preskip=0))),
        (2, "audio", "ogg",
         bytearray(encode_ogg_flac(
             encode_flac(pcm, rate=16000, bits=16, block_size=192)
         ))),
    ]
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
    assert (probed[0]["width"], probed[0]["sample_rate"]) == (6144, 22050)
    assert (probed[1]["width"], probed[1]["sample_rate"]) == (2880, 48000)
    assert (probed[2]["width"], probed[2]["channels"]) == (256, 2)
    # features: FLAC-in-Ogg decodes real samples; vorbis/opus tag
    feats = media_features(media, errors="tag").collect()
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[0]["decode_error"] is not None
    assert by_id[1]["decode_error"] is not None
    assert by_id[2]["decode_error"] is None
    assert by_id[2]["min_intensity"] == int(pcm.min())
    assert by_id[2]["max_intensity"] == int(pcm.max())
