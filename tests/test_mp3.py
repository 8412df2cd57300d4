"""MP3 header probe (sources/mp3.py): golden hand-computed frame
layouts, CBR/VBR walks, ID3 tag skipping, version/layer matrix, the
honest decode gate, and the crawl corruption contract."""

from __future__ import annotations

import numpy as np
import pytest

from hortacloud_importer_spark.sources.mp3 import (
    Mp3ParseError,
    decode_mp3,
    encode_mp3_headers,
    mp3_bitrate_stats,
    mp3_probe,
)


def test_golden_cbr_mpeg1_layer3():
    """A hand-checked stream: MPEG-1 Layer III, 44.1 kHz, 128 kbps.
    Unpadded frame = 144*128000/44100 = 417 bytes; padded = 418;
    1152 samples each."""
    blob = encode_mp3_headers(4, rate=44100, kbps=128, channels=2)
    # frame sizes alternate 417/418 through the fixture's padding bit
    assert len(blob) == 417 + 418 + 417 + 418
    n, ch, rate, nf = mp3_probe(blob)
    assert (n, ch, rate, nf) == (4 * 1152, 2, 44100, 4)
    assert mp3_bitrate_stats(blob) == (128, 128, False)


def test_vbr_walk_is_exact():
    kbps = [64, 128, 320, 96, 64]
    blob = encode_mp3_headers(5, rate=48000, kbps=kbps, channels=1)
    n, ch, rate, nf = mp3_probe(blob)
    assert (n, ch, rate, nf) == (5 * 1152, 1, 48000, 5)
    assert mp3_bitrate_stats(blob) == (64, 320, True)


def test_version_layer_matrix():
    # MPEG-2 Layer III halves the frame (576 samples, 72 factor)
    blob = encode_mp3_headers(3, rate=22050, kbps=64, version=2)
    assert mp3_probe(blob) == (3 * 576, 2, 22050, 3)
    # MPEG-2.5
    blob = encode_mp3_headers(2, rate=8000, kbps=32, version=0)
    assert mp3_probe(blob) == (2 * 576, 2, 8000, 2)
    # Layer II keeps 1152 samples at every version
    blob = encode_mp3_headers(2, rate=44100, kbps=192, layer=2)
    assert mp3_probe(blob) == (2 * 1152, 2, 44100, 2)
    # Layer I: 384 samples, 4-byte slots
    blob = encode_mp3_headers(2, rate=32000, kbps=256, layer=1)
    assert mp3_probe(blob) == (2 * 384, 2, 32000, 2)


def test_id3_tags_are_skipped():
    blob = encode_mp3_headers(
        3, rate=44100, kbps=128, id3v2_bytes=500, id3v1=True
    )
    assert blob[:3] == b"ID3" and blob[-128:-125] == b"TAG"
    assert mp3_probe(blob) == (3 * 1152, 2, 44100, 3)


def test_named_gates():
    blob = bytearray(encode_mp3_headers(2, rate=44100, kbps=128))
    # free-format (bitrate index 0)
    b = bytearray(blob)
    b[2] &= 0x0F
    with pytest.raises(Mp3ParseError, match="free-format"):
        mp3_probe(bytes(b))
    # trailing garbage after the last frame
    with pytest.raises(Mp3ParseError, match="trailing|sync"):
        mp3_probe(bytes(blob) + b"\x01\x02\x03")
    # mid-stream rate change
    a = encode_mp3_headers(1, rate=44100, kbps=128)
    c = encode_mp3_headers(1, rate=48000, kbps=128)
    with pytest.raises(Mp3ParseError, match="mid-stream"):
        mp3_probe(a + c)
    # decode is an honest gate on a VALID container
    with pytest.raises(NotImplementedError, match="binding"):
        decode_mp3(bytes(blob))


def test_corrupt_streams_raise_named_error_only():
    rng = np.random.default_rng(59)
    base = encode_mp3_headers(
        6, rate=44100, kbps=[64, 128, 96, 64, 320, 128], id3v2_bytes=64
    )
    for _ in range(400):
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
            mp3_probe(bytes(b))
            mp3_bitrate_stats(bytes(b))
        except (Mp3ParseError, NotImplementedError):
            pass  # named errors only


def test_media_probe_routes_mp3(spark):
    from pyspark.sql import functions as F

    from hortacloud_importer_spark.operators.multimodal import media_probe

    rows = [
        (1, "audio", "mp3",
         bytearray(encode_mp3_headers(10, rate=44100, kbps=128))),
        (2, "audio", "mp3",
         bytearray(encode_mp3_headers(4, rate=22050, kbps=64, version=2,
                                      channels=1))),
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
    got = {r["media_id"]: r for r in media_probe(media).collect()}
    assert got[1]["width"] == 10 * 1152
    assert got[1]["sample_rate"] == 44100
    assert got[1]["n_frames"] == 10
    assert (got[2]["width"], got[2]["channels"], got[2]["sample_rate"]) == (
        4 * 576, 1, 22050,
    )


# --------------------------------------------------- ADTS AAC probe


def test_adts_probe_golden_and_gates():
    from hortacloud_importer_spark.sources.adts import (
        AdtsParseError,
        adts_probe,
        decode_adts,
        encode_adts_headers,
    )

    blob = encode_adts_headers(5, rate=44100, channels=2)
    assert adts_probe(blob) == (5 * 1024, 2, 44100, 5)
    # multiple raw data blocks per frame multiply the sample count
    blob = encode_adts_headers(3, rate=48000, channels=6, n_blocks=4)
    assert adts_probe(blob) == (3 * 4096, 6, 48000, 3)
    # CRC-present headers are 9 bytes
    blob = encode_adts_headers(2, rate=8000, channels=1, with_crc=True)
    assert adts_probe(blob) == (2 * 1024, 1, 8000, 2)
    # decode is an honest gate on a VALID container
    with pytest.raises(NotImplementedError, match="binding"):
        decode_adts(blob)
    # trailing garbage / mid-stream rate change are named errors
    with pytest.raises(AdtsParseError):
        adts_probe(encode_adts_headers(1) + b"\x01\x02")
    with pytest.raises(AdtsParseError, match="mid-stream"):
        adts_probe(
            encode_adts_headers(1, rate=44100)
            + encode_adts_headers(1, rate=48000)
        )


def test_adts_corruption_raises_named_error_only():
    from hortacloud_importer_spark.sources.adts import (
        AdtsParseError,
        adts_probe,
        encode_adts_headers,
    )

    rng = np.random.default_rng(139)
    base = encode_adts_headers(6, rate=22050, channels=2, n_blocks=2)
    for _ in range(400):
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
            adts_probe(bytes(b))
        except (AdtsParseError, NotImplementedError):
            pass


def test_media_probe_routes_aac(spark):
    from pyspark.sql import functions as F

    from hortacloud_importer_spark.operators.multimodal import media_probe
    from hortacloud_importer_spark.sources.adts import encode_adts_headers

    media = spark.createDataFrame(
        [(1, "audio", "aac",
          bytearray(encode_adts_headers(8, rate=32000, channels=2)))],
        "media_id long, kind string, format string, payload binary",
    ).withColumn(
        "meta",
        F.expr(
            "named_struct('height', 0, 'width', 0, 'channels', 0,"
            " 'sample_rate', 0, 'n_frames', 0)"
        ),
    )
    row = media_probe(media).collect()[0]
    assert (row["width"], row["channels"], row["sample_rate"],
            row["n_frames"]) == (8 * 1024, 2, 32000, 8)
