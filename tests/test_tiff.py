"""Clean-room baseline-TIFF reader (A1/A2 front door).

The golden-byte case is hand-assembled in the test, independent of
encode_tiff, so a writer bug cannot mask a reader bug.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from hortacloud_importer_spark.sources.tiff import (
    TiffParseError,
    decode_tiff,
    encode_tiff,
)


def _golden_single_page() -> tuple[bytes, np.ndarray]:
    """Little-endian, one 2x3 uint8 grayscale page, one strip."""
    pixels = bytes([10, 20, 30, 40, 50, 60])
    entries = []

    def e(tag, ftype, count, value4):
        entries.append(struct.pack("<HHI", tag, ftype, count) + value4)

    # IFD at offset 8, 7 entries -> strip data right after
    n = 7
    strip_off = 8 + 2 + n * 12 + 4
    e(256, 4, 1, struct.pack("<I", 3))            # ImageWidth = 3
    e(257, 4, 1, struct.pack("<I", 2))            # ImageLength = 2
    e(258, 3, 1, struct.pack("<HH", 8, 0))        # BitsPerSample = 8
    e(259, 3, 1, struct.pack("<HH", 1, 0))        # Compression = none
    e(273, 4, 1, struct.pack("<I", strip_off))    # StripOffsets
    e(278, 4, 1, struct.pack("<I", 2))            # RowsPerStrip
    e(279, 4, 1, struct.pack("<I", len(pixels)))  # StripByteCounts
    blob = (
        b"II*\x00"
        + struct.pack("<I", 8)
        + struct.pack("<H", n)
        + b"".join(entries)
        + struct.pack("<I", 0)  # no next IFD
        + pixels
    )
    want = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)[..., None]
    return blob, want[None, ...]


def test_golden_bytes_decode():
    blob, want = _golden_single_page()
    got = decode_tiff(blob)
    assert got.shape == (1, 2, 3, 1)
    assert got.dtype == np.uint8
    assert np.array_equal(got, want)


def test_multipage_uint16_roundtrip():
    rng = np.random.default_rng(3)
    stack = rng.integers(0, 65535, (4, 6, 5), dtype=np.uint16)
    got = decode_tiff(encode_tiff(stack))
    assert got.shape == (4, 6, 5, 1)
    assert got.dtype == np.uint16
    assert np.array_equal(got[..., 0], stack)


def test_multisample_page_roundtrip():
    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 255, (1, 4, 4, 3), dtype=np.uint8)
    got = decode_tiff(encode_tiff(rgb))
    assert np.array_equal(got, rgb)


def test_compressed_raises_with_codec_hint():
    blob, _ = _golden_single_page()
    # flip the Compression entry (tag 259) value from 1 -> 5 (LZW)
    idx = blob.find(struct.pack("<HHI", 259, 3, 1))
    bad = blob[: idx + 8] + struct.pack("<HH", 5, 0) + blob[idx + 12 :]
    with pytest.raises(TiffParseError, match="codec"):
        decode_tiff(bad)


def test_bad_magic_raises():
    with pytest.raises(TiffParseError):
        decode_tiff(b"PK\x03\x04not a tiff")


def test_binaryfile_scan_to_features(spark, tmp_path):
    """A1 end to end with REAL files: a directory of z-slice TIFFs ->
    binaryFile scan -> mapInPandas decode -> per-file feature rows
    (the reference's slice_to_dask_array shape, tiff2octree.py:653-691)."""
    from hortacloud_importer_spark.operators.multimodal import media_features

    rng = np.random.default_rng(5)
    slices = rng.integers(0, 255, (3, 8, 8), dtype=np.uint8)
    for z in range(3):
        (tmp_path / f"default.0.{z:03d}.tif").write_bytes(
            encode_tiff(slices[z][None, ...])
        )
    media = (
        spark.read.format("binaryFile")
        .load(f"file://{tmp_path}/*.tif")
        .select(
            F.xxhash64("path").alias("media_id"),
            F.lit("image").alias("kind"),
            F.lit("tiff").alias("format"),
            F.col("content").alias("payload"),
            F.expr(
                "named_struct('height', 8, 'width', 8, 'channels', 1,"
                " 'sample_rate', 0, 'n_frames', 1)"
            ).alias("meta"),
        )
    )
    rows = media_features(media).collect()
    assert len(rows) == 3
    means = sorted(round(r["mean_intensity"], 6) for r in rows)
    want = sorted(round(float(s.mean()), 6) for s in slices)
    assert means == want
    assert all(r["n_bytes"] == 64 for r in rows)
