"""JPEG 2000 slice ingest (sources/jp2.py): codec-free header walk,
the honest decode gate, and suffix auto-detection in build_octree.
Reference behavior: tiff2octree.py:673-678 reads .jp2 slice
directories through rasterio."""

from __future__ import annotations

import struct

import pytest

from hortacloud_importer_spark.sources.jp2 import (
    JP2_SIGNATURE,
    Jp2ParseError,
    decode_jp2,
    jp2_shape,
)


def _box(tbox: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tbox + payload


def _codestream(h: int, w: int, nc: int) -> bytes:
    siz = struct.pack(
        ">HHIIIIIIIIH",
        38 + 3 * nc,  # Lsiz
        0,  # Rsiz
        w, h, 0, 0,  # Xsiz Ysiz XOsiz YOsiz
        w, h, 0, 0,  # XTsiz YTsiz XTOsiz YTOsiz
        nc,
    ) + b"\x07\x01\x01" * nc
    return b"\xff\x4f" + b"\xff\x51" + siz


def _jp2_bytes(h: int, w: int, nc: int = 1) -> bytes:
    """Minimal spec-shaped JP2: signature, ftyp, jp2h/ihdr, jp2c.
    Headers are real; the codestream body is header-only (enough for
    every codec-free path; an actual decode hits the gate)."""
    ftyp = _box(b"ftyp", b"jp2 " + b"\x00" * 4 + b"jp2 ")
    ihdr = _box(b"ihdr", struct.pack(">IIHBBBB", h, w, nc, 7, 7, 0, 0))
    jp2h = _box(b"jp2h", ihdr)
    jp2c = _box(b"jp2c", _codestream(h, w, nc))
    return JP2_SIGNATURE + ftyp + jp2h + jp2c


def _codec_available() -> bool:
    for mod in ("glymur", "imageio", "PIL"):
        try:
            __import__(mod)
            return True
        except ImportError:
            continue
    return False


def test_jp2_shape_from_ihdr_box():
    assert jp2_shape(_jp2_bytes(6, 9, 1)) == (6, 9, 1)
    assert jp2_shape(_jp2_bytes(512, 1024, 3)) == (512, 1024, 3)


def test_jp2_shape_from_raw_codestream():
    assert jp2_shape(_codestream(7, 5, 2)) == (7, 5, 2)


def test_jp2_shape_rejects_garbage():
    with pytest.raises(Jp2ParseError):
        jp2_shape(b"II*\x00 this is a TIFF, not a JP2")
    with pytest.raises(Jp2ParseError):
        jp2_shape(JP2_SIGNATURE + _box(b"ftyp", b"jp2 "))  # no jp2h
    # overrunning box length must not read out of bounds
    bad = JP2_SIGNATURE + struct.pack(">I", 1 << 30) + b"jp2h"
    with pytest.raises(Jp2ParseError):
        jp2_shape(bad)


@pytest.mark.skipif(
    _codec_available(), reason="a JP2 codec is importable here"
)
def test_decode_jp2_gate_names_the_options():
    with pytest.raises(NotImplementedError, match="OpenJPEG"):
        decode_jp2(_jp2_bytes(4, 4, 1))


@pytest.mark.skipif(
    not _codec_available(), reason="no JP2 codec in this container"
)
def test_decode_jp2_parity_with_header_walk():
    # when a codec IS present the decode's geometry must agree with
    # the codec-free header walk
    data = _jp2_bytes(4, 4, 1)
    h, w, nc = jp2_shape(data)
    arr = decode_jp2(data)
    assert arr.shape == (1, h, w, nc)


def test_build_octree_detects_jp2_slices_and_gates_decode(spark, tmp_path):
    """A .jp2 slice directory is auto-detected (dims from the ihdr
    header walk — no codec); the DECODE then hits the honest gate in
    this codec-less container instead of silently misreading."""
    from hortacloud_importer_spark.pipelines import build_octree
    from hortacloud_importer_spark.pipelines.octree import (
        _detect_slice_suffix,
        _infer_slice_dims,
    )

    indir = tmp_path / "jp2_slices"
    indir.mkdir()
    for z in range(4):
        (indir / f"default.0.{z:05d}.jp2").write_bytes(_jp2_bytes(4, 4, 1))

    assert _detect_slice_suffix(str(indir), 1) == ".jp2"
    assert _infer_slice_dims(str(indir), 1, ".jp2") == (4, 4, 4)

    if _codec_available():
        pytest.skip("decode would succeed here; gate branch untestable")
    with pytest.raises(Exception, match="OpenJPEG"):
        build_octree(
            spark,
            str(indir),
            str(tmp_path / "out"),
            nlevels=2,
            filter_="max",
        ).collect()


def _jp2_bytes_bpc(h: int, w: int, nc: int, bpc: int) -> bytes:
    """Like _jp2_bytes but with an explicit ihdr BPC byte."""
    ftyp = _box(b"ftyp", b"jp2 " + b"\x00" * 4 + b"jp2 ")
    ihdr = _box(b"ihdr", struct.pack(">IIHBBBB", h, w, nc, bpc, 7, 0, 0))
    jp2h = _box(b"jp2h", ihdr)
    jp2c = _box(b"jp2c", _codestream(h, w, nc))
    return JP2_SIGNATURE + ftyp + jp2h + jp2c


def test_jp2_sample_format_from_ihdr_and_codestream():
    from hortacloud_importer_spark.sources.jp2 import jp2_sample_format

    # BPC byte: low 7 bits = depth-1, high bit = signed
    assert jp2_sample_format(_jp2_bytes_bpc(4, 4, 1, 7)) == (8, False)
    assert jp2_sample_format(_jp2_bytes_bpc(4, 4, 1, 15)) == (16, False)
    assert jp2_sample_format(_jp2_bytes_bpc(4, 4, 1, 31)) == (32, False)
    assert jp2_sample_format(_jp2_bytes_bpc(4, 4, 1, 0x87)) == (8, True)
    # raw codestream: per-component Ssiz bytes (the _codestream
    # builder writes 0x07 = 8-bit unsigned)
    assert jp2_sample_format(_codestream(4, 4, 2)) == (8, False)


def test_jp2_sample_format_bpcc_box_takes_widest():
    from hortacloud_importer_spark.sources.jp2 import jp2_sample_format

    # BPC=255 declares per-component depths in a bpcc box
    ftyp = _box(b"ftyp", b"jp2 " + b"\x00" * 4 + b"jp2 ")
    ihdr = _box(b"ihdr", struct.pack(">IIHBBBB", 4, 4, 2, 0xFF, 7, 0, 0))
    bpcc = _box(b"bpcc", bytes([7, 15]))  # 8-bit + 16-bit
    jp2h = _box(b"jp2h", ihdr + bpcc)
    data = JP2_SIGNATURE + ftyp + jp2h + _box(b"jp2c", _codestream(4, 4, 2))
    assert jp2_sample_format(data) == (16, False)


def test_check_jp2_uint16_rejects_wide_or_signed_samples():
    """ADVICE r6 (medium): >16-bit or signed JP2 slices must fail at
    admission instead of wrapping modulo 2^16 in the uint16 tile cut
    — the JP2 mirror of TIFF's _page_dtype rule."""
    from hortacloud_importer_spark.sources.jp2 import check_jp2_uint16

    check_jp2_uint16(_jp2_bytes_bpc(4, 4, 1, 15))  # 16-bit unsigned ok
    with pytest.raises(Jp2ParseError, match="32-bit"):
        check_jp2_uint16(_jp2_bytes_bpc(4, 4, 1, 31))
    with pytest.raises(Jp2ParseError, match="signed"):
        check_jp2_uint16(_jp2_bytes_bpc(4, 4, 1, 0x87))


def test_infer_slice_dims_rejects_wide_jp2(tmp_path):
    """The plan-time probe in _infer_slice_dims applies the admission
    rule, so a 32-bit JP2 store fails the build before any executor
    work."""
    from hortacloud_importer_spark.pipelines.octree import _infer_slice_dims

    indir = tmp_path / "wide_jp2"
    indir.mkdir()
    for z in range(2):
        (indir / f"{z:05d}.jp2").write_bytes(_jp2_bytes_bpc(4, 4, 1, 31))
    with pytest.raises(Jp2ParseError, match="32-bit"):
        _infer_slice_dims(str(indir), 1, ".jp2")


def test_decode_jp2_falls_through_broken_binding(monkeypatch):
    """ADVICE r6 + review: an importable binding that cannot decode
    (plugin missing -> OSError/ValueError) falls through to the next
    binding; if EVERY present binding fails, the error is a
    Jp2ParseError carrying the per-binding messages — the
    NotImplementedError gate is reserved for "no binding importable
    at all" (the FIXTURES.md environment signal)."""
    import sys
    import types

    class _BrokenJp2k:
        def __init__(self, *a, **k):
            raise OSError("openjpeg library not found")

    fake = types.ModuleType("glymur")
    fake.Jp2k = _BrokenJp2k
    monkeypatch.setitem(sys.modules, "glymur", fake)
    if _codec_available():
        pytest.skip("a later binding would decode for real here")
    with pytest.raises(Jp2ParseError) as exc:
        decode_jp2(_jp2_bytes(4, 4, 1))
    assert "glymur: openjpeg library not found" in str(exc.value)
