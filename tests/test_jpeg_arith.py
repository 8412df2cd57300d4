"""Arithmetic-coded JPEG (T.81 Annexes D + F, sources/jpeg_arith.py).

Three rings of evidence:
1. QM-coder primitive round-trips (property, no image layer).
2. Whole-image self round-trips: the arithmetic encoder's streams
   decode to EXACTLY the pixels of the Huffman encoder's streams for
   the same input (both carry identical quantized coefficients and
   share the IDCT tail, so any entropy bug shows as a bit diff).
3. libjpeg conformance (gcc-gated): decode parity on independently
   encoded streams — sequential/progressive/subsampled/restarts —
   and libjpeg decoding this encoder's output.
"""

from __future__ import annotations

import numpy as np
import pytest

from hortacloud_importer_spark.sources.jpeg import (
    JpegParseError,
    decode_jpeg,
    encode_jpeg,
    jpeg_probe,
)
from hortacloud_importer_spark.sources.jpeg_arith import (
    _QmDecoder,
    _QmEncoder,
    encode_jpeg_arith,
)

from tests import jpeg_ref


def test_qm_coder_round_trip_property():
    rng = np.random.default_rng(11)
    for _ in range(60):
        n = int(rng.integers(1, 900))
        p = rng.uniform(0.02, 0.98)
        bits = (rng.random(n) < p).astype(int).tolist()
        nctx = int(rng.integers(1, 12))
        ctxs = rng.integers(0, nctx, n).tolist()
        enc = _QmEncoder()
        stats = bytearray(nctx)
        for b, cx in zip(bits, ctxs):
            enc.encode(stats, cx, b)
        stream = enc.stuffed().replace(b"\xff\x00", b"\xff")
        dec = _QmDecoder(stream)
        stats2 = bytearray(nctx)
        assert [dec.decode(stats2, cx) for cx in ctxs] == bits


def test_qm_streams_are_marker_safe():
    """Every 0xFF in the entropy output must be followed by 0x00 —
    otherwise a scan byte would alias a marker."""
    rng = np.random.default_rng(13)
    for _ in range(20):
        n = int(rng.integers(50, 2000))
        bits = (rng.random(n) < 0.9).astype(int).tolist()
        enc = _QmEncoder()
        stats = bytearray(4)
        for i, b in enumerate(bits):
            enc.encode(stats, i & 3, b)
        s = enc.stuffed()
        for i, byte in enumerate(s[:-1]):
            if byte == 0xFF:
                assert s[i + 1] == 0x00


@pytest.mark.parametrize(
    "shape", [(8, 8), (16, 16), (37, 53), (120, 176), (64, 64, 3)]
)
def test_arith_equals_huffman_self(shape):
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    got = decode_jpeg(encode_jpeg_arith(img))
    ref = decode_jpeg(encode_jpeg(img))
    assert np.array_equal(got, ref)


def test_arith_restart_interval_self():
    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg_arith(img, restart_interval=5))
    ref = decode_jpeg(encode_jpeg(img))
    assert np.array_equal(got, ref)


def test_arith_12bit_self():
    rng = np.random.default_rng(23)
    img = rng.integers(0, 4096, (24, 40), dtype=np.uint16)
    got = decode_jpeg(encode_jpeg_arith(img, precision=12))
    ref = decode_jpeg(encode_jpeg(img, precision=12))
    assert got.dtype == np.uint16
    assert np.array_equal(got, ref)


def test_arith_probe_and_quality_table():
    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    q50 = np.clip(np.arange(1, 65, dtype=np.int32), 1, 255)
    blob = encode_jpeg_arith(img, qtable=q50)
    assert jpeg_probe(blob) == (40, 56, 1)
    got = decode_jpeg(blob)
    ref = decode_jpeg(encode_jpeg(img, qtable=q50))
    assert np.array_equal(got, ref)


def test_arith_corrupt_streams_raise_named_error():
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    blob = bytearray(encode_jpeg_arith(img))
    mut = np.random.default_rng(37)
    for _ in range(60):
        b = bytearray(blob)
        mode = mut.integers(0, 3)
        if mode == 0:  # truncate
            b = b[: int(mut.integers(4, len(b)))]
        elif mode == 1:  # bit flip
            i = int(mut.integers(2, len(b)))
            b[i] ^= 1 << int(mut.integers(0, 8))
        else:  # splice garbage
            i = int(mut.integers(2, len(b)))
            b[i : i + 4] = bytes(mut.integers(0, 256, 4).tolist())
        try:
            decode_jpeg(bytes(b))
        except JpegParseError:
            pass  # the one named error the crawl kernels catch


def test_dac_conditioning_validation():
    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    blob = bytearray(encode_jpeg_arith(img))
    i = blob.find(b"\xff\xcc")
    assert i > 0
    # DC conditioning byte: L in the low nibble must be <= U
    b = bytearray(blob)
    b[i + 5] = 0x5F  # L=15, U=5 -> invalid
    with pytest.raises(JpegParseError, match="DAC DC conditioning"):
        decode_jpeg(bytes(b))
    b = bytearray(blob)
    b[i + 7] = 0  # Kx = 0 -> invalid
    with pytest.raises(JpegParseError, match="DAC AC Kx"):
        decode_jpeg(bytes(b))


# ------------------------------------------- libjpeg conformance

_LIBJPEG = jpeg_ref.binary() is not None
needs_libjpeg = pytest.mark.skipif(
    not _LIBJPEG, reason="cc or arithmetic-capable libjpeg unavailable"
)


@needs_libjpeg
@pytest.mark.parametrize(
    "kw,shape",
    [
        (dict(), (40, 56)),
        (dict(ri=3), (40, 56)),
        (dict(prog=1), (40, 56)),
        (dict(), (33, 47, 3)),
        (dict(hs=2, vs=2), (64, 80, 3)),
        (dict(hs=2, vs=1, prog=1), (50, 66, 3)),
        (dict(hs=2, vs=2, prog=1, ri=4), (48, 64, 3)),
    ],
    ids=[
        "gray-seq", "gray-seq-ri3", "gray-prog", "rgb-444",
        "rgb-420", "rgb-422-prog", "rgb-420-prog-ri4",
    ],
)
def test_decode_parity_on_libjpeg_streams(kw, shape):
    """Decoding libjpeg's arithmetic stream must give bit-identical
    pixels to decoding libjpeg's Huffman stream of the same image —
    identical coefficients through our shared IDCT tail."""
    rng = np.random.default_rng(43)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    a = decode_jpeg(jpeg_ref.encode(img, arith=1, **kw))
    h = decode_jpeg(jpeg_ref.encode(img, arith=0, **kw))
    assert np.array_equal(a, h)


@needs_libjpeg
def test_libjpeg_decodes_our_arith_streams():
    rng = np.random.default_rng(47)
    for shape in [(16, 16), (37, 53), (64, 64, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        a = jpeg_ref.decode(encode_jpeg_arith(img))
        h = jpeg_ref.decode(encode_jpeg(img))
        assert np.array_equal(a, h)
    img = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    a = jpeg_ref.decode(encode_jpeg_arith(img, restart_interval=5))
    h = jpeg_ref.decode(encode_jpeg(img))
    assert np.array_equal(a, h)


@needs_libjpeg
@pytest.mark.parametrize("arith", [0, 1], ids=["huffman", "arith"])
@pytest.mark.parametrize(
    "kw",
    [dict(), dict(hs=2, vs=2), dict(ri=3)],
    ids=["444", "420", "ri3"],
)
def test_noninterleaved_multiscan_parity(arith, kw):
    """libjpeg scan scripts (one sequential scan per component) must
    decode bit-identically to the interleaved stream — for both
    entropy coders, subsampled and restart-interval variants."""
    rng = np.random.default_rng(79)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    ni = decode_jpeg(jpeg_ref.encode(img, arith=arith, prog=2, **kw))
    il = decode_jpeg(jpeg_ref.encode(img, arith=arith, prog=0, **kw))
    assert np.array_equal(ni, il)
