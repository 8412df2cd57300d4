"""Clean-room JPEG 2000 codec (sources/j2k.py): MQ coder, Tier-1,
tag trees, 5/3 DWT, and full codestream round-trips — all written
from ISO/IEC 15444-1 / ITU-T T.800 with no external binding.
Closes the reference's rasterio-only JP2 ingest path
(tiff2octree.py:673-678) for this container."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hortacloud_importer_spark.sources.j2k import (
    J2kParseError,
    J2kUnsupported,
    MQDecoder,
    MQEncoder,
    TagTree,
    decode_j2k,
    dwt_forward,
    dwt_inverse,
    encode_j2k,
    t1_decode_block,
    t1_encode_block,
)


# ------------------------------------------------------------ MQ coder


def test_mq_roundtrip_random_contexts():
    rng = np.random.default_rng(0)
    for _ in range(40):
        n = int(rng.integers(1, 300))
        bits = rng.integers(0, 2, size=n).tolist()
        ctxs = rng.integers(0, 19, size=n).tolist()
        enc = MQEncoder()
        for c, b in zip(ctxs, bits):
            enc.encode(int(c), int(b))
        dec = MQDecoder(enc.flush())
        assert [dec.decode(int(c)) for c in ctxs] == bits


def test_mq_stuffed_ff_byte_and_flush_high_bits():
    """Regression: the FLUSH-time stuffed byte can legally exceed
    0x7F (≤ 0x8F); masking it with 0x7F corrupted the stream. This
    exact sequence produced `.. ff 83 ..` at flush."""
    seq = [(0, 1), (9, 0), (5, 0), (5, 0), (14, 1), (5, 0), (16, 1),
           (5, 0), (16, 0), (5, 0), (16, 1), (5, 0), (16, 1), (5, 0),
           (16, 1), (5, 0), (16, 0), (5, 1), (12, 0), (16, 1),
           (16, 0), (15, 1)]
    enc = MQEncoder()
    for c, b in seq:
        enc.encode(c, b)
    data = enc.flush()
    assert b"\xff" in data  # the stream really exercises stuffing
    dec = MQDecoder(data)
    assert [dec.decode(c) for c, _ in seq] == [b for _, b in seq]


def test_mq_decoder_survives_truncation_deterministically():
    """Annex C: past the stream end the decoder synthesizes 0xFF
    bytes — truncated input decodes without raising."""
    enc = MQEncoder()
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=64).tolist()
    for b in bits:
        enc.encode(0, int(b))
    data = enc.flush()
    dec = MQDecoder(data[: max(1, len(data) // 2)])
    out = [dec.decode(0) for _ in bits]
    assert len(out) == len(bits)  # no exception, deterministic length


# ------------------------------------------------------------ tag tree


def test_tag_tree_roundtrip():
    rng = np.random.default_rng(2)
    for w, h in [(1, 1), (3, 2), (5, 7), (8, 8)]:
        vals = rng.integers(0, 6, size=(h, w))
        enc_tree = TagTree(w, h)
        for y in range(h):
            for x in range(w):
                enc_tree.set_value(x, y, int(vals[y, x]))
        enc_tree.finalize()
        bits: list[int] = []
        for y in range(h):
            for x in range(w):
                enc_tree.encode(x, y, int(vals[y, x]) + 1, bits.append)
        dec_tree = TagTree(w, h)
        it = iter(bits)
        for y in range(h):
            for x in range(w):
                k = 1
                while not dec_tree.decode(x, y, k, lambda: next(it)):
                    k += 1
                assert dec_tree.leaf_value(x, y) == vals[y, x]


# ------------------------------------------------------------- 5/3 DWT


def test_dwt_53_perfect_reconstruction():
    rng = np.random.default_rng(3)
    for shape in [(1, 1), (1, 17), (16, 16), (31, 45), (100, 70)]:
        for levels in range(0, 4):
            a = rng.integers(-(1 << 15), 1 << 15, size=shape).astype(np.int64)
            assert np.array_equal(dwt_inverse(dwt_forward(a, levels)), a)


# ------------------------------------------------------------- Tier-1


@pytest.mark.parametrize("band", ["LL", "HL", "LH", "HH"])
def test_t1_block_roundtrip(band):
    rng = np.random.default_rng(4)
    for _ in range(8):
        h, w = int(rng.integers(1, 65)), int(rng.integers(1, 65))
        mag = 1 << int(rng.integers(1, 16))
        blk = rng.integers(-mag, mag, size=(h, w)).astype(np.int32)
        data, nplanes, npasses = t1_encode_block(blk, band)
        if nplanes == 0:
            assert not blk.any()
            continue
        out = t1_decode_block(data, w, h, band, nplanes, npasses)
        assert np.array_equal(out, blk)


def test_t1_sparse_blocks_use_runlength_mode():
    """Mostly-zero blocks (the microscopy case) compress well — the
    run-length cleanup mode is what makes that happen."""
    blk = np.zeros((64, 64), dtype=np.int32)
    blk[10, 3] = 9000
    blk[50, 60] = -12345
    data, nplanes, npasses = t1_encode_block(blk, "LL")
    out = t1_decode_block(data, 64, 64, "LL", nplanes, npasses)
    assert np.array_equal(out, blk)
    assert len(data) < 64  # 4096 coefficients in under 64 bytes


# ------------------------------------------------------ full codestream


@pytest.mark.parametrize(
    "shape,dtype,levels",
    [
        ((5, 7), np.uint8, 1),
        ((31, 45), np.uint8, 2),
        ((64, 64), np.uint16, 3),
        ((100, 70), np.uint16, 0),
        ((257, 129), np.uint16, 5),
        ((1, 1), np.uint8, 0),
    ],
)
def test_codestream_roundtrip_grey(shape, dtype, levels):
    rng = np.random.default_rng(5)
    a = rng.integers(0, np.iinfo(dtype).max, size=shape, dtype=dtype)
    out = decode_j2k(encode_j2k(a, levels=levels))
    assert out.dtype == dtype
    assert np.array_equal(out[:, :, 0], a)


def test_codestream_roundtrip_rgb_with_rct():
    rng = np.random.default_rng(6)
    a = rng.integers(0, 255, size=(50, 60, 3), dtype=np.uint8)
    out = decode_j2k(encode_j2k(a, levels=2))
    assert np.array_equal(out, a)


def test_codestream_roundtrip_smooth_compresses():
    """Smooth microscopy-like data must land well under 1x raw size
    (lossless), and still reconstruct exactly."""
    yy, xx = np.mgrid[0:128, 0:96]
    a = (
        3000 * np.exp(-((yy - 64) ** 2 + (xx - 48) ** 2) / 500.0)
    ).astype(np.uint16)
    data = encode_j2k(a, levels=3)
    assert len(data) < a.nbytes / 2
    assert np.array_equal(decode_j2k(data)[:, :, 0], a)


def test_codestream_small_codeblocks_and_progressions():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 65535, size=(40, 56), dtype=np.uint16)
    for cb in [(16, 16), (32, 8)]:
        for prog in [0, 1, 2, 4]:  # LRCP RLCP RPCL CPRL
            out = decode_j2k(encode_j2k(a, levels=2, cb=cb, prog=prog))
            assert np.array_equal(out[:, :, 0], a)


def test_unsupported_features_gate_with_names():
    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    cs = bytearray(encode_j2k(a, levels=1))

    def _patch_cod(data: bytearray, offset_from_len: int, value: int):
        pos = 2
        while pos < len(data):
            marker, length = struct.unpack(">HH", data[pos : pos + 4])
            if marker == 0xFF52:
                data[pos + 2 + offset_from_len] = value
                return
            pos += 2 + length
        raise AssertionError("no COD marker")

    bad = bytearray(cs)
    _patch_cod(bad, 11, 0)  # transformation -> 9/7, but QCD stays
    # style 0: inconsistent header is a parse error (9/7 itself
    # decodes when scalar quantization is declared)
    with pytest.raises(J2kParseError, match="no-quantization"):
        decode_j2k(bytes(bad))

    bad = bytearray(cs)
    _patch_cod(bad, 10, 0x40)  # reserved code-block style bit
    with pytest.raises(J2kUnsupported, match="code-block style"):
        decode_j2k(bytes(bad))


def test_truncated_and_garbage_streams_parse_error():
    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = encode_j2k(a, levels=1)
    with pytest.raises(J2kParseError):
        decode_j2k(data[:30])
    with pytest.raises(J2kParseError):
        decode_j2k(b"not a codestream at all")


def test_fuzz_roundtrip_mixed():
    """Property fuzz across shapes, depths, block sizes, levels."""
    rng = np.random.default_rng(8)
    for _ in range(15):
        h = int(rng.integers(1, 90))
        w = int(rng.integers(1, 90))
        dt = np.uint16 if rng.integers(0, 2) else np.uint8
        levels = int(rng.integers(0, 4))
        a = rng.integers(0, np.iinfo(dt).max, size=(h, w), dtype=dt)
        out = decode_j2k(encode_j2k(a, levels=levels))
        assert np.array_equal(out[:, :, 0], a), (h, w, dt, levels)


def test_review_gates_signed_rgn_and_error_contract():
    """Round-8 review: signed components and RGN/POC/PPM must gate
    (not silently corrupt), and truncated segments must surface as
    J2kParseError, never raw struct.error/ValueError."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 65535, (21, 34), dtype=np.uint16)
    enc = encode_j2k(img)

    # Ssiz sign bit: signed components now DECODE (round-trip pinned
    # in test_signed_components_round_trip); flipping the bit on an
    # unsigned stream is a pure reinterpretation — same coefficients,
    # no DC level shift, int16 output
    i = enc.find(b"\xff\x51")
    ba = bytearray(enc)
    ba[i + 4 + 36] |= 0x80  # first component's Ssiz
    reint = decode_j2k(bytes(ba))
    assert reint.dtype == np.int16
    assert np.array_equal(
        reint[:, :, 0].astype(np.int64), img.astype(np.int64) - 32768
    )

    # RGN maxshift now DECODES (test_rgn_maxshift_roi_round_trip);
    # the explicit-ROI style (Srgn != 0) still gates by name
    rgn = b"\xff\x5e" + struct.pack(">H", 5) + b"\x00\x01\x05"
    k = enc.find(b"\xff\x90")
    with pytest.raises(J2kUnsupported, match="maxshift"):
        decode_j2k(enc[:k] + rgn + enc[k:])

    # short-but-self-consistent COD (Lcod admits 5 bytes): the inner
    # unpack raises ValueError; the public API must wrap it
    c = enc.find(b"\xff\x52")
    lcod = struct.unpack(">H", enc[c + 2 : c + 4])[0]
    bad = (
        enc[:c]
        + b"\xff\x52"
        + struct.pack(">H", 7)
        + enc[c + 4 : c + 9]
        + enc[c + 2 + lcod :]
    )
    with pytest.raises(J2kParseError):
        decode_j2k(bad)

    # truncated inside SOT: struct.error inside -> J2kParseError out
    s = enc.find(b"\xff\x90")
    with pytest.raises(J2kParseError):
        decode_j2k(enc[: s + 6])


def test_multitile_roundtrip_grids():
    """Tiled codestreams (the layout slide/slice scanners emit):
    exact roundtrip across ragged grids, depths, and RCT."""
    rng = np.random.default_rng(11)
    cases = [
        ((100, 140), (64, 64), np.uint8, 2),
        ((65, 64), (32, 32), np.uint16, 1),
        # levels=0: any tile size is 2^0-aligned, and the (50, 17)
        # grid forces short anchored code-blocks at tile origins
        ((50, 50), (50, 17), np.uint8, 0),
        ((81, 77), (32, 40), np.uint16, 3),
        # aligned but non-multiple-of-cbw origins: tile x origin 48
        # splits the first block row of every band
        ((70, 100), (48, 32), np.uint8, 2),
    ]
    for shape, tile, dt, levels in cases:
        a = rng.integers(0, np.iinfo(dt).max, shape, dtype=dt)
        out = decode_j2k(encode_j2k(a, tile=tile, levels=levels))
        assert np.array_equal(out[:, :, 0], a), (shape, tile, dt)
    img = rng.integers(0, 255, (70, 90, 3), dtype=np.uint8)
    assert np.array_equal(decode_j2k(encode_j2k(img, tile=(32, 48))), img)


def test_multitile_out_of_order_and_coverage():
    """Tile-parts may appear in any order; missing or duplicate
    tiles are parse errors, not silent holes."""
    rng = np.random.default_rng(13)
    a = rng.integers(0, 255, (64, 96), dtype=np.uint8)
    enc = encode_j2k(a, tile=(48, 32), levels=1)

    # split codestream into header, per-tile chunks, EOC
    sots = []
    p = enc.find(b"\xff\x90")
    head = enc[:p]
    while p < len(enc) - 2:
        (psot,) = struct.unpack(">I", enc[p + 6 : p + 10])
        sots.append(enc[p : p + psot])
        p += psot
    assert enc[p:] == b"\xff\xd9" and len(sots) == 4

    # reversed tile order decodes identically
    shuffled = head + b"".join(reversed(sots)) + b"\xff\xd9"
    assert np.array_equal(decode_j2k(shuffled)[:, :, 0], a)

    # a dropped tile is a hard error
    with pytest.raises(J2kParseError, match="3 of 4 tiles"):
        decode_j2k(head + b"".join(sots[:3]) + b"\xff\xd9")

    # a duplicated tile-part (same isot, same tpsot) is a hard error
    with pytest.raises(J2kParseError, match="not contiguous"):
        decode_j2k(head + b"".join(sots + [sots[0]]) + b"\xff\xd9")


def test_anchored_block_partition_and_misaligned_grid():
    """T.800 B.7: code-blocks anchor at canvas (0,0), so a tile whose
    band origin is not a block multiple starts with a short block;
    multi-tile grids NOT aligned to 2^levels decode exactly (band
    geometry follows the B-15 ceil formulas, lane parity included)."""
    from hortacloud_importer_spark.sources.j2k import _Band

    # band 89 wide at origin 25 under 64-wide blocks: anchored grid
    # is [25,64),[64,89+25=114) -> widths 39 and 50
    b = _Band("HL", 10, 89, 64, 64, 10, ox=25, oy=0)
    assert (b.ncx, b.ncy) == (2, 1)
    assert b.block_rect(0, 0) == (0, 0, 10, 39)
    assert b.block_rect(1, 0) == (0, 39, 10, 50)
    # origin at a block multiple reduces to the plain grid
    b0 = _Band("HL", 10, 89, 64, 64, 10, ox=128, oy=0)
    assert (b0.ncx, b0.ncy) == (2, 1)
    assert b0.block_rect(0, 0) == (0, 0, 10, 64)

    # multi-tile grid not aligned to 2^levels round-trips exactly
    rng = np.random.default_rng(61)
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    out = decode_j2k(encode_j2k(img, tile=(27, 40), levels=3))
    assert np.array_equal(out[:, :, 0], img)


def test_tile_parts_and_pcrl():
    """Tile-parts (T.800 A.4.2): a tile's packet stream split across
    SOT segments reassembles by TPsot-ordered concatenation; PLT in
    a tile-part header is skipped; missing parts hard-error; PCRL
    decodes via the degenerate single-precinct sequence."""
    rng = np.random.default_rng(23)
    a = rng.integers(0, 65535, (60, 90), dtype=np.uint16)
    for tp in (2, 3, 99):
        out = decode_j2k(encode_j2k(a, levels=2, tile_parts=tp))
        assert np.array_equal(out[:, :, 0], a), tp
    img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    out = decode_j2k(encode_j2k(img, tile=(32, 32), tile_parts=2))
    assert np.array_equal(out, img)
    out = decode_j2k(encode_j2k(a, levels=2, prog=3))  # PCRL
    assert np.array_equal(out[:, :, 0], a)

    # PLT (informational packet lengths) in the tile-part header
    enc = encode_j2k(a, levels=1)
    i = enc.find(b"\xff\x90")
    plt = b"\xff\x58" + struct.pack(">H", 4) + b"\x00\x05"
    psot = struct.unpack(">I", enc[i + 6 : i + 10])[0]
    patched = bytearray(enc[: i + 12] + plt + enc[i + 12 :])
    struct.pack_into(">I", patched, i + 6, psot + len(plt))
    assert np.array_equal(decode_j2k(bytes(patched))[:, :, 0], a)

    # dropping a middle tile-part is a contiguity parse error
    enc3 = encode_j2k(a, levels=2, tile_parts=3)
    sots = []
    p = enc3.find(b"\xff\x90")
    while p != -1:
        ps = struct.unpack(">I", enc3[p + 6 : p + 10])[0]
        sots.append((p, ps))
        p = enc3.find(b"\xff\x90", p + ps)
    assert len(sots) == 3
    cut = (
        enc3[: sots[1][0]]
        + enc3[sots[2][0] : sots[2][0] + sots[2][1]]
        + b"\xff\xd9"
    )
    with pytest.raises(J2kParseError, match="not contiguous"):
        decode_j2k(cut)


def test_quality_layers_roundtrip():
    """Multi-layer codestreams: per-layer inclusion tag-tree
    thresholds, idle-block bits, and cross-packet contribution
    accumulation all roundtrip exactly, across progressions and
    combined with tiling and tile-parts."""
    rng = np.random.default_rng(29)
    a = rng.integers(0, 65535, (60, 90), dtype=np.uint16)
    for layers in (2, 3, 16):
        for prog in (0, 1, 2, 4):
            out = decode_j2k(
                encode_j2k(a, levels=2, layers=layers, prog=prog)
            )
            assert np.array_equal(out[:, :, 0], a), (layers, prog)
    img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    out = decode_j2k(
        encode_j2k(img, tile=(32, 32), layers=3, tile_parts=2)
    )
    assert np.array_equal(out, img)
    # sparse: never-included blocks must stay pending through every
    # layer's tag-tree threshold without desyncing the headers
    sp = np.zeros((128, 128), dtype=np.uint16)
    sp[5, 7] = 9000
    sp[100, 90] = 123
    out = decode_j2k(encode_j2k(sp, levels=3, layers=4))
    assert np.array_equal(out[:, :, 0], sp)


def test_97_dwt_reconstruction_and_normalization():
    """Float 9/7 lifting: perfect reconstruction to 1e-8, and the
    normalization pin — the analysis lowpass taps sum to 1, so a
    constant input must pass through the low band unscaled."""
    from hortacloud_importer_spark.sources.j2k import (
        dwt_forward97,
        dwt_inverse97,
        fwd_9x7_1d,
    )

    rng = np.random.default_rng(31)
    for shape in [(1, 1), (1, 17), (16, 16), (31, 45), (100, 70)]:
        for levels in range(4):
            a = rng.normal(0, 1000, shape)
            rec = dwt_inverse97(dwt_forward97(a, levels))
            assert np.abs(rec - a).max() < 1e-8, (shape, levels)
    s, d = fwd_9x7_1d(np.full((1, 64), 123.0))
    assert np.abs(s - 123.0).max() < 1e-9
    assert np.abs(d).max() < 1e-9


def test_lossy_97_decode_near_lossless_and_live():
    """Irreversible (9/7 + scalar quantization) codestreams decode:
    expounded and derived QCD styles, gray/RGB-ICT, tiles + layers +
    tile-parts — all within the fine-step error bound; patching the
    QCD mu must CHANGE the output (proves the dequantization path is
    live, not a silent lossless fallback)."""
    rng = np.random.default_rng(37)
    img = rng.integers(0, 65535, (60, 90), dtype=np.uint16)
    for quant in (1, 2):
        out = decode_j2k(encode_j2k(img, levels=3, lossy=True, quant=quant))
        err = np.abs(out[:, :, 0].astype(int) - img.astype(int)).max()
        assert err <= 2, (quant, err)
    rgb = rng.integers(0, 255, (50, 60, 3), dtype=np.uint8)
    out = decode_j2k(encode_j2k(rgb, lossy=True))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 3
    big = rng.integers(0, 65535, (96, 130), dtype=np.uint16)
    out = decode_j2k(
        encode_j2k(big, tile=(64, 64), lossy=True, layers=2, tile_parts=2)
    )
    assert np.abs(out[:, :, 0].astype(int) - big.astype(int)).max() <= 2

    enc = bytearray(encode_j2k(img, levels=2, lossy=True))
    i = enc.find(b"\xff\x5c")  # QCD, first band word at i+5
    w = struct.unpack(">H", enc[i + 5 : i + 7])[0]
    struct.pack_into(">H", enc, i + 5, w | 0x7FF)  # mu -> max
    base = decode_j2k(encode_j2k(img, levels=2, lossy=True))
    assert np.abs(
        decode_j2k(bytes(enc)).astype(int) - base.astype(int)
    ).max() > 0


@pytest.mark.parametrize("ph", ["ppt", "ppm"])
def test_packed_headers_roundtrip(ph):
    """PPM/PPT packed packet headers (T.800 A.7.4/A.7.5): the same
    pixels decode whether headers are inline, in per-tile-part PPT
    segments, or in one Nppm-framed main-header PPM segment — across
    tiles, tile-parts, layers, progressions, and the 9/7 path."""
    rng = np.random.default_rng(17)
    for kw in (
        {},
        {"tile": (16, 16)},
        {"tile_parts": 3},
        {"layers": 2},
        {"prog": 2},
        {"tile": (16, 16), "tile_parts": 2, "layers": 2},
    ):
        img = rng.integers(0, 256, (24, 31), dtype=np.uint8)
        plain = decode_j2k(encode_j2k(img, levels=2, **kw))
        packed = decode_j2k(encode_j2k(img, levels=2, **kw, packed_headers=ph))
        assert np.array_equal(packed, plain)
        assert np.array_equal(packed[:, :, 0], img)
    # lossy 9/7 with packed headers
    img = rng.integers(0, 256, (20, 20), dtype=np.uint8)
    out = decode_j2k(encode_j2k(img, levels=1, lossy=True, packed_headers=ph))
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 2


def test_ppm_ppt_mutually_exclusive():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    ppm = encode_j2k(img, levels=1, packed_headers="ppm")
    ppt = encode_j2k(img, levels=1, packed_headers="ppt")
    # splice the PPM segment of one stream into the other's main header
    i = ppm.find(b"\xff\x60")
    ln = struct.unpack(">H", ppm[i + 2 : i + 4])[0]
    seg = ppm[i : i + 2 + ln]
    k = ppt.find(b"\xff\x90")
    hybrid = ppt[:k] + seg + ppt[k:]
    with pytest.raises(J2kParseError, match="mutually exclusive"):
        decode_j2k(hybrid)


def test_packed_headers_corruption_contract_fuzz():
    """The named-error contract extends over the PPM/PPT surfaces."""
    rng = np.random.default_rng(0x99A)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    for ph in ("ppt", "ppm"):
        payload = encode_j2k(
            img, levels=1, tile=(16, 16), tile_parts=2, packed_headers=ph
        )
        for _ in range(120):
            buf = bytearray(payload)
            kind = rng.integers(0, 3)
            if kind == 0 and len(buf) > 12:
                buf = buf[: int(rng.integers(10, len(buf)))]
            elif kind == 1:
                for _ in range(int(rng.integers(1, 5))):
                    buf[int(rng.integers(0, len(buf)))] = int(
                        rng.integers(0, 256)
                    )
            else:
                buf[int(rng.integers(0, len(buf)))] ^= 1 << int(
                    rng.integers(0, 8)
                )
            try:
                decode_j2k(bytes(buf))
            except J2kParseError:
                pass  # J2kUnsupported subclasses it


# ---------------------------------------- QCC component overrides


def test_qcc_per_component_quantization_round_trip():
    """QCC markers override QCD per component: coarsening ONE
    component's table (eps-4 => 16x coarser steps) must degrade that
    component alone — proving the decoder binds each QCC to its
    component, not just parses it."""
    from hortacloud_importer_spark.sources.j2k import decode_j2k, encode_j2k

    rng = np.random.default_rng(83)
    img = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    for target in (0, 1, 2):
        blob = encode_j2k(
            img, lossy=True, quant=2, mct=False,
            qcc_eps_delta={target: -4},
        )
        assert b"\xff\x5d" in blob  # QCC marker emitted
        out = decode_j2k(blob)
        for c in range(3):
            err = int(
                np.abs(out[:, :, c].astype(int) - img[:, :, c].astype(int)).max()
            )
            if c == target:
                assert 1 <= err <= 16, (target, c, err)
            else:
                assert err == 0, (target, c, err)


def test_qcc_degenerate_override_matches_no_qcc():
    from hortacloud_importer_spark.sources.j2k import decode_j2k, encode_j2k

    rng = np.random.default_rng(89)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    plain = decode_j2k(encode_j2k(img, lossy=True, quant=2, mct=False))
    with_qcc = decode_j2k(
        encode_j2k(
            img, lossy=True, quant=2, mct=False,
            qcc_eps_delta={0: 0, 1: 0, 2: 0},
        )
    )
    assert np.array_equal(plain, with_qcc)


def test_qcc_errors_are_named():
    from hortacloud_importer_spark.sources.j2k import (
        J2kParseError,
        decode_j2k,
        encode_j2k,
    )

    rng = np.random.default_rng(97)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    with pytest.raises(J2kParseError, match="lossy"):
        encode_j2k(img, qcc_eps_delta={0: 1})
    with pytest.raises(J2kParseError, match="missing component"):
        encode_j2k(img, lossy=True, qcc_eps_delta={7: 1})
    blob = bytearray(
        encode_j2k(img, lossy=True, quant=2, mct=False,
                   qcc_eps_delta={1: -2})
    )
    i = blob.find(b"\xff\x5d")
    b = bytearray(blob)
    b[i + 4] = 9  # Cqcc -> missing component
    with pytest.raises(J2kParseError, match="names component"):
        decode_j2k(bytes(b))
    # corruption inside the QCC body stays a named error
    import random

    rnd = random.Random(0x9CC)
    for _ in range(150):
        b = bytearray(blob)
        at = rnd.randrange(i, min(i + 40, len(b)))
        b[at] = rnd.randrange(256)
        try:
            decode_j2k(bytes(b))
        except J2kParseError:
            pass


# ------------------------------------------- RGN (maxshift ROI)


def test_rgn_maxshift_roi_round_trip():
    """T.800 Annex H maxshift: ROI-upshifted coefficients decode
    losslessly alongside the background — reversible 5/3, tiled
    multi-component, and the scalar-quantized 9/7 path."""
    from hortacloud_importer_spark.sources.j2k import decode_j2k, encode_j2k

    rng = np.random.default_rng(139)
    img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    blob = encode_j2k(
        img, tile=(32, 32), roi=(10, 40, 20, 50), roi_shift=12, mct=False
    )
    assert b"\xff\x5e" in blob  # RGN markers emitted
    assert np.array_equal(decode_j2k(blob), img)
    # lossy path: step fine enough that the roundtrip stays exact
    blob = encode_j2k(
        img, lossy=True, quant=2, mct=False,
        roi=(10, 40, 20, 50), roi_shift=14,
    )
    assert np.array_equal(decode_j2k(blob), img)


def test_rgn_gates_and_errors_are_named():
    from hortacloud_importer_spark.sources.j2k import (
        J2kParseError,
        J2kUnsupported,
        decode_j2k,
        encode_j2k,
    )

    rng = np.random.default_rng(149)
    img = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    # a shift too small to separate ROI from background
    with pytest.raises(J2kParseError, match="too small"):
        encode_j2k(img, roi=(8, 24, 8, 24), roi_shift=2)
    # >31 coded bit-planes gate (16-bit imagery)
    img16 = rng.integers(0, 65536, (32, 32)).astype(np.uint16)
    with pytest.raises(J2kUnsupported, match="bit-planes"):
        encode_j2k(img16, roi=(8, 24, 8, 24), roi_shift=20)
    # decoder-side validation of the marker fields
    blob = bytearray(
        encode_j2k(img, roi=(8, 24, 8, 24), roi_shift=12)
    )
    i = blob.find(b"\xff\x5e")
    b = bytearray(blob)
    b[i + 5] = 1  # Srgn = 1 (explicit ROI) gates by name
    with pytest.raises(J2kUnsupported, match="maxshift"):
        decode_j2k(bytes(b))
    b = bytearray(blob)
    b[i + 4] = 9  # Crgn names a missing component
    with pytest.raises(J2kParseError, match="names component"):
        decode_j2k(bytes(b))


def test_signed_components_round_trip():
    """Signed components (Ssiz bit 7): no DC level shift, int8/int16
    output, exact through 5/3 — incl. the RCT and lossy 9/7 paths."""
    rng = np.random.default_rng(89)
    for dt, lo, hi in ((np.int8, -128, 128), (np.int16, -32768, 32768)):
        img = rng.integers(lo, hi, (33, 29)).astype(dt)
        out = decode_j2k(encode_j2k(img, levels=2))
        assert out.dtype == dt
        assert np.array_equal(out[:, :, 0], img)
    rgb = rng.integers(-128, 128, (16, 16, 3)).astype(np.int8)
    assert np.array_equal(decode_j2k(encode_j2k(rgb, levels=1)), rgb)
    deep = rng.integers(-2000, 2000, (32, 32)).astype(np.int16)
    out = decode_j2k(encode_j2k(deep, levels=2, lossy=True))
    assert out.dtype == np.int16
    assert np.abs(out[:, :, 0].astype(np.int64) - deep).max() <= 2


def test_coc_per_component_overrides_round_trip():
    """Main-header COC: per-component decomposition levels, code-block
    geometry, and the T.800 B.12 packet walk that skips resolutions a
    component does not have — across every progression order, tiles,
    and layers. A deepened component ships its own style-0 QCC."""
    rng = np.random.default_rng(97)
    img = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    for prog in (0, 1, 2, 3, 4):
        blob = encode_j2k(
            img, levels=3, prog=prog,
            coc={1: {"levels": 1, "cb": (16, 16)}, 2: {"levels": 2}},
        )
        assert np.array_equal(decode_j2k(blob), img), prog
    # COC may also DEEPEN a component beyond the COD default
    blob = encode_j2k(img, levels=1, coc={2: {"levels": 3}})
    assert b"\xff\x53" in blob  # a real COC marker is on the wire
    assert np.array_equal(decode_j2k(blob), img)
    # multi-tile + quality layers + COC together
    blob = encode_j2k(
        img, levels=2, tile=(32, 32), layers=3, coc={1: {"levels": 1}}
    )
    assert np.array_equal(decode_j2k(blob), img)
    # signed + COC compose
    si = rng.integers(-3000, 3000, (32, 32, 2)).astype(np.int16)
    blob = encode_j2k(si, levels=2, mct=False, coc={1: {"levels": 1}})
    assert np.array_equal(decode_j2k(blob), si)


def test_coc_gates_stay_named():
    rng = np.random.default_rng(101)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    enc = encode_j2k(img, levels=1, coc={0: {"levels": 2}})
    i = enc.find(b"\xff\x53")
    # Scoc custom-precinct bit without its size bytes -> parse error
    b = bytearray(enc)
    b[i + 5] |= 0x01
    with pytest.raises(J2kParseError, match="precinct-size bytes"):
        decode_j2k(bytes(b))
    # COC naming a missing component -> parse error
    b = bytearray(enc)
    b[i + 4] = 7
    with pytest.raises(J2kParseError, match="COC names"):
        decode_j2k(bytes(b))


def test_component_subsampling_round_trip():
    """Non-unit XRsiz/YRsiz: each component codes on its own sample
    grid (ceil division, odd dims included) and the decoder upsamples
    back to the reference grid by nearest-neighbor replication —
    exact per component because coding is lossless."""
    rng = np.random.default_rng(103)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    blob = encode_j2k(
        img, levels=2, mct=False, subsampling={1: (2, 2), 2: (2, 1)}
    )
    out = decode_j2k(blob)
    assert out.shape == (32, 48, 3)
    assert np.array_equal(out[:, :, 0], img[:, :, 0])
    d1 = np.repeat(np.repeat(img[::2, ::2, 1], 2, 0), 2, 1)[:32, :48]
    assert np.array_equal(out[:, :, 1], d1)
    d2 = np.repeat(img[:, ::2, 2], 2, 1)[:32, :48]
    assert np.array_equal(out[:, :, 2], d2)

    # odd reference dims + rate 3, and composition with COC
    img = rng.integers(0, 65536, (33, 29, 2)).astype(np.uint16)
    blob = encode_j2k(img, levels=1, mct=False, subsampling={1: (3, 2)})
    out = decode_j2k(blob)
    d1 = np.repeat(np.repeat(img[::2, ::3, 1], 2, 0), 3, 1)[:33, :29]
    assert np.array_equal(out[:, :, 0], img[:, :, 0])
    assert np.array_equal(out[:, :, 1], d1)
    blob = encode_j2k(
        img, levels=2, mct=False, subsampling={1: (2, 2)},
        coc={1: {"levels": 1}},
    )
    d1 = np.repeat(np.repeat(img[::2, ::2, 1], 2, 0), 2, 1)[:33, :29]
    assert np.array_equal(decode_j2k(blob)[:, :, 1], d1)


def test_subsampling_gates_stay_named():
    rng = np.random.default_rng(107)
    img = rng.integers(0, 256, (16, 16, 2), dtype=np.uint8)
    enc = encode_j2k(img, levels=1, mct=False, subsampling={1: (2, 2)})
    # shrinking XTsiz makes the 1-tile stream claim 2 tiles: the
    # missing tile is a hard parse error, not a partial decode
    i = enc.find(b"\xff\x51")
    b = bytearray(enc)
    b[i + 4 + 18 : i + 4 + 22] = struct.pack(">I", 8)  # XTsiz = 8
    with pytest.raises(J2kParseError, match="of 2 tiles"):
        decode_j2k(bytes(b))
    # zero rate is a parse error
    b = bytearray(enc)
    b[i + 4 + 36 + 1] = 0  # first component XRsiz = 0
    with pytest.raises(J2kParseError, match="zero component"):
        decode_j2k(bytes(b))


def test_poc_progression_order_changes_round_trip():
    """POC (T.800 A.6.6): multi-segment progression changes reorder
    the packet stream; decode follows the same continuation rule.
    Composes with quality layers and COC per-component levels."""
    rng = np.random.default_rng(109)
    img = rng.integers(0, 256, (48, 40, 3), dtype=np.uint8)
    poc = [(0, 0, 2, 2, 3, 4), (0, 0, 2, 4, 3, 0)]
    blob = encode_j2k(img, levels=3, layers=2, poc=poc)
    assert b"\xff\x5f" in blob  # a real POC marker on the wire
    assert np.array_equal(decode_j2k(blob), img)
    poc = [(0, 0, 1, 4, 3, 1), (0, 0, 3, 2, 3, 2), (0, 0, 3, 4, 3, 0)]
    blob = encode_j2k(
        img, levels=3, layers=3, poc=poc, coc={1: {"levels": 1}}
    )
    assert np.array_equal(decode_j2k(blob), img)


def test_poc_gates_and_coverage_errors():
    rng = np.random.default_rng(113)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    enc = encode_j2k(img, levels=2, poc=[(0, 0, 1, 3, 1, 2)])
    i = enc.find(b"\xff\x5f")
    # an undercovering POC (REpoc shrunk) is a parse error, not a
    # silent partial decode
    b = bytearray(enc)
    b[i + 8] = 1  # REpoc: only resolution 0
    with pytest.raises(J2kParseError, match="cover"):
        decode_j2k(bytes(b))
    # reserved progression in a POC entry gates by name
    b = bytearray(enc)
    b[i + 10] = 7  # Ppoc
    with pytest.raises(J2kUnsupported, match="POC progression"):
        decode_j2k(bytes(b))


def test_poc_with_tile_overrides_decodes():
    """POC + per-tile coding overrides: the coverage check and the
    packet walk both recompute from each tile's RESOLVED parameters
    (ADVICE r10 asked for the gate or the recompute — this is the
    recompute), so a tile-header COC no longer desyncs the walk."""
    import struct as _s

    rng = np.random.default_rng(113)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    enc = encode_j2k(img, levels=2, poc=[(0, 0, 1, 3, 1, 2)])
    sot = enc.find(b"\xff\x90")
    assert sot > 0
    psot = _s.unpack(">I", enc[sot + 6 : sot + 10])[0]
    # splice a structurally-valid COC into the tile header (after the
    # 12-byte SOT segment) and grow Psot to match; its parameters
    # agree with the main header, so the decode must still be exact
    coc = b"\xff\x53" + _s.pack(">H", 9) + bytes([0, 0, 2, 4, 4, 0, 1])
    b = bytearray(enc[: sot + 12] + coc + enc[sot + 12 :])
    if psot:
        b[sot + 6 : sot + 10] = _s.pack(">I", psot + len(coc))
    assert np.array_equal(decode_j2k(bytes(b))[:, :, 0], img)
    # a tile COC RAISING the level count outgrows the main QCD's band
    # table — a parse error, never a silent mis-walk
    coc = b"\xff\x53" + _s.pack(">H", 9) + bytes([0, 0, 3, 4, 4, 0, 1])
    b = bytearray(enc[: sot + 12] + coc + enc[sot + 12 :])
    if psot:
        b[sot + 6 : sot + 10] = _s.pack(">I", psot + len(coc))
    with pytest.raises(J2kParseError, match="band count"):
        decode_j2k(bytes(b))
    # encoder-side composition: POC + tile_overrides round-trips
    img2 = rng.integers(0, 65536, (64, 64)).astype(np.uint16)
    blob = encode_j2k(
        img2, levels=2, tile=(32, 32), layers=2,
        poc=[(0, 0, 2, 3, 1, 2)],
        tile_overrides={1: {"levels": 1}, 2: {"layers": 1}},
    )
    assert np.array_equal(decode_j2k(blob)[:, :, 0], img2)


def test_per_tile_cod_qcd_overrides_round_trip():
    """Tile-header COD/QCD (T.800 A.6 precedence): per-tile
    decomposition levels, code-block geometry, quality layers, and
    progression order, each resolved for that tile only."""
    rng = np.random.default_rng(127)
    img = rng.integers(0, 65536, (64, 64)).astype(np.uint16)
    blob = encode_j2k(
        img, levels=1, tile=(32, 32),
        tile_overrides={1: {"levels": 3, "cb": (16, 16)},
                        2: {"layers": 3}, 3: {"prog": 4}},
    )
    # real tile-header markers on the wire: a COD after the first SOT
    sot = blob.find(b"\xff\x90", blob.find(b"\xff\x90") + 2)
    assert b"\xff\x52" in blob[sot:]
    assert np.array_equal(decode_j2k(blob)[:, :, 0], img)
    # MCT + per-tile levels; multi tile-parts with overrides
    rgb = rng.integers(0, 256, (64, 32, 3), dtype=np.uint8)
    blob = encode_j2k(rgb, levels=2, tile=(32, 32),
                      tile_overrides={0: {"levels": 1}})
    assert np.array_equal(decode_j2k(blob), rgb)
    blob = encode_j2k(img, levels=2, tile=(32, 32), tile_parts=3,
                      tile_overrides={2: {"levels": 3, "layers": 2}})
    assert np.array_equal(decode_j2k(blob)[:, :, 0], img)


def test_per_tile_override_placement_rules():
    rng = np.random.default_rng(131)
    img = rng.integers(0, 65536, (64, 64)).astype(np.uint16)
    enc = encode_j2k(img, levels=1, tile=(32, 32), tile_parts=2,
                     tile_overrides={1: {"levels": 2}})
    # relocate the tile COD into a LATER tile-part: spec violation,
    # named parse error. Find tile 1's part-1 SOT and splice a COD in.
    import struct as _s
    pos = 2
    sots = []
    while True:
        i = enc.find(b"\xff\x90", pos)
        if i < 0:
            break
        isot, _psot, tpsot = _s.unpack(">HIB", enc[i + 4 : i + 11])
        sots.append((i, isot, tpsot))
        pos = i + 2
    late = next(i for i, isot, tp in sots if isot == 1 and tp == 1)
    cod = b"\xff\x52" + _s.pack(">HBBHB", 12, 0, 0, 1, 0) + bytes(
        [1, 4, 4, 0, 1]
    )
    bad = enc[: late + 12] + cod + enc[late + 12 :]
    # psot now lies; either the placement error or a length error is
    # fine — but it must be the NAMED error type
    with pytest.raises((J2kParseError, J2kUnsupported)):
        decode_j2k(bad)


def test_round10_feature_streams_fuzz_named_errors_only():
    """Corruption over streams exercising every round-10 feature
    (COC, POC, subsampling, tile overrides, signed) must raise
    J2kParseError (J2kUnsupported is a subclass) — never a raw
    TypeError/IndexError from the new parse paths."""
    rng = np.random.default_rng(211)
    img8 = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    bases = [
        encode_j2k(img8, levels=2, coc={1: {"levels": 1}}),
        encode_j2k(img8, levels=2, layers=2, poc=[(0, 0, 2, 3, 3, 2)]),
        encode_j2k(img8, levels=1, mct=False, subsampling={1: (2, 2)}),
        encode_j2k(
            rng.integers(0, 65536, (64, 64)).astype(np.uint16),
            levels=1, tile=(32, 32), tile_overrides={1: {"levels": 2}},
        ),
        encode_j2k(
            rng.integers(-128, 128, (24, 24)).astype(np.int8), levels=1
        ),
    ]
    for base in bases:
        for t in range(150):
            b = bytearray(base)
            mode = t % 3
            if mode == 0:
                b = b[: int(rng.integers(1, len(b)))]
            elif mode == 1:
                i = int(rng.integers(0, len(b)))
                b[i] ^= 1 << int(rng.integers(0, 8))
            else:
                i = int(rng.integers(0, len(b)))
                b[i : i + 4] = bytes(rng.integers(0, 256, 4).tolist())
            try:
                decode_j2k(bytes(b))
            except J2kParseError:
                pass  # the one named contract


def test_geometry_corruption_raises_named_errors_only():
    """Corruption fuzz over the NEW geometry surface (misaligned
    tiles + image/tile offsets + tile-header POC): truncations, bit
    flips, and 4-byte stomps must surface as J2kParseError (incl.
    its J2kUnsupported subclass), never raw struct/Index/Value
    errors or a hang — SIZ offset fields are prime stomp targets."""
    rng = np.random.default_rng(271)
    base = encode_j2k(
        rng.integers(0, 65536, (40, 44)).astype(np.uint16),
        levels=2, tile=(13, 11), cb=(8, 8), layers=2,
        offsets=(5, 3, 2, 1),
        tile_overrides={1: {"poc": [(0, 0, 2, 3, 1, 2)]}},
    )
    for t in range(300):
        b = bytearray(base)
        mode = t % 3
        if mode == 0:
            b = b[: int(rng.integers(1, len(b)))]
        elif mode == 1:
            i = int(rng.integers(0, len(b)))
            b[i] ^= 1 << int(rng.integers(0, 8))
        else:
            i = int(rng.integers(0, len(b)))
            b[i : i + 4] = bytes(rng.integers(0, 256, 4).tolist())
        try:
            decode_j2k(bytes(b))
        except J2kParseError:
            pass  # the one named contract


def test_subsampling_with_aligned_multi_tile_grid():
    """Tiled + subsampled: every tile origin lands on the component
    grid 2^levels-aligned, per-component band anchors included —
    partial edge tiles and ceil-divided component rects round-trip."""
    rng = np.random.default_rng(137)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    blob = encode_j2k(img, levels=2, mct=False, tile=(32, 32),
                      subsampling={1: (2, 2), 2: (2, 2)})
    out = decode_j2k(blob)
    assert np.array_equal(out[:, :, 0], img[:, :, 0])
    for ci in (1, 2):
        d = np.repeat(np.repeat(img[::2, ::2, ci], 2, 0), 2, 1)
        assert np.array_equal(out[:, :, ci], d)
    img = rng.integers(0, 65536, (48, 80, 2)).astype(np.uint16)
    blob = encode_j2k(img, levels=1, mct=False, tile=(32, 32),
                      subsampling={1: (2, 2)})
    out = decode_j2k(blob)
    assert np.array_equal(out[:, :, 0], img[:, :, 0])
    d = np.repeat(np.repeat(img[::2, ::2, 1], 2, 0), 2, 1)[:48, :80]
    assert np.array_equal(out[:, :, 1], d)
    # a MISALIGNED grid (xt not divisible by rate*2^levels) decodes
    # exactly too: each tile-component anchors on its own grid with
    # ceil bounds (T.800 B.5), rate-3 sampling included
    blob = encode_j2k(img, levels=2, mct=False, tile=(32, 32),
                      subsampling={1: (3, 2)})
    out = decode_j2k(blob)
    assert np.array_equal(out[:, :, 0], img[:, :, 0])
    d = np.repeat(np.repeat(img[::2, ::3, 1], 2, 0), 3, 1)[:48, :80]
    assert np.array_equal(out[:, :, 1], d)


def test_misaligned_tile_grids_round_trip():
    """Multi-tile grids NOT aligned to 2^levels (and not to a
    subsampled component's rate x 2^levels): tile-component band
    geometry follows the exact T.800 B-15 ceil formulas and the
    lifting splits lanes by CANVAS parity, so arbitrary tile origins
    decode exactly — the last geometry gate of rounds <= 10."""
    rng = np.random.default_rng(241)
    for (h, w, lv, t) in [(33, 29, 2, (10, 12)), (64, 64, 3, (17, 9)),
                          (21, 40, 1, (7, 7)), (16, 16, 2, (5, 16))]:
        img = rng.integers(0, 65536, (h, w)).astype(np.uint16)
        blob = encode_j2k(img, levels=lv, tile=t, cb=(8, 8))
        assert np.array_equal(decode_j2k(blob)[:, :, 0], img), (h, w, lv, t)
    # misaligned + subsampled multi-tile (the VERDICT r10 gate)
    img = rng.integers(0, 256, (33, 29, 2), dtype=np.uint8)
    blob = encode_j2k(img, levels=2, mct=False, subsampling={1: (2, 2)},
                      tile=(10, 12), cb=(8, 8))
    out = decode_j2k(blob)
    assert np.array_equal(out[:, :, 0], img[:, :, 0])
    d1 = np.repeat(np.repeat(img[::2, ::2, 1], 2, 0), 2, 1)[:33, :29]
    assert np.array_equal(out[:, :, 1], d1)
    # misaligned + MCT + layers, every progression (position orders
    # come from the exact reference-grid precinct positions)
    img = rng.integers(0, 256, (30, 34, 3), dtype=np.uint8)
    for prog in range(5):
        blob = encode_j2k(img, levels=2, tile=(13, 11), layers=2,
                          prog=prog, cb=(8, 8))
        assert np.array_equal(decode_j2k(blob), img), prog
    # misaligned + lossy 9/7 (parity-aware float lifting)
    img = rng.integers(0, 256, (40, 44), dtype=np.uint8)
    blob = encode_j2k(img, levels=2, tile=(13, 17), lossy=True, cb=(8, 8))
    d = np.abs(decode_j2k(blob)[:, :, 0].astype(np.int64) - img)
    assert d.max() <= 2
    # misaligned + precincts + POC + styles + ppt tile-parts
    img = rng.integers(0, 65536, (48, 48)).astype(np.uint16)
    blob = encode_j2k(img, levels=2, tile=(13, 19), cb=(8, 8),
                      precincts=[(3, 3), (3, 3), (4, 4)], layers=2,
                      poc=[(0, 0, 2, 2, 1, 3), (0, 0, 2, 3, 1, 4)])
    assert np.array_equal(decode_j2k(blob)[:, :, 0], img)
    img = rng.integers(0, 256, (26, 31), dtype=np.uint8)
    blob = encode_j2k(img, levels=2, tile=(9, 14), cb=(8, 8),
                      termall=True, bypass=True, segsym=True,
                      tile_parts=2, packed_headers="ppt")
    assert np.array_equal(decode_j2k(blob)[:, :, 0], img)


def test_image_and_tile_grid_offsets_round_trip():
    """Nonzero XOsiz/YOsiz/XTOsiz/YTOsiz (T.800 B.3/B.4): the image
    area anchors inside the reference grid, tiles anchor at the tile
    offset and clip to the image area, components anchor at
    ceil(offset/rate) on their own grids — previously a named gate."""
    rng = np.random.default_rng(251)
    for (off, t) in [((5, 3, 2, 1), (16, 16)), ((7, 7, 7, 7), None),
                     ((1, 2, 0, 0), (13, 9)), ((9, 5, 4, 4), (8, 8))]:
        img = rng.integers(0, 256, (40, 44), dtype=np.uint8)
        blob = encode_j2k(img, levels=2, cb=(8, 8), tile=t, offsets=off)
        out = decode_j2k(blob)
        assert out.shape[:2] == (40, 44), (off, t)
        assert np.array_equal(out[:, :, 0], img), (off, t)
    # SIZ carries the offsets on the wire
    i = blob.find(b"\xff\x51")
    assert struct.unpack(">II", blob[i + 4 + 10 : i + 4 + 18]) == (9, 5)
    assert struct.unpack(">II", blob[i + 4 + 26 : i + 4 + 34]) == (4, 4)
    # offsets + MCT + layers; offsets + lossy
    img = rng.integers(0, 256, (30, 34, 3), dtype=np.uint8)
    blob = encode_j2k(img, levels=2, tile=(13, 11), layers=2,
                      offsets=(6, 2, 3, 1), cb=(8, 8))
    assert np.array_equal(decode_j2k(blob), img)
    img = rng.integers(0, 256, (26, 31), dtype=np.uint8)
    blob = encode_j2k(img, levels=2, tile=(9, 14), lossy=True,
                      offsets=(2, 6, 1, 3), cb=(8, 8))
    d = np.abs(decode_j2k(blob)[:, :, 0].astype(np.int64) - img)
    assert d.max() <= 2
    # offsets + subsampling with an offset that is NOT a rate
    # multiple: the component grid still anchors at reference 0
    img = rng.integers(0, 256, (32, 36, 2), dtype=np.uint8)
    blob = encode_j2k(img, levels=1, mct=False, subsampling={1: (2, 2)},
                      tile=(11, 13), offsets=(3, 5, 1, 2), cb=(8, 8))
    out = decode_j2k(blob)
    assert np.array_equal(out[:, :, 0], img[:, :, 0])
    comp = img[(np.arange(3, 19) * 2 - 5)[:, None],
               (np.arange(2, 20) * 2 - 3)[None, :], 1]
    xs = np.clip(np.arange(3, 39) // 2 - 2, 0, comp.shape[1] - 1)
    ys = np.clip(np.arange(5, 37) // 2 - 3, 0, comp.shape[0] - 1)
    assert np.array_equal(out[:, :, 1], comp[np.ix_(ys, xs)])
    # malformed offset relations are parse errors (T.800 A.5.1)
    enc = bytearray(encode_j2k(img[:, :, 0], levels=1))
    i = enc.find(b"\xff\x51")
    struct.pack_into(">I", enc, i + 4 + 10, 60)  # XOsiz >= Xsiz
    with pytest.raises(J2kParseError, match="image offset"):
        decode_j2k(bytes(enc))
    with pytest.raises(J2kParseError, match="overlap"):
        encode_j2k(img[:, :, 0], levels=1, tile=(4, 4), offsets=(5, 0, 0, 0))


def test_tile_header_poc_and_rgn():
    """POC and RGN in TILE-PART headers (T.800 A.6.6 / A.6.3): a tile
    POC replaces the main header's progression for that tile, a tile
    RGN overrides the maxshift per component; POC in a non-first
    tile-part (mid-stream progression change) gates by name."""
    rng = np.random.default_rng(263)
    img = rng.integers(0, 65536, (64, 64)).astype(np.uint16)
    # per-tile POC with no main POC, different order per tile
    blob = encode_j2k(
        img, levels=2, tile=(32, 32), layers=2,
        tile_overrides={
            1: {"poc": [(0, 0, 2, 3, 1, 2)]},
            2: {"poc": [(0, 0, 2, 2, 1, 4), (0, 0, 2, 3, 1, 0)]},
        },
    )
    assert blob.count(b"\xff\x5f") >= 2  # POCs really in tile headers
    assert np.array_equal(decode_j2k(blob)[:, :, 0], img)
    # main POC + tile POC override + a tile that ALSO swaps its COD
    blob = encode_j2k(
        img, levels=2, tile=(32, 32), layers=2,
        poc=[(0, 0, 2, 3, 1, 2)],
        tile_overrides={
            1: {"poc": [(0, 0, 2, 3, 1, 1)]},
            3: {"levels": 1, "poc": [(0, 0, 2, 2, 1, 0)]},
        },
    )
    assert np.array_equal(decode_j2k(blob)[:, :, 0], img)
    # tile POC + custom precincts + a misaligned tile grid
    blob = encode_j2k(
        img, levels=2, tile=(13, 19), cb=(8, 8), layers=2,
        precincts=[(3, 3), (3, 3), (4, 4)],
        tile_overrides={
            1: {"poc": [(0, 0, 2, 2, 1, 3), (0, 0, 2, 3, 1, 4)]},
        },
    )
    assert np.array_equal(decode_j2k(blob)[:, :, 0], img)
    # tile RGN: relocate the main-header RGN into the tile header —
    # the decode must be identical (the override path, A.6.3)
    img8 = rng.integers(0, 4, (16, 16), dtype=np.uint8)
    img8[4:10, 6:12] = rng.integers(200, 255, (6, 6))
    enc = encode_j2k(img8, levels=1, roi=(4, 10, 6, 12), roi_shift=8)
    i = enc.find(b"\xff\x5e")
    rgn_seg = enc[i : i + 7]
    stripped = enc[:i] + enc[i + 7 :]
    sot = stripped.find(b"\xff\x90")
    psot = struct.unpack(">I", stripped[sot + 6 : sot + 10])[0]
    b2 = bytearray(stripped[: sot + 12] + rgn_seg + stripped[sot + 12 :])
    if psot:
        b2[sot + 6 : sot + 10] = struct.pack(">I", psot + 7)
    assert np.array_equal(decode_j2k(bytes(b2))[:, :, 0], img8)
    # POC spliced into a NON-first tile-part gates by name
    enc = encode_j2k(img, levels=2, tile_parts=2)
    p = -1
    for _ in range(2):
        p = enc.find(b"\xff\x90", p + 1)
    poc_seg = (
        b"\xff\x5f" + struct.pack(">H", 9) + bytes([0, 0])
        + struct.pack(">H", 1) + bytes([3, 1, 0])
    )
    psot = struct.unpack(">I", enc[p + 6 : p + 10])[0]
    b3 = bytearray(enc[: p + 12] + poc_seg + enc[p + 12 :])
    if psot:
        b3[p + 6 : p + 10] = struct.pack(">I", psot + len(poc_seg))
    with pytest.raises(J2kUnsupported, match="non-first tile-part"):
        decode_j2k(bytes(b3))


def test_position_progression_scales_by_component_rate():
    """T.800 B.12: the position loops (RPCL/PCRL/CPRL) visit
    precincts by their REFERENCE-GRID corner — resolution coordinates
    scaled by 2^(N-r) AND the component's XRsiz/YRsiz. A subsampled
    component's precincts cover rate-x more reference grid per
    resolution unit, so they interleave sparsely with a full-rate
    component's (hand-derived order below)."""
    from hortacloud_importer_spark.sources.j2k import (
        _build_bands, _packet_sequence,
    )

    # canvas 64x8: comp0 sampled at rate (4,1) -> 16 wide on its own
    # grid; comp1 full-rate 64 wide. levels=1, precinct exponent 3
    # (size 8 in resolution coords).
    comps = [
        _build_bands(8, 16, 1, 8, 8, 8, precincts=[(3, 3), (3, 3)],
                     rate=(4, 1)),
        _build_bands(8, 64, 1, 8, 8, 8, precincts=[(3, 3), (3, 3)],
                     rate=(1, 1)),
    ]
    seq = _packet_sequence(2, [2, 2], 2, 1, comps)  # RPCL
    r1 = [(c, p) for (l, r, c, p) in seq if r == 1]
    # comp0 r1 precincts sit at reference x = 0, 32 (res coords 0, 8
    # scaled by rate 4); comp1's at x = 0, 8, ..., 56
    assert r1 == [
        (0, 0), (1, 0), (1, 1), (1, 2), (1, 3),
        (0, 1), (1, 4), (1, 5), (1, 6), (1, 7),
    ]
    r0 = [(c, p) for (l, r, c, p) in seq if r == 0]
    # res 0: comp0 [0,8) -> 1 precinct at x=0 (scale 4*2); comp1
    # [0,32) -> 4 precincts at reference x = 0, 16, 32, 48 (scale 2)
    assert r0 == [(0, 0), (1, 0), (1, 1), (1, 2), (1, 3)]


def test_dwt_phase_property():
    """The 1-D lifting on canvas interval [o, o+n): lane sizes follow
    the B.5 ceil split, both filters invert exactly, and an even
    origin reproduces the classic 0-origin transform bit-for-bit."""
    from hortacloud_importer_spark.sources.j2k import (
        fwd_5x3_1d, inv_5x3_1d, fwd_9x7_1d, inv_9x7_1d,
    )

    rng = np.random.default_rng(257)
    for n in range(0, 34):
        for o in (0, 1, 2, 7):
            a = rng.integers(-1000, 1000, (3, n)).astype(np.int64)
            s, d = fwd_5x3_1d(a, o)
            ns = (o + n + 1) // 2 - (o + 1) // 2
            assert s.shape[-1] == ns and d.shape[-1] == n - ns, (n, o)
            assert np.array_equal(inv_5x3_1d(s, d, o), a), (n, o)
            f = a.astype(np.float64)
            s, d = fwd_9x7_1d(f, o)
            assert np.allclose(inv_9x7_1d(s, d, o), f, atol=1e-9), (n, o)
    a = rng.integers(0, 65536, (5, 33)).astype(np.int64)
    s0, d0 = fwd_5x3_1d(a)
    s2, d2 = fwd_5x3_1d(a, 2)
    assert np.array_equal(s0, s2) and np.array_equal(d0, d2)


def test_termall_per_pass_segments_round_trip():
    """Code-block style 0x04 (termination on each coding pass): every
    pass is its own MQ-flushed codeword segment, lengths signaled one
    per pass in the packet header, context states carried across
    segments — composing with tiles, layers, progressions, lossy 9/7,
    and subsampling."""
    rng = np.random.default_rng(139)
    img = rng.integers(0, 65536, (40, 56)).astype(np.uint16)
    blob = encode_j2k(img, levels=2, termall=True)
    # the cbstyle byte is really on the wire
    c = blob.find(b"\xff\x52")
    assert blob[c + 4 + 8] == 0x04
    assert np.array_equal(decode_j2k(blob)[:, :, 0], img)
    rgb = rng.integers(0, 256, (64, 32, 3), dtype=np.uint8)
    for prog in (0, 2, 4):
        blob = encode_j2k(rgb, levels=2, tile=(32, 32), layers=3,
                          prog=prog, termall=True)
        assert np.array_equal(decode_j2k(blob), rgb), prog
    blob = encode_j2k(img, levels=2, lossy=True, termall=True)
    d = np.abs(decode_j2k(blob)[:, :, 0].astype(np.int64) - img)
    assert d.max() <= 2
    st = rng.integers(0, 256, (32, 32, 2), dtype=np.uint8)
    blob = encode_j2k(st, levels=1, mct=False,
                      subsampling={1: (2, 2)}, termall=True)
    assert np.array_equal(decode_j2k(blob)[:, :, 0], st[:, :, 0])


def test_bypass_selective_raw_segments_round_trip():
    """Code-block style 0x01 (selective arithmetic coding bypass,
    T.800 D.6): SPP/MRP passes from the 5th bit-plane are raw
    bit-stuffed segments, cleanups stay MQ with carried contexts,
    lengths signaled per segment in lblock + floor(log2(seg passes))
    bits — composing with tiles, layers, progressions, lossy 9/7,
    and termall (0x05: every pass its own segment, raw or MQ)."""
    rng = np.random.default_rng(157)
    # 16-bit image -> deep bit-planes, so raw passes really engage
    img = rng.integers(0, 65536, (40, 56)).astype(np.uint16)
    blob = encode_j2k(img, levels=2, bypass=True)
    c = blob.find(b"\xff\x52")
    assert blob[c + 4 + 8] == 0x01  # the style bit is on the wire
    assert np.array_equal(decode_j2k(blob)[:, :, 0], img)
    # a bypass stream with deep planes must contain raw segments:
    # the same image coded without bypass differs in size
    assert blob != encode_j2k(img, levels=2)
    rgb = rng.integers(0, 256, (64, 32, 3), dtype=np.uint8)
    for prog in (0, 2, 4):
        blob = encode_j2k(rgb, levels=2, tile=(32, 32), layers=3,
                          prog=prog, bypass=True)
        assert np.array_equal(decode_j2k(blob), rgb), prog
    blob = encode_j2k(img, levels=2, lossy=True, bypass=True)
    d = np.abs(decode_j2k(blob)[:, :, 0].astype(np.int64) - img)
    assert d.max() <= 2
    # combined style 0x05
    blob = encode_j2k(img, levels=1, termall=True, bypass=True)
    c = blob.find(b"\xff\x52")
    assert blob[c + 4 + 8] == 0x05
    assert np.array_equal(decode_j2k(blob)[:, :, 0], img)
    # shallow image: fewer than 5 bit-planes -> pure-MQ single segment
    shallow = rng.integers(0, 8, (16, 16)).astype(np.uint8)
    blob = encode_j2k(shallow, levels=1, bypass=True)
    assert np.array_equal(decode_j2k(blob)[:, :, 0], shallow)


def test_bypass_raw_segment_bit_stuffing():
    """The raw coder's 0xFF stuffing: after an 0xFF byte the next
    byte carries 7 bits with MSB 0, and a segment never ends in
    0xFF (T.800 D.6.2)."""
    from hortacloud_importer_spark.sources.j2k import (
        RawDecoder,
        RawEncoder,
    )

    enc = RawEncoder()
    bits = [1] * 8 + [1, 0, 1, 1, 0, 0, 1]  # forces an 0xFF byte
    for b in bits:
        enc.encode(0, b)
    data = enc.flush()
    assert data[0] == 0xFF
    assert data[1] & 0x80 == 0  # stuffed: MSB of the next byte is 0
    assert data[-1] != 0xFF
    dec = RawDecoder(data)
    assert [dec.decode(0) for _ in bits] == bits
    # a stream whose stuffing bit is SET raises the named error
    bad = bytearray(data)
    bad[1] |= 0x80
    dec = RawDecoder(bytes(bad))
    with pytest.raises(J2kParseError, match="stuffing"):
        for _ in bits:
            dec.decode(0)
    # overrun raises, never wraps
    dec = RawDecoder(b"")
    with pytest.raises(J2kParseError, match="overruns"):
        dec.decode(0)


def test_bypass_corruption_raises_named_errors_only():
    rng = np.random.default_rng(163)
    base = encode_j2k(
        rng.integers(0, 65536, (24, 24)).astype(np.uint16),
        levels=2, bypass=True,
    )
    for t in range(300):
        b = bytearray(base)
        mode = t % 3
        if mode == 0:
            b = b[: int(rng.integers(1, len(b)))]
        elif mode == 1:
            i = int(rng.integers(0, len(b)))
            b[i] ^= 1 << int(rng.integers(0, 8))
        else:
            i = int(rng.integers(0, len(b)))
            b[i : i + 4] = bytes(rng.integers(0, 256, 4).tolist())
        try:
            decode_j2k(bytes(b))
        except J2kParseError:
            pass


def test_reserved_style_bits_stay_gated():
    rng = np.random.default_rng(149)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    enc = encode_j2k(img, levels=1, termall=True)
    c = enc.find(b"\xff\x52")
    for flag in (0x40, 0x80, 0xC0):
        b = bytearray(enc)
        b[c + 4 + 8] = 0x04 | flag
        with pytest.raises(J2kUnsupported, match="code-block style"):
            decode_j2k(bytes(b))


def test_termall_corruption_raises_named_errors_only():
    rng = np.random.default_rng(151)
    base = encode_j2k(
        rng.integers(0, 65536, (24, 24)).astype(np.uint16),
        levels=2, termall=True,
    )
    for t in range(300):
        b = bytearray(base)
        mode = t % 3
        if mode == 0:
            b = b[: int(rng.integers(1, len(b)))]
        elif mode == 1:
            i = int(rng.integers(0, len(b)))
            b[i] ^= 1 << int(rng.integers(0, 8))
        else:
            i = int(rng.integers(0, len(b)))
            b[i : i + 4] = bytes(rng.integers(0, 256, 4).tolist())
        try:
            decode_j2k(bytes(b))
        except J2kParseError:
            pass


def test_all_six_mode_switches_round_trip():
    """T.800 code-block mode switches 0x01-0x20 decode in any
    combination: reset (0x02) reinitializes contexts per pass, vsc
    (0x08) masks next-stripe neighbors in context formation, segsym
    (0x20) codes a verified 1010 at each cleanup end — composed with
    bypass/termall, layers, tiles, and lossy 9/7."""
    rng = np.random.default_rng(167)
    img = rng.integers(0, 65536, (40, 48)).astype(np.uint16)
    rgb = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    combos = [
        dict(reset=True),
        dict(vsc=True),
        dict(segsym=True),
        dict(reset=True, vsc=True, segsym=True),
        dict(bypass=True, vsc=True, segsym=True),
        dict(termall=True, reset=True),
        dict(termall=True, bypass=True, reset=True, vsc=True,
             segsym=True),
    ]
    for kw in combos:
        blob = encode_j2k(img, levels=2, **kw)
        assert np.array_equal(decode_j2k(blob)[:, :, 0], img), kw
        blob = encode_j2k(rgb, levels=2, layers=2, tile=(16, 32), **kw)
        assert np.array_equal(decode_j2k(blob), rgb), kw
    # the full style byte is on the wire
    blob = encode_j2k(img, levels=1, termall=True, bypass=True,
                      reset=True, vsc=True, segsym=True)
    c = blob.find(b"\xff\x52")
    assert blob[c + 12] == 0x2F
    # lossy composes
    blob = encode_j2k(img, levels=2, lossy=True, reset=True, vsc=True,
                      segsym=True)
    d = np.abs(decode_j2k(blob)[:, :, 0].astype(np.int64) - img)
    assert d.max() <= 2


def test_predictable_termination_bit_is_a_decode_noop():
    """Style 0x10 only constrains the ENCODER's flush; a stream whose
    header sets it decodes identically."""
    rng = np.random.default_rng(173)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    enc = encode_j2k(img, levels=1, termall=True)
    b = bytearray(enc)
    c = enc.find(b"\xff\x52")
    b[c + 12] = 0x04 | 0x10
    assert np.array_equal(decode_j2k(bytes(b))[:, :, 0], img)


def test_segsym_detects_payload_corruption():
    """The segmentation symbol is a real error check: corrupting the
    Tier-1 payload of a segsym stream must surface the named
    mismatch (or another named parse error) far more often than
    silent mis-decode — and the specific 1010 check fires."""
    rng = np.random.default_rng(179)
    img = rng.integers(0, 65536, (24, 24)).astype(np.uint16)
    enc = encode_j2k(img, levels=1, segsym=True)
    sod = enc.find(b"\xff\x93") + 2
    hits = 0
    for t in range(120):
        b = bytearray(enc)
        i = sod + int(rng.integers(0, len(enc) - sod - 2))
        b[i] ^= 1 << int(rng.integers(0, 8))
        try:
            decode_j2k(bytes(b))
        except J2kParseError as exc:
            if "segmentation symbol" in str(exc):
                hits += 1
    assert hits > 10  # the check demonstrably fires on corruption


def test_new_style_corruption_raises_named_errors_only():
    rng = np.random.default_rng(181)
    base = encode_j2k(
        rng.integers(0, 65536, (24, 24)).astype(np.uint16),
        levels=2, bypass=True, reset=True, vsc=True, segsym=True,
    )
    for t in range(300):
        b = bytearray(base)
        mode = t % 3
        if mode == 0:
            b = b[: int(rng.integers(1, len(b)))]
        elif mode == 1:
            i = int(rng.integers(0, len(b)))
            b[i] ^= 1 << int(rng.integers(0, 8))
        else:
            i = int(rng.integers(0, len(b)))
            b[i : i + 4] = bytes(rng.integers(0, 256, 4).tolist())
        try:
            decode_j2k(bytes(b))
        except J2kParseError:
            pass


def test_custom_precincts_round_trip():
    """Scod bit 0 / T.800 B.9: per-resolution precinct partitions.
    Packets become per-(layer, resolution, component, PRECINCT) with
    per-precinct tag trees, code-blocks clamp to the precinct size,
    and the position-dependent progressions order precincts by canvas
    position — composed with tiles, tile-parts, layers, every
    progression, lossy 9/7, subsampling, packed headers, and the
    code-block style modes."""
    rng = np.random.default_rng(191)
    img = rng.integers(0, 65536, (70, 90)).astype(np.uint16)
    rgb = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    for kw in (
        dict(levels=2, precincts=[(5, 5), (5, 5), (5, 5)], cb=(16, 16)),
        dict(levels=2, precincts=[(4, 5), (5, 4), (6, 5)], cb=(8, 8)),
        dict(levels=3, precincts=[(3, 3), (3, 3), (4, 4), (5, 5)],
             cb=(8, 8)),
        dict(levels=0, precincts=[(5, 5)], cb=(16, 16)),
        dict(levels=2, precincts=[(15, 15), (6, 6), (7, 7)],
             cb=(32, 32)),
    ):
        blob = encode_j2k(img, **kw)
        i = blob.find(b"\xff\x52")
        assert blob[i + 4] & 0x01  # Scod precinct bit on the wire
        # Lcod grew by levels+1 precinct-size bytes
        assert blob[i + 3] == 12 + kw["levels"] + 1
        assert np.array_equal(decode_j2k(blob)[:, :, 0], img), kw
    for prog in (0, 1, 2, 3, 4):
        blob = encode_j2k(rgb, levels=2, layers=3, prog=prog,
                          precincts=[(4, 4), (4, 4), (5, 5)], cb=(8, 8))
        assert np.array_equal(decode_j2k(blob), rgb), prog
    blob = encode_j2k(img, levels=2, tile=(32, 32), tile_parts=3,
                      cb=(8, 8), precincts=[(4, 4), (4, 4), (5, 5)])
    assert np.array_equal(decode_j2k(blob)[:, :, 0], img)
    blob = encode_j2k(img, levels=2, lossy=True, cb=(16, 16),
                      precincts=[(5, 5), (5, 5), (6, 6)])
    d = np.abs(decode_j2k(blob)[:, :, 0].astype(np.int64) - img)
    assert d.max() <= 2
    blob = encode_j2k(
        img, levels=2, cb=(8, 8), precincts=[(4, 4), (4, 4), (4, 4)],
        termall=True, bypass=True, reset=True, vsc=True, segsym=True,
    )
    assert np.array_equal(decode_j2k(blob)[:, :, 0], img)
    st = rng.integers(0, 256, (64, 64, 2), dtype=np.uint8)
    blob = encode_j2k(st, levels=1, mct=False, subsampling={1: (2, 2)},
                      cb=(8, 8), precincts=[(4, 4), (4, 4)])
    assert np.array_equal(decode_j2k(blob)[:, :, 0], st[:, :, 0])
    for ph in ("ppm", "ppt"):
        blob = encode_j2k(img, levels=2, cb=(8, 8),
                          precincts=[(4, 4), (4, 4), (4, 4)],
                          packed_headers=ph)
        assert np.array_equal(decode_j2k(blob)[:, :, 0], img), ph


def test_precincts_compose_with_poc_coc_and_tile_overrides():
    """Precincts are a PER-COMPONENT, PER-TILE property (T.800 A.6.1
    / A.6.2): a COC or tile COD overrides the COD's coding style in
    full, its own precinct list included (absent = maximal), and POC
    entries iterate the real precinct grids with the B.12 position
    loops — the three combinations round 10 still gated."""
    rng = np.random.default_rng(199)
    img = rng.integers(0, 256, (64, 80), dtype=np.uint8)
    rgb = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    # POC + precincts, including position-dependent progressions
    for poc in (
        [(0, 0, 2, 2, 3, 4), (0, 0, 2, 4, 3, 0)],
        [(0, 0, 1, 3, 3, 2), (0, 0, 2, 3, 3, 1)],
        [(0, 0, 2, 1, 3, 3), (0, 0, 2, 3, 3, 2)],
    ):
        blob = encode_j2k(rgb, levels=2, layers=2, cb=(8, 8),
                          precincts=[(4, 4), (4, 4), (5, 5)], poc=poc)
        assert np.array_equal(decode_j2k(blob), rgb), poc
    # COC carrying its own precinct list (Scoc bit 0) next to a COD
    # list; a third component proves COC-without-precincts resets to
    # maximal rather than inheriting the COD's
    blob = encode_j2k(
        rgb, levels=2, cb=(8, 8), precincts=[(4, 4), (4, 4), (5, 5)],
        coc={1: {"levels": 1, "precincts": [(3, 3), (4, 4)]},
             2: {"levels": 2}},
    )
    i = blob.find(b"\xff\x53")
    assert blob[i + 5] & 0x01  # Scoc precinct bit on the wire
    assert np.array_equal(decode_j2k(blob), rgb)
    # per-tile COD with its own precinct list, mixed with tiles that
    # keep the main header's
    blob = encode_j2k(
        img, levels=2, tile=(32, 32), cb=(8, 8),
        precincts=[(4, 4), (4, 4), (5, 5)],
        tile_overrides={1: {"levels": 1, "precincts": [(3, 3), (4, 4)]},
                        2: {"levels": 2}},
    )
    assert np.array_equal(decode_j2k(blob)[:, :, 0], img)
    # all three at once: POC + precincts + tiles + layers
    blob = encode_j2k(
        img, levels=2, tile=(32, 32), layers=3, cb=(8, 8),
        precincts=[(3, 3), (3, 3), (4, 4)],
        poc=[(0, 0, 2, 2, 1, 3), (0, 0, 3, 3, 1, 4)],
    )
    assert np.array_equal(decode_j2k(blob)[:, :, 0], img)


def test_precinct_gates_and_validation():
    rng = np.random.default_rng(193)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    # precinct exponent 0 above resolution 0 is a parse error
    with pytest.raises(J2kParseError, match="exponent 0"):
        encode_j2k(img, levels=1, precincts=[(4, 4), (0, 4)])
    with pytest.raises(J2kParseError, match="precinct sizes"):
        encode_j2k(img, levels=2, precincts=[(4, 4)])
    # a coc-component precinct list must match the coc'd level count
    with pytest.raises(J2kParseError, match="precinct sizes"):
        encode_j2k(img, levels=2, precincts=[(4, 4), (4, 4), (5, 5)],
                   coc={0: {"levels": 1,
                            "precincts": [(4, 4), (4, 4), (4, 4)]}})
    # ... and a tile-override list must match the tile's level count
    with pytest.raises(J2kParseError, match="precinct sizes"):
        encode_j2k(img, levels=2, tile=(16, 16),
                   tile_overrides={0: {"levels": 1,
                                       "precincts": [(4, 4)]}})
    # decoder side: COD with the precinct flag but truncated sizes
    enc = bytearray(encode_j2k(img, levels=1))
    i = enc.find(b"\xff\x52")
    enc[i + 4] |= 0x01  # claim precincts, provide no bytes
    with pytest.raises(J2kParseError, match="precinct"):
        decode_j2k(bytes(enc))


def test_precinct_corruption_raises_named_errors_only():
    rng = np.random.default_rng(197)
    base = encode_j2k(
        rng.integers(0, 65536, (48, 48)).astype(np.uint16),
        levels=2, cb=(8, 8), precincts=[(4, 4), (4, 4), (5, 5)],
        prog=2,
    )
    for t in range(300):
        b = bytearray(base)
        mode = t % 3
        if mode == 0:
            b = b[: int(rng.integers(1, len(b)))]
        elif mode == 1:
            i = int(rng.integers(0, len(b)))
            b[i] ^= 1 << int(rng.integers(0, 8))
        else:
            i = int(rng.integers(0, len(b)))
            b[i : i + 4] = bytes(rng.integers(0, 256, 4).tolist())
        try:
            decode_j2k(bytes(b))
        except J2kParseError:
            pass
