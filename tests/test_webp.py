"""Clean-room WebP VP8L codec (sources/webp.py).

The fixture encoder only emits literal streams, so every other
decoder path — LZ77 backrefs with the 2D distance map, color-cache
codes, palette indexing (bundled and plain), the predictor and
cross-color transforms, and meta-prefix groups — is pinned here by
streams assembled bit-by-bit from the spec."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hortacloud_importer_spark.sources.webp import (
    WebpParseError,
    _BitWriter,
    decode_webp,
    encode_webp,
)


def _container(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """{symbol: length} -> {symbol: (code, length)} per canonical
    (length, symbol) assignment — mirrors what any spec decoder does."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for ln, sym in sorted((ln, s) for s, ln in lengths.items() if ln > 0):
        code <<= ln - prev_len
        out[sym] = (code, ln)
        code += 1
        prev_len = ln
    return out


def _write_normal_code(bw: _BitWriter, alphabet: int, lengths: dict[int, int]):
    """Emit an arbitrary complete prefix code through the 19-symbol
    code-length code (zero runs written literally — slow but simple).
    Returns the symbol->(code,len) table for emitting data."""
    used_cls = sorted({ln for ln in lengths.values()} | {0})
    # give every used CL symbol the same length; pad the set to a
    # power of two with unused CL symbols so the CL code is complete
    import math

    k = max(1, math.ceil(math.log2(len(used_cls))))
    pad = [s for s in range(19) if s not in used_cls]
    while len(used_cls) < (1 << k):
        used_cls.append(pad.pop())
    cl_lengths = {s: k for s in used_cls}
    cl_codes = _canonical_codes(cl_lengths)

    order = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
    last = max(order.index(s) for s in used_cls)
    bw.write(0, 1)  # normal code
    bw.write(last + 1 - 4, 4)
    for i in range(last + 1):
        bw.write(cl_lengths.get(order[i], 0), 3)
    bw.write(0, 1)  # no max_symbol cap
    for sym in range(alphabet):
        c, ln = cl_codes[lengths.get(sym, 0)]
        bw.write_code(c, ln)
    return _canonical_codes(lengths)


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _single(bw: _BitWriter, symbol: int) -> None:
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(1, 1)
    bw.write(symbol, 8)


def test_roundtrip_shapes_and_subtract_green():
    rng = np.random.default_rng(3)
    for shape in [(7, 5), (16, 24, 3), (9, 13, 4), (1, 1, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for sg in (False, True):
            out = decode_webp(encode_webp(img, subtract_green=sg))
            want = (
                img
                if img.ndim == 3
                else np.repeat(img[:, :, None], 3, axis=2)
            )
            if want.shape[-1] == 4 and (want[:, :, 3] == 255).all():
                want = want[:, :, :3]
            assert np.array_equal(out, want), (shape, sg)


def test_hand_built_lz77_backref_and_distance_map():
    """5x1 image: two literals then a length-3 backref at 2D distance
    code 2 = (1, 0) = one pixel back -> A B B B B."""
    bw = _BitWriter()
    _header(bw, 5, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # green: literals 0x10, 0x20 and length-prefix symbol 256+0
    green = _write_normal_code(bw, 280, {0x10: 1, 0x20: 2, 256: 2})
    red = _write_normal_code(bw, 256, {1: 1, 2: 1})
    blue = _write_normal_code(bw, 256, {3: 1, 4: 1})
    _single(bw, 255)  # alpha
    dist = _write_normal_code(bw, 40, {1: 1, 5: 1})  # dist prefix 1 -> 2
    # pixel A = (r1, g10, b3), pixel B = (r2, g20, b4)
    for g, r, b in ((0x10, 1, 3), (0x20, 2, 4)):
        bw.write_code(*green[g])
        bw.write_code(*red[r])
        bw.write_code(*blue[b])
    bw.write_code(*green[256])  # length prefix 0 -> length 1? no: value 1
    # prefix code 0 -> length 1; we want length 3 -> prefix code 2,
    # but 256+2 wasn't allocated; use three length-1 backrefs instead
    bw.write_code(*dist[1])  # dist prefix 1 -> value 2 -> map (1,0) -> 1
    bw.write_code(*green[256])
    bw.write_code(*dist[1])
    bw.write_code(*green[256])
    bw.write_code(*dist[1])
    out = decode_webp(_container(b"\x2f" + bw.bytes()))
    assert out.shape == (1, 5, 3)
    assert np.array_equal(out[0, 0], [1, 0x10, 3])
    for x in (1, 2, 3, 4):
        assert np.array_equal(out[0, x], [2, 0x20, 4])


def test_hand_built_color_cache():
    """Literal, different literal, then a cache hit re-emitting the
    FIRST pixel via its 0x1e35a7bd hash slot."""
    cache_bits = 4
    px = (255 << 24) | (7 << 16) | (0x30 << 8) | 9  # a=255 r=7 g=0x30 b=9
    idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = _BitWriter()
    _header(bw, 3, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta
    alphabet = 256 + 24 + (1 << cache_bits)
    green = _write_normal_code(
        bw, alphabet, {0x30: 1, 0x40: 2, 280 + idx: 2}
    )
    red = _write_normal_code(bw, 256, {7: 1, 8: 1})
    blue = _write_normal_code(bw, 256, {9: 1, 10: 1})
    _single(bw, 255)
    _single(bw, 0)  # distance, unused
    for g, r, b in ((0x30, 7, 9), (0x40, 8, 10)):
        bw.write_code(*green[g])
        bw.write_code(*red[r])
        bw.write_code(*blue[b])
    bw.write_code(*green[280 + idx])
    out = decode_webp(_container(b"\x2f" + bw.bytes()))
    assert np.array_equal(out[0, 0], [7, 0x30, 9])
    assert np.array_equal(out[0, 1], [8, 0x40, 10])
    assert np.array_equal(out[0, 2], [7, 0x30, 9])  # cache replay


def _palette_stream(n_colors: int, w: int, indices, palette_rgb):
    """Build a color-indexing stream: palette deltas + packed image."""
    bw = _BitWriter()
    _header(bw, w, 1)
    bw.write(1, 1)  # transform present
    bw.write(3, 2)  # color indexing
    bw.write(n_colors - 1, 8)
    # palette sub-image: n_colors x 1 literals, delta-coded per spec
    bw.write(0, 1)  # no cache (sub-image)
    deltas = []
    prev = (0, 0, 0, 0)  # a, r, g, b
    for rgb in palette_rgb:
        cur = (255, *rgb)
        deltas.append(tuple((c - p) & 0xFF for c, p in zip(cur, prev)))
        prev = cur
    g_syms = {d[2] for d in deltas}
    r_syms = {d[1] for d in deltas}
    b_syms = {d[3] for d in deltas}
    a_syms = {d[0] for d in deltas}

    def lens(syms):
        syms = sorted(syms)
        if len(syms) == 1:
            return None  # single-symbol code
        k = max(1, (len(syms) - 1).bit_length())
        # pad to a complete code with unused symbols
        pad = [s for s in range(256) if s not in syms]
        while len(syms) < (1 << k):
            syms.append(pad.pop())
        return {s: k for s in syms}

    tables = []
    for i, syms in enumerate((g_syms, r_syms, b_syms, a_syms)):
        ln = lens(syms)
        alphabet = 280 if i == 0 else 256
        if ln is None:
            _single(bw, next(iter(syms)))
            tables.append(None)
        else:
            tables.append(_write_normal_code(bw, alphabet, ln))
    _single(bw, 0)  # distance
    for a, r, g, b in deltas:
        for ti, val in ((0, g), (1, r), (2, b), (3, a)):
            if tables[ti] is not None:
                bw.write_code(*tables[ti][val])
    # back in the main stream: no more transforms, then packed image
    bw.write(0, 1)
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    if n_colors <= 2:
        width_bits = 3
    elif n_colors <= 4:
        width_bits = 2
    elif n_colors <= 16:
        width_bits = 1
    else:
        width_bits = 0
    packed_w = (w + (1 << width_bits) - 1) >> width_bits
    bpp = 8 >> width_bits
    packed = []
    for px in range(packed_w):
        val = 0
        for sub in range(1 << width_bits):
            x = (px << width_bits) + sub
            if x < w:
                val |= indices[x] << (sub * bpp)
        packed.append(val)
    g_main = _write_normal_code(
        bw, 280, {v: max(1, (len(set(packed)) - 1).bit_length()) for v in set(packed)}
    ) if len(set(packed)) > 1 else None
    if g_main is None:
        # single packed value
        bw_pos_fixup = None
        raise AssertionError("test palette stream needs >=2 packed values")
    _single(bw, 0)  # red
    _single(bw, 0)  # blue
    _single(bw, 255)  # alpha
    _single(bw, 0)  # distance
    for val in packed:
        bw.write_code(*g_main[val])
    return _container(b"\x2f" + bw.bytes())


def test_hand_built_palette_bundled():
    """4-color palette -> 2-bit bundled pixels (4 per green byte)."""
    pal = [(10, 20, 30), (200, 0, 50), (0, 255, 0), (5, 5, 5)]
    idx = [0, 1, 2, 3, 3, 0]  # 6 pixels -> packed width 2
    data = _palette_stream(4, 6, idx, pal)
    out = decode_webp(data)
    assert out.shape == (1, 6, 3)
    for x, i in enumerate(idx):
        assert np.array_equal(out[0, x], pal[i]), x


def test_hand_built_palette_unbundled():
    """20-color palette -> width_bits 0, plain index per pixel."""
    rng = np.random.default_rng(11)
    pal = [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(20)]
    idx = [0, 19, 7, 3, 7]
    out = decode_webp(_palette_stream(20, 5, idx, pal))
    for x, i in enumerate(idx):
        assert np.array_equal(out[0, x], pal[i]), x


def _plain_literal_image(bw: _BitWriter, pixels) -> None:
    """Emit (a, r, g, b) literals with hand-built codes (no cache/meta
    headers — caller writes those)."""
    gs = {g for _, _, g, _ in pixels}
    rs = {r for _, r, _, _ in pixels}
    bs = {b for _, _, _, b in pixels}
    as_ = {a for a, _, _, _ in pixels}

    def make(syms, alphabet):
        syms = sorted(syms)
        if len(syms) == 1:
            _single(bw, syms[0])
            return None
        k = max(1, (len(syms) - 1).bit_length())
        pad = [s for s in range(alphabet) if s not in syms]
        while len(syms) < (1 << k):
            syms.append(pad.pop())
        return _write_normal_code(bw, alphabet, {s: k for s in syms})

    tg = make(gs, 280)
    tr = make(rs, 256)
    tb = make(bs, 256)
    ta = make(as_, 256)
    _single(bw, 0)  # distance
    for a, r, g, b in pixels:
        for t, v in ((tg, g), (tr, r), (tb, b), (ta, a)):
            if t is not None:
                bw.write_code(*t[v])


def test_hand_built_predictor_transform():
    """2x2 image under predictor mode 2 (top) everywhere (block size
    16 -> one mode block). Residuals chosen so the inverse must chain
    through the special row-0/col-0 rules."""
    bw = _BitWriter()
    _header(bw, 2, 2)
    bw.write(1, 1)
    bw.write(0, 2)  # predictor transform
    bw.write(2, 3)  # size_bits = 4 -> 16x16 blocks
    # mode sub-image: single pixel with green = 2
    bw.write(0, 1)  # no cache
    _plain_literal_image(bw, [(0, 0, 2, 0)])
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # residuals (a, r, g, b): (0,0) abs 10/20/30 opaque; (1,0) +1s;
    # row 1 mode-2 deltas +5
    residuals = [
        (0, 10, 20, 30),  # (0,0): pred = ARGB 0xff000000 -> a wraps
        (0, 1, 1, 1),  # (0,1): pred = left
        (0, 5, 5, 5),  # (1,0): pred = above (col-0 rule)
        (0, 5, 5, 5),  # (1,1): mode 2 -> top
    ]
    _plain_literal_image(bw, residuals)
    out = decode_webp(_container(b"\x2f" + bw.bytes()))
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out[0, 0], [10, 20, 30])
    assert np.array_equal(out[0, 1], [11, 21, 31])
    assert np.array_equal(out[1, 0], [15, 25, 35])
    assert np.array_equal(out[1, 1], [16, 26, 36])


def test_inverse_predictor_matches_reference():
    """The segment-vectorized inverse predictor must match a direct
    per-pixel transcription of the spec (incl. the rule that TR of
    the rightmost column is the CURRENT row's leftmost pixel), for
    every mode and across block boundaries."""
    from hortacloud_importer_spark.sources.webp import _inverse_predictor

    def _avg2(a, b):
        return (a.astype(np.uint16) + b.astype(np.uint16)) >> 1

    def _predict(mode, left, top, topleft, topright):
        # direct numpy transcription of the 14 spec predictors
        if mode == 0:
            return np.array([255, 0, 0, 0], dtype=np.uint8)
        if mode == 1:
            return left
        if mode == 2:
            return top
        if mode == 3:
            return topright
        if mode == 4:
            return topleft
        if mode == 5:
            return _avg2(_avg2(left, topright), top).astype(np.uint8)
        if mode == 6:
            return _avg2(left, topleft).astype(np.uint8)
        if mode == 7:
            return _avg2(left, top).astype(np.uint8)
        if mode == 8:
            return _avg2(topleft, top).astype(np.uint8)
        if mode == 9:
            return _avg2(top, topright).astype(np.uint8)
        if mode == 10:
            return _avg2(
                _avg2(left, topleft), _avg2(top, topright)
            ).astype(np.uint8)
        if mode == 11:  # Select
            p = left.astype(int) + top.astype(int) - topleft.astype(int)
            p_left = int(np.abs(p - left).sum())
            p_top = int(np.abs(p - top).sum())
            return left if p_left < p_top else top
        if mode == 12:  # ClampAddSubtractFull
            full = left.astype(int) + top.astype(int) - topleft.astype(int)
            return np.clip(full, 0, 255).astype(np.uint8)
        # 13: ClampAddSubtractHalf (C-truncating /2)
        ave = _avg2(left, top).astype(int)
        diff = ave - topleft.astype(int)
        half = ave + np.trunc(diff / 2).astype(int)
        return np.clip(half, 0, 255).astype(np.uint8)

    def reference(res, size_bits, mode_green, w, h, mode_w):
        out = res.copy()
        black = np.array([255, 0, 0, 0], dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = black
                elif y == 0:
                    pred = out[0, x - 1]
                elif x == 0:
                    pred = out[y - 1, 0]
                else:
                    m = int(
                        mode_green[(y >> size_bits) * mode_w + (x >> size_bits)]
                    )
                    tr = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                    pred = _predict(
                        m, out[y, x - 1], out[y - 1, x], out[y - 1, x - 1], tr
                    )
                out[y, x] = out[y, x] + pred
        return out

    rng = np.random.default_rng(61)
    size_bits = 2  # 4x4 blocks
    for w, h in [(11, 9), (4, 4), (1, 7), (13, 1)]:
        mode_w = (w + 3) >> size_bits
        mode_h = (h + 3) >> size_bits
        for trial in range(6):
            res = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
            mode_green = rng.integers(0, 14, mode_w * mode_h)
            modes_px = (mode_green.astype(np.uint32) << 8)
            got = res.copy()
            _inverse_predictor(got, w, h, size_bits, modes_px)
            want = reference(res, size_bits, mode_green, w, h, mode_w)
            assert np.array_equal(got, want), (w, h, trial)


def test_hand_built_cross_color_transform():
    """1x1 cross-color element (g2r=16, g2b=0, r2b=0): red +=
    (int8(16) * int8(g)) >> 5."""
    bw = _BitWriter()
    _header(bw, 1, 1)
    bw.write(1, 1)
    bw.write(1, 2)  # cross-color
    bw.write(2, 3)  # size_bits 4
    bw.write(0, 1)  # sub-image: no cache
    # element pixel: blue = g2r = 16, green = g2b = 0, red = r2b = 0
    _plain_literal_image(bw, [(255, 0, 0, 16)])
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # stored pixel: g = 64 -> delta = (16 * 64) >> 5 = 32
    _plain_literal_image(bw, [(255, 100, 64, 50)])
    out = decode_webp(_container(b"\x2f" + bw.bytes()))
    assert np.array_equal(out[0, 0], [(100 + 32) & 0xFF, 64, 50])


def test_hand_built_meta_prefix_groups():
    """8x1 image, meta block size 4 -> two prefix groups with
    different constant colors; the meta image selects group 1 for the
    right half via its (r<<8 | g) pixel."""
    bw = _BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta present
    bw.write(0, 3)  # hbits = 2 -> blocks of 4
    # meta sub-image 2x1: green = group index (0 then 1)
    bw.write(0, 1)  # sub-image: no cache
    _plain_literal_image(bw, [(0, 0, 0, 0), (0, 0, 1, 0)])
    # group 0: constant red pixel; group 1: constant blue pixel
    for g, r, b in ((0x11, 200, 1), (0x22, 2, 200)):
        _single(bw, g)
        _single(bw, r)
        _single(bw, b)
        _single(bw, 255)
        _single(bw, 0)
    out = decode_webp(_container(b"\x2f" + bw.bytes()))
    assert out.shape == (1, 8, 3)
    for x in range(4):
        assert np.array_equal(out[0, x], [200, 0x11, 1])
    for x in range(4, 8):
        assert np.array_equal(out[0, x], [2, 0x22, 200])


def test_gates_and_corruption():
    with pytest.raises(WebpParseError, match="not a RIFF"):
        decode_webp(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(WebpParseError, match="VP8"):
        # truncated lossy chunk: the VP8 decoder's named gate
        decode_webp(
            b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00\x00\x00\x00\x00"
        )
    with pytest.raises(WebpParseError, match="VP8X"):
        decode_webp(
            b"RIFF\x10\x00\x00\x00WEBPVP8X\x04\x00\x00\x00\x00\x00\x00\x00"
        )
    good = encode_webp(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(WebpParseError):
        decode_webp(good[:30])
    bad = bytearray(good)
    bad[20] ^= 0xFF  # clobber the VP8L signature region
    with pytest.raises(WebpParseError):
        decode_webp(bytes(bad))


def test_fuzzed_corruption_raises_named_errors():
    import random

    rng = np.random.default_rng(23)
    payload = encode_webp(rng.integers(0, 256, (12, 12, 3), dtype=np.uint8))
    rnd = random.Random(0xBEE)
    for trial in range(600):
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
            decode_webp(bytes(b))
        except WebpParseError:
            pass


def test_multimodal_kernel_routes_webp():
    from hortacloud_importer_spark.operators.multimodal import _decode_one

    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)
    arr = _decode_one("webp", encode_webp(img), {})
    assert arr.shape == (1, 10, 14, 3)
    assert np.array_equal(arr[0], img)


# --------------------------------------------- animation (ANIM/ANMF)


def test_anim_composites_offsets_and_background():
    from hortacloud_importer_spark.sources.webp import (
        decode_webp_frames,
        encode_webp_anim,
        webp_frame_count,
        webp_probe,
    )

    rng = np.random.default_rng(31)
    f0 = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
    f1 = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    blob = encode_webp_anim([f0, f1], offsets=[(0, 0), (2, 2)], bg=(9, 8, 7))
    assert webp_probe(blob) == (8, 10, "animated")
    assert webp_frame_count(blob) == 2
    frames = decode_webp_frames(blob)
    assert frames.shape == (2, 8, 10, 3)
    want0 = np.broadcast_to(
        np.array([9, 8, 7], np.uint8), (8, 10, 3)
    ).copy()
    want0[0:8, 0:10] = f0
    assert np.array_equal(frames[0], want0)
    want1 = want0.copy()
    want1[2:6, 2:8] = f1
    assert np.array_equal(frames[1], want1)


def test_anim_dispose_to_background():
    from hortacloud_importer_spark.sources.webp import (
        decode_webp_frames,
        encode_webp_anim,
    )

    rng = np.random.default_rng(37)
    f = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    blob = encode_webp_anim(
        [f, f], offsets=[(2, 2), (2, 2)], bg=(1, 2, 3), dispose_bg=True
    )
    frames = decode_webp_frames(blob)
    canvas = np.broadcast_to(
        np.array([1, 2, 3], np.uint8), frames.shape[1:]
    ).copy()
    canvas[2:6, 2:8] = f
    # every snapshot shows the freshly drawn frame; the dispose only
    # affects what the NEXT frame starts from (identical here)
    assert np.array_equal(frames[0], canvas)
    assert np.array_equal(frames[1], canvas)


def test_anim_stills_pass_through_and_errors_are_named():
    import pytest

    from hortacloud_importer_spark.sources.webp import (
        decode_webp_frames,
        encode_webp_anim,
    )

    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    still = decode_webp_frames(encode_webp(img))
    assert still.shape == (1, 6, 6, 3)
    assert np.array_equal(still[0], img)
    # frame overrunning the canvas is a named error, not a crash
    blob = bytearray(
        encode_webp_anim([img], offsets=[(0, 0)], canvas=(6, 6))
    )
    i = blob.find(b"ANMF")
    blob[i + 8 + 6 : i + 8 + 9] = (9).to_bytes(3, "little")  # width-1=9
    with pytest.raises(WebpParseError, match="canvas|declares"):
        decode_webp_frames(bytes(blob))
    # old still API keeps refusing animations by name
    anim = encode_webp_anim([img, img])
    with pytest.raises(WebpParseError, match="decode_webp_frames"):
        decode_webp(anim)


def test_anim_fuzz_raises_named_error_only():
    import random

    from hortacloud_importer_spark.sources.webp import (
        decode_webp_frames,
        encode_webp_anim,
    )

    rng = np.random.default_rng(43)
    frames = [
        rng.integers(0, 256, (6, 8, 3), dtype=np.uint8) for _ in range(3)
    ]
    payload = encode_webp_anim(frames, dispose_bg=True)
    rnd = random.Random(0xA11)
    for trial in range(500):
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
            decode_webp_frames(bytes(b))
        except WebpParseError:
            pass


def test_multimodal_kernel_routes_animated_webp():
    from hortacloud_importer_spark.operators.multimodal import (
        _decode_one,
        _probe_one,
    )
    from hortacloud_importer_spark.sources.webp import encode_webp_anim

    rng = np.random.default_rng(47)
    frames = [
        rng.integers(0, 256, (6, 8, 3), dtype=np.uint8) for _ in range(4)
    ]
    blob = encode_webp_anim(frames)
    arr = _decode_one("webp", blob, {})
    assert arr.shape == (4, 6, 8, 3)
    meta = _probe_one("webp", blob, {})
    assert (meta["height"], meta["width"], meta["n_frames"]) == (6, 8, 4)
