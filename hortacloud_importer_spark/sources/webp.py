"""Clean-room WebP decoder: lossless (VP8L) here, lossy (VP8) via
sources/vp8.py.

§2.K4: WebP is the fourth web-crawl image format next to JPEG, PNG,
and GIF (all of which already decode clean-room here). This module
implements the LOSSLESS half of WebP from the public bitstream
specification (RFC 9649 / the WebP Lossless Bitstream Specification):
the 'VP8L' chunk with canonical prefix coding, LZ77 backward
references with the 2D distance mapping, color-cache codes, and all
four transforms (predictor, cross-color, subtract-green, and
color-indexing with sub-byte pixel bundling).

Lossy WebP ('VP8 ' chunks — a VP8 intra keyframe with boolean
arithmetic coding and loop filtering) dispatches to the clean-room
RFC 6386 decoder in sources/vp8.py; still images inside a 'VP8X'
extended container decode through their inner VP8/VP8L chunk; and
animated containers (ANIM/ANMF) composite through
:func:`decode_webp_frames` — per-frame offsets, alpha-blend vs
overwrite, dispose-to-background. The ALPH alpha sidecar decodes
too (raw and lossless compression, all four filters), so every
variant of the format a crawl encounters — lossless, lossy, lossy
with alpha, extended stills, animations — decodes clean-room;
corrupt streams raise :class:`WebpParseError` for the
``errors="tag"`` crawl kernels.

Layout notes (all from the spec):

- the bitstream is read LSB-first within bytes; canonical prefix
  codes are consumed bit-by-bit starting at the root (first bit =
  most significant bit of the code);
- each prefix-code group holds 5 codes: green+length+cache (alphabet
  256 + 24 + cache_size), red, blue, alpha (256 each), distance (40);
- code lengths are themselves prefix-coded with the 19-symbol
  code-length code in the fixed order 17, 18, 0, 1, ..., 16 (16
  repeats the previous nonzero length, 17/18 emit zero runs);
- distances 1..120 map through the 2D neighbor table below, larger
  codes are ``code - 120`` linear distances;
- transforms are read in stream order (each may appear once) and
  inverted in reverse order after pixel decode; color-indexing
  reduces the coded width when the palette has <= 16 entries
  (8/4/2/1 pixels bundled per green byte).

The encoder writes spec-shaped fixtures: no-transform or
subtract-green literal streams with flat 8-bit literal codes (the
code-length code exercising repeat-zero runs), simple-code channels
for constant planes, and the uncompressed RIFF container. Decoder
paths the encoder does not emit (backrefs, cache, palette,
predictor, cross-color) are pinned by hand-built streams in
tests/test_webp.py.
"""

from __future__ import annotations

import struct

import numpy as np


class WebpParseError(ValueError):
    pass


# max w*h*4 samples a VP8L header may declare (decompression-bomb
# guard; 14-bit dims cap at 16384^2 = 1 Gpx = 4 GiB RGBA)
MAX_PIXELS = 1 << 26

_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# 2D distance mapping (spec: codes 1..120 address near neighbors)
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


class _BitReader:
    """LSB-first bit reader over the VP8L payload."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > 8 * len(self.data):
            raise WebpParseError("VP8L stream exhausted")
        out = 0
        shift = 0
        pos = self.pos
        data = self.data
        while shift < n:
            byte = data[pos >> 3] >> (pos & 7)
            take = min(8 - (pos & 7), n - shift)
            out |= (byte & ((1 << take) - 1)) << shift
            shift += take
            pos += take
        self.pos = end
        return out

    def peek(self, n: int) -> int:
        """Non-consuming LSB-first peek, zero-padded past the end —
        the prefix-LUT fast path reads up to max_len bits at once and
        then skips only the decoded code's length."""
        pos = self.pos
        byte0 = pos >> 3
        data = self.data
        chunk = data[byte0 : byte0 + ((n + (pos & 7) + 7) >> 3)]
        return (int.from_bytes(chunk, "little") >> (pos & 7)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.pos += n
        if self.pos > 8 * len(self.data):
            raise WebpParseError("VP8L stream exhausted")


class _Huffman:
    """Canonical prefix decoder: codes assigned in (length, symbol)
    order, consumed MSB-first bit-by-bit from the LSB-first stream.
    Decode runs on a flat peek LUT (one peek + one skip per symbol):
    a code ``c`` of length ``l`` matches every max_len-bit peek whose
    LOW ``l`` bits equal ``c`` bit-reversed, so the table fills with
    numpy stride writes at build time."""

    __slots__ = ("single", "max_len", "lut_sym", "lut_len")

    def __init__(self, lengths: list[int]) -> None:
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise WebpParseError("prefix code with no symbols")
        if len(nz) == 1:
            # A one-symbol code consumes zero bits, which is only
            # well-formed when the declared length is 1 (the simple
            # path always writes 1; libwebp's code-length path special-
            # cases exactly that). A lone symbol of length >1 would
            # bypass the Kraft check below on a corrupt stream.
            if nz[0][0] != 1:
                raise WebpParseError(
                    f"single-symbol prefix code with length {nz[0][0]} != 1"
                )
            self.single = nz[0][1]
            return
        self.single = None
        max_len = max(ln for ln, _ in nz)
        if max_len > 15:
            raise WebpParseError(f"prefix length {max_len} > 15")
        counts = [0] * (max_len + 1)
        for ln, _ in nz:
            counts[ln] += 1
        # completeness (Kraft equality) — an over- or under-subscribed
        # code is corrupt
        kraft = sum(c << (max_len - ln) for ln, c in enumerate(counts) if ln)
        if kraft != 1 << max_len:
            raise WebpParseError("prefix code lengths are not complete")
        self.max_len = max_len
        size = 1 << max_len
        sym_arr = np.zeros(size, dtype=np.uint16)
        len_arr = np.zeros(size, dtype=np.uint8)
        code = 0
        prev_len = 0
        for ln, sym in sorted(nz):
            code <<= ln - prev_len
            prev_len = ln
            rev = int(f"{code:0{ln}b}"[::-1], 2)
            sym_arr[rev :: 1 << ln] = sym
            len_arr[rev :: 1 << ln] = ln
            code += 1
        self.lut_sym = sym_arr.tolist()
        self.lut_len = len_arr.tobytes()

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        p = br.peek(self.max_len)
        ln = self.lut_len[p]
        if ln == 0:
            raise WebpParseError("invalid prefix code")
        br.skip(ln)
        return self.lut_sym[p]


def _simple_code(br: _BitReader, alphabet: int) -> _Huffman:
    num = br.read(1) + 1
    first_8bit = br.read(1)
    s0 = br.read(8 if first_8bit else 1)
    syms = [s0]
    if num == 2:
        syms.append(br.read(8))
    lengths = [0] * alphabet
    for s in syms:
        if s >= alphabet:
            raise WebpParseError(f"simple-code symbol {s} >= {alphabet}")
    if num == 1:
        h = _Huffman.__new__(_Huffman)
        h.single = syms[0]  # zero-bit code: decode consumes nothing
        return h
    if syms[0] == syms[1]:
        raise WebpParseError("simple code repeats a symbol")
    for s in syms:
        lengths[s] = 1
    return _Huffman(lengths)


def _read_code_lengths(
    br: _BitReader, cl_huff: _Huffman, alphabet: int, max_symbol: int
) -> list[int]:
    lengths = [0] * alphabet
    prev = 8
    symbol = 0
    while symbol < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_huff.decode(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev = cl
        else:
            if cl == 16:
                repeat, fill = 3 + br.read(2), prev
            elif cl == 17:
                repeat, fill = 3 + br.read(3), 0
            elif cl == 18:
                repeat, fill = 11 + br.read(7), 0
            else:
                raise WebpParseError(f"code-length symbol {cl}")
            if symbol + repeat > alphabet:
                raise WebpParseError("code-length repeat overruns alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_prefix_code(br: _BitReader, alphabet: int) -> _Huffman:
    if br.read(1):
        return _simple_code(br, alphabet)
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_ORDER[i]] = br.read(3)
    cl_huff = _Huffman(cl_lengths)
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet:
            raise WebpParseError(
                f"max_symbol {max_symbol} exceeds alphabet {alphabet}"
            )
    else:
        max_symbol = alphabet
    return _Huffman(_read_code_lengths(br, cl_huff, alphabet, max_symbol))


def _prefix_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix decoding: 40-entry alphabet of
    (2 + (code & 1)) << extra_bits ranges."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _decode_image(
    br: _BitReader, w: int, h: int, allow_meta: bool
) -> np.ndarray:
    """One entropy-coded VP8L image -> (h*w,) uint32 ARGB pixels."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise WebpParseError(f"color cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_w = hbits = 0
    num_groups = 1
    if allow_meta and br.read(1):
        hbits = br.read(3) + 2
        meta_w = (w + (1 << hbits) - 1) >> hbits
        meta_h = (h + (1 << hbits) - 1) >> hbits
        meta_img = _decode_image(br, meta_w, meta_h, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(meta.max()) + 1

    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )

    n = w * h
    # plain-int list in the hot loop — per-pixel numpy scalar writes
    # cost several times the whole decode
    pixels: list[int] = [0] * n
    cache = [0] * cache_size
    pos = 0
    g_green, g_red, g_blue, g_alpha, g_dist = groups[0]
    multi = meta is not None
    while pos < n:
        if multi:
            gx = (pos % w) >> hbits
            gy = (pos // w) >> hbits
            g_green, g_red, g_blue, g_alpha, g_dist = groups[
                int(meta[gy * meta_w + gx])
            ]
        s = g_green.decode(br)
        if s < 256:
            red = g_red.decode(br)
            blue = g_blue.decode(br)
            alpha = g_alpha.decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            pixels[pos] = px
            pos += 1
            if cache_size:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < 280:
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(g_dist.decode(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos:
                raise WebpParseError(
                    f"backward reference distance {dist} at pixel {pos}"
                )
            if pos + length > n:
                raise WebpParseError("backward reference overruns image")
            src = pos - dist
            if cache_size:
                for _ in range(length):
                    px = pixels[src]
                    pixels[pos] = px
                    cache[
                        (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
                    src += 1
                    pos += 1
            else:
                while length > 0:
                    span = min(length, pos - src)
                    pixels[pos : pos + span] = pixels[src : src + span]
                    pos += span
                    length -= span
        else:
            idx = s - 280
            if idx >= cache_size:
                raise WebpParseError(f"color cache index {idx}")
            pixels[pos] = cache[idx]
            pos += 1
    return np.array(pixels, dtype=np.uint32)


# ------------------------------------------------------- transforms


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.uint16) + b.astype(np.uint16)) >> 1


# predictor modes whose value does not involve the LEFT neighbor:
# within a row these have no serial dependency, so whole block-width
# segments vectorize (the left-dependent modes 1, 5, 6, 7, 10-13 stay
# per-pixel — the dependency is inherent to the inverse)
_TOP_ONLY_MODES = frozenset((0, 2, 3, 4, 8, 9))


def _predict_int(mode, left, top, topleft, topright):
    """Scalar predictor over 4-int [A, R, G, B] sequences — the
    serial path avoids per-pixel numpy overhead (~20x faster)."""
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return [
            ((((left[c] + topright[c]) >> 1) + top[c]) >> 1) for c in range(4)
        ]
    if mode == 6:
        return [(left[c] + topleft[c]) >> 1 for c in range(4)]
    if mode == 7:
        return [(left[c] + top[c]) >> 1 for c in range(4)]
    if mode == 8:
        return [(topleft[c] + top[c]) >> 1 for c in range(4)]
    if mode == 9:
        return [(top[c] + topright[c]) >> 1 for c in range(4)]
    if mode == 10:
        return [
            (((left[c] + topleft[c]) >> 1) + ((top[c] + topright[c]) >> 1))
            >> 1
            for c in range(4)
        ]
    if mode == 11:  # Select
        p = [left[c] + top[c] - topleft[c] for c in range(4)]
        p_left = sum(abs(p[c] - left[c]) for c in range(4))
        p_top = sum(abs(p[c] - top[c]) for c in range(4))
        return left if p_left < p_top else top
    if mode == 12:  # ClampAddSubtractFull
        return [
            min(255, max(0, left[c] + top[c] - topleft[c])) for c in range(4)
        ]
    if mode == 13:  # ClampAddSubtractHalf (C-truncating /2)
        out = []
        for c in range(4):
            ave = (left[c] + top[c]) >> 1
            diff = ave - topleft[c]
            half = ave + (diff // 2 if diff >= 0 else -((-diff) // 2))
            out.append(min(255, max(0, half)))
        return out
    raise WebpParseError(f"predictor mode {mode}")


def _inverse_predictor(
    argb: np.ndarray, w: int, h: int, size_bits: int, modes: np.ndarray
) -> None:
    """In-place inverse of the predictor transform. argb is (h, w, 4)
    uint8 channel-order [A, R, G, B] holding residuals on entry.

    Rows whose blocks all use top-only predictors (no left
    dependency) invert as vectorized segment ops; rows containing a
    left-dependent mode run the serial chain in plain-int Python
    (the dependency is inherent to the inverse)."""
    mode_w = (w + (1 << size_bits) - 1) >> size_bits
    mode_green = ((modes >> 8) & 0xFF).astype(np.int64)
    black = np.array([255, 0, 0, 0], dtype=np.uint8)
    # row 0: pixel 0 adds the 0xff000000 base, the rest chain on the
    # left neighbor = cumulative sum mod 256
    argb[0, 0] = argb[0, 0] + black
    argb[0] = np.cumsum(argb[0].astype(np.uint32), axis=0).astype(np.uint8)
    n_blocks = (w + (1 << size_bits) - 1) >> size_bits
    for y in range(1, h):
        row = argb[y]
        prev = argb[y - 1]
        blocks = mode_green[
            (y >> size_bits) * mode_w : (y >> size_bits) * mode_w + n_blocks
        ]
        if all(int(m) in _TOP_ONLY_MODES for m in blocks):
            row[0] = row[0] + prev[0]  # col 0 predicts from above
            x = 1
            while x < w:
                mode = int(blocks[x >> size_bits])
                seg_end = min(((x >> size_bits) + 1) << size_bits, w)
                top = prev[x:seg_end].astype(np.uint16)
                if mode == 0:
                    pred = np.broadcast_to(black, top.shape)
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    # TR of the rightmost column is the leftmost pixel
                    # of the CURRENT row (spec addressing rule), which
                    # the col-0 step above already reconstructed
                    tr = prev[x + 1 : seg_end + 1]
                    if seg_end == w:
                        tr = np.concatenate([tr, row[:1]])
                    pred = tr
                elif mode == 4:
                    pred = prev[x - 1 : seg_end - 1]
                elif mode == 8:
                    pred = _avg2(prev[x - 1 : seg_end - 1], prev[x:seg_end])
                else:  # 9: Average2(T, TR)
                    tr = prev[x + 1 : seg_end + 1]
                    if seg_end == w:
                        tr = np.concatenate([tr, row[:1]])
                    pred = _avg2(prev[x:seg_end], tr)
                row[x:seg_end] = row[x:seg_end] + pred.astype(np.uint8)
                x = seg_end
        else:
            prev_l = prev.tolist()
            res_l = row.tolist()
            first = [
                (res_l[0][c] + prev_l[0][c]) & 0xFF for c in range(4)
            ]
            out = [first]
            left = first
            for x in range(1, w):
                tr = prev_l[x + 1] if x + 1 < w else out[0]
                pred = _predict_int(
                    int(blocks[x >> size_bits]), left, prev_l[x], prev_l[x - 1], tr
                )
                left = [(res_l[x][c] + pred[c]) & 0xFF for c in range(4)]
                out.append(left)
            row[:] = np.asarray(out, dtype=np.uint8)


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta over arrays: (int8(t) * int8(c)) >> 5 with
    arithmetic shift."""
    prod = t.astype(np.int8).astype(np.int32) * c.astype(np.int8).astype(
        np.int32
    )
    return prod >> 5


def _inverse_color_transform(
    argb: np.ndarray, w: int, h: int, size_bits: int, elements: np.ndarray
) -> None:
    """In-place inverse cross-color transform. Element pixel fields:
    red = red_to_blue, green = green_to_blue, blue = green_to_red."""
    bs = 1 << size_bits
    ew = (w + bs - 1) >> size_bits
    elems = elements.reshape(-1)
    bx = np.arange(w) >> size_bits
    for y in range(h):
        row = argb[y]
        e = elems[(y >> size_bits) * ew + bx]
        g2r = (e >> 0) & 0xFF  # blue field
        g2b = (e >> 8) & 0xFF  # green field
        r2b = (e >> 16) & 0xFF  # red field
        green = row[:, 2]
        red = (
            row[:, 1].astype(np.int32) + _ct_delta(g2r, green)
        ) & 0xFF
        blue = (
            row[:, 3].astype(np.int32)
            + _ct_delta(g2b, green)
            + _ct_delta(r2b, red.astype(np.uint8))
        ) & 0xFF
        row[:, 1] = red.astype(np.uint8)
        row[:, 3] = blue.astype(np.uint8)


def _decode_vp8l_body(br: _BitReader, w: int, h: int) -> np.ndarray:
    """Post-header VP8L stream (transform loop + entropy-coded
    image + inverse transforms) -> (h, w, 4) uint8 RGBA. Shared by
    still/animated pixel decode and the headerless ALPH alpha
    stream (which stores alpha in the green channel)."""
    # transforms are read in stream order at the then-current width
    cur_w = w
    transforms: list[tuple] = []
    seen = set()
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise WebpParseError(f"transform {ttype} appears twice")
        seen.add(ttype)
        if ttype == 0:  # predictor
            size_bits = br.read(3) + 2
            tw = (cur_w + (1 << size_bits) - 1) >> size_bits
            th = (h + (1 << size_bits) - 1) >> size_bits
            modes = _decode_image(br, tw, th, False)
            transforms.append(("predictor", size_bits, modes))
        elif ttype == 1:  # cross-color
            size_bits = br.read(3) + 2
            tw = (cur_w + (1 << size_bits) - 1) >> size_bits
            th = (h + (1 << size_bits) - 1) >> size_bits
            elems = _decode_image(br, tw, th, False)
            transforms.append(("color", size_bits, elems))
        elif ttype == 2:  # subtract green
            transforms.append(("subtract_green",))
        else:  # color indexing
            n_colors = br.read(8) + 1
            deltas = _decode_image(br, n_colors, 1, False)
            palette = np.cumsum(
                deltas.view(np.uint8).reshape(-1, 4).astype(np.uint32),
                axis=0,
                dtype=np.uint32,
            ).astype(np.uint8)
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append(
                ("indexing", width_bits, palette, n_colors, cur_w)
            )
            cur_w = (cur_w + (1 << width_bits) - 1) >> width_bits

    pixels = _decode_image(br, cur_w, h, True)
    # (h*w,) uint32 ARGB -> (h, w, 4) uint8 [A, R, G, B]
    le = pixels.view(np.uint8).reshape(h, cur_w, 4)  # [B, G, R, A] LE
    argb = le[:, :, [3, 2, 1, 0]].copy()

    for t in reversed(transforms):
        if t[0] == "indexing":
            _, width_bits, palette, n_colors, orig_w = t
            if width_bits:
                bpp = 8 >> width_bits
                mask = (1 << bpp) - 1
                xs = np.arange(orig_w)
                packed_green = argb[:, xs >> width_bits, 2]
                idx = (packed_green >> ((xs & ((1 << width_bits) - 1)) * bpp)) & mask
            else:
                idx = argb[:, :, 2].astype(np.int64)
            if int(idx.max(initial=0)) >= n_colors:
                raise WebpParseError("palette index outside the color table")
            argb = palette[idx][:, :, [3, 2, 1, 0]]  # stored LE BGRA
        elif t[0] == "predictor":
            _inverse_predictor(argb, argb.shape[1], h, t[1], t[2])
        elif t[0] == "color":
            _inverse_color_transform(argb, argb.shape[1], h, t[1], t[2])
        else:  # subtract_green
            g = argb[:, :, 2]
            argb[:, :, 1] = argb[:, :, 1] + g  # uint8 wraps
            argb[:, :, 3] = argb[:, :, 3] + g

    return np.ascontiguousarray(argb[:, :, [1, 2, 3, 0]])


def _decode_alph(body: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk -> (h, w) uint8 alpha plane. Method byte packs
    rsrv(2) P(2) F(2) C(2); C=0 is a raw w*h plane, C=1 a headerless
    VP8L stream of implicit dimensions whose GREEN channel carries
    alpha (transform loop included — libwebp emits a predictor
    transform on smooth planes). Filtering (F) is inverted per the
    container spec: row 0 left-chains, later rows predict the first
    pixel from above and the rest from left / above / the clamped
    gradient. Level-reduction preprocessing (P=1) is a lossy encoder
    step with no inverse."""
    if not body:
        raise WebpParseError("empty ALPH chunk")
    method = body[0]
    if method >> 6:
        raise WebpParseError("reserved ALPH bits set")
    filt = (method >> 2) & 3
    comp = method & 3
    if comp == 0:
        if len(body) - 1 < w * h:
            raise WebpParseError(
                f"raw ALPH holds {len(body) - 1} bytes for {w * h} pixels"
            )
        alpha = np.frombuffer(
            body, dtype=np.uint8, count=w * h, offset=1
        ).reshape(h, w).copy()
    elif comp == 1:
        rgba = _decode_vp8l_body(_BitReader(body[1:]), w, h)
        alpha = rgba[:, :, 1].copy()  # green channel
    else:
        raise WebpParseError(f"ALPH compression method {comp} invalid")
    if filt == 0:
        return alpha
    a = alpha.astype(np.int64)
    if filt == 1:  # horizontal: cumulative left; rows>0 seed from above
        a[0] = np.cumsum(a[0]) & 0xFF
        for y in range(1, h):
            a[y, 0] = (a[y, 0] + a[y - 1, 0]) & 0xFF
            a[y] = np.cumsum(a[y]) & 0xFF
    elif filt == 2:  # vertical: row 0 left-chains, then add above
        a[0] = np.cumsum(a[0]) & 0xFF
        a = np.cumsum(a, axis=0) & 0xFF
    else:  # gradient
        a[0] = np.cumsum(a[0]) & 0xFF
        for y in range(1, h):
            left = int(a[y - 1, 0])
            top_left = left
            row = a[y]
            prev = a[y - 1]
            for x in range(w):
                top = int(prev[x])
                pred = min(255, max(0, left + top - top_left))
                left = (int(row[x]) + pred) & 0xFF
                top_left = top
                row[x] = left
    return a.astype(np.uint8)


def decode_webp(data: bytes) -> np.ndarray:
    """WebP bytes -> (h, w, 3|4) uint8 (RGB when fully opaque)."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpParseError("not a RIFF/WEBP stream")
    pos = 12
    payload = None
    alph_body = None
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            payload = body
            break
        if fourcc == b"ALPH":
            # alpha sidecar for the following lossy VP8 chunk
            alph_body = bytes(body)
            pos += 8 + size + (size & 1)
            continue
        if fourcc == b"VP8 ":
            # lossy still image: a single VP8 intra keyframe
            # (clean-room decoder in sources/vp8.py, RFC 6386)
            from hortacloud_importer_spark.sources.vp8 import (
                Vp8ParseError,
                decode_vp8,
                yuv_to_rgb,
            )

            try:
                y, u, v = decode_vp8(bytes(body))
            except Vp8ParseError as exc:
                raise WebpParseError(f"VP8: {exc}") from exc
            rgb = yuv_to_rgb(y, u, v)
            if alph_body is None:
                return rgb
            alpha = _decode_alph(
                alph_body, rgb.shape[1], rgb.shape[0]
            )
            return np.ascontiguousarray(
                np.dstack([rgb, alpha])
            )
        if fourcc == b"VP8X":
            # extended container: flags byte is RR I L E X A R
            # (MSB-first). Stills (with or without an ALPH sidecar)
            # decode through the inner chunks; animations route via
            # decode_webp_frames.
            if len(body) < 10:
                raise WebpParseError("short VP8X header")
            flags = body[0]
            if flags & 0x02:
                raise WebpParseError(
                    "animated WebP: decode_webp is the still-image "
                    "API; use decode_webp_frames"
                )
            pos += 8 + size + (size & 1)
            continue
        pos += 8 + size + (size & 1)
    if payload is None:
        raise WebpParseError("no VP8/VP8L chunk in container")
    if not payload or payload[0] != 0x2F:
        raise WebpParseError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint
    version = br.read(3)
    if version != 0:
        raise WebpParseError(f"VP8L version {version}")
    if w * h > MAX_PIXELS:
        raise WebpParseError(
            f"{w}x{h} exceeds the {MAX_PIXELS}-pixel decode guard"
        )

    rgba = _decode_vp8l_body(br, w, h)
    if (rgba[:, :, 3] == 255).all():
        return np.ascontiguousarray(rgba[:, :, :3])
    return rgba


def webp_probe(data: bytes) -> tuple[int, int, str]:
    """(height, width, variant) from container headers only, for ALL
    three WebP variants — including lossy 'VP8 ' and extended 'VP8X',
    whose PIXELS gate: a crawl metadata pass still gets dimensions
    from the public frame/canvas headers."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpParseError("not a RIFF/WEBP stream")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            if len(body) < 5 or body[0] != 0x2F:
                raise WebpParseError("bad VP8L signature byte")
            bits = int.from_bytes(body[1:5], "little")
            return ((bits >> 14) & 0x3FFF) + 1, (bits & 0x3FFF) + 1, "lossless"
        if fourcc == b"VP8 ":
            # VP8 keyframe: 3-byte frame tag, 0x9d012a start code,
            # then 14-bit LE width/height
            if len(body) < 10 or body[3:6] != b"\x9d\x01\x2a":
                raise WebpParseError("bad VP8 keyframe header")
            if body[0] & 0x1:
                raise WebpParseError("VP8 stream starts with an interframe")
            w = int.from_bytes(body[6:8], "little") & 0x3FFF
            h = int.from_bytes(body[8:10], "little") & 0x3FFF
            return h, w, "lossy"
        if fourcc == b"VP8X":
            if len(body) < 10:
                raise WebpParseError("short VP8X header")
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            variant = "animated" if body[0] & 0x02 else "extended"
            return h, w, variant
        pos += 8 + size + (size & 1)
    raise WebpParseError("no VP8/VP8L/VP8X chunk in container")


def webp_frame_count(data: bytes) -> int:
    """Number of ANMF frames (1 for stills) — header walk only."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpParseError("not a RIFF/WEBP stream")
    pos = 12
    n = 0
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if fourcc == b"ANMF":
            n += 1
        pos += 8 + size + (size & 1)
    return max(n, 1)


def decode_webp_frames(data: bytes) -> np.ndarray:
    """WebP bytes -> (n_frames, h, w, 3|4) uint8.

    Stills (simple VP8/VP8L, or VP8X without the ANIM flag) come back
    as one frame with their native channel count (RGBA preserved).
    Animated containers composite to (n, canvas_h, canvas_w, 3) RGB. Animated VP8X containers composite every ANMF frame
    onto the canvas per the container spec: frames place at their
    (x, y) offsets, the blend flag selects alpha-over vs overwrite
    (integer blend, round-half-up), and dispose-to-background refills
    the frame rectangle with the declared ANIM background color after
    the frame is snapshotted. Frame payloads are the same clean-room
    VP8 / VP8L decoders as stills; an ALPH subchunk gates by name."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpParseError("not a RIFF/WEBP stream")
    pos = 12
    vp8x = None
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if fourcc == b"VP8X":
            vp8x = data[pos + 8 : pos + 8 + size]
            break
        pos += 8 + size + (size & 1)
    if vp8x is None or len(vp8x) < 10 or not vp8x[0] & 0x02:
        # stills keep their native channel count — RGBA VP8L and
        # ALPH-paired lossy stills surface transparency (mirroring
        # decode_png_frames); only ANMF frames composite to RGB.
        return decode_webp(data)[None]
    cw = int.from_bytes(vp8x[4:7], "little") + 1
    ch = int.from_bytes(vp8x[7:10], "little") + 1
    if cw * ch > MAX_PIXELS:
        raise WebpParseError(
            f"canvas {cw}x{ch} exceeds the {MAX_PIXELS}-pixel guard"
        )

    bg = np.zeros(3, dtype=np.uint8)
    canvas = None
    frames: list[np.ndarray] = []
    pos += 8 + len(vp8x) + (len(vp8x) & 1)
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise WebpParseError(f"truncated {fourcc!r} chunk")
        pos += 8 + size + (size & 1)
        if fourcc == b"ANIM":
            if len(body) < 6:
                raise WebpParseError("short ANIM chunk")
            # background color is [B, G, R, A] byte order
            bg = np.array([body[2], body[1], body[0]], dtype=np.uint8)
            canvas = np.broadcast_to(bg, (ch, cw, 3)).copy()
        elif fourcc == b"ANMF":
            if canvas is None:
                raise WebpParseError("ANMF before ANIM chunk")
            if len(body) < 16:
                raise WebpParseError("short ANMF header")
            fx = int.from_bytes(body[0:3], "little") * 2
            fy = int.from_bytes(body[3:6], "little") * 2
            fw = int.from_bytes(body[6:9], "little") + 1
            fh = int.from_bytes(body[9:12], "little") + 1
            flags = body[15]
            no_blend = bool(flags & 0x02)
            dispose_bg = bool(flags & 0x01)
            if fx + fw > cw or fy + fh > ch:
                raise WebpParseError(
                    f"frame {fw}x{fh}@{fx},{fy} exceeds the "
                    f"{cw}x{ch} canvas"
                )
            sub = _anmf_payload(body[16:])
            if sub.shape[:2] != (fh, fw):
                raise WebpParseError(
                    f"frame payload is {sub.shape[1]}x{sub.shape[0]}, "
                    f"ANMF declares {fw}x{fh}"
                )
            rect = canvas[fy : fy + fh, fx : fx + fw]
            if sub.shape[2] == 4 and not no_blend:
                a = sub[:, :, 3:].astype(np.uint16)
                mixed = (
                    a * sub[:, :, :3].astype(np.uint16)
                    + (255 - a) * rect.astype(np.uint16)
                    + 127
                ) // 255
                rect[:] = mixed.astype(np.uint8)
            else:
                rect[:] = sub[:, :, :3]
            frames.append(canvas.copy())
            if dispose_bg:
                rect[:] = bg
            if len(frames) * ch * cw > MAX_PIXELS * 4:
                raise WebpParseError(
                    "animation exceeds the total-pixel decode guard"
                )
    if not frames:
        raise WebpParseError("ANIM container with no ANMF frames")
    return np.stack(frames)


def _anmf_payload(body: bytes) -> np.ndarray:
    """Decode the frame subchunks inside one ANMF body -> (h, w, 3|4).
    VP8L frames carry alpha natively; lossy frames pair a VP8 chunk
    with an ALPH sidecar — both rewrap into a still container so the
    whole still path (including alpha) is reused."""
    pos = 0
    chunks = []
    while pos + 8 <= len(body):
        fourcc = body[pos : pos + 4]
        (size,) = struct.unpack("<I", body[pos + 4 : pos + 8])
        chunk = body[pos + 8 : pos + 8 + size]
        if fourcc in (b"ALPH", b"VP8 ", b"VP8L"):
            chunks.append(
                fourcc
                + struct.pack("<I", len(chunk))
                + chunk
                + (b"\x00" if len(chunk) & 1 else b"")
            )
            if fourcc != b"ALPH":
                inner = b"WEBP" + b"".join(chunks)
                return decode_webp(
                    b"RIFF" + struct.pack("<I", len(inner)) + inner
                )
        pos += 8 + size + (size & 1)
    raise WebpParseError("ANMF frame without a VP8/VP8L payload")


def encode_webp_alpha(
    mb_vals,
    alpha: np.ndarray,
    filt: int = 0,
) -> bytes:
    """Fixture encoder: a VP8X still pairing a lossy VP8 frame
    (sources/vp8.py per-macroblock luma constants) with a raw
    (compression 0) ALPH plane under filter ``filt`` (0..3) —
    exercising the decoder's unfilter paths without libwebp."""
    from hortacloud_importer_spark.sources.vp8 import encode_vp8

    h, w = alpha.shape
    if filt not in (0, 1, 2, 3):
        raise WebpParseError(f"ALPH filter {filt} invalid")
    a = alpha.astype(np.int64)
    res = a.copy()
    if filt == 1:  # horizontal
        res[:, 1:] = a[:, 1:] - a[:, :-1]
        res[1:, 0] = a[1:, 0] - a[:-1, 0]
    elif filt == 2:  # vertical (row 0 horizontal)
        res[0, 1:] = a[0, 1:] - a[0, :-1]
        res[1:] = a[1:] - a[:-1]
    elif filt == 3:  # gradient (row 0 horizontal)
        res[0, 1:] = a[0, 1:] - a[0, :-1]
        for y in range(1, h):
            for x in range(w):
                left = int(a[y, x - 1]) if x else int(a[y - 1, 0])
                top = int(a[y - 1, x])
                top_left = int(a[y - 1, x - 1]) if x else top
                res[y, x] = a[y, x] - min(255, max(0, left + top - top_left))
    alph = bytes([filt << 2]) + (res & 0xFF).astype(np.uint8).tobytes()
    vp8 = encode_vp8(mb_vals)
    chunks = []
    vp8x = bytes([0x10, 0, 0, 0]) + (w - 1).to_bytes(3, "little") + (
        h - 1
    ).to_bytes(3, "little")
    chunks.append(b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x)
    chunks.append(
        b"ALPH" + struct.pack("<I", len(alph)) + alph
        + (b"\x00" if len(alph) & 1 else b"")
    )
    chunks.append(
        b"VP8 " + struct.pack("<I", len(vp8)) + vp8
        + (b"\x00" if len(vp8) & 1 else b"")
    )
    inner = b"WEBP" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(inner)) + inner


def encode_webp_anim(
    frames: "list[np.ndarray]",
    offsets: "list[tuple[int, int]] | None" = None,
    canvas: tuple[int, int] | None = None,
    bg: tuple[int, int, int] = (0, 0, 0),
    no_blend: bool = True,
    dispose_bg: bool = False,
) -> bytes:
    """Fixture encoder: RGB frames -> animated WebP (VP8X + ANIM +
    one lossless VP8L ANMF per frame). Offsets must be even (the
    container stores x/2, y/2)."""
    if not frames:
        raise WebpParseError("need at least one frame")
    offsets = offsets or [(0, 0)] * len(frames)
    if canvas is None:
        ch = max(y + f.shape[0] for (x, y), f in zip(offsets, frames))
        cw = max(x + f.shape[1] for (x, y), f in zip(offsets, frames))
    else:
        cw, ch = canvas
    chunks = []
    flags = 0x02  # ANIM
    vp8x = bytes([flags, 0, 0, 0]) + (cw - 1).to_bytes(3, "little") + (
        ch - 1
    ).to_bytes(3, "little")
    chunks.append(b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x)
    anim = bytes([bg[2], bg[1], bg[0], 0xFF]) + struct.pack("<H", 0)
    chunks.append(b"ANIM" + struct.pack("<I", len(anim)) + anim)
    for (x, y), frame in zip(offsets, frames):
        if x % 2 or y % 2:
            raise WebpParseError("frame offsets must be even")
        payload = encode_webp(frame)
        vp8l_off = payload.index(b"VP8L")
        (vp8l_len,) = struct.unpack(
            "<I", payload[vp8l_off + 4 : vp8l_off + 8]
        )
        vp8l = payload[vp8l_off : vp8l_off + 8 + vp8l_len + (vp8l_len & 1)]
        fl = (0x02 if no_blend else 0) | (0x01 if dispose_bg else 0)
        body = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (frame.shape[1] - 1).to_bytes(3, "little")
            + (frame.shape[0] - 1).to_bytes(3, "little")
            + (100).to_bytes(3, "little")  # duration ms
            + bytes([fl])
            + vp8l
        )
        chunks.append(
            b"ANMF" + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) & 1 else b"")
        )
    inner = b"WEBP" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(inner)) + inner


# ------------------------------------------------------------ encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        """LSB-first field write (header fields, extra bits)."""
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, n: int) -> None:
        """Prefix-code write: bits MSB-first (how decoders walk the
        tree), each as a 1-bit LSB-first field."""
        for i in range(n - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytes(self.out)
        if self.nbits:
            out += bytes([self.acc & 0xFF])
        return out


def _write_flat_literal_code(bw: _BitWriter, alphabet: int) -> None:
    """Emit a 'normal' prefix code where symbols 0..255 all have
    length 8 (a complete flat code) and the rest of the alphabet is
    absent — via the code-length code, exercising its zero-run path."""
    bw.write(0, 1)  # not a simple code
    # code-length code: symbol 8 -> 1 bit, symbols 17/18 -> 2 bits
    # (spec slot order 17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8 -> 12
    # slots to reach symbol 8)
    bw.write(12 - 4, 4)
    for sym_len in (2, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1):
        bw.write(sym_len, 3)
    bw.write(0, 1)  # no max_symbol cap
    # canonical CL codes: 8 -> '0'; 17 -> '10'; 18 -> '11'
    for _ in range(256):
        bw.write_code(0b0, 1)  # length 8
    rest = alphabet - 256
    while rest > 0:
        run = min(rest, 138)
        if run < 11:
            bw.write_code(0b10, 2)  # 17: 3 + ReadBits(3) zeros
            bw.write(run - 3, 3)
        else:
            bw.write_code(0b11, 2)  # 18: 11 + ReadBits(7) zeros
            bw.write(run - 11, 7)
        rest -= run


def _write_single_symbol_code(bw: _BitWriter, symbol: int) -> None:
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    bw.write(1, 1)  # 8-bit symbol
    bw.write(symbol, 8)


def encode_webp(img: np.ndarray, subtract_green: bool = False) -> bytes:
    """(h, w), (h, w, 3) or (h, w, 4) uint8 -> lossless WebP bytes.

    Fixture writer: literal-only VP8L (flat 8-bit codes; constant
    channels collapse to zero-bit simple codes), optionally behind the
    subtract-green transform. No LZ77/cache/palette — those decoder
    paths are pinned by hand-built streams in the tests."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise WebpParseError(f"dims {w}x{h} outside VP8L's 14-bit range")
    if c == 1:
        img = np.repeat(img, 3, axis=2)
        c = 3
    if c == 3:
        alpha = np.full((h, w), 255, dtype=np.uint8)
        rgb = img
    elif c == 4:
        alpha = img[:, :, 3]
        rgb = img[:, :, :3]
    else:
        raise WebpParseError(f"unsupported channel count {c}")
    red = rgb[:, :, 0].astype(np.int32)
    green = rgb[:, :, 1].astype(np.int32)
    blue = rgb[:, :, 2].astype(np.int32)
    if subtract_green:
        red = (red - green) & 0xFF
        blue = (blue - green) & 0xFF

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(int((alpha != 255).any()), 1)
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)  # a transform follows
        bw.write(2, 2)  # subtract-green
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta-prefix image

    planes = [green, red, blue, alpha.astype(np.int32)]
    codes = []
    for i, plane in enumerate(planes):
        alphabet = 256 + 24 if i == 0 else 256
        const = plane.min() == plane.max()
        if const and i != 0:
            _write_single_symbol_code(bw, int(plane.flat[0]))
            codes.append(None)
        else:
            _write_flat_literal_code(bw, alphabet)
            codes.append("flat")
    _write_single_symbol_code(bw, 0)  # distance code (never used)

    g, r, b, a = (p.ravel() for p in planes)
    for i in range(h * w):
        bw.write_code(int(g[i]), 8)
        if codes[1] == "flat":
            bw.write_code(int(r[i]), 8)
        if codes[2] == "flat":
            bw.write_code(int(b[i]), 8)
        if codes[3] == "flat":
            bw.write_code(int(a[i]), 8)

    payload = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
