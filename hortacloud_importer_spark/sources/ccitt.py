"""Clean-room CCITT Group 3 / Group 4 fax decoders (ITU-T T.4/T.6).

Scanned-document corpora are overwhelmingly bilevel TIFFs with
compression 2 (T.4 one-dimensional "Modified Huffman" RLE, rows
byte-aligned), 3 (full Group 3: EOL framing with per-line 1-D or 2-D
coding), or 4 (Group 4 / T.6 pure two-dimensional coding). The reference outsources these to
tifffile; this module implements them from the public ITU-T T.4/T.6
code listings: the white/black terminating + make-up run-length
tables (T.4 §2), the extended make-up codes shared by both colors,
the 2-D vertical/pass/horizontal mode codes (T.4 §4.2 / T.6 §2), and
uncompressed mode (the 0000001111 extension + Table-4 literal pixel
codes + exit-T, i.e. T4Options/T6Options bit 1).

Decode output is "ink" bits — uint8 (rows, width), 1 = black run, 0 =
white — independent of TIFF photometric; the TIFF layer maps ink to
sample values (PhotometricInterpretation 0: white paper = 0).

Conformance is pinned behaviorally by tests/test_ccitt.py against an
independent implementation (the JDK's javax.imageio TIFF plugin,
compiled on the fly): Java-encoded CCITT streams must decode here to
the exact raster Java itself reads back. Corruption raises
:class:`CcittParseError` (the named-error crawl contract).
"""

from __future__ import annotations

import numpy as np


class CcittParseError(ValueError):
    pass


# T.4 Table 2 — white terminating codes (run 0..63) as bit strings
_WHITE_TERM = (
    "00110101", "000111", "0111", "1000", "1011", "1100", "1110", "1111",
    "10011", "10100", "00111", "01000", "001000", "000011", "110100",
    "110101", "101010", "101011", "0100111", "0001100", "0001000",
    "0010111", "0000011", "0000100", "0101000", "0101011", "0010011",
    "0100100", "0011000", "00000010", "00000011", "00011010", "00011011",
    "00010010", "00010011", "00010100", "00010101", "00010110", "00010111",
    "00101000", "00101001", "00101010", "00101011", "00101100", "00101101",
    "00000100", "00000101", "00001010", "00001011", "01010010", "01010011",
    "01010100", "01010101", "00100100", "00100101", "01011000", "01011001",
    "01011010", "01011011", "01001010", "01001011", "00110010", "00110011",
    "00110100",
)
# T.4 Table 2 — white make-up codes (runs 64, 128, ..., 1728)
_WHITE_MAKEUP = (
    "11011", "10010", "010111", "0110111", "00110110", "00110111",
    "01100100", "01100101", "01101000", "01100111", "011001100",
    "011001101", "011010010", "011010011", "011010100", "011010101",
    "011010110", "011010111", "011011000", "011011001", "011011010",
    "011011011", "010011000", "010011001", "010011010", "011000",
    "010011011",
)
# T.4 Table 3 — black terminating codes (run 0..63)
_BLACK_TERM = (
    "0000110111", "010", "11", "10", "011", "0011", "0010", "00011",
    "000101", "000100", "0000100", "0000101", "0000111", "00000100",
    "00000111", "000011000", "0000010111", "0000011000", "0000001000",
    "00001100111", "00001101000", "00001101100", "00000110111",
    "00000101000", "00000010111", "00000011000", "000011001010",
    "000011001011", "000011001100", "000011001101", "000001101000",
    "000001101001", "000001101010", "000001101011", "000011010010",
    "000011010011", "000011010100", "000011010101", "000011010110",
    "000011010111", "000001101100", "000001101101", "000011011010",
    "000011011011", "000001010100", "000001010101", "000001010110",
    "000001010111", "000001100100", "000001100101", "000001010010",
    "000001010011", "000000100100", "000000110111", "000000111000",
    "000000100111", "000000101000", "000001011000", "000001011001",
    "000000101011", "000000101100", "000001011010", "000001100110",
    "000001100111",
)
# T.4 Table 3 — black make-up codes (runs 64..1728)
_BLACK_MAKEUP = (
    "0000001111", "000011001000", "000011001001", "000001011011",
    "000000110011", "000000110100", "000000110101", "0000001101100",
    "0000001101101", "0000001001010", "0000001001011", "0000001001100",
    "0000001001101", "0000001110010", "0000001110011", "0000001110100",
    "0000001110101", "0000001110110", "0000001110111", "0000001010010",
    "0000001010011", "0000001010100", "0000001010101", "0000001011010",
    "0000001011011", "0000001100100", "0000001100101",
)
# T.4 Table 4 — extended make-up codes (runs 1792..2560, both colors)
_EXT_MAKEUP = (
    "00000001000", "00000001100", "00000001101", "000000010010",
    "000000010011", "000000010100", "000000010101", "000000010110",
    "000000010111", "000000011100", "000000011101", "000000011110",
    "000000011111",
)


def _build(term, makeup):
    table: dict[tuple[int, int], int] = {}
    for run, code in enumerate(term):
        table[(len(code), int(code, 2))] = run
    for i, code in enumerate(makeup):
        table[(len(code), int(code, 2))] = 64 * (i + 1)
    for i, code in enumerate(_EXT_MAKEUP):
        table[(len(code), int(code, 2))] = 1792 + 64 * i
    return table


_WHITE = _build(_WHITE_TERM, _WHITE_MAKEUP)
_BLACK = _build(_BLACK_TERM, _BLACK_MAKEUP)
_MAX_CODE_LEN = 14


class _Bits:
    """MSB-first bit reader over the strip payload."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def bit(self) -> int:
        p = self.pos
        if p >= 8 * len(self.data):
            raise CcittParseError("CCITT stream exhausted")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self, slack_bits: int = 0) -> bool:
        return self.pos + slack_bits >= 8 * len(self.data)


def _read_run(bits: _Bits, table) -> int:
    """One complete run: make-up codes accumulate until a terminating
    code (< 64) closes the run (T.4 §2.2)."""
    total = 0
    for _ in range(64):  # bound: runs can't chain 64 make-ups
        ln = 0
        code = 0
        while ln < _MAX_CODE_LEN:
            code = (code << 1) | bits.bit()
            ln += 1
            run = table.get((ln, code))
            if run is not None:
                break
        else:
            raise CcittParseError(f"invalid T.4 run code {code:0{ln}b}")
        total += run
        if run < 64:
            return total
    raise CcittParseError("runaway T.4 make-up chain")


def _transitions_to_row(trans: list[int], width: int) -> np.ndarray:
    row = np.zeros(width, np.uint8)
    for i in range(0, len(trans) - 1, 2):
        row[trans[i] : trans[i + 1]] = 1
    if len(trans) % 2 == 1:
        row[trans[-1] :] = 1
    return row


def _decode_2d_line(bits: _Bits, ref: list[int], width: int) -> list[int]:
    """One two-dimensional coded line (T.6 §2 / T.4 §4.2.1) against
    the reference line's transition list. Returns the new line's
    transitions."""
    trans: list[int] = []
    a0 = -1
    color = 0  # 0 = white
    while a0 < width:
        # locate b1: first reference transition > a0 with the parity
        # of the current color; b2 follows it
        i = 0
        n = len(ref)
        while i < n and (ref[i] <= a0 or (i & 1) != color):
            i += 1
        b1 = ref[i] if i < n else width
        b2 = ref[i + 1] if i + 1 < n else width
        if bits.bit():  # 1 -> V0
            a1 = b1
        else:
            if bits.bit():  # 01x -> VR1 / VL1
                a1 = b1 + 1 if bits.bit() else b1 - 1
            elif bits.bit():  # 001 -> horizontal
                r1 = _read_run(bits, _BLACK if color else _WHITE)
                r2 = _read_run(bits, _WHITE if color else _BLACK)
                start = a0 if a0 > 0 else 0
                a1 = start + r1
                a2 = a1 + r2
                if a2 > width:
                    raise CcittParseError("horizontal runs overrun row")
                trans += [a1, a2]
                a0 = a2
                continue
            elif bits.bit():  # 0001 -> pass
                a0 = b2
                continue
            else:  # 0000 0...
                if bits.bit():  # 00001x -> VR2/VL2
                    a1 = b1 + 2 if bits.bit() else b1 - 2
                elif bits.bit():  # 000001x -> VR3/VL3
                    a1 = b1 + 3 if bits.bit() else b1 - 3
                elif bits.bit():  # 0000001xxx -> extension
                    ext = (bits.bit() << 2) | (bits.bit() << 1) | bits.bit()
                    if ext != 0b111:
                        raise CcittParseError(
                            f"T.6 extension type {ext} unsupported"
                        )
                    # uncompressed mode (T.4 4.2.1.4 / T.6 Table 4):
                    # literal pixel values until an exit code; the
                    # exit's T bit names the color of the next run
                    p = a0 if a0 > 0 else 0
                    cur = len(trans) & 1
                    lit, t_color = _decode_uncompressed(bits, width - p)
                    for b in lit:
                        if b != cur:
                            if trans and p < trans[-1]:
                                raise CcittParseError(
                                    "uncompressed pixels out of order"
                                )
                            trans.append(p)
                            cur = b
                        p += 1
                    a0 = p
                    if t_color != cur and a0 < width:
                        trans.append(a0)
                    color = len(trans) & 1
                    continue
                else:
                    raise CcittParseError(
                        "unsupported T.6 code / premature EOFB"
                    )
        if a1 < 0 or a1 > width or (trans and a1 < trans[-1]):
            raise CcittParseError("2-D transition out of order")
        trans.append(a1)
        a0 = a1
        color ^= 1
    return trans


def _decode_uncompressed(bits: _Bits, room: int) -> tuple[list, int]:
    """T.4 Table 5 / T.6 Table 4 uncompressed-mode body: -> (literal
    pixel values, T). Codes are runs of k white pixels: k<=4 followed
    by a black pixel ('0'*k + '1'), exactly five whites ('000001'),
    or the exit codes ('0'*(6+n) + '1' + T, n<=4 trailing whites,
    T = color of the run that resumes 2-D coding)."""
    lit: list = []
    while True:
        k = 0
        while not bits.bit():
            k += 1
            if k > 10:
                raise CcittParseError(
                    "uncompressed-mode code exceeds 10 zeros"
                )
        if k <= 4:
            lit += [0] * k + [1]
        elif k == 5:
            lit += [0] * 5
        else:  # exit with k-6 trailing whites, then the T bit
            lit += [0] * (k - 6)
            t_color = bits.bit()
            if len(lit) > room:
                raise CcittParseError(
                    "uncompressed pixels overrun the row"
                )
            return lit, t_color
        if len(lit) > room:
            raise CcittParseError("uncompressed pixels overrun the row")


def _decode_1d_line(bits: _Bits, width: int) -> list[int]:
    """One Modified-Huffman line (T.4 §2): alternating white/black
    runs starting white. Returns the line's transitions."""
    trans: list[int] = []
    pos = 0
    color = 0
    while pos < width:
        run = _read_run(bits, _BLACK if color else _WHITE)
        pos += run
        if pos > width:
            raise CcittParseError("T.4 run overruns row")
        trans.append(pos)
        color ^= 1
    return trans


def decode_g4(data: bytes, width: int, height: int) -> np.ndarray:
    """T.6 (Group 4) strip -> (height, width) uint8 ink bits."""
    if width <= 0 or height <= 0:
        raise CcittParseError("bad CCITT dimensions")
    bits = _Bits(data)
    out = np.zeros((height, width), np.uint8)
    ref = [width, width]  # imaginary all-white reference line
    for y in range(height):
        trans = _decode_2d_line(bits, ref, width)
        out[y] = _transitions_to_row(trans, width)
        ref = trans + [width, width]
    return out


def decode_g3(data: bytes, width: int, height: int) -> np.ndarray:
    """Full Group 3 (TIFF compression 3 with T4Options bit 0 set):
    every line is EOL-framed; the bit after each EOL selects 1-D
    Modified Huffman (1) or 2-D coding against the previous line (0)
    — T.4 §4.2.1."""
    if width <= 0 or height <= 0:
        raise CcittParseError("bad CCITT dimensions")
    bits = _Bits(data)
    out = np.zeros((height, width), np.uint8)
    ref = [width, width]
    for y in range(height):
        _expect_eol(bits)
        if bits.bit():  # 1-D line
            trans = _decode_1d_line(bits, width)
        else:
            trans = _decode_2d_line(bits, ref, width)
        out[y] = _transitions_to_row(trans, width)
        ref = trans + [width, width]
    return out


def decode_mh(
    data: bytes, width: int, height: int, *, eol: bool = False
) -> np.ndarray:
    """T.4 one-dimensional Modified Huffman strip -> ink bits.

    ``eol=False`` is TIFF compression 2 (each row starts byte-
    aligned, no EOL codes); ``eol=True`` is the 1-D flavor of TIFF
    compression 3 (each row preceded by an EOL, fill bits allowed)."""
    if width <= 0 or height <= 0:
        raise CcittParseError("bad CCITT dimensions")
    bits = _Bits(data)
    out = np.zeros((height, width), np.uint8)
    for y in range(height):
        if eol:
            _expect_eol(bits)
        else:
            bits.align()
        out[y] = _transitions_to_row(_decode_1d_line(bits, width), width)
    return out


def _expect_eol(bits: _Bits) -> None:
    """Consume fill zeros + the 000000000001 EOL code (T.4 §4.1.2)."""
    zeros = 0
    while True:
        b = bits.bit()
        if b:
            if zeros < 11:
                raise CcittParseError("malformed T.4 EOL")
            return
        zeros += 1
        if zeros > 64 + 11:
            raise CcittParseError("runaway T.4 fill")


# ------------------------------------------------------------ encoders
#
# Minimal writers for fixtures and reverse-parity tests: every line is
# coded with horizontal-mode run pairs (G4) or plain MH runs — always
# valid T.6/T.4, never optimal. The run-length tables invert the
# decoder's, so goldens cross-check both directions; tests/test_ccitt
# additionally makes the JDK's TIFF plugin decode these streams.

_ENC_WHITE: dict[int, str] = {}
_ENC_BLACK: dict[int, str] = {}
for _run, _code in enumerate(_WHITE_TERM):
    _ENC_WHITE[_run] = _code
for _i, _code in enumerate(_WHITE_MAKEUP):
    _ENC_WHITE[64 * (_i + 1)] = _code
for _run, _code in enumerate(_BLACK_TERM):
    _ENC_BLACK[_run] = _code
for _i, _code in enumerate(_BLACK_MAKEUP):
    _ENC_BLACK[64 * (_i + 1)] = _code
for _i, _code in enumerate(_EXT_MAKEUP):
    _ENC_WHITE[1792 + 64 * _i] = _code
    _ENC_BLACK[1792 + 64 * _i] = _code


class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: str) -> None:
        for ch in code:
            self.acc = (self.acc << 1) | (ch == "1")
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        if self.n:
            self.out.append(self.acc << (8 - self.n))
            self.acc = 0
            self.n = 0


def _emit_run(bw: _BitWriter, run: int, table: dict[int, str]) -> None:
    while run >= 64:
        step = min(2560, run & ~63) if run >= 64 else 0
        if run - step >= 64:  # keep the tail under one make-up
            step = 2560
        bw.write(table[step])
        run -= step
    bw.write(table[run])


def _row_runs(row: np.ndarray) -> list[int]:
    """Alternating white/black run lengths covering the row (white
    first, possibly 0)."""
    row = np.asarray(row, np.uint8)
    changes = np.flatnonzero(np.diff(row)) + 1
    bounds = [0, *changes.tolist(), row.size]
    runs = [bounds[i + 1] - bounds[i] for i in range(len(bounds) - 1)]
    if row.size and row[0] == 1:
        runs = [0, *runs]
    return runs


def _emit_uncompressed(bw: _BitWriter, row: np.ndarray) -> None:
    """Code one full row of literal pixels in uncompressed mode:
    the 0000001111 entry code, Table-4 body codes, and an exit with
    T = 0 (the row is complete, so the color is immaterial)."""
    bw.write("0000001111")  # extension -> uncompressed mode
    px = np.asarray(row, np.uint8).tolist()
    i, n = 0, len(px)
    while i < n:
        z = 0
        while i + z < n and px[i + z] == 0:
            z += 1
        if i + z >= n:  # only whites remain: fives, then exit
            while z >= 5:
                bw.write("000001")
                z -= 5
            bw.write("0" * (6 + z) + "1" + "0")
            return
        i += z + 1  # the whites plus their terminating black pixel
        while z >= 5:  # whites before a black: fives, then k<=4 + 1
            bw.write("000001")
            z -= 5
        bw.write("0" * z + "1")
    bw.write("0000001" + "0")  # row ended on a black pixel


def encode_g4(ink: np.ndarray, uncompressed_rows=()) -> bytes:
    """(rows, width) ink bits -> a T.6 strip (horizontal-mode-only;
    rows listed in ``uncompressed_rows`` are coded entirely in
    uncompressed mode, T6Options-bit-1 style)."""
    bw = _BitWriter()
    for y, row in enumerate(np.asarray(ink, np.uint8)):
        if y in uncompressed_rows:
            _emit_uncompressed(bw, row)
            continue
        runs = _row_runs(row)
        if len(runs) % 2 == 1:
            runs.append(0)  # trailing zero-length black run
        for i in range(0, len(runs), 2):
            bw.write("001")  # horizontal mode
            _emit_run(bw, runs[i], _ENC_WHITE)
            _emit_run(bw, runs[i + 1], _ENC_BLACK)
    bw.align()
    return bytes(bw.out)


def encode_mh(ink: np.ndarray) -> bytes:
    """(rows, width) ink bits -> a TIFF-compression-2 strip (rows
    byte-aligned, no EOLs)."""
    bw = _BitWriter()
    for row in np.asarray(ink, np.uint8):
        for i, run in enumerate(_row_runs(row)):
            _emit_run(bw, run, _ENC_WHITE if i % 2 == 0 else _ENC_BLACK)
        bw.align()
    return bytes(bw.out)
