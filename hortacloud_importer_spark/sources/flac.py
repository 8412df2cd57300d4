"""Clean-room FLAC codec for the multimodal audio hook
(SURVEY.md §2.K4).

Crawl audio is overwhelmingly MP3/FLAC; WAV (sources/wav.py) covered
only the uncompressed tail. FLAC is fully public (RFC 9639 / the
xiph.org format spec) and LOSSLESS, so the closed-form oracle pattern
the other clean-room codecs use applies directly: a decoded sample
equals the encoded sample bit-for-bit, and a DuckDB expression can
regenerate it.

Scope (the complete static-metadata + audio-frame subset):

- stream layout: ``fLaC`` magic, metadata blocks (STREAMINFO
  mandatory-first; PADDING/APPLICATION/SEEKTABLE/VORBIS_COMMENT/
  CUESHEET/PICTURE skipped by length), then audio frames;
- frame headers: fixed + variable blocking strategies, all block-size
  codes (192 / 576*2^n / 256*2^n / 8-bit / 16-bit end-of-header),
  all sample-rate codes (table + 8-bit kHz / 16-bit Hz / 16-bit daHz),
  all sample sizes (8/12/16/20/24/32), UTF-8-style coded frame/sample
  numbers, CRC-8 header + CRC-16 frame verification;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized-coefficient integer predictor), wasted-bits unpacking;
- residuals: 4-bit (method 0) and 5-bit (method 1) Rice parameters,
  partition orders 0-15, escape-to-raw partitions, zigzag folding;
- stereo decorrelation: independent, left/side, right/side, mid/side
  (side channel carries bps+1 bits per the spec);
- STREAMINFO MD5 verification of the decoded PCM when the recorded
  signature is present and the sample size is byte-aligned.

``decode_flac`` returns ``(samples, sample_rate)`` with samples
``(n, channels)`` int32 — the same surface as ``decode_wav``, so the
multimodal kernels treat both uniformly. ``encode_flac`` is the
fixture/writer dual; it can force every subframe type, stereo mode,
partition order, wasted-bits count, and blocking strategy so tests
exercise each decoder path explicitly. Both run per-file inside
executor kernels (``mapInPandas``), the same granularity as the
image codecs.

No reference parity: the reference repo shells out to external tools
for media and contains no FLAC code (SURVEY.md §2.K4 extension row).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class FlacParseError(ValueError):
    pass


MAX_SAMPLES = 1 << 28  # total-sample decode guard (~256M samples)

_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc_tables():
    t8 = bytearray(256)
    t16 = [0] * 256
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t8[i] = c
        c = i << 8
        for _ in range(8):
            c = (
                ((c << 1) ^ 0x8005) & 0xFFFF
                if c & 0x8000
                else (c << 1) & 0xFFFF
            )
        t16[i] = c
    return bytes(t8), t16


_CRC8_TABLE, _CRC16_TABLE = _crc_tables()


def _crc8(data) -> int:
    c = 0
    t = _CRC8_TABLE
    for b in data:
        c = t[c ^ b]
    return c


def _crc16(data) -> int:
    c = 0
    t = _CRC16_TABLE
    for b in data:
        c = (t[(c >> 8) ^ b] ^ (c << 8)) & 0xFFFF
    return c


class _BitReader:
    """MSB-first bit reader with a Python-int accumulator refilled in
    8-byte chunks; unary decode uses bit_length so long zero runs cost
    O(runs), not O(bits)."""

    __slots__ = ("data", "n", "byte", "buf", "nbuf")

    def __init__(self, data: bytes, start_byte: int = 0):
        self.data = data
        self.n = len(data)
        self.byte = start_byte
        self.buf = 0
        self.nbuf = 0

    def _fill(self, need: int) -> None:
        while self.nbuf < need:
            take = min(8, self.n - self.byte)
            if take <= 0:
                raise FlacParseError("bitstream overruns the payload")
            self.buf = (self.buf << (8 * take)) | int.from_bytes(
                self.data[self.byte : self.byte + take], "big"
            )
            self.byte += take
            self.nbuf += 8 * take

    def bits(self, nb: int) -> int:
        if nb == 0:
            return 0
        if self.nbuf < nb:
            self._fill(nb)
        self.nbuf -= nb
        v = self.buf >> self.nbuf
        self.buf &= (1 << self.nbuf) - 1
        return v

    def sbits(self, nb: int) -> int:
        v = self.bits(nb)
        return v - (1 << nb) if v >> (nb - 1) else v

    def unary(self) -> int:
        q = 0
        while True:
            if self.nbuf == 0:
                self._fill(1)
            if self.buf == 0:
                q += self.nbuf
                self.nbuf = 0
                continue
            lead = self.nbuf - self.buf.bit_length()
            q += lead
            self.nbuf -= lead + 1
            self.buf &= (1 << self.nbuf) - 1
            return q

    def bitpos(self) -> int:
        return self.byte * 8 - self.nbuf

    def at_end(self) -> bool:
        return self.byte >= self.n and self.nbuf == 0


def _parse_streaminfo(data: bytes) -> tuple[dict, int]:
    """-> (streaminfo dict, offset of the first audio frame)."""
    if len(data) < 8 or data[:4] != b"fLaC":
        raise FlacParseError("not a FLAC stream (no fLaC magic)")
    pos = 4
    si = None
    while True:
        if pos + 4 > len(data):
            raise FlacParseError("unterminated metadata block chain")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        ln = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if pos + 4 + ln > len(data):
            raise FlacParseError(f"metadata block {btype} truncated")
        if pos == 4 and btype != 0:
            raise FlacParseError("first metadata block is not STREAMINFO")
        if btype == 127:
            raise FlacParseError("invalid metadata block type 127")
        if btype == 0:
            body = data[pos + 4 : pos + 4 + ln]
            if ln < 34:
                raise FlacParseError("STREAMINFO shorter than 34 bytes")
            min_bs, max_bs = struct.unpack(">HH", body[:4])
            packed = int.from_bytes(body[10:18], "big")
            si = {
                "min_block": min_bs,
                "max_block": max_bs,
                "sample_rate": packed >> 44,
                "channels": ((packed >> 41) & 0x7) + 1,
                "bps": ((packed >> 36) & 0x1F) + 1,
                "total_samples": packed & ((1 << 36) - 1),
                "md5": body[18:34],
            }
        pos += 4 + ln
        if last:
            break
    if si is None:
        raise FlacParseError("no STREAMINFO block")
    if si["sample_rate"] == 0:
        raise FlacParseError("STREAMINFO sample rate is zero")
    if si["total_samples"] > MAX_SAMPLES:
        raise FlacParseError(
            f"stream declares {si['total_samples']} samples, "
            f"over the {MAX_SAMPLES} guard"
        )
    return si, pos


def flac_probe(data: bytes) -> tuple[int, int, int, int]:
    """(n_samples, n_channels, sample_rate, bits_per_sample) from
    STREAMINFO only — no frame decode."""
    si, _ = _parse_streaminfo(data)
    return (
        si["total_samples"],
        si["channels"],
        si["sample_rate"],
        si["bps"],
    )


def _coded_number(br: _BitReader, max_bytes: int) -> int:
    """The frame header's UTF-8-style frame/sample number (extended
    to 7-byte forms for 36-bit sample numbers)."""
    b0 = br.bits(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n == 0 or n + 1 > max_bytes:
        raise FlacParseError(f"invalid coded-number lead byte {b0:#x}")
    val = b0 & (0x3F >> n) if n < 6 else 0
    for _ in range(n):
        c = br.bits(8)
        if c & 0xC0 != 0x80:
            raise FlacParseError("coded-number continuation is not 10xxxxxx")
        val = (val << 6) | (c & 0x3F)
    return val


def _decode_residual(br: _BitReader, bs: int, order: int) -> np.ndarray:
    method = br.bits(2)
    if method > 1:
        raise FlacParseError(f"reserved residual coding method {method}")
    pbits = 4 + method
    esc = (1 << pbits) - 1
    po = br.bits(4)
    nparts = 1 << po
    if bs % nparts:
        raise FlacParseError(
            f"partition order {po} does not divide block size {bs}"
        )
    psize = bs >> po
    # RFC 9639 s9.2.7: (block size >> partition order) must be strictly
    # greater than the predictor order when partitioned — an empty
    # first partition is nonconforming, not merely zero samples
    if psize < order or (po > 0 and psize == order):
        raise FlacParseError(
            f"first partition would hold {psize - order} samples"
        )
    out = np.empty(bs - order, np.int64)
    pos = 0
    bits = br.bits
    unary = br.unary
    for p in range(nparts):
        cnt = psize - order if p == 0 else psize
        k = bits(pbits)
        if k == esc:
            nb = bits(5)
            if nb == 0:
                out[pos : pos + cnt] = 0
            else:
                out[pos : pos + cnt] = [br.sbits(nb) for _ in range(cnt)]
        else:
            for i in range(pos, pos + cnt):
                folded = (unary() << k) | bits(k)
                out[i] = (folded >> 1) ^ -(folded & 1)
        pos += cnt
    return out


def _integrate_fixed(warm: list, res: np.ndarray, bs: int, order: int
                     ) -> np.ndarray:
    """Reconstruct a FIXED-predicted subframe: the order-k fixed
    predictor makes the residual the k-th finite difference of the
    signal, so decode is k cumulative sums seeded from the warm-up
    samples' difference pyramid."""
    if order == 0:
        return res.copy()
    inits = []
    w = np.array(warm, np.int64)
    for _ in range(order):
        inits.append(int(w[0]))
        w = np.diff(w)
    x = res
    for j in range(order - 1, -1, -1):
        x = np.concatenate(([inits[j]], x)).cumsum()
    return x


def _decode_subframe(br: _BitReader, bs: int, bps: int) -> np.ndarray:
    if br.bits(1):
        raise FlacParseError("subframe padding bit set")
    t = br.bits(6)
    wasted = 0
    if br.bits(1):
        wasted = br.unary() + 1
    ebps = bps - wasted
    if ebps <= 0:
        raise FlacParseError(
            f"wasted bits {wasted} consume the whole {bps}-bit sample"
        )
    if t == 0:  # CONSTANT
        out = np.full(bs, br.sbits(ebps), np.int64)
    elif t == 1:  # VERBATIM
        sb = br.sbits
        out = np.fromiter(
            (sb(ebps) for _ in range(bs)), np.int64, count=bs
        )
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t - 8
        if order > bs:
            raise FlacParseError(
                f"fixed order {order} exceeds block size {bs}"
            )
        warm = [br.sbits(ebps) for _ in range(order)]
        res = _decode_residual(br, bs, order)
        out = _integrate_fixed(warm, res, bs, order)
    elif t >= 32:  # LPC order 1-32
        order = (t & 31) + 1
        if order > bs:
            raise FlacParseError(
                f"LPC order {order} exceeds block size {bs}"
            )
        warm = [br.sbits(ebps) for _ in range(order)]
        prec = br.bits(4)
        if prec == 15:
            raise FlacParseError("invalid LPC precision code 15")
        prec += 1
        shift = br.sbits(5)
        if shift < 0:
            raise FlacParseError("negative LPC shift")
        coefs = [br.sbits(prec) for _ in range(order)]
        res = _decode_residual(br, bs, order)
        sig = warm + [0] * (bs - order)
        rl = res.tolist()
        rng = range(order)
        guard = 1 << 40  # any legal sample fits 33 bits (32-bit side)
        for i in range(order, bs):
            acc = 0
            for j in rng:
                acc += coefs[j] * sig[i - 1 - j]
            v = (acc >> shift) + rl[i - order]
            if not -guard < v < guard:
                raise FlacParseError("LPC prediction diverges")
            sig[i] = v
        out = np.array(sig, np.int64)
    else:
        raise FlacParseError(f"reserved subframe type {t:#08b}")
    return out << wasted if wasted else out


def _decode_frame(data: bytes, br: _BitReader, si: dict
                  ) -> tuple[np.ndarray, int]:
    """One audio frame -> ((block_size, n_channels) int64, rate)."""
    start_bit = br.bitpos()
    if start_bit & 7:
        raise FlacParseError("frame does not start byte-aligned")
    sbyte = start_bit >> 3
    if br.bits(14) != 0x3FFE:
        raise FlacParseError("bad frame sync code")
    if br.bits(1):
        raise FlacParseError("reserved frame-header bit set")
    variable = br.bits(1)
    bs_code = br.bits(4)
    sr_code = br.bits(4)
    ch_code = br.bits(4)
    ss_code = br.bits(3)
    if br.bits(1):
        raise FlacParseError("reserved frame-header bit set")
    _coded_number(br, 7 if variable else 6)
    if bs_code == 0:
        raise FlacParseError("reserved block-size code 0")
    elif bs_code == 1:
        bs = 192
    elif bs_code <= 5:
        bs = 576 << (bs_code - 2)
    elif bs_code == 6:
        bs = br.bits(8) + 1
    elif bs_code == 7:
        bs = br.bits(16) + 1
    else:
        bs = 256 << (bs_code - 8)
    if sr_code == 0:
        rate = si["sample_rate"]
    elif sr_code in _RATE_CODES:
        rate = _RATE_CODES[sr_code]
    elif sr_code == 12:
        rate = br.bits(8) * 1000
    elif sr_code == 13:
        rate = br.bits(16)
    elif sr_code == 14:
        rate = br.bits(16) * 10
    else:
        raise FlacParseError("invalid sample-rate code 15")
    if ss_code == 0:
        bps = si["bps"]
    elif ss_code in _SIZE_CODES:
        bps = _SIZE_CODES[ss_code]
    else:
        raise FlacParseError(f"reserved sample-size code {ss_code}")
    cur = br.bitpos() >> 3
    if _crc8(data[sbyte:cur]) != br.bits(8):
        raise FlacParseError("frame-header CRC-8 mismatch")

    if ch_code <= 7:
        chans = [
            _decode_subframe(br, bs, bps) for _ in range(ch_code + 1)
        ]
        block = np.stack(chans, axis=1)
    elif ch_code == 8:  # left/side
        left = _decode_subframe(br, bs, bps)
        side = _decode_subframe(br, bs, bps + 1)
        block = np.stack([left, left - side], axis=1)
    elif ch_code == 9:  # right/side (stores side, right)
        side = _decode_subframe(br, bs, bps + 1)
        right = _decode_subframe(br, bs, bps)
        block = np.stack([right + side, right], axis=1)
    elif ch_code == 10:  # mid/side
        mid = _decode_subframe(br, bs, bps)
        side = _decode_subframe(br, bs, bps + 1)
        m = (mid << 1) | (side & 1)
        block = np.stack([(m + side) >> 1, (m - side) >> 1], axis=1)
    else:
        raise FlacParseError(f"reserved channel assignment {ch_code}")

    pad = (-br.bitpos()) & 7
    if pad and br.bits(pad):
        raise FlacParseError("non-zero frame padding bits")
    cur = br.bitpos() >> 3
    if _crc16(data[sbyte:cur]) != br.bits(16):
        raise FlacParseError("frame CRC-16 mismatch")
    return block, rate


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> ((n_samples, n_channels) int32, sample_rate),
    MD5-verified against STREAMINFO when the signature is present and
    the sample size is byte-aligned."""
    si, first = _parse_streaminfo(data)
    br = _BitReader(data, first)
    blocks = []
    n_out = 0
    while not br.at_end():
        block, rate = _decode_frame(data, br, si)
        if rate != si["sample_rate"]:
            raise FlacParseError(
                f"frame rate {rate} != STREAMINFO {si['sample_rate']}"
            )
        if block.shape[1] != si["channels"]:
            raise FlacParseError(
                f"frame has {block.shape[1]} channels, STREAMINFO "
                f"says {si['channels']}"
            )
        blocks.append(block)
        n_out += block.shape[0]
        if n_out > max(si["total_samples"], 0) and si["total_samples"]:
            raise FlacParseError(
                "frames carry more samples than STREAMINFO declares"
            )
        if n_out > MAX_SAMPLES:
            raise FlacParseError("decoded samples exceed the guard")
    if not blocks:
        raise FlacParseError("stream holds no audio frames")
    out = np.concatenate(blocks, axis=0)
    if si["total_samples"] and out.shape[0] != si["total_samples"]:
        raise FlacParseError(
            f"decoded {out.shape[0]} samples, STREAMINFO declares "
            f"{si['total_samples']}"
        )
    lo, hi = -(1 << (si["bps"] - 1)), (1 << (si["bps"] - 1)) - 1
    if out.min() < lo or out.max() > hi:
        raise FlacParseError("decoded sample exceeds the declared bps")
    if si["md5"] != b"\x00" * 16 and si["bps"] % 8 == 0:
        if hashlib.md5(_md5_bytes(out, si["bps"])).digest() != si["md5"]:
            raise FlacParseError("decoded PCM fails the STREAMINFO MD5")
    return out.astype(np.int32), si["sample_rate"]


def _md5_bytes(samples: np.ndarray, bps: int) -> bytes:
    """The spec's MD5 input: channel-interleaved samples, each in
    bps/8 little-endian bytes."""
    nbytes = bps // 8
    flat = samples.astype("<i8").reshape(-1)
    raw = flat.astype("<i8").view(np.uint8).reshape(-1, 8)[:, :nbytes]
    return np.ascontiguousarray(raw).tobytes()


# --------------------------------------------------------------- encoder


class _BitWriter:
    __slots__ = ("out", "acc", "nacc")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def bits(self, v: int, nb: int) -> None:
        self.acc = (self.acc << nb) | (v & ((1 << nb) - 1))
        self.nacc += nb
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def unary(self, q: int) -> None:
        self.bits(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nacc:
            self.bits(0, 8 - self.nacc)

    def getvalue(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.out)


def _rice_param(folded: np.ndarray, esc: int) -> int:
    if len(folded) == 0:
        return 0
    mean = float(folded.mean())
    k = 0
    while (1 << k) < mean + 1 and k < esc - 1:
        k += 1
    return k


def _write_residual(bw: _BitWriter, res: np.ndarray, bs: int, order: int,
                    partition_order: int, method: int) -> None:
    # raw-escape partitions top out at 31 bits per sample; when the
    # residual is wider AND 4-bit Rice parameters (k <= 14) would blow
    # the unary quotients up, upgrade to the 5-bit parameter method
    # (the caller's method is a minimum, not a pin)
    if len(res):
        fmax = int(res.max()) << 1
        fmin = (int(-res.min()) << 1) - 1 if res.min() < 0 else 0
        widest = max(fmax, fmin)
        if method == 0 and widest.bit_length() + 1 > 31 and (
            widest >> 14
        ) > 64:
            method = 1
    pbits = 4 + method
    esc = (1 << pbits) - 1
    bw.bits(method, 2)
    bw.bits(partition_order, 4)
    nparts = 1 << partition_order
    if bs % nparts or (bs >> partition_order) <= order:
        raise FlacParseError(
            f"partition order {partition_order} invalid for block "
            f"{bs} / order {order}"
        )
    psize = bs >> partition_order
    pos = 0
    for p in range(nparts):
        cnt = psize - order if p == 0 else psize
        part = res[pos : pos + cnt]
        pos += cnt
        folded = np.where(part >= 0, part << 1, (-part << 1) - 1)
        k = _rice_param(folded, esc)
        nb = (
            max(
                int(part.max()).bit_length(),
                int(~part.min()).bit_length(),
            )
            + 1
            if len(part)
            else 1
        )
        # escape to raw when unary quotients would blow up (and the
        # samples fit the 5-bit raw width)
        if len(folded) and int(folded.max() >> k) > 64 and nb <= 31:
            bw.bits(esc, pbits)
            bw.bits(nb, 5)
            for v in part.tolist():
                bw.bits(v, nb)
        else:
            bw.bits(k, pbits)
            for f in folded.tolist():
                bw.unary(f >> k)
                bw.bits(f & ((1 << k) - 1), k)


def _write_subframe(bw: _BitWriter, sig: np.ndarray, bps: int,
                    subframe: str, partition_order: int, method: int,
                    wasted: int) -> None:
    bs = len(sig)
    if wasted:
        if np.any(sig & ((1 << wasted) - 1)):
            raise FlacParseError(
                f"samples do not carry {wasted} zero low bits"
            )
        sig = sig >> wasted
    ebps = bps - wasted

    def header(type_bits: int) -> None:
        bw.bits(0, 1)
        bw.bits(type_bits, 6)
        if wasted:
            bw.bits(1, 1)
            bw.unary(wasted - 1)
        else:
            bw.bits(0, 1)

    if subframe == "constant":
        if np.any(sig != sig[0]):
            raise FlacParseError("constant subframe needs constant samples")
        header(0)
        bw.bits(int(sig[0]), ebps)
    elif subframe == "verbatim":
        header(1)
        for v in sig.tolist():
            bw.bits(v, ebps)
    elif subframe.startswith("fixed"):
        order = int(subframe.split(":")[1]) if ":" in subframe else 2
        if not 0 <= order <= 4 or order > bs:
            raise FlacParseError(f"fixed order {order} out of range")
        header(8 + order)
        res = sig.copy()
        for _ in range(order):
            res = np.diff(res)
        for v in sig[:order].tolist():
            bw.bits(v, ebps)
        _write_residual(bw, res, bs, order, partition_order, method)
    elif subframe == "lpc":
        # a fixture-grade quantized predictor: order 2, coefs 2,-1 at
        # shift 5 (the fixed-order-2 polynomial scaled) — exact for
        # round-trips regardless of how suboptimal the prediction is
        order, shift, prec = 2, 5, 12
        coefs = [2 << shift, -(1 << shift)]
        if bs <= order:
            raise FlacParseError("block too small for the LPC fixture")
        header(32 + order - 1)
        for v in sig[:order].tolist():
            bw.bits(v, ebps)
        bw.bits(prec - 1, 4)
        bw.bits(shift, 5)
        for c in coefs:
            bw.bits(c, prec)
        s = sig.astype(np.int64)
        pred = (coefs[0] * s[1:-1] + coefs[1] * s[:-2]) >> shift
        res = s[2:] - pred
        _write_residual(bw, res, bs, order, partition_order, method)
    else:
        raise FlacParseError(f"unknown subframe mode {subframe!r}")


def encode_flac(
    samples: np.ndarray,
    rate: int = 44100,
    bits: int = 16,
    block_size: int = 4096,
    subframe: str = "auto",
    stereo: str = "independent",
    partition_order: int = 0,
    rice_method: int = 0,
    wasted: int = 0,
    variable_blocking: bool = False,
    sr_code_mode: str = "auto",
) -> bytes:
    """Fixture encoder: int samples ``(n,)`` or ``(n, channels)`` ->
    a complete FLAC stream. ``subframe`` forces one coding mode
    ('constant' | 'verbatim' | 'fixed[:order]' | 'lpc' | 'auto'),
    ``stereo`` one decorrelation ('independent' | 'left_side' |
    'right_side' | 'mid_side'), so tests pin each decoder path."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2 or samples.shape[0] == 0:
        raise FlacParseError("samples must be (n,) or (n, channels)")
    n, nch = samples.shape
    if not 1 <= nch <= 8:
        raise FlacParseError(f"{nch} channels out of the 1-8 range")
    if bits not in (8, 12, 16, 20, 24, 32):
        raise FlacParseError(f"unsupported bits-per-sample {bits}")
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    s64 = samples.astype(np.int64)
    if s64.min() < lo or s64.max() > hi:
        raise FlacParseError(f"samples exceed {bits}-bit range")
    if stereo != "independent" and nch != 2:
        raise FlacParseError("stereo decorrelation needs 2 channels")

    md5 = (
        hashlib.md5(_md5_bytes(s64, bits)).digest()
        if bits % 8 == 0
        else b"\x00" * 16
    )
    packed = (
        (rate << 44)
        | ((nch - 1) << 41)
        | ((bits - 1) << 36)
        | n
    )
    streaminfo = (
        struct.pack(">HH", block_size, block_size)
        + b"\x00\x00\x00" * 2
        + packed.to_bytes(8, "big")
        + md5
    )
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    for fidx, off in enumerate(range(0, n, block_size)):
        blk = s64[off : off + block_size]
        bs = blk.shape[0]
        bw = _BitWriter()
        bw.bits(0x3FFE, 14)
        bw.bits(0, 1)
        bw.bits(1 if variable_blocking else 0, 1)
        if bs == 192:
            bs_code, bs_extra = 1, None
        elif bs in (576, 1152, 2304, 4608):
            bs_code, bs_extra = 2 + (576, 1152, 2304, 4608).index(bs), None
        elif bs in tuple(256 << i for i in range(8)):
            bs_code, bs_extra = (
                8 + tuple(256 << i for i in range(8)).index(bs),
                None,
            )
        elif bs <= 256:
            bs_code, bs_extra = 6, (bs - 1, 8)
        else:
            bs_code, bs_extra = 7, (bs - 1, 16)
        bw.bits(bs_code, 4)
        rate_rev = {v: k for k, v in _RATE_CODES.items()}
        if sr_code_mode == "streaminfo":
            sr_code, sr_extra = 0, None
        elif rate in rate_rev and sr_code_mode == "auto":
            sr_code, sr_extra = rate_rev[rate], None
        elif rate % 1000 == 0 and rate // 1000 < 256:
            sr_code, sr_extra = 12, (rate // 1000, 8)
        elif rate < 65536:
            sr_code, sr_extra = 13, (rate, 16)
        elif rate % 10 == 0 and rate // 10 < 65536:
            sr_code, sr_extra = 14, (rate // 10, 16)
        else:
            sr_code, sr_extra = 0, None
        bw.bits(sr_code, 4)
        ch_code = {
            "independent": nch - 1,
            "left_side": 8,
            "right_side": 9,
            "mid_side": 10,
        }[stereo]
        bw.bits(ch_code, 4)
        size_rev = {v: k for k, v in _SIZE_CODES.items()}
        bw.bits(size_rev[bits], 3)
        bw.bits(0, 1)
        number = off if variable_blocking else fidx
        _write_coded_number(bw, number)
        if bs_extra is not None:
            bw.bits(*bs_extra)
        if sr_extra is not None:
            bw.bits(*sr_extra)
        bw.align()
        hdr = bw.getvalue()
        bw = _BitWriter()

        if stereo == "independent":
            chans = [(blk[:, c], bits) for c in range(nch)]
        elif stereo == "left_side":
            chans = [(blk[:, 0], bits), (blk[:, 0] - blk[:, 1], bits + 1)]
        elif stereo == "right_side":
            chans = [(blk[:, 0] - blk[:, 1], bits + 1), (blk[:, 1], bits)]
        else:  # mid_side
            chans = [
                ((blk[:, 0] + blk[:, 1]) >> 1, bits),
                (blk[:, 0] - blk[:, 1], bits + 1),
            ]
        for sig, cbps in chans:
            mode = subframe
            if mode == "auto":
                if np.all(sig == sig[0]):
                    mode = "constant"
                elif bs > 4:
                    mode = "fixed:2"
                else:
                    mode = "verbatim"
            w = 0 if cbps > bits else wasted  # side channel: no waste
            _write_subframe(
                bw, sig, cbps, mode, partition_order, rice_method, w
            )
        bw.align()
        body = bw.getvalue()
        frame = hdr + bytes([_crc8(hdr)]) + body
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
    return bytes(out)


def _write_coded_number(bw: _BitWriter, val: int) -> None:
    if val < 0x80:
        bw.bits(val, 8)
        return
    tails = []
    while True:
        tails.append(0x80 | (val & 0x3F))
        val >>= 6
        n = len(tails)
        lead_bits = 6 - n
        if lead_bits >= 0 and val < (1 << lead_bits):
            break
        if n == 6:
            if val:
                raise FlacParseError("coded number exceeds 36 bits")
            break
    n = len(tails)
    if n == 6:
        bw.bits(0xFE, 8)
    else:
        lead = ((0xFF << (7 - n)) & 0xFF) | val
        bw.bits(lead, 8)
    for t in reversed(tails):
        bw.bits(t, 8)
