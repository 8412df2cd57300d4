"""Clean-room arithmetic-coded JPEG (ITU-T T.81 Annexes D and F).

Decodes SOF9 (extended sequential) and SOF10 (progressive) frames —
the "JPEG long tail" of scanned-document and instrument corpora that
Huffman-only decoders gate on. The reference repo reads these through
tifffile/PIL (which wrap libjpeg); here the QM-coder and its
statistics model are implemented directly from the public spec:

- Annex D: the QM arithmetic coder — a 113-state probability
  estimation machine (Table D.3) over a 16-bit interval register,
  with conditional MPS/LPS exchange and byte-oriented renormalization
  (0xFF bytes are zero-stuffed exactly like the Huffman entropy
  layer, so the surrounding marker machinery is shared).
- Annex F: the decision sequencing — per-component DC conditioning
  contexts selected by the previous diff's magnitude category
  (bounded by the DAC marker's L/U parameters), per-position AC
  contexts with the Kx low/high-frequency split, and the fixed
  (non-adaptive) state for AC signs and DC refinement bits.

The encoder exists so the test suite can pin round-trips without a
system libjpeg; the gcc-gated tests in tests/test_jpeg_arith.py
additionally pin BOTH directions against libjpeg as an independent
conformance reference (decode parity on libjpeg-encoded streams,
and libjpeg decoding this encoder's streams).

Frame geometry, coefficient stores, IDCT, and marker parsing are all
shared with sources/jpeg.py — this module only supplies the entropy
layer. Corrupt streams raise :class:`~.jpeg.JpegParseError` like
every other codec (the crawl-kernel error contract).

Reference parity: tiff2octree.py delegates whole-file decode to
tifffile/PIL; this covers the same streams without the library.
"""

from __future__ import annotations

import numpy as np

from hortacloud_importer_spark.sources.jpeg import JpegParseError

# T.81 Table D.3 — the QM-coder probability estimation state machine:
# (Qe, next-index-after-LPS, next-index-after-MPS, switch-MPS).
# Standardized constants; index 113 is the fixed (non-adaptive) state
# used for AC signs and refinement decisions.
_QE = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1), (0x5A1D, 113, 113, 0),
)

# Statistics bins are bytearrays of packed (state_index << 1) | MPS.
_FIXED = 113 << 1  # non-adaptive state: Qe ~ 0.5, self-looping

# Flattened transition tables over the packed (index << 1) | MPS byte:
# Qe per packed state, and the packed successor after an MPS / LPS
# decision (the LPS table folds the switch-MPS flip in).
_QE_Q = tuple(_QE[s >> 1][0] for s in range(228))
_NEXT_MPS = bytes((_QE[s >> 1][2] << 1) | (s & 1) for s in range(228))
_NEXT_LPS = bytes(
    (_QE[s >> 1][1] << 1) | ((s & 1) ^ 1 if _QE[s >> 1][3] else (s & 1))
    for s in range(228)
)

_DC_BINS = 64
_AC_BINS = 256
_DC_DEFAULT_COND = (0, 1)  # (L, U) when no DAC segment names the table
_AC_DEFAULT_KX = 5


class _QmDecoder:
    """Annex D.2 decoder over one entropy segment (already
    zero-unstuffed and restart-split by the caller; past the segment
    end, zero bytes are synthesized — the spec's convention for data
    exhausted at a marker)."""

    __slots__ = ("data", "pos", "c", "a", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        # Two bytes prime Chigh at full scale; the interval starts at
        # one whole unit (0x10000) to mirror INITENC, so the first
        # decision sees the same split the encoder made.
        # Both priming bytes sit fully inside the Chigh comparison
        # window, so the bit counter starts exhausted: the first
        # renormalization shift must pull in the third byte first.
        self.c = (self._next() << 24) | (self._next() << 16)
        self.ct = 0
        self.a = 0x10000

    def _next(self) -> int:
        if self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            return b
        return 0

    def decode(self, stats: bytearray, i: int) -> int:
        # Hot path first: an MPS decision needing no renormalization
        # touches only A (the overwhelmingly common case — the state
        # machine drives Qe small for skewed contexts).
        s = stats[i]
        qe = _QE_Q[s]
        a = self.a - qe
        c = self.c
        if (c >> 16) < a:
            # bottom sub-interval (size A - Qe): MPS unless exchanged
            if a & 0x8000:
                self.a = a
                return s & 1
            if a < qe:  # conditional exchange: bottom belongs to LPS
                d = (s & 1) ^ 1
                stats[i] = _NEXT_LPS[s]
            else:
                d = s & 1
                stats[i] = _NEXT_MPS[s]
        else:
            # top sub-interval (size Qe): LPS unless exchanged
            c -= a << 16
            if a < qe:  # conditional exchange: top belongs to MPS
                d = s & 1
                stats[i] = _NEXT_MPS[s]
            else:
                d = (s & 1) ^ 1
                stats[i] = _NEXT_LPS[s]
            a = qe
        # renormalize
        ct = self.ct
        data = self.data
        pos = self.pos
        n = len(data)
        while a < 0x8000:
            if ct == 0:
                if pos < n:
                    c += data[pos] << 8
                    pos += 1
                ct = 8
            a <<= 1
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
        self.a = a
        self.c = c
        self.ct = ct
        self.pos = pos
        return d


class _QmEncoder:
    """Annex D.1 encoder. Carries resolve in the raw byte buffer
    (a carry never ripples past a non-0xFF byte); zero-stuffing is
    applied once at :meth:`stuffed`."""

    __slots__ = ("a", "c", "ct", "buf")

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buf = bytearray()

    def encode(self, stats: bytearray, i: int, bit: int) -> None:
        s = stats[i]
        mps = s & 1
        qe, nlps, nmps, switch = _QE[s >> 1]
        a = self.a - qe
        if bit == mps:
            if a & 0x8000:
                self.a = a
                return
            if a < qe:  # exchange: MPS coded in the top (Qe) interval
                self.c += a
                self.a = qe
            else:
                self.a = a
            stats[i] = (nmps << 1) | mps
        else:
            if a < qe:  # exchange: LPS coded in the bottom interval
                self.a = a
            else:
                self.c += a
                self.a = qe
            if switch:
                mps ^= 1
            stats[i] = (nlps << 1) | mps
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8

    def _byteout(self) -> None:
        t = self.c >> 19
        self.c &= 0x7FFFF
        if t > 0xFF:
            i = len(self.buf) - 1
            while i >= 0 and self.buf[i] == 0xFF:
                self.buf[i] = 0
                i -= 1
            if i < 0:
                raise JpegParseError("arithmetic encoder carry escaped")
            self.buf[i] += 1
            t &= 0xFF
        self.buf.append(t)

    def stuffed(self) -> bytes:
        """Terminate the codeword (D.1.7 CLEARBITS + FINALWRITES) and
        return the stuffed entropy bytes."""
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        self._byteout()
        self.c <<= 8
        self._byteout()
        raw = bytes(self.buf).rstrip(b"\x00")
        return raw.replace(b"\xff", b"\xff\x00")


def _new_stats(hdr: dict):
    """Fresh statistics areas + per-component conditioning for one
    restart segment: ({tb: dc_bins}, {tb: ac_bins}, fixed_bin,
    {cid: (L, U)}, {cid: Kx})."""
    dc_stats = {s["td"]: bytearray(_DC_BINS) for s in hdr["comps"]}
    ac_stats = {s["ta"]: bytearray(_AC_BINS) for s in hdr["comps"]}
    fixed = bytearray([_FIXED])
    dc_cond = {
        s["cs"]: hdr["arith_dc"].get(s["td"], _DC_DEFAULT_COND)
        for s in hdr["comps"]
    }
    ac_kx = {
        s["cs"]: hdr["arith_ac"].get(s["ta"], _AC_DEFAULT_KX)
        for s in hdr["comps"]
    }
    return dc_stats, ac_stats, fixed, dc_cond, ac_kx


# ------------------------------------------------ decode: decisions


def _decode_dc_diff(dec, dcs, ctx, cond):
    """F.2.4.1 Decode_DC_DIFF -> (diff, next context index)."""
    if not dec.decode(dcs, ctx):
        return 0, 0
    sign = dec.decode(dcs, ctx + 1)
    st = ctx + 2 + sign
    m = dec.decode(dcs, st)
    if m:
        st = 20  # X1: the magnitude-category chain (Table F.4)
        while dec.decode(dcs, st):
            m <<= 1
            if m == 0x8000:
                raise JpegParseError("arithmetic DC magnitude overflow")
            st += 1
    low, up = cond
    if m < (1 << low) >> 1:
        nxt = 0
    elif m > (1 << up) >> 1:
        nxt = 12 + 4 * sign
    else:
        nxt = 4 + 4 * sign
    v = m
    st += 14  # magnitude bits share one bin per category (Table F.4)
    m >>= 1
    while m:
        if dec.decode(dcs, st):
            v |= m
        m >>= 1
    v += 1
    return (-v if sign else v), nxt


def _decode_ac_band(dec, acs, fixed, blk, ss, se, kx, shift=0):
    """F.2.4.2 Decode_AC_coefficients over zigzag band [ss, se];
    writes (value << shift) into the zigzag-ordered block vector."""
    decode = dec.decode  # hot loop: bind the method once
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if decode(acs, st):
            return  # end of block
        while not decode(acs, st + 1):
            st += 3
            k += 1
            if k > se:
                raise JpegParseError("arithmetic AC run past band end")
        sign = decode(fixed, 0)
        st += 2
        m = decode(acs, st)
        if m and decode(acs, st):
            m = 2
            st = 189 if k <= kx else 217  # X2 chains (Table F.5)
            while decode(acs, st):
                m <<= 1
                if m == 0x8000:
                    raise JpegParseError(
                        "arithmetic AC magnitude overflow"
                    )
                st += 1
        v = m
        st += 14
        m >>= 1
        while m:
            if decode(acs, st):
                v |= m
            m >>= 1
        v += 1
        blk[k] = (-v if sign else v) << shift
        k += 1


# -------------------------------------------------- decode: scans


def decode_arith_seq(data: bytes, hdr: dict, start: int, end: int,
                     sof: dict):
    """Sequential (SOF9) interleaved scan -> per-component
    zigzag-ordered coefficient grids, mirroring jpeg._decode_scan."""
    from hortacloud_importer_spark.sources.jpeg import (
        _alloc_store,
        _frame_geometry,
        _restart_segments,
        _unstuff,
    )

    comps = sof["comps"]
    by_id = {c["id"]: c for c in comps}
    hmax, vmax, mcux, mcuy = _frame_geometry(sof)
    del hmax, vmax
    store = _alloc_store(sof, mcux, mcuy)
    segments = _restart_segments(data[start:end], hdr["ri"])
    order = [by_id[s["cs"]] for s in hdr["comps"]]

    mcu_per_seg = hdr["ri"] or mcuy * mcux
    mcu = 0
    for seg in segments:
        dec = _QmDecoder(_unstuff(seg))
        dcs_t, acs_t, fixed, dc_cond, ac_kx = _new_stats(hdr)
        pred = {c["id"]: 0 for c in comps}
        dc_ctx = {c["id"]: 0 for c in comps}
        tabs = [
            (dcs_t[s["td"]], acs_t[s["ta"]]) for s in hdr["comps"]
        ]
        for _ in range(min(mcu_per_seg, mcuy * mcux - mcu)):
            my, mx = divmod(mcu, mcux)
            for (dcs, acs), comp in zip(tabs, order):
                cid = comp["id"]
                grid = store[cid]
                for v_i in range(comp["v"]):
                    for h_i in range(comp["h"]):
                        blk = grid[
                            my * comp["v"] + v_i, mx * comp["h"] + h_i
                        ]
                        diff, dc_ctx[cid] = _decode_dc_diff(
                            dec, dcs, dc_ctx[cid], dc_cond[cid]
                        )
                        pred[cid] += diff
                        blk[0] = pred[cid]
                        _decode_ac_band(
                            dec, acs, fixed, blk, 1, 63, ac_kx[cid]
                        )
            mcu += 1
    if mcu != mcuy * mcux:
        raise JpegParseError(
            f"arithmetic scan ended after {mcu} of {mcuy * mcux} MCUs"
        )
    return store


def decode_arith_scan_set(data: bytes, scans: list, sof: dict):
    """Sequential arithmetic MULTI-scan (the QM analog of
    jpeg._decode_scan_set): each SOS codes a disjoint component
    subset with its own decoder, statistics, predictions, and
    conditioning; restart markers reset all four."""
    from hortacloud_importer_spark.sources.jpeg import (
        _alloc_store,
        _frame_geometry,
        _restart_segments,
        _scan_blocks,
        _unstuff,
    )

    comps = sof["comps"]
    frame_ids = {c["id"] for c in comps}
    _, _, mcux, mcuy = _frame_geometry(sof)
    store = _alloc_store(sof, mcux, mcuy)
    seen: set = set()
    for hdr, start, end in scans:
        for s in hdr["comps"]:
            if s["cs"] in seen:
                raise JpegParseError(
                    f"component {s['cs']} coded by two sequential scans"
                )
            seen.add(s["cs"])
        units = _scan_blocks(sof, hdr["comps"], store)
        segments = _restart_segments(data[start:end], hdr["ri"])
        per_seg = hdr["ri"] or len(units)
        pos = 0
        for seg in segments:
            dec = _QmDecoder(_unstuff(seg))
            dcs_t, acs_t, fixed, dc_cond, ac_kx = _new_stats(hdr)
            sel = {
                s["cs"]: (dcs_t[s["td"]], acs_t[s["ta"]])
                for s in hdr["comps"]
            }
            pred = {c["id"]: 0 for c in comps}
            dc_ctx = {c["id"]: 0 for c in comps}
            for unit in units[pos : pos + per_seg]:
                for comp, blk in unit:
                    cid = comp["id"]
                    dcs, acs = sel[cid]
                    diff, dc_ctx[cid] = _decode_dc_diff(
                        dec, dcs, dc_ctx[cid], dc_cond[cid]
                    )
                    pred[cid] += diff
                    blk[0] = pred[cid]
                    _decode_ac_band(
                        dec, acs, fixed, blk, 1, 63, ac_kx[cid]
                    )
            pos += min(per_seg, len(units) - pos)
        if pos < len(units):
            raise JpegParseError(
                f"arithmetic scan ended after {pos} of {len(units)} "
                "data units"
            )
    if seen != frame_ids:
        raise JpegParseError(
            f"sequential scans never coded components "
            f"{sorted(frame_ids - seen)}"
        )
    return store


def decode_arith_progressive(data: bytes, sof: dict, scans: list):
    """Progressive (SOF10) frame: run every scan's pass type into
    shared coefficient grids (the arithmetic analog of
    jpeg._decode_progressive; same admission checks)."""
    from hortacloud_importer_spark.sources.jpeg import (
        _alloc_store,
        _frame_geometry,
        _restart_segments,
        _scan_blocks,
        _unstuff,
    )

    _, _, mcux, mcuy = _frame_geometry(sof)
    store = _alloc_store(sof, mcux, mcuy)
    for hdr, start, end in scans:
        ss, se = hdr["ss"], hdr["se"]
        if ss == 0 and se != 0:
            raise JpegParseError(
                "progressive scan mixes DC and AC (Ss=0 needs Se=0)"
            )
        if ss > 0 and len(hdr["comps"]) != 1:
            raise JpegParseError(
                "progressive AC scans must be non-interleaved (ns=1)"
            )
        if se > 63 or ss > se:
            raise JpegParseError(f"bad spectral selection {ss}..{se}")
        units = _scan_blocks(sof, hdr["comps"], store)
        segments = _restart_segments(data[start:end], hdr["ri"])
        al = hdr["al"]
        seg_len = hdr["ri"] or len(units)
        pos = 0
        for seg in segments:
            dec = _QmDecoder(_unstuff(seg))
            dcs_t, acs_t, fixed, dc_cond, ac_kx = _new_stats(hdr)
            pred = {c["id"]: 0 for c in sof["comps"]}
            dc_ctx = {c["id"]: 0 for c in sof["comps"]}
            sel = {
                s["cs"]: (dcs_t[s["td"]], acs_t[s["ta"]])
                for s in hdr["comps"]
            }
            for unit in units[pos : pos + seg_len]:
                for comp, blk in unit:
                    cid = comp["id"]
                    dcs, acs = sel[cid]
                    if ss == 0 and hdr["ah"] == 0:  # DC first
                        diff, dc_ctx[cid] = _decode_dc_diff(
                            dec, dcs, dc_ctx[cid], dc_cond[cid]
                        )
                        pred[cid] += diff
                        blk[0] = pred[cid] << al
                    elif ss == 0:  # DC refinement: one fixed decision
                        if dec.decode(fixed, 0):
                            blk[0] |= 1 << al
                    elif hdr["ah"] == 0:  # AC first
                        _decode_ac_band(
                            dec, acs, fixed, blk, ss, se,
                            ac_kx[cid], shift=al,
                        )
                    else:  # AC refinement (F.2.4.3.3)
                        _decode_ac_refine(
                            dec, acs, fixed, blk, ss, se, al
                        )
            pos += seg_len
        if pos < len(units):
            raise JpegParseError(
                f"arithmetic scan ended after {pos} of {len(units)} "
                "data units"
            )
    return store


def _decode_ac_refine(dec, acs, fixed, blk, ss, se, al):
    p1 = 1 << al
    m1 = -1 << al
    # kex: highest zigzag index already nonzero from earlier scans
    kex = se
    while kex >= ss and blk[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if dec.decode(acs, st):
                return
        while True:
            if blk[k]:  # previously nonzero: one correction bit
                if dec.decode(acs, st + 2):
                    blk[k] += m1 if blk[k] < 0 else p1
                break
            if dec.decode(acs, st + 1):  # newly nonzero
                blk[k] = m1 if dec.decode(fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise JpegParseError(
                    "arithmetic AC refinement past band end"
                )
        k += 1


# ------------------------------------------------ encode: decisions


def _encode_dc_diff(enc, dcs, ctx, cond, diff):
    """Mirror of _decode_dc_diff -> next context index."""
    if diff == 0:
        enc.encode(dcs, ctx, 0)
        return 0
    enc.encode(dcs, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(dcs, ctx + 1, sign)
    st = ctx + 2 + sign
    n = abs(diff) - 1
    if n == 0:
        enc.encode(dcs, st, 0)
        m = 0
    else:
        enc.encode(dcs, st, 1)
        st = 20
        m = 1
        while (m << 1) <= n:
            enc.encode(dcs, st, 1)
            m <<= 1
            st += 1
        enc.encode(dcs, st, 0)
    low, up = cond
    if m < (1 << low) >> 1:
        nxt = 0
    elif m > (1 << up) >> 1:
        nxt = 12 + 4 * sign
    else:
        nxt = 4 + 4 * sign
    st += 14
    bit = m >> 1
    while bit:
        enc.encode(dcs, st, 1 if n & bit else 0)
        bit >>= 1
    return nxt


def _encode_ac_band(enc, acs, fixed, blk, ss, se, kx):
    last_nz = se
    while last_nz >= ss and blk[last_nz] == 0:
        last_nz -= 1
    k = ss
    while k <= last_nz:
        st = 3 * (k - 1)
        enc.encode(acs, st, 0)  # not EOB
        while blk[k] == 0:
            enc.encode(acs, st + 1, 0)
            st += 3
            k += 1
        enc.encode(acs, st + 1, 1)
        v = int(blk[k])
        sign = 1 if v < 0 else 0
        enc.encode(fixed, 0, sign)
        st += 2
        n = abs(v) - 1
        if n == 0:
            enc.encode(acs, st, 0)
            m = 0
        elif n == 1:
            enc.encode(acs, st, 1)
            enc.encode(acs, st, 0)
            m = 1
        else:
            enc.encode(acs, st, 1)
            enc.encode(acs, st, 1)
            m = 2
            st = 189 if k <= kx else 217
            while (m << 1) <= n:
                enc.encode(acs, st, 1)
                m <<= 1
                st += 1
            enc.encode(acs, st, 0)
        st += 14
        bit = m >> 1
        while bit:
            enc.encode(acs, st, 1 if n & bit else 0)
            bit >>= 1
        k += 1
    if last_nz < se:
        enc.encode(acs, 3 * (k - 1), 1)  # EOB


def encode_jpeg_arith(
    img: np.ndarray,
    qtable: np.ndarray | None = None,
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Arithmetic-coded sequential (SOF9) encoder — fixture/test
    counterpart of jpeg.encode_jpeg: (h, w) grayscale or (h, w, 3)
    RGB, 4:4:4, one interleaved scan, explicit DAC with the default
    conditioning. ``precision=12`` takes a 2-D uint16 array."""
    import struct

    from hortacloud_importer_spark.sources.jpeg import (
        _plane_zigzag_blocks,
        _rgb_to_ycbcr,
        _seg,
    )

    if precision not in (8, 12):
        raise JpegParseError(f"precision must be 8 or 12, not {precision}")
    if precision == 12:
        if img.dtype != np.uint16 or img.ndim != 2:
            raise JpegParseError("12-bit encoder takes a 2-D uint16 array")
        if img.max(initial=0) > 4095:
            raise JpegParseError("12-bit samples must be < 4096")
        planes = [img.astype(np.float64)]
    elif img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise JpegParseError("encoder takes a 2-D or (h, w, 3) uint8 array")
    elif img.ndim == 3:
        if img.shape[2] != 3:
            raise JpegParseError("3-D input must be (h, w, 3) RGB")
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[:, :, i] for i in range(3)]
    else:
        planes = [img.astype(np.float64)]
    if qtable is None:
        qtable = np.ones(64, dtype=np.int32)
    h, w = planes[0].shape
    shift = float(1 << (precision - 1))
    zz_per_comp = [
        _plane_zigzag_blocks(p, qtable, shift=shift) for p in planes
    ]
    nc = len(planes)
    cond = _DC_DEFAULT_COND
    kx = _AC_DEFAULT_KX

    hdr = {
        "comps": [{"cs": i + 1, "td": 0, "ta": 0} for i in range(nc)],
        "arith_dc": {0: cond},
        "arith_ac": {0: kx},
    }
    n_mcu = zz_per_comp[0].shape[0]
    parts = []
    rst = 0
    enc = None

    def fresh():
        dcs_t, acs_t, fixed, _, _ = _new_stats(hdr)
        return (
            _QmEncoder(), dcs_t[0], acs_t[0], fixed,
            [0] * nc, [0] * nc,
        )

    enc, dcs, acs, fixed, preds, ctxs = fresh()
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            parts.append(enc.stuffed())
            parts.append(bytes([0xFF, 0xD0 + (rst % 8)]))
            rst += 1
            enc, dcs, acs, fixed, preds, ctxs = fresh()
        for ci, zz in enumerate(zz_per_comp):
            blk = zz[mcu]
            diff = int(blk[0]) - preds[ci]
            preds[ci] = int(blk[0])
            ctxs[ci] = _encode_dc_diff(enc, dcs, ctxs[ci], cond, diff)
            _encode_ac_band(enc, acs, fixed, blk, 1, 63, kx)
    parts.append(enc.stuffed())
    entropy = b"".join(parts)

    # quant table (8- or 16-bit precision per sample width)
    if precision == 12:
        dqt = _seg(
            0xDB, bytes([0x10]) + b"".join(
                struct.pack(">H", int(q)) for q in qtable
            ),
        )
    else:
        dqt = _seg(0xDB, bytes([0x00]) + bytes(int(q) for q in qtable))
    dac = _seg(
        0xCC,
        bytes([0x00, (cond[1] << 4) | cond[0]]) + bytes([0x10, kx]),
    )
    sof = _seg(
        0xC9,
        bytes([precision])
        + struct.pack(">HH", h, w)
        + bytes([nc])
        + b"".join(bytes([i + 1, 0x11, 0]) for i in range(nc)),
    )
    sos = _seg(
        0xDA,
        bytes([nc])
        + b"".join(bytes([i + 1, 0x00]) for i in range(nc))
        + bytes([0, 63, 0]),
    )
    dri = (
        _seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return b"\xff\xd8" + dqt + dac + dri + sof + sos + entropy + b"\xff\xd9"
