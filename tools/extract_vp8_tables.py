"""Transcribe the RFC 6386 (VP8) constant tables out of the system
libwebp shared object.

The tables — default coefficient probabilities (RFC 6386 §13.5),
coefficient-probability update flags (§13.4), keyframe B_PRED mode
probabilities (§11.5), and the quantizer lookup tables (§14.1) — are
normative spec constants published in RFC 6386. Rekeying 3000+
numbers by hand from the RFC text is error-prone, so this tool
locates them in the container's libwebp (BSD-licensed reference
implementation of the same public spec) by anchoring on their first
rows, and dumps them as Python source for sources/vp8_tables.py.

Layout note: the binary stores the default coefficient table WITHOUT
block-type 0's band 0 (93 rows of 11 instead of 96) — type-0 blocks
("Y after Y2") always start at coefficient 1, whose band is 1, so
band 0 is never read for them; the RFC prints those three rows as
all-128 filler. The dump reinstates them so the Python table is the
spec's full [4][8][3][11].

The decoder itself (sources/vp8.py) is written from the spec; a
behavioral parity test (tests/test_vp8_parity.py) cross-checks this
transcription by round-tripping libwebp-encoded streams bit-exactly.

Run: python tools/extract_vp8_tables.py > /tmp/vp8_tables_dump.py
"""

from __future__ import annotations

import struct

SO = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"


def find(blob: bytes, anchor: bytes, what: str, expect: int = 1) -> int:
    hits = []
    start = 0
    while True:
        i = blob.find(anchor, start)
        if i < 0:
            break
        hits.append(i)
        start = i + 1
    if len(hits) != expect:
        raise SystemExit(f"{what}: {len(hits)} hits for anchor (need {expect})")
    return hits[0]


def main() -> None:
    blob = open(SO, "rb").read()

    # --- default coefficient probs (two identical copies: decoder and
    # encoder translation units). 93 stored rows + 3 reinstated
    # all-128 rows for the never-read type-0 band 0.
    a = find(blob, bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128]),
             "CoeffsProba0", expect=2)
    stored = blob[a : a + 1023]
    assert min(stored) >= 1, "prob out of range"
    # structural checks: type starts at stored rows 21/45/69
    assert stored[21 * 11 : 21 * 11 + 3] == bytes([198, 35, 237])
    assert stored[69 * 11 : 69 * 11 + 3] == bytes([202, 24, 213])
    coeffs = bytes([128] * 33) + stored  # full 1056

    # --- coefficient-prob update flags: full [4][8][3][11] = 1056
    # (band 0 rows present here — they are read for every type).
    u = find(blob, bytes([255] * 33 + [176, 246]), "CoeffsUpdateProba", expect=2)
    update = blob[u : u + 1056]
    assert min(update) >= 1

    # --- keyframe B_PRED mode probs: [10][10][9] = 900 bytes.
    b = find(blob, bytes([231, 120, 48, 89, 115, 113, 120, 152, 112]),
             "kf_bmode_probs", expect=2)
    raw = blob[b : b + 900]
    assert min(raw) >= 1
    # libwebp's B-mode enum orders RD,VR,LD at 4,5,6 where the RFC
    # orders LD,RD,VR — permute both context dims into RFC order
    # (the 9 probs per row are tree-node-ordered in both).
    lw = {4: 6, 5: 4, 6: 5}  # rfc index -> libwebp index
    bmode = bytearray(900)
    for a in range(10):
        for l in range(10):
            src = (lw.get(a, a) * 10 + lw.get(l, l)) * 9
            dst = (a * 10 + l) * 9
            bmode[dst : dst + 9] = raw[src : src + 9]

    # --- quantizer lookups: two uint16[128] tables (RFC 6386 14.1).
    def find16(prefix: list[int], what: str) -> list[int]:
        pat = struct.pack("<9H", *prefix)
        i = find(blob, pat, what, expect=2)
        return list(struct.unpack("<128H", blob[i : i + 256]))

    # dc values max out at 157, so the binary stores them as uint8
    i = find(blob, bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13]),
             "dc_qlookup", expect=2)
    dc_q = list(blob[i : i + 128])
    ac_q = find16([4, 5, 6, 7, 8, 9, 10, 11, 12], "ac_qlookup")
    assert dc_q[-1] == 157 and ac_q[-1] == 284, (dc_q[-1], ac_q[-1])

    def emit(name: str, vals, per: int) -> None:
        print(f"{name} = (")
        for i in range(0, len(vals), per):
            row = ", ".join(str(v) for v in vals[i : i + per])
            print(f"    {row},")
        print(")")

    print("# Transcribed spec constants — see tools/extract_vp8_tables.py")
    emit("COEFF_PROBS", list(coeffs), 11)
    emit("COEFF_UPDATE_PROBS", list(update), 11)
    emit("KF_BMODE_PROBS", list(bmode), 9)
    emit("DC_QLOOKUP", dc_q, 16)
    emit("AC_QLOOKUP", ac_q, 16)


if __name__ == "__main__":
    main()
