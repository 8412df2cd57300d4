"""ISOBMFF header probe (sources/isobmff.py): HEIF/HEIC/AVIF spatial
extents, MP4/MOV track metadata — hand-assembled golden containers
(no encoder in the loop), plus the crawl-kernel error contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hortacloud_importer_spark.sources.isobmff import (
    IsobmffParseError,
    decode_isobmff,
    isobmff_boxes,
    isobmff_probe,
)


def box(t: bytes, payload: bytes = b"") -> bytes:
    return struct.pack(">I", len(payload) + 8) + t + payload


def full(t: bytes, payload: bytes, ver: int = 0, flags: int = 0) -> bytes:
    return box(t, bytes([ver]) + flags.to_bytes(3, "big") + payload)


def ftyp(major: bytes, *compat: bytes) -> bytes:
    return box(b"ftyp", major + b"\x00\x00\x00\x00" + b"".join(compat))


def ispe(w: int, h: int) -> bytes:
    return full(b"ispe", struct.pack(">II", w, h))


def _heif(primary_first: bool) -> bytes:
    """heic with TWO ispes (primary 640x480, thumb 160x120); pitm/ipma
    associate item 1 with the primary extent."""
    idx_primary = 1 if primary_first else 2
    props = (
        ispe(640, 480) + ispe(160, 120)
        if primary_first
        else ispe(160, 120) + ispe(640, 480)
    )
    ipco = box(b"ipco", props)
    pitm = full(b"pitm", struct.pack(">H", 1))
    # one entry: item 1 -> property index idx_primary (1-based, 7-bit)
    ipma = full(
        b"ipma",
        struct.pack(">I", 1) + struct.pack(">HB", 1, 1) + bytes([idx_primary]),
    )
    meta = full(b"meta", pitm + box(b"iprp", ipco) + ipma)
    return ftyp(b"heic", b"mif1") + meta + box(b"mdat", b"\x00" * 16)


def _mp4(w: int, h: int, frames: int, rate: int) -> bytes:
    def tkhd(tw, th):
        body = (
            b"\x00" * 20  # creation/mod/track/reserved/duration
            + b"\x00" * 8  # reserved
            + b"\x00" * 8  # layer/alt/volume/reserved
            + b"\x00" * 36  # matrix
            + struct.pack(">II", tw << 16, th << 16)
        )
        return full(b"tkhd", body)

    def mdhd(ts):
        return full(b"mdhd", struct.pack(">IIII", 0, 0, ts, 0) + b"\x00\x00\x00\x00")

    def stsz(n):
        return full(b"stsz", struct.pack(">II", 0, n))

    video = box(
        b"trak",
        tkhd(w, h)
        + box(
            b"mdia",
            mdhd(30_000)
            + box(b"minf", box(b"stbl", stsz(frames))),
        ),
    )
    audio = box(
        b"trak",
        tkhd(0, 0)
        + box(b"mdia", mdhd(rate) + box(b"minf", box(b"stbl", stsz(999)))),
    )
    return ftyp(b"isom", b"mp42") + box(b"moov", video + audio) + box(
        b"mdat", b"\x00" * 32
    )


def test_heif_primary_item_via_pitm_ipma():
    for first in (True, False):
        kind, h, w, c, nf, rate = isobmff_probe(_heif(first))
        assert (kind, h, w, c, nf, rate) == ("image", 480, 640, 3, 1, 0)


def test_heif_ipma_skips_non_ispe_properties():
    """Real HEIC layout: ipco = [hvcC, thumb ispe, primary ispe];
    the primary item's associations are [hvcC, primary ispe]. The
    probe must map association indices over ALL ipco children and
    return the primary's ispe, not the thumbnail's."""
    props = box(b"hvcC", b"\x01" + b"\x00" * 22) + ispe(160, 120) + ispe(640, 480)
    ipco = box(b"ipco", props)
    pitm = full(b"pitm", struct.pack(">H", 1))
    # item 1 -> properties 1 (hvcC, essential) and 3 (primary ispe)
    ipma = full(
        b"ipma",
        struct.pack(">I", 1) + struct.pack(">HB", 1, 2) + bytes([0x81, 3]),
    )
    meta = full(b"meta", pitm + box(b"iprp", ipco) + ipma)
    blob = ftyp(b"heic", b"mif1") + meta + box(b"mdat", b"\x00" * 16)
    kind, h, w, *_ = isobmff_probe(blob)
    assert (kind, h, w) == ("image", 480, 640)


def test_heif_non_ispe_only_association_falls_back_to_largest():
    """When the primary item's associations name no ispe at all, the
    probe falls back to the largest extent instead of mis-indexing."""
    props = box(b"hvcC", b"\x01" + b"\x00" * 22) + ispe(160, 120) + ispe(1920, 1080)
    ipco = box(b"ipco", props)
    pitm = full(b"pitm", struct.pack(">H", 1))
    ipma = full(
        b"ipma",
        struct.pack(">I", 1) + struct.pack(">HB", 1, 1) + bytes([1]),
    )
    meta = full(b"meta", pitm + box(b"iprp", ipco) + ipma)
    blob = ftyp(b"avif") + meta
    kind, h, w, *_ = isobmff_probe(blob)
    assert (kind, h, w) == ("image", 1080, 1920)


def test_heif_largest_extent_fallback_without_pitm():
    props = ispe(160, 120) + ispe(1920, 1080)
    meta = full(b"meta", box(b"iprp", box(b"ipco", props)))
    blob = ftyp(b"avif") + meta
    kind, h, w, *_ = isobmff_probe(blob)
    assert (kind, h, w) == ("image", 1080, 1920)


def test_mp4_video_track_dims_frames_and_audio_rate():
    kind, h, w, c, nf, rate = isobmff_probe(_mp4(1280, 720, 240, 48000))
    assert (kind, h, w, nf, rate) == ("video", 720, 1280, 240, 48000)


def test_m4a_audio_only():
    blob = ftyp(b"isom") + box(
        b"moov",
        box(
            b"trak",
            full(
                b"tkhd",
                b"\x00" * 20 + b"\x00" * 8 + b"\x00" * 8 + b"\x00" * 36
                + struct.pack(">II", 0, 0),
            )
            + box(
                b"mdia",
                full(b"mdhd", struct.pack(">IIII", 0, 0, 44100, 0) + b"\x00" * 4),
            ),
        ),
    )
    kind, h, w, c, nf, rate = isobmff_probe(blob)
    assert (kind, rate) == ("audio", 44100)


def test_largesize_and_size_zero_boxes_parse():
    payload = b"x" * 10
    large = struct.pack(">I", 1) + b"free" + struct.pack(">Q", 16 + 10) + payload
    tail = struct.pack(">I", 0) + b"mdat" + b"y" * 5  # runs to EOF
    blob = ftyp(b"isom") + large + tail
    paths = [p[-1] for p, _, _ in isobmff_boxes(blob)]
    assert paths == [b"ftyp", b"free", b"mdat"]


def test_decode_is_an_honest_gate():
    from hortacloud_importer_spark.sources.heif import load_libheif

    if load_libheif() is None:
        # bindingless: the named gate
        with pytest.raises(NotImplementedError, match="codec binding"):
            decode_isobmff(_heif(True))
    else:
        # binding present: a payload-less container is a PARSE error
        # from libheif, renamed — never a crash, never fake pixels
        with pytest.raises(IsobmffParseError):
            decode_isobmff(_heif(True))
    # video/audio payloads stay gated either way (no AAC/AVC path)
    with pytest.raises(NotImplementedError, match="codec binding"):
        decode_isobmff(_mp4(320, 240, 10, 8000))


def test_corrupt_containers_raise_named_error_only():
    rng = np.random.default_rng(53)
    for base in (_heif(True), _mp4(640, 360, 30, 22050)):
        for _ in range(200):
            b = bytearray(base)
            mode = rng.integers(0, 3)
            if mode == 0:
                b = b[: int(rng.integers(1, len(b)))]
            elif mode == 1:
                i = int(rng.integers(0, len(b)))
                b[i] ^= 1 << int(rng.integers(0, 8))
            else:
                i = int(rng.integers(0, len(b)))
                b[i : i + 4] = bytes(rng.integers(0, 256, 4).tolist())
            try:
                isobmff_probe(bytes(b))
            except (IsobmffParseError, NotImplementedError):
                pass  # named errors only — never IndexError/struct.error


def test_bomb_guards():
    # a box declaring more bytes than the buffer has
    bad = struct.pack(">I", 1 << 30) + b"moov" + b"\x00" * 16
    with pytest.raises(IsobmffParseError, match="declares"):
        isobmff_boxes(ftyp(b"isom") + bad)
    # pathological nesting beyond the depth cap
    blob = b""
    for _ in range(32):
        blob = box(b"moov", blob)
    with pytest.raises(IsobmffParseError, match="depth"):
        isobmff_boxes(ftyp(b"isom") + blob)


def test_media_probe_routes_isobmff(spark):
    from pyspark.sql import functions as F

    from hortacloud_importer_spark.operators.multimodal import media_probe

    rows = [
        (1, "image", "heic", bytearray(_heif(True))),
        (2, "video", "mp4", bytearray(_mp4(1920, 1080, 120, 44100))),
        (3, "image", "avif", bytearray(_heif(False))),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, format string, payload binary"
    ).withColumn(
        "meta",
        F.expr(
            "named_struct('height', 0, 'width', 0, 'channels', 0,"
            " 'sample_rate', 0, 'n_frames', 0)"
        ),
    )
    got = {r["media_id"]: r for r in media_probe(media).collect()}
    assert (got[1]["height"], got[1]["width"]) == (480, 640)
    assert (got[2]["height"], got[2]["width"], got[2]["n_frames"]) == (
        1080, 1920, 120,
    )
    assert got[2]["sample_rate"] == 44100
    assert (got[3]["height"], got[3]["width"]) == (480, 640)
    # a corrupt payload in tag mode is a counted row, not a dead stage
    bad = bytearray(_heif(True))
    bad[4:8] = b"xxxx"  # ftyp gone
    media_bad = spark.createDataFrame(
        [(9, "image", "heic", bad)],
        "media_id long, kind string, format string, payload binary",
    ).withColumn(
        "meta",
        F.expr(
            "named_struct('height', 0, 'width', 0, 'channels', 0,"
            " 'sample_rate', 0, 'n_frames', 0)"
        ),
    )
    tagged = media_probe(media_bad, errors="tag").collect()
    assert len(tagged) == 1
    assert "IsobmffParseError" in tagged[0]["probe_error"]


# -------------------------------------------- sample-table frame index


def test_frame_index_unfragmented_and_fragmented_golden():
    from hortacloud_importer_spark.queries.multimodal import (
        _frame_index_fixtures,
    )
    from hortacloud_importer_spark.sources.isobmff import (
        isobmff_frame_index,
    )

    fx = dict(_frame_index_fixtures())
    idx = isobmff_frame_index(fx[0])
    assert len(idx) == 10
    vid = [r for r in idx if r[0] == 1]
    aud = [r for r in idx if r[0] == 2]
    assert [r[4] for r in vid] == [0, 1001, 2002, 3003, 4004, 5504]
    assert [r[7] for r in vid] == [True, False, False, True, False, False]
    assert [r[3] for r in aud] == [50] * 4
    # audio chunk is interleaved between the two video chunks
    assert vid[2][2] < aud[0][2] < vid[3][2]
    # offsets within a chunk are contiguous sums of sizes
    assert vid[1][2] - vid[0][2] == 100
    assert aud[3][2] - aud[0][2] == 150

    idx = isobmff_frame_index(fx[1])
    assert [r[3] for r in idx] == [10, 20, 30, 40, 50, 60]
    assert [r[4] for r in idx] == [0, 40, 80, 120, 160, 200]
    assert [r[7] for r in idx] == [True, True, True, True, False, True]


def test_frame_index_multi_moof_continues_dts_and_indices():
    """A second moof with tfdt resumes timestamps; sample indices keep
    counting per track."""
    from hortacloud_importer_spark.sources.isobmff import (
        isobmff_frame_index,
    )

    def u32s(*vals):
        return b"".join(struct.pack(">I", v) for v in vals)

    moov = box(
        b"moov",
        box(
            b"trak",
            full(
                b"tkhd",
                struct.pack(">III", 0, 0, 7) + b"\x00" * 60
                + struct.pack(">II", 0, 0),
            )
            + box(
                b"mdia",
                full(b"mdhd", struct.pack(">IIII", 0, 0, 600, 0) + b"\x00" * 4)
                + box(b"minf", box(b"stbl", b"")),
            ),
        ),
    )

    def moof(doff, base_dts, sizes):
        tfhd = full(b"tfhd", u32s(7, 25), flags=0x020008)
        tfdt = full(b"tfdt", struct.pack(">Q", base_dts), ver=1)
        trun = full(b"trun", u32s(len(sizes), doff, *sizes), flags=0x000201)
        return box(b"moof", box(b"traf", tfhd + tfdt + trun))

    ft = ftyp(b"isom", b"mp42")
    m1 = moof(len(moof(0, 0, [5, 6])) + 8, 0, [5, 6])
    md1 = box(b"mdat", bytes(11))
    m2 = moof(len(moof(0, 0, [7])) + 8, 50, [7])
    md2 = box(b"mdat", bytes(7))
    idx = isobmff_frame_index(ft + moov + m1 + md1 + m2 + md2)
    assert [(r[1], r[4], r[3]) for r in idx] == [
        (0, 0, 5), (1, 25, 6), (2, 50, 7),
    ]
    # second fragment's offset lands in the second mdat's body
    start2 = len(ft + moov + m1 + md1 + m2) + 8
    assert idx[2][2] == start2


def test_frame_index_co64_offsets():
    from hortacloud_importer_spark.sources.isobmff import (
        isobmff_frame_index,
    )

    def u32s(*vals):
        return b"".join(struct.pack(">I", v) for v in vals)

    def moov(mdat0):
        stbl = (
            full(b"stts", u32s(1, 2, 100))
            + full(b"stsc", u32s(1, 1, 2, 1))
            + full(b"stsz", u32s(9, 2))
            + full(b"co64", u32s(1) + struct.pack(">Q", mdat0))
        )
        return box(
            b"moov",
            box(
                b"trak",
                full(
                    b"tkhd",
                    struct.pack(">III", 0, 0, 3) + b"\x00" * 60
                    + struct.pack(">II", 0, 0),
                )
                + box(
                    b"mdia",
                    full(b"mdhd", struct.pack(">IIII", 0, 0, 90, 0) + b"\x00" * 4)
                    + box(b"minf", box(b"stbl", stbl)),
                ),
            ),
        )

    ft = ftyp(b"isom")
    mdat0 = len(ft) + len(moov(0)) + 8
    blob = ft + moov(mdat0) + box(b"mdat", bytes(18))
    idx = isobmff_frame_index(blob)
    assert [(r[2], r[3], r[4]) for r in idx] == [
        (mdat0, 9, 0), (mdat0 + 9, 9, 100),
    ]


def _frag_moov(track_id=7, trex=None):
    """Minimal moov for fragment tests: one trak (no sample table) and
    an optional mvex/trex carrying fragment-wide defaults."""
    trak = box(
        b"trak",
        full(
            b"tkhd",
            struct.pack(">III", 0, 0, track_id) + b"\x00" * 60
            + struct.pack(">II", 0, 0),
        )
        + box(
            b"mdia",
            full(b"mdhd", struct.pack(">IIII", 0, 0, 600, 0) + b"\x00" * 4)
            + box(b"minf", box(b"stbl", b"")),
        ),
    )
    body = trak
    if trex is not None:
        dur, size, flags = trex
        body += box(
            b"mvex",
            full(
                b"trex",
                struct.pack(">IIIII", track_id, 1, dur, size, flags),
            ),
        )
    return box(b"moov", body)


def test_frame_index_dash_default_sample_flags():
    """ADVICE r10: the DASH/fMP4 pattern — tfhd default-sample-flags
    marks every sample non-sync, trun first-sample-flags marks the
    keyframe. Only sample 0 may report is_sync."""
    from hortacloud_importer_spark.sources.isobmff import (
        isobmff_frame_index,
    )

    def u32s(*vals):
        return b"".join(struct.pack(">I", v) for v in vals)

    moov = _frag_moov()
    # tfhd: base-is-moof + default dur + size + FLAGS (0x020038)
    tfhd = full(
        b"tfhd", u32s(7, 25, 9, 0x00010000), flags=0x020038
    )
    # trun: data-offset + first-sample-flags, nothing per-sample
    def moof(doff):
        trun = full(b"trun", u32s(3, doff, 0x02000000), flags=0x000005)
        return box(b"moof", box(b"traf", tfhd + trun))

    ft = ftyp(b"isom", b"mp42")
    m = moof(len(moof(0)) + 8)
    blob = ft + moov + m + box(b"mdat", bytes(27))
    idx = isobmff_frame_index(blob)
    assert [(r[1], r[3], r[5], r[7]) for r in idx] == [
        (0, 9, 25, True), (1, 9, 25, False), (2, 9, 25, False),
    ]


def test_frame_index_trex_defaults_and_trun_continuation():
    """trex supplies duration/size/flags when tfhd has none, and a
    second trun WITHOUT data-offset-present continues after the prior
    trun's samples instead of restarting at base."""
    from hortacloud_importer_spark.sources.isobmff import (
        isobmff_frame_index,
    )

    def u32s(*vals):
        return b"".join(struct.pack(">I", v) for v in vals)

    moov = _frag_moov(trex=(40, 6, 0x00010000))
    tfhd = full(b"tfhd", u32s(7), flags=0x020000)  # base-is-moof only

    def moof(doff):
        trun1 = full(b"trun", u32s(2, doff), flags=0x000001)
        trun2 = full(b"trun", u32s(2), flags=0x000000)  # no data-offset
        return box(b"moof", box(b"traf", tfhd + trun1 + trun2))

    ft = ftyp(b"isom", b"mp42")
    m = moof(len(moof(0)) + 8)
    blob = ft + moov + m + box(b"mdat", bytes(24))
    idx = isobmff_frame_index(blob)
    mdat0 = len(ft + moov + m) + 8
    # trex flags mark non-sync; durations/sizes come from trex; the
    # second trun's offsets continue where the first ended
    assert [(r[1], r[2], r[3], r[5], r[7]) for r in idx] == [
        (0, mdat0, 6, 40, False),
        (1, mdat0 + 6, 6, 40, False),
        (2, mdat0 + 12, 6, 40, False),
        (3, mdat0 + 18, 6, 40, False),
    ]


def test_frame_index_corruption_raises_named_error_only():
    from hortacloud_importer_spark.queries.multimodal import (
        _frame_index_fixtures,
    )
    from hortacloud_importer_spark.sources.isobmff import (
        isobmff_frame_index,
    )

    rng = np.random.default_rng(71)
    for _mid, base in _frame_index_fixtures():
        for _ in range(250):
            b = bytearray(base)
            mode = rng.integers(0, 3)
            if mode == 0:
                b = b[: int(rng.integers(1, len(b)))]
            elif mode == 1:
                i = int(rng.integers(0, len(b)))
                b[i] ^= 1 << int(rng.integers(0, 8))
            else:
                i = int(rng.integers(0, len(b)))
                b[i : i + 4] = bytes(rng.integers(0, 256, 4).tolist())
            try:
                isobmff_frame_index(bytes(b))
            except IsobmffParseError:
                pass  # the named contract


# ----------------------------------------------- MJPEG-in-MP4 decode


def _mjpeg_mp4(payloads: "list[bytes]", codec: bytes = b"jpeg") -> bytes:
    """MP4 with one video track whose samples are the given complete
    JPEG streams — stsd carries the codec tag, stsz/stco point into
    one mdat (two-pass offset patch)."""
    def u32s(*vals):
        return b"".join(struct.pack(">I", v) for v in vals)

    entry = struct.pack(">I", 86) + codec + b"\x00" * 6 + b"\x00\x01" + bytes(70)
    sizes = [len(p) for p in payloads]

    def moov(mdat0):
        stbl = (
            full(b"stsd", u32s(1) + entry)
            + full(b"stts", u32s(1, len(payloads), 100))
            + full(b"stsc", u32s(1, 1, len(payloads), 1))
            + full(b"stsz", u32s(0, len(payloads), *sizes))
            + full(b"stco", u32s(1, mdat0))
        )
        return box(
            b"moov",
            box(
                b"trak",
                full(
                    b"tkhd",
                    struct.pack(">III", 0, 0, 1) + b"\x00" * 60
                    + struct.pack(">II", 16 << 16, 16 << 16),
                )
                + box(
                    b"mdia",
                    full(b"mdhd", struct.pack(">IIII", 0, 0, 3000, 0) + b"\x00" * 4)
                    + box(b"minf", box(b"stbl", stbl)),
                ),
            ),
        )

    ft = ftyp(b"isom", b"mp42")
    mdat0 = len(ft) + len(moov(0)) + 8
    return ft + moov(mdat0) + box(b"mdat", b"".join(payloads))


def test_mjpeg_mp4_decodes_through_the_t81_decoder():
    from hortacloud_importer_spark.sources.isobmff import (
        decode_isobmff_mjpeg,
        isobmff_track_codecs,
    )
    from hortacloud_importer_spark.sources.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(79)
    frames = [
        rng.integers(0, 256, (16, 16), dtype=np.uint8) for _ in range(3)
    ]
    payloads = [encode_jpeg(f) for f in frames]
    blob = _mjpeg_mp4(payloads)
    assert isobmff_track_codecs(blob) == {1: b"jpeg"}
    got = decode_isobmff_mjpeg(blob)
    assert got.shape == (3, 16, 16, 1)
    for i, p in enumerate(payloads):
        assert np.array_equal(got[i], decode_jpeg(p))
    # the general decode entry point routes video -> MJPEG path
    assert np.array_equal(decode_isobmff(blob), got)


def test_mjpeg_gate_for_other_codecs_and_errors():
    from hortacloud_importer_spark.sources.isobmff import (
        decode_isobmff_mjpeg,
    )
    from hortacloud_importer_spark.sources.jpeg import encode_jpeg

    rng = np.random.default_rng(83)
    p = encode_jpeg(rng.integers(0, 256, (8, 8), dtype=np.uint8))
    # an avc1-coded track stays honestly gated
    blob = _mjpeg_mp4([p], codec=b"avc1")
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_isobmff_mjpeg(blob)
    with pytest.raises(NotImplementedError, match="codec binding"):
        decode_isobmff(blob)
    # corruption inside a sample surfaces as a named error
    blob = bytearray(_mjpeg_mp4([p, p]))
    from hortacloud_importer_spark.sources.jpeg import JpegParseError

    i = blob.rfind(b"\xff\xc4")  # DHT marker inside the LAST payload
    blob[i + 1] = 0x00
    with pytest.raises((IsobmffParseError, JpegParseError)):
        decode_isobmff_mjpeg(bytes(blob))


def test_third_party_muxed_mp4_frame_index():
    """Round-10/11 carried ask: validate isobmff_frame_index against a
    file produced by an INDEPENDENT muxer, not this repo's
    hand-assembled fixtures.

    Documented conclusion for this container (re-checked 2026-08-16,
    round 12): no third-party MP4 muxer is obtainable here — no
    ffmpeg/MP4Box/gst-launch binaries, no PyAV/moviepy/imageio-ffmpeg
    Python packages, the JDK's imageio has no MP4 writer, and libheif
    (present, used as the independent HEVC/AV1 payload parser) writes
    HEIF still-image containers, not timed mdat/stbl tracks. The two
    standing mitigations stay in force: scan_mp4_frames decodes MJPEG
    samples located by the walker, and mm_video_sync_decode feeds its
    byte ranges to libheif, which would reject a mis-offset sample as
    a corrupt bitstream.

    This test is the activation hook: the moment a muxer appears in
    the environment (ffmpeg CLI or PyAV), it muxes a 3-frame MJPEG
    movie and checks the walker's sample count, byte sizes, and
    monotone DTS against it — until then it SKIPS, visibly."""
    import shutil
    import subprocess
    import tempfile
    from pathlib import Path

    from hortacloud_importer_spark.sources.isobmff import (
        isobmff_frame_index,
    )
    from hortacloud_importer_spark.sources.jpeg import encode_jpeg

    frames = [
        np.full((32, 48), 40 * (i + 1), dtype=np.uint8) for i in range(3)
    ]
    jpgs = [encode_jpeg(f) for f in frames]

    blob = None
    muxer = None
    try:
        import av  # PyAV, if it ever lands in the image

        with tempfile.TemporaryDirectory() as d:
            out = Path(d) / "clip.mp4"
            with av.open(str(out), "w") as ct:
                stream = ct.add_stream("mjpeg", rate=10)
                stream.width, stream.height = 48, 32
                for j in jpgs:
                    pkt = av.Packet(j)
                    pkt.stream = stream
                    ct.mux(pkt)
            blob = out.read_bytes()
            muxer = "PyAV"
    except ImportError:
        pass
    if blob is None and shutil.which("ffmpeg"):
        with tempfile.TemporaryDirectory() as d:
            for i, j in enumerate(jpgs):
                (Path(d) / f"f{i:03d}.jpg").write_bytes(j)
            out = Path(d) / "clip.mp4"
            r = subprocess.run(
                ["ffmpeg", "-y", "-framerate", "10", "-i",
                 f"{d}/f%03d.jpg", "-c", "copy", str(out)],
                capture_output=True,
            )
            if r.returncode == 0:
                blob = out.read_bytes()
                muxer = "ffmpeg"
    if blob is None:
        pytest.skip(
            "no third-party MP4 muxer in this environment (checked "
            "ffmpeg/MP4Box/gst binaries and PyAV; libheif writes HEIF "
            "stills, not tracks) — hand-assembled fixtures plus the "
            "libheif byte-range cross-check remain the verification"
        )
    # rows: (track_id, sample_idx, byte_offset, byte_size, dts,
    #        duration, timescale, is_sync)
    idx = isobmff_frame_index(blob)
    tracks = {r[0] for r in idx}
    assert len(tracks) == 1, f"{muxer} wrote {len(tracks)} tracks"
    vid = sorted(idx, key=lambda r: r[1])
    assert len(vid) == 3, f"{muxer} muxed 3 samples, walker saw {len(vid)}"
    assert sorted(r[3] for r in vid) == sorted(len(j) for j in jpgs)
    dts = [r[4] for r in vid]
    assert dts == sorted(dts)
