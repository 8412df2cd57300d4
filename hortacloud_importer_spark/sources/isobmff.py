"""Clean-room ISO Base Media File Format box parser (ISO/IEC
14496-12) — the container behind MP4/MOV video and HEIF/HEIC/AVIF
images, which dominate modern crawls alongside JPEG/WebP.

Metadata-first by design: the probe walks the box tree and reads the
spatial-extents / track-header metadata a crawl pipeline needs to
schedule work (`media_probe`'s schema-scan-then-decode-selectively
posture), and ``isobmff_frame_index`` enumerates per-sample byte
ranges + timestamps from the sample tables (stbl) and movie
fragments (moof) so frames can be range-read without shipping mdat.
Pixel decode: MJPEG-coded video tracks decode CLEAN-ROOM (every
sample is a complete T.81 stream -> sources/jpeg.py); HEIF-family
images decode through the optional system libheif binding
(sources/heif.py); HEVC/AV1/AAC tracks stay a gated
NotImplementedError — codec bindings belong behind the same optional
import tail as PIL, and shipping a wrong decode would be worse than
an honest gate.

What the probe extracts:
- HEIF/HEIC/AVIF (`ftyp` brands mif1/heic/heix/avif/avis):
  `meta/iprp/ipco/ispe` image spatial extents; the PRIMARY item is
  resolved via `pitm` + `ipma` when present, else the largest extent
  (thumbnails are smaller by construction).
- MP4/MOV (`isom`/`mp4*`/`qt  ` and friends): per-track `tkhd` pixel
  dimensions (16.16 fixed point), `mdhd` timescale, `stsz`/`stts`
  sample counts — video dims + frame count, audio sample rate.

Bomb-guarded like every other codec here: declared box sizes are
checked against the payload, recursion depth and box counts are
capped, and every malformed structure raises
:class:`IsobmffParseError` (the one named error crawl kernels catch).

Reference parity: the reference repo has no ISOBMFF path (its corpora
are TIFF stacks); this extends the K4 multimodal surface the same way
webp/gif/avi did.
"""

from __future__ import annotations

import struct

__all__ = [
    "IsobmffParseError",
    "isobmff_probe",
    "isobmff_boxes",
    "decode_isobmff",
]

_MAX_BOXES = 100_000
_MAX_DEPTH = 16

# containers we recurse into (plain concatenations of child boxes)
_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"iprp", b"ipco",
    b"edts", b"mvex", b"moof", b"traf",
}
# full-box containers: 4 bytes of version/flags precede the children
_FULLBOX_CONTAINERS = {b"meta"}

_HEIF_BRANDS = {
    b"mif1", b"msf1", b"heic", b"heix", b"hevc", b"heim", b"heis",
    b"avif", b"avis",
}


class IsobmffParseError(ValueError):
    """Malformed or truncated ISOBMFF container."""


def _walk(data: bytes, start: int, end: int, depth: int, out: list,
          path: tuple):
    if depth > _MAX_DEPTH:
        raise IsobmffParseError("box nesting exceeds the depth cap")
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise IsobmffParseError(f"truncated box header at {pos}")
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise IsobmffParseError(f"truncated largesize at {pos}")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:  # box runs to end of enclosing scope
            size = end - pos
        if size < hdr or pos + size > end:
            raise IsobmffParseError(
                f"box {btype!r} at {pos} declares {size} bytes, "
                f"scope has {end - pos}"
            )
        out.append((path + (btype,), pos + hdr, pos + size))
        if len(out) > _MAX_BOXES:
            raise IsobmffParseError("box count exceeds the cap")
        if btype in _CONTAINERS:
            _walk(data, pos + hdr, pos + size, depth + 1, out,
                  path + (btype,))
        elif btype in _FULLBOX_CONTAINERS:
            if size < hdr + 4:
                raise IsobmffParseError(f"full box {btype!r} too short")
            _walk(data, pos + hdr + 4, pos + size, depth + 1, out,
                  path + (btype,))
        pos += size


def isobmff_boxes(data: bytes) -> list[tuple[tuple, int, int]]:
    """-> [(path, body_start, body_end)] for every box, depth-first.
    ``path`` is the tuple of 4CCs from the root down to the box."""
    if len(data) < 8:
        raise IsobmffParseError("shorter than one box header")
    out: list = []
    _walk(data, 0, len(data), 0, out, ())
    return out


def _u(data: bytes, off: int, n: int) -> int:
    if off + n > len(data):
        raise IsobmffParseError("field overruns its box")
    return int.from_bytes(data[off : off + n], "big")


def _heif_dims(data: bytes, boxes) -> tuple[int, int]:
    """Primary-item width/height: resolve pitm -> ipma to the first
    associated property that IS an ispe; else the largest ispe.
    Association indices are 1-based over ALL ipco children, so
    non-ispe properties (hvcC/av1C/colr — typically listed before the
    ispe in real HEIC/AVIF) must be counted when mapping them."""
    children: list = []  # (type_4cc, (w, h) | None), in ipco order
    for path, a, b in boxes:
        if len(path) >= 2 and path[-2] == b"ipco":
            if path[-1] == b"ispe":
                if b - a < 12:
                    raise IsobmffParseError("ispe too short")
                children.append(
                    (b"ispe", (_u(data, a + 4, 4), _u(data, a + 8, 4)))
                )
            else:
                children.append((path[-1], None))
    ispes = [dims for t, dims in children if t == b"ispe"]
    if not ispes:
        raise IsobmffParseError("no ispe (image spatial extents) box")
    try:
        pitm = next(
            (a, b) for path, a, b in boxes if path[-1] == b"pitm"
        )
        ver = _u(data, pitm[0], 1)
        item_id = _u(
            data, pitm[0] + 4, 2 if ver == 0 else 4
        )
        ipma = next(
            (a, b) for path, a, b in boxes if path[-1] == b"ipma"
        )
        for idx in _ipma_assocs(data, ipma, item_id):
            if idx < len(children) and children[idx][0] == b"ispe":
                return children[idx][1]
    except (StopIteration, IsobmffParseError):
        pass
    return max(ispes, key=lambda wh: wh[0] * wh[1])


def _ipma_assocs(data, ipma, item_id) -> list:
    """0-based ipco indices of every property associated with
    ``item_id``, in association order (essential bit stripped).
    Empty when the item has no entry."""
    a, b = ipma
    ver = _u(data, a, 1)
    flags = _u(data, a + 1, 3)
    pos = a + 4
    count = _u(data, pos, 4)
    pos += 4
    for _ in range(count):
        iid = _u(data, pos, 2 if ver < 1 else 4)
        pos += 2 if ver < 1 else 4
        assoc_n = _u(data, pos, 1)
        pos += 1
        idxs = []
        for _ in range(assoc_n):
            if flags & 1:
                idx = _u(data, pos, 2) & 0x7FFF
                pos += 2
            else:
                idx = _u(data, pos, 1) & 0x7F
                pos += 1
            if idx > 0:
                idxs.append(idx - 1)  # 1-based in the file
        if iid == item_id:
            return idxs
    return []


def isobmff_probe(data: bytes) -> tuple[str, int, int, int, int, int]:
    """-> (kind, height, width, channels, n_frames, sample_rate)
    without touching any coded payload. ``kind`` is 'image' for
    HEIF-family brands, 'video' when a sized video track exists,
    else 'audio'."""
    try:
        boxes = isobmff_boxes(data)
    except RecursionError as exc:  # pathological nesting
        raise IsobmffParseError(f"box recursion: {exc}") from exc
    if not boxes or boxes[0][0][-1] != b"ftyp":
        raise IsobmffParseError("first box is not ftyp")
    a, b = boxes[0][1], boxes[0][2]
    if b - a < 8:
        raise IsobmffParseError("ftyp too short")
    brands = {data[a : a + 4]} | {
        data[i : i + 4] for i in range(a + 8, b - 3, 4)
    }

    if brands & _HEIF_BRANDS:
        w, h = _heif_dims(data, boxes)
        if not (0 < w <= 1 << 20 and 0 < h <= 1 << 20):
            raise IsobmffParseError(f"ispe extents {w}x{h} out of range")
        return "image", h, w, 3, 1, 0

    # MP4/MOV: scan tracks for video dims + frame count, audio rate
    h = w = 0
    n_frames = 0
    rate = 0
    cur_dims = None
    for path, a, b in boxes:
        leaf = path[-1]
        if leaf == b"tkhd":
            ver = _u(data, a, 1)
            base = a + 4 + (32 if ver == 1 else 20)
            # reserved(8) layer(2) alternate_group(2) volume(2)
            # reserved(2) matrix(36) then width/height as 16.16
            wh = base + 8 + 8 + 36
            tw = _u(data, wh, 4) >> 16
            th = _u(data, wh + 4, 4) >> 16
            cur_dims = (tw, th)
            if tw and th and tw * th > w * h:
                w, h = tw, th
        elif leaf == b"mdhd":
            ver = _u(data, a, 1)
            ts_off = a + 4 + (16 if ver == 1 else 8)
            ts = _u(data, ts_off, 4)
            if cur_dims in (None, (0, 0)) and rate == 0 and ts:
                rate = ts  # audio track: timescale = sample rate
        elif leaf == b"stsz":
            cnt = _u(data, a + 8, 4)
            if cur_dims and cur_dims != (0, 0):
                n_frames = max(n_frames, cnt)
        elif leaf == b"stts" and n_frames == 0:
            entries = _u(data, a + 4, 4)
            total = 0
            pos = a + 8
            for _ in range(min(entries, 10_000)):
                total += _u(data, pos, 4)
                pos += 8
            if cur_dims and cur_dims != (0, 0):
                n_frames = max(n_frames, total)
    if w and h:
        return "video", h, w, 3, max(n_frames, 1), rate
    if rate:
        return "audio", 0, 0, 1, max(n_frames, 1), rate
    raise IsobmffParseError("no sized video track, audio track, or ispe")


def decode_isobmff(data: bytes):
    """Pixel/sample decode is a codec-binding problem (HEVC, AV1,
    AAC). HEIF-family images route through the optional system
    libheif binding (sources/heif.py — de265/dav1d, the jp2-style
    fallback chain); video/audio payloads and bindingless
    environments raise the honest gate."""
    kind, h, w, *_ = isobmff_probe(data)
    if kind == "image":
        from hortacloud_importer_spark.sources.heif import decode_heif

        try:
            return decode_heif(data)[None]
        except NotImplementedError:
            pass  # no binding: fall through to the named gate
    elif kind == "video":
        try:
            return decode_isobmff_mjpeg(data)  # clean-room, no binding
        except NotImplementedError:
            pass  # non-JPEG codec: fall through to the named gate
    raise NotImplementedError(
        f"ISOBMFF {kind} payload ({w}x{h}): coded-stream decode needs "
        "a codec binding (HEVC/AV1/AAC) — header metadata is available "
        "via isobmff_probe/media_probe"
    )


# ------------------------------------------------- sample-table index

_MAX_INDEX_SAMPLES = 1 << 22


def isobmff_frame_index(data: bytes) -> list:
    """Enumerate every sample (frame) of every track WITHOUT touching
    coded payloads: -> [(track_id, sample_idx, byte_offset, byte_size,
    dts, duration, timescale, is_sync)], unfragmented tracks first
    (stsd/stts/stsc/stco|co64/stsz/stss), then movie fragments
    (moof: tfhd/tfdt/trun) in file order.

    This is the crawl pipeline's video analog of chunk pruning: with
    per-frame byte ranges + timestamps a scheduler can range-read
    every k-th keyframe from object storage without shipping the
    mdat, exactly how the windowed-region reader prunes chunks
    (sources/datasource.py pushFilters). Decode stays codec-gated."""
    boxes = isobmff_boxes(data)
    out: list = []
    timescales: dict = {}
    next_dts: dict = {}
    next_idx: dict = {}

    # mvex/trex: fragment-wide defaults (ISO 14496-12 8.8.3) — the
    # fallback when a tfhd carries no per-fragment default
    trex_defaults: dict = {}
    for path, a, b in boxes:
        if path[-1] == b"trex":
            if b - a < 24:
                raise IsobmffParseError("trex box truncated")
            trex_defaults[_u(data, a + 4, 4)] = (
                _u(data, a + 12, 4),  # default_sample_duration
                _u(data, a + 16, 4),  # default_sample_size
                _u(data, a + 20, 4),  # default_sample_flags
            )

    traks = [(a, b) for path, a, b in boxes if path[-1] == b"trak"]
    for ta, tb in traks:
        sub = [(p, a, b) for p, a, b in boxes if ta <= a and b <= tb]

        def _find(leaf, sub=sub):
            return next(
                ((a, b) for p, a, b in sub if p[-1] == leaf), None
            )

        tkhd = _find(b"tkhd")
        mdhd = _find(b"mdhd")
        if tkhd is None or mdhd is None:
            raise IsobmffParseError("trak without tkhd/mdhd")
        ver = _u(data, tkhd[0], 1)
        track_id = _u(data, tkhd[0] + (4 + 16 if ver else 4 + 8), 4)
        mver = _u(data, mdhd[0], 1)
        timescale = _u(data, mdhd[0] + (4 + 16 if mver else 4 + 8), 4)
        if timescale == 0:
            raise IsobmffParseError("mdhd timescale is zero")
        timescales[track_id] = timescale
        next_dts[track_id] = 0
        next_idx[track_id] = 0

        stsz = _find(b"stsz")
        stts = _find(b"stts")
        stsc = _find(b"stsc")
        stco = _find(b"stco")
        co64 = _find(b"co64")
        if stsz is None or stts is None or stsc is None or (
            stco is None and co64 is None
        ):
            continue  # metadata-only track (no sample table)

        # stsz: uniform size or per-sample table
        a, b = stsz
        uniform = _u(data, a + 4, 4)
        n = _u(data, a + 8, 4)
        if n > _MAX_INDEX_SAMPLES:
            raise IsobmffParseError("stsz sample count exceeds the cap")
        if uniform:
            sizes = [uniform] * n
        else:
            if b - a < 12 + 4 * n:
                raise IsobmffParseError("stsz table truncated")
            sizes = [_u(data, a + 12 + 4 * i, 4) for i in range(n)]

        # stts: (count, delta) runs -> per-sample durations
        a, b = stts
        n_ent = _u(data, a + 4, 4)
        if b - a < 8 + 8 * n_ent:
            raise IsobmffParseError("stts table truncated")
        durations: list = []
        for i in range(n_ent):
            cnt = _u(data, a + 8 + 8 * i, 4)
            delta = _u(data, a + 12 + 8 * i, 4)
            if len(durations) + cnt > n:
                raise IsobmffParseError("stts covers more samples than stsz")
            durations.extend([delta] * cnt)
        if len(durations) != n:
            raise IsobmffParseError(
                f"stts covers {len(durations)} samples, stsz has {n}"
            )

        # chunk offsets
        if stco is not None:
            a, b = stco
            n_chunks = _u(data, a + 4, 4)
            if b - a < 8 + 4 * n_chunks:
                raise IsobmffParseError("stco table truncated")
            chunk_offs = [_u(data, a + 8 + 4 * i, 4) for i in range(n_chunks)]
        else:
            a, b = co64
            n_chunks = _u(data, a + 4, 4)
            if b - a < 8 + 8 * n_chunks:
                raise IsobmffParseError("co64 table truncated")
            chunk_offs = [_u(data, a + 8 + 8 * i, 8) for i in range(n_chunks)]

        # stsc: (first_chunk, samples_per_chunk, desc) runs
        a, b = stsc
        n_ent = _u(data, a + 4, 4)
        if b - a < 8 + 12 * n_ent:
            raise IsobmffParseError("stsc table truncated")
        runs = []
        for i in range(n_ent):
            first = _u(data, a + 8 + 12 * i, 4)
            per = _u(data, a + 12 + 12 * i, 4)
            if first < 1 or per < 1:
                raise IsobmffParseError("stsc run out of range")
            runs.append((first, per))
        if not runs or runs[0][0] != 1:
            raise IsobmffParseError("stsc does not start at chunk 1")

        # stss: sync table (absent -> every sample is sync)
        stss = _find(b"stss")
        sync: set | None = None
        if stss is not None:
            a, b = stss
            n_ent = _u(data, a + 4, 4)
            if b - a < 8 + 4 * n_ent:
                raise IsobmffParseError("stss table truncated")
            sync = {
                _u(data, a + 8 + 4 * i, 4) for i in range(n_ent)
            }

        dts = 0
        si = 0
        for ci in range(n_chunks):
            per = next(
                runs[ri][1]
                for ri in range(len(runs) - 1, -1, -1)
                if runs[ri][0] <= ci + 1
            )
            off = chunk_offs[ci]
            for _ in range(per):
                if si >= n:
                    break
                if off + sizes[si] > len(data):
                    raise IsobmffParseError(
                        f"sample {si} overruns the payload"
                    )
                out.append(
                    (
                        track_id, si, off, sizes[si], dts,
                        durations[si], timescale,
                        sync is None or (si + 1) in sync,
                    )
                )
                off += sizes[si]
                dts += durations[si]
                si += 1
        if si != n:
            raise IsobmffParseError(
                f"chunk map places {si} of {n} samples"
            )
        next_dts[track_id] = dts
        next_idx[track_id] = n

    # ---- movie fragments: moof header starts from a top-level scan
    moof_starts = []
    pos = 0
    while pos + 8 <= len(data):
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        if size == 1:
            size = _u(data, pos + 8, 8)
        elif size == 0:
            size = len(data) - pos
        if btype == b"moof":
            moof_starts.append((pos, pos + size))
        pos += size

    for ms, me in moof_starts:
        trafs = [
            (a, b)
            for path, a, b in boxes
            if path[-1] == b"traf" and ms <= a and b <= me
        ]
        for fa, fb in trafs:
            fsub = [(p, a, b) for p, a, b in boxes if fa <= a and b <= fb]
            tfhd = next(
                ((a, b) for p, a, b in fsub if p[-1] == b"tfhd"), None
            )
            if tfhd is None:
                raise IsobmffParseError("traf without tfhd")
            a, _ = tfhd
            flags = _u(data, a + 1, 3)
            track_id = _u(data, a + 4, 4)
            p = a + 8
            base = ms
            if flags & 0x000001:
                base = _u(data, p, 8)
                p += 8
            if flags & 0x000002:
                p += 4
            tdef = trex_defaults.get(track_id)
            def_dur, def_size, def_flags = tdef if tdef else (
                None, None, None
            )
            if flags & 0x000008:
                def_dur = _u(data, p, 4)
                p += 4
            if flags & 0x000010:
                def_size = _u(data, p, 4)
                p += 4
            if flags & 0x000020:  # default-sample-flags-present
                def_flags = _u(data, p, 4)
                p += 4
            timescale = timescales.get(track_id)
            if timescale is None:
                raise IsobmffParseError(
                    f"fragment for unknown track {track_id}"
                )
            dts = next_dts.get(track_id, 0)
            tfdt = next(
                ((a, b) for p2, a, b in fsub if p2[-1] == b"tfdt"), None
            )
            if tfdt is not None:
                tver = _u(data, tfdt[0], 1)
                dts = _u(data, tfdt[0] + 4, 8 if tver else 4)
            si = next_idx.get(track_id, 0)
            off = base  # truns without data-offset-present continue
            # after the prior trun's samples (8.8.8.2), not at base
            for p2, a2, b2 in fsub:
                if p2[-1] != b"trun":
                    continue
                tflags = _u(data, a2 + 1, 3)
                cnt = _u(data, a2 + 4, 4)
                if cnt > _MAX_INDEX_SAMPLES:
                    raise IsobmffParseError("trun count exceeds the cap")
                q = a2 + 8
                if tflags & 0x000001:
                    doff = _u(data, q, 4)
                    if doff >> 31:
                        doff -= 1 << 32
                    off = base + doff
                    q += 4
                first_flags = None
                if tflags & 0x000004:
                    first_flags = _u(data, q, 4)
                    q += 4
                for k in range(cnt):
                    dur = def_dur
                    if tflags & 0x000100:
                        dur = _u(data, q, 4)
                        q += 4
                    sz = def_size
                    if tflags & 0x000200:
                        sz = _u(data, q, 4)
                        q += 4
                    sflags = None
                    if tflags & 0x000400:
                        sflags = _u(data, q, 4)
                        q += 4
                    if tflags & 0x000800:
                        q += 4  # composition offset: not indexed
                    if k == 0 and first_flags is not None:
                        sflags = first_flags
                    elif sflags is None:
                        sflags = def_flags  # tfhd, else trex default
                    if dur is None or sz is None:
                        raise IsobmffParseError(
                            "trun sample lacks duration/size and no "
                            "tfhd default applies"
                        )
                    if off + sz > len(data):
                        raise IsobmffParseError(
                            f"fragment sample {si} overruns the payload"
                        )
                    is_sync = (
                        not (sflags & 0x00010000) if sflags is not None
                        else True
                    )
                    out.append(
                        (track_id, si, off, sz, dts, dur, timescale,
                         is_sync)
                    )
                    off += sz
                    dts += dur
                    si += 1
                    if len(out) > _MAX_INDEX_SAMPLES:
                        raise IsobmffParseError(
                            "total sample count exceeds the cap"
                        )
            next_dts[track_id] = dts
            next_idx[track_id] = si
    if not out:
        raise IsobmffParseError("no sample tables or fragments")
    return out


def isobmff_track_codecs(data: bytes) -> dict:
    """track_id -> sample-entry 4CC (the stsd codec tag, e.g. b'avc1',
    b'hvc1', b'jpeg', b'mp4a') — header walk only."""
    boxes = isobmff_boxes(data)
    out: dict = {}
    for path, ta, tb in boxes:
        if path[-1] != b"trak":
            continue
        sub = [(p, a, b) for p, a, b in boxes if ta <= a and b <= tb]
        tkhd = next(((a, b) for p, a, b in sub if p[-1] == b"tkhd"), None)
        stsd = next(((a, b) for p, a, b in sub if p[-1] == b"stsd"), None)
        if tkhd is None or stsd is None:
            continue
        ver = _u(data, tkhd[0], 1)
        track_id = _u(data, tkhd[0] + (4 + 16 if ver else 4 + 8), 4)
        a, b = stsd
        if b - a < 16:
            raise IsobmffParseError("stsd too short")
        n = _u(data, a + 4, 4)
        if n < 1:
            continue
        entry_size = _u(data, a + 8, 4)
        if entry_size < 8 or a + 8 + entry_size > b:
            raise IsobmffParseError("stsd entry overruns its box")
        out[track_id] = data[a + 12 : a + 16]
    return out


_MJPEG_TAGS = {b"jpeg", b"mjpa", b"mjpb", b"mjpg", b"MJPG"}


def decode_isobmff_mjpeg(data: bytes) -> "object":
    """MJPEG-in-MP4/MOV -> (n_frames, h, w, c) uint8: every sample of
    the first JPEG-coded video track is a complete T.81 stream, so
    the sample-table frame index + the clean-room JPEG decoder give
    REAL video pixel decode with no external binding — the same
    composition the AVI path uses (sources/avi.py), on the modern
    container. Non-JPEG tracks raise NotImplementedError (the codec
    gate); structural problems raise IsobmffParseError."""
    import numpy as np

    from hortacloud_importer_spark.sources.jpeg import decode_jpeg

    codecs = isobmff_track_codecs(data)
    track = next(
        (tid for tid, cc in codecs.items() if cc in _MJPEG_TAGS), None
    )
    if track is None:
        raise NotImplementedError(
            f"no MJPEG video track (codecs: "
            f"{sorted(cc.decode('latin1') for cc in codecs.values())})"
        )
    idx = [r for r in isobmff_frame_index(data) if r[0] == track]
    if not idx:
        raise IsobmffParseError("MJPEG track has no samples")
    frames = []
    shape = None
    total = 0
    for (_tid, _si, off, sz, _dts, _dur, _ts, _sync) in idx:
        arr = decode_jpeg(data[off : off + sz])
        if shape is None:
            shape = arr.shape
        elif arr.shape != shape:
            raise IsobmffParseError(
                f"frame size changes mid-track: {arr.shape} vs {shape}"
            )
        total += arr.size
        if total > 1 << 28:
            # whole-video decode guard (same 2^28-sample posture as
            # the image codecs): longer videos should range-read
            # selected frames via isobmff_frame_index instead of
            # materializing every frame in one executor task
            raise IsobmffParseError(
                f"{len(idx)} frames of {shape} exceed the full-decode "
                "guard; use the frame index to range-read a subset"
            )
        frames.append(arr)
    return np.stack(frames)
