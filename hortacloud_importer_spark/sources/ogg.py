"""Clean-room Ogg container (RFC 3533) walker for the multimodal
metadata hook (SURVEY.md §2.K4).

Ogg is the one mainstream crawl audio container the probe set lacked:
.ogg/.oga (Vorbis), .opus (Opus), and FLAC-in-Ogg all share the page
layout below, and — like the MP3/ADTS probes (sources/mp3.py,
sources/adts.py) — exact duration/rate/channel metadata falls out of
a header walk with no entropy decode:

    "OggS" ver(1=0) htype(1) granulepos(8 LE) serial(4 LE)
    pageseq(4 LE) crc(4 LE) nsegs(1) lacing(nsegs)

Packets are reassembled from lacing runs (255 = continue, <255 ends a
packet; a packet may span pages via the continuation flag). Every
page's CRC-32 (poly 0x04C11DB7, init 0, no reflection, no final xor,
CRC field zeroed) is verified — a crawl probe that skips the checksum
mistakes truncation for silence.

Codec mappings (all public specs):
- Vorbis I: id header ``\\x01vorbis`` — channels, rate; granulepos
  counts PCM samples.
- Opus (RFC 7845): ``OpusHead`` — channels, pre-skip, input rate;
  granulepos counts 48 kHz samples, duration excludes pre-skip.
- FLAC-in-Ogg: ``\\x7fFLAC`` prefix wrapping a native STREAMINFO;
  audio packets are native FLAC frames, so :func:`ogg_flac_to_native`
  reassembles a byte-valid fLaC stream and the clean-room decoder
  (sources/flac.py) decodes REAL samples — the one Ogg codec with a
  full sample path here. Vorbis/Opus sample decode stays an honest
  named gate (MDCT/CELT chains need a codec binding), the same
  contract as decode_mp3/decode_adts.

CHAINED streams (complete BOS..EOS streams concatenated — the
icecast-recording shape) aggregate across links when every link
shares codec/channels/rate; parameter changes mid-chain raise the
named error, as do multiplexed (grouped) streams: a probe that
averaged two concurrent streams' granules would report garbage
durations, so refusing is the honest contract.

No reference parity: the reference repo contains no Ogg handling
(SURVEY.md §2.K4 extension row).
"""

from __future__ import annotations

import struct


class OggParseError(ValueError):
    pass


MAX_PAGES = 1 << 20  # ~64 GiB of maximal pages


def _crc_table():
    tbl = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            r &= 0xFFFFFFFF
        tbl.append(r)
    return tbl


_CRC_TABLE = _crc_table()


def ogg_page_crc(page: bytes) -> int:
    """RFC 3533 §6: CRC-32, poly 0x04C11DB7, init 0, no reflection,
    no final xor, computed over the page with its CRC field zeroed."""
    crc = 0
    for b in page:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[(crc >> 24) ^ b]
    return crc


def ogg_pages(data: bytes) -> list:
    """Walk every page -> [(htype, granulepos, serial, pageseq,
    [segment bytes])]; CRC, version, capture pattern, sequence
    numbering, and BOS/EOS placement all verified."""
    pages = []
    pos = 0
    n = len(data)
    if n < 27 or data[:4] != b"OggS":
        raise OggParseError("no OggS capture pattern at byte 0")
    while pos < n:
        if n - pos < 27:
            raise OggParseError(f"{n - pos} trailing bytes are not a page")
        if data[pos : pos + 4] != b"OggS":
            raise OggParseError(f"no OggS capture pattern at byte {pos}")
        ver = data[pos + 4]
        if ver != 0:
            raise OggParseError(f"ogg stream structure version {ver}")
        htype = data[pos + 5]
        if htype & ~0x07:
            raise OggParseError(f"reserved header-type bits {htype:#x}")
        granule, serial, pageseq, crc = struct.unpack(
            "<qIII", data[pos + 6 : pos + 26]
        )
        nsegs = data[pos + 26]
        hdr_end = pos + 27 + nsegs
        if hdr_end > n:
            raise OggParseError("lacing table overruns the payload")
        lacing = data[pos + 27 : hdr_end]
        body_len = sum(lacing)
        if hdr_end + body_len > n:
            raise OggParseError(
                f"page at {pos} declares {body_len} body bytes past EOF"
            )
        page = bytearray(data[pos : hdr_end + body_len])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_page_crc(bytes(page)) != crc:
            raise OggParseError(f"page at {pos} fails its CRC-32")
        segs = []
        off = hdr_end
        for lv in lacing:
            segs.append(data[off : off + lv])
            off += lv
        pages.append((htype, granule, serial, pageseq, segs, lacing))
        if len(pages) > MAX_PAGES:
            raise OggParseError("page count exceeds the cap")
        pos = hdr_end + body_len
    return pages


def _chain_segments(pages: list) -> list:
    """Split a page list into chain links (RFC 3533 chained streams:
    complete BOS..EOS streams concatenated). A BOS page after the
    first page starts a new link; the previous link must have closed
    with its EOS page."""
    if not pages:
        raise OggParseError("stream holds no pages")
    segments: list = []
    cur: list = []
    for pi, page in enumerate(pages):
        if page[0] & 0x02 and pi != 0:
            if not cur or not cur[-1][0] & 0x04:
                raise OggParseError(
                    "new BOS before the prior chain link's EOS"
                )
            segments.append(cur)
            cur = []
        cur.append(page)
    segments.append(cur)
    return segments


def _single_stream_packets(pages: list) -> tuple[list, list, int]:
    """Pages -> (packets, per-packet end-granulepos, last granulepos)
    for exactly ONE logical stream (one chain link); grouped streams
    raise."""
    if not pages:
        raise OggParseError("stream holds no pages")
    serial = pages[0][2]
    if not pages[0][0] & 0x02:
        raise OggParseError("first page is not a BOS page")
    seen_eos = False
    expect_seq = 0
    packets: list = []
    granules: list = []
    partial = bytearray()
    open_packet = False
    for pi, (htype, granule, ser, pageseq, segs, lacing) in enumerate(pages):
        if ser != serial:
            raise OggParseError(
                "grouped (multiplexed) ogg streams are not supported"
            )
        if htype & 0x02 and pi != 0:
            raise OggParseError(
                "chain link contains an interior BOS page"
            )
        if seen_eos:
            raise OggParseError("page follows the EOS page")
        if pageseq != expect_seq:
            raise OggParseError(
                f"page sequence jumps {expect_seq} -> {pageseq}"
            )
        expect_seq += 1
        if bool(htype & 0x01) != open_packet:
            raise OggParseError(
                "continuation flag disagrees with packet state"
            )
        for si, seg in enumerate(segs):
            partial += seg
            if lacing[si] < 255:
                packets.append(bytes(partial))
                granules.append(granule)
                partial = bytearray()
        if lacing:  # a segment-less page leaves the packet state alone
            open_packet = lacing[-1] == 255
        if htype & 0x04:
            seen_eos = True
    if open_packet:
        raise OggParseError("stream ends inside a packet")
    if not seen_eos:
        raise OggParseError("stream has no EOS page")
    if not packets:
        raise OggParseError("stream holds no packets")
    return packets, granules, pages[-1][1]


def ogg_probe(data: bytes) -> tuple[str, int, int, int, int]:
    """(codec, n_samples, n_channels, sample_rate, n_packets) from a
    full page walk — exact duration accounting, no sample decode.
    ``n_samples`` is at the output rate (Opus: 48 kHz minus pre-skip,
    per RFC 7845 §4/§5.1). CHAINED streams (complete streams
    concatenated, the icecast-recording shape) aggregate across links
    when every link shares codec/channels/rate; parameter changes
    mid-chain raise the named error."""
    segments = _chain_segments(ogg_pages(data))
    if len(segments) > 1:
        probes = [_probe_one_link(seg) for seg in segments]
        head = probes[0]
        for p in probes[1:]:
            if (p[0], p[2], p[3]) != (head[0], head[2], head[3]):
                raise OggParseError(
                    "chained ogg stream changes codec/channels/rate "
                    f"mid-chain ({head[0]}/{head[2]}ch/{head[3]} -> "
                    f"{p[0]}/{p[2]}ch/{p[3]})"
                )
        return (
            head[0],
            sum(p[1] for p in probes),
            head[2],
            head[3],
            sum(p[4] for p in probes),
        )
    return _probe_one_link(segments[0])


def _probe_one_link(pages: list) -> tuple[str, int, int, int, int]:
    packets, _granules, last_granule = _single_stream_packets(pages)
    first = packets[0]
    if first.startswith(b"\x01vorbis"):
        if len(first) < 30:
            raise OggParseError("vorbis id header shorter than 30 bytes")
        version, channels, rate = struct.unpack("<IBI", first[7:16])
        if version != 0:
            raise OggParseError(f"vorbis version {version}")
        if channels == 0 or rate == 0:
            raise OggParseError("vorbis id header has zero channels/rate")
        if not first[29] & 0x01:
            raise OggParseError("vorbis id header framing bit unset")
        if len(packets) < 3:
            raise OggParseError(
                "vorbis stream lacks comment/setup headers"
            )
        if not packets[1].startswith(b"\x03vorbis"):
            raise OggParseError("second packet is not a comment header")
        if not packets[2].startswith(b"\x05vorbis"):
            raise OggParseError("third packet is not a setup header")
        n_audio = len(packets) - 3
        if last_granule < 0:
            raise OggParseError("final granule position is negative")
        return "vorbis", int(last_granule), channels, rate, n_audio
    if first.startswith(b"OpusHead"):
        if len(first) < 19:
            raise OggParseError("OpusHead shorter than 19 bytes")
        ver, channels, preskip, in_rate, _gain, mapping = struct.unpack(
            "<BBHIhB", first[8:19]
        )
        if ver >> 4 != 0:  # RFC 7845 §5.1: major version must be 0
            raise OggParseError(f"opus id header version {ver}")
        if channels == 0:
            raise OggParseError("opus id header has zero channels")
        if mapping > 1:
            raise OggParseError(
                f"opus channel mapping family {mapping} unsupported"
            )
        if len(packets) < 2 or not packets[1].startswith(b"OpusTags"):
            raise OggParseError("second packet is not OpusTags")
        n_audio = len(packets) - 2
        if last_granule < 0:
            raise OggParseError("final granule position is negative")
        n_samples = max(0, int(last_granule) - preskip)
        return "opus", n_samples, channels, 48000, n_audio
    if first.startswith(b"\x7fFLAC"):
        from hortacloud_importer_spark.sources.flac import flac_probe

        native = _link_flac_to_native(pages)
        n_samples, channels, rate, _bps = flac_probe(native)
        n_headers = struct.unpack(">H", first[7:9])[0]
        n_audio = len(packets) - 1 - n_headers
        return "flac", n_samples, channels, rate, n_audio
    if first.startswith(b"\x80theora") or first.startswith(b"Speex   "):
        name = "theora" if first[0] == 0x80 else "speex"
        raise OggParseError(f"ogg {name} streams are not supported")
    raise OggParseError("unrecognized codec id header in the BOS packet")


def ogg_flac_to_native(data: bytes) -> bytes:
    """FLAC-in-Ogg -> a byte-valid native fLaC stream (the Ogg FLAC
    mapping v1.0: BOS packet = 0x7f 'FLAC' maj min nheaders(2 BE) +
    'fLaC' + STREAMINFO; next ``nheaders`` packets are metadata
    blocks; every later packet is one native frame). Metadata-block
    last-flags are rewritten so the chain terminates exactly once.
    For CHAINED containers this converts the FIRST link (decode_ogg
    concatenates links itself)."""
    return _link_flac_to_native(_chain_segments(ogg_pages(data))[0])


def _link_flac_to_native(pages: list) -> bytes:
    packets, _granules, _last = _single_stream_packets(pages)
    first = packets[0]
    if not first.startswith(b"\x7fFLAC"):
        raise OggParseError("BOS packet is not an Ogg FLAC id header")
    if len(first) < 13:
        raise OggParseError("ogg flac id header truncated")
    maj = first[5]
    if maj != 1:
        raise OggParseError(f"ogg flac mapping major version {maj}")
    n_headers = struct.unpack(">H", first[7:9])[0]
    if first[9:13] != b"fLaC":
        raise OggParseError("ogg flac id header lacks the fLaC magic")
    if len(packets) < 1 + n_headers:
        raise OggParseError(
            f"stream declares {n_headers} header packets, "
            f"{len(packets) - 1} present"
        )
    meta_blocks = [bytearray(first[13:])]
    for pkt in packets[1 : 1 + n_headers]:
        meta_blocks.append(bytearray(pkt))
    for i, blk in enumerate(meta_blocks):
        if len(blk) < 4:
            raise OggParseError("metadata header packet truncated")
        ln = int.from_bytes(blk[1:4], "big")
        if 4 + ln != len(blk):
            raise OggParseError(
                "metadata header packet length disagrees with its block"
            )
        last = i == len(meta_blocks) - 1
        blk[0] = (blk[0] & 0x7F) | (0x80 if last else 0x00)
    out = bytearray(b"fLaC")
    for blk in meta_blocks:
        out += blk
    for pkt in packets[1 + n_headers :]:
        out += pkt
    return bytes(out)


def decode_ogg(data: bytes):
    """FLAC-in-Ogg decodes REAL samples through the clean-room FLAC
    decoder (chained links concatenate, PCM-gaplessly, after the probe
    has verified uniform codec/channels/rate); Vorbis/Opus raise the
    honest codec-binding gate after the container validates — same
    contract as decode_mp3/decode_adts."""
    import numpy as np

    kind = ogg_probe(data)[0]  # also validates chain uniformity
    if kind == "flac":
        from hortacloud_importer_spark.sources.flac import decode_flac

        segments = _chain_segments(ogg_pages(data))
        outs = []
        rate = None
        for seg in segments:
            pcm, rate = decode_flac(_link_flac_to_native(seg))
            outs.append(pcm)
        return np.concatenate(outs, axis=0), rate
    raise NotImplementedError(
        f"ogg {kind} sample decode needs an audio codec binding; the "
        "page walk (ogg_probe) covers metadata extraction"
    )


# --------------------------------------------------- fixture encoders


def write_ogg_pages(
    packets: list,
    granules: list,
    serial: int = 0x1234,
    max_segs: int = 255,
) -> bytes:
    """Packets (+ per-packet end granulepos) -> a single-stream Ogg
    byte stream with correct lacing, continuation flags, sequence
    numbers, and CRCs. Packets longer than ``max_segs*255`` bytes span
    pages. Fixture-only: golden tests pin the wire layout."""
    if len(packets) != len(granules):
        raise OggParseError("one granule per packet required")
    # lace each packet, then greedily fill pages up to max_segs
    pages: list = []  # (segs, lacing, granule, continued)
    cur_segs: list = []
    cur_lac: list = []
    cur_granule = -1
    continued = False
    next_continued = False

    def flush():
        nonlocal cur_segs, cur_lac, cur_granule, continued
        pages.append((cur_segs, cur_lac, cur_granule, continued))
        cur_segs, cur_lac, cur_granule = [], [], -1
        continued = next_continued

    for pkt, gran in zip(packets, granules):
        lac = [255] * (len(pkt) // 255) + [len(pkt) % 255]
        off = 0
        for i, lv in enumerate(lac):
            if len(cur_lac) == max_segs:
                next_continued = i > 0
                flush()
            cur_segs.append(pkt[off : off + lv])
            cur_lac.append(lv)
            off += lv
        cur_granule = gran  # last COMPLETED packet's granule
    next_continued = False
    flush()
    out = bytearray()
    for i, (segs, lac, gran, cont) in enumerate(pages):
        htype = (0x01 if cont else 0) | (0x02 if i == 0 else 0)
        if i == len(pages) - 1:
            htype |= 0x04
        if gran < 0:
            gran = -1  # no packet completes on this page
        hdr = (
            b"OggS"
            + bytes([0, htype])
            + struct.pack("<qIII", gran, serial, i, 0)
            + bytes([len(lac)])
            + bytes(lac)
        )
        page = hdr + b"".join(segs)
        crc = ogg_page_crc(page)
        page = bytearray(page)
        page[22:26] = struct.pack("<I", crc)
        out += page
    return bytes(out)


def encode_ogg_vorbis_headers(
    n_audio_packets: int,
    rate: int = 44100,
    channels: int = 2,
    samples_per_packet: int = 1024,
    vendor: bytes = b"hortacloud-importer-spark-fixture",
) -> bytes:
    """Fixture: a structurally valid Ogg Vorbis stream whose audio
    packets are deterministic filler (the probe reads only headers and
    granule positions, mirroring encode_mp3_headers)."""
    ident = (
        b"\x01vorbis"
        + struct.pack("<IBI", 0, channels, rate)
        + struct.pack("<iii", -1, rate * 2, -1)
        + bytes([0x66])  # blocksizes 64/4096 (unused by the probe)
        + b"\x01"
    )
    comment = (
        b"\x03vorbis"
        + struct.pack("<I", len(vendor))
        + vendor
        + struct.pack("<I", 0)
        + b"\x01"
    )
    setup = b"\x05vorbis" + bytes(
        (i * 17 + 5) & 0xFF for i in range(64)
    )
    packets = [ident, comment, setup]
    granules = [0, 0, 0]
    total = 0
    for i in range(n_audio_packets):
        total += samples_per_packet
        packets.append(bytes(((i * 31 + j * 7) & 0xFF) for j in range(40)))
        granules.append(total)
    return write_ogg_pages(packets, granules)


def encode_ogg_opus_headers(
    n_audio_packets: int,
    channels: int = 2,
    preskip: int = 312,
    samples_per_packet: int = 960,
    vendor: bytes = b"hortacloud-importer-spark-fixture",
) -> bytes:
    """Fixture: a structurally valid Ogg Opus stream (RFC 7845 layout)
    with filler audio packets; granulepos runs at 48 kHz and includes
    the pre-skip, as the spec requires."""
    head = b"OpusHead" + struct.pack(
        "<BBHIhB", 1, channels, preskip, 48000, 0, 0
    )
    tags = (
        b"OpusTags"
        + struct.pack("<I", len(vendor))
        + vendor
        + struct.pack("<I", 0)
    )
    packets = [head, tags]
    granules = [0, 0]
    total = preskip
    for i in range(n_audio_packets):
        total += samples_per_packet
        packets.append(bytes(((i * 13 + j * 3) & 0xFF) for j in range(20)))
        granules.append(total)
    return write_ogg_pages(packets, granules)


def encode_ogg_flac(native: bytes) -> bytes:
    """Wrap a NATIVE fLaC stream (e.g. from encode_flac) in the Ogg
    FLAC mapping: one packet per metadata block and per frame, sample
    granule positions from STREAMINFO block sizes. Round-trips through
    :func:`ogg_flac_to_native` / :func:`decode_ogg` byte-exactly."""
    from hortacloud_importer_spark.sources.flac import (
        FlacParseError,
        _parse_streaminfo,
    )

    try:
        si, first_frame = _parse_streaminfo(native)
    except FlacParseError as exc:
        raise OggParseError(f"not a native flac stream: {exc}") from exc
    # split the metadata chain
    blocks = []
    pos = 4
    while True:
        hdr = native[pos]
        ln = int.from_bytes(native[pos + 1 : pos + 4], "big")
        blocks.append(bytearray(native[pos : pos + 4 + ln]))
        pos += 4 + ln
        if hdr & 0x80:
            break
    streaminfo = blocks[0]
    streaminfo[0] &= 0x7F  # ogg mapping: more headers may follow
    id_pkt = (
        b"\x7fFLAC"
        + bytes([1, 0])
        + struct.pack(">H", len(blocks) - 1)
        + b"fLaC"
        + bytes(streaminfo)
    )
    packets = [id_pkt] + [bytes(b) for b in blocks[1:]]
    granules = [0] * len(packets)
    # exact frame boundaries: decode frame-by-frame with the clean-room
    # parser (frames are not self-delimiting without a full parse) and
    # granule from the actual decoded block sizes
    from hortacloud_importer_spark.sources.flac import (
        _BitReader,
        _decode_frame,
    )

    br = _BitReader(native, first_frame)
    bounds = []
    total = 0
    while not br.at_end():
        start = br.bitpos() >> 3
        block, _rate = _decode_frame(native, br, si)
        total += block.shape[0]
        bounds.append((start, total))
    if not bounds:
        raise OggParseError("native flac stream holds no frames")
    ends = [s for s, _ in bounds[1:]] + [len(native)]
    for (start, gran), end in zip(bounds, ends):
        packets.append(native[start:end])
        granules.append(gran)
    return write_ogg_pages(packets, granules)
