"""Clean-room GIF codec (sources/gif.py): decoder against hand-built
spec-shaped streams, encoder/decoder roundtrips, animation
compositing, and the multimodal-kernel route."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hortacloud_importer_spark.sources.gif import (
    GifParseError,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)

BLACK_WHITE = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)


def test_hand_built_stream_decodes():
    """A GIF89a file assembled byte-by-byte, its LZW bitstream packed
    by hand (codes CLEAR,1,0,1,EOI at width 3, LSB-first = 0x0C 0x52):
    pins header layout, color-table framing, and LZW bit order
    against the spec rather than the encoder."""
    gif = (
        b"GIF89a"
        + struct.pack("<HHBBB", 3, 1, 0x80, 0, 0)  # screen 3x1, 2-color GCT
        + bytes([0, 0, 0, 255, 255, 255])  # GCT: black, white
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, 3, 1, 0)  # full-frame descriptor
        + bytes([2])  # LZW minimum code size
        + bytes([2, 0x0C, 0x52, 0])  # one sub-block + terminator
        + b"\x3b"
    )
    out = decode_gif(gif)
    assert out.shape == (1, 1, 3, 3)
    assert np.array_equal(out[0, 0], [[255] * 3, [0] * 3, [255] * 3])


def test_gif87a_and_no_initial_clear():
    """87a headers decode, and an LZW stream that omits the optional
    leading CLEAR code still decodes (the table starts initialized)."""
    gif = (
        b"GIF87a"
        + struct.pack("<HHBBB", 2, 1, 0x80, 0, 0)
        + bytes([0, 0, 0, 255, 255, 255])
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
        + bytes([2])
    )
    # codes 1,0,EOI(5) at width 3, LSB-first: 001 000 101 -> bits
    # 1,0,0,0,0,0,1,0,1 -> bytes 0b01000001=0x41, 0b1=0x01
    gif += bytes([2, 0x41, 0x01, 0]) + b"\x3b"
    out = decode_gif(gif)
    assert np.array_equal(out[0, 0], [[255] * 3, [0] * 3])


@pytest.mark.parametrize("ncol", [2, 4, 16, 256])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_palette_sizes(ncol, interlace):
    rng = np.random.default_rng(ncol)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    img = rng.integers(0, ncol, (23, 31), dtype=np.uint8)
    out = decode_gif(encode_gif(img, pal, interlace=interlace))
    assert out.shape == (1, 23, 31, 3)
    assert np.array_equal(out[0], pal[img])


def test_roundtrip_dictionary_growth_and_cap():
    """Structured data long enough to walk the code width up to 12
    bits and hit the 4096-entry re-CLEAR path."""
    rng = np.random.default_rng(41)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    pat = np.tile(np.arange(256, dtype=np.uint8), 300).reshape(150, 512)
    assert np.array_equal(decode_gif(encode_gif(pat, pal))[0], pal[pat])
    noise = rng.integers(0, 256, (120, 200), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(noise, pal))[0], pal[noise])


def test_lzw_deferred_clear_tolerated():
    """A stream may keep emitting 12-bit codes after the table fills
    instead of clearing (deferred clear): the dictionary stops
    growing and decode continues."""
    rng = np.random.default_rng(43)
    data = rng.integers(0, 250, 30_000, dtype=np.uint8).tobytes()
    enc = _lzw_encode(data, 8)
    assert _lzw_decode(enc, 8, len(data)) == data


def test_animation_transparency_and_disposal():
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 7, 7]], dtype=np.uint8
    )
    f0 = np.zeros((8, 8), dtype=np.uint8)  # all red
    f1 = np.full((8, 8), 1, dtype=np.uint8)
    f1[2:4, 2:4] = 3  # transparent hole
    out = decode_gif(
        encode_gif(np.stack([f0, f1]), pal, transparent=3, disposal=1)
    )
    assert out.shape == (2, 8, 8, 3)
    # the transparent hole shows frame 0's red through frame 1's green
    assert np.array_equal(out[1, 2, 2], [255, 0, 0])
    assert np.array_equal(out[1, 0, 0], [0, 255, 0])


def test_disposal_restore_background_and_previous():
    """Disposal 2 clears the frame rect to the background color before
    the next frame; disposal 3 restores the pre-frame canvas."""
    pal = np.array(
        [[10, 10, 10], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8
    )
    base = np.zeros((4, 4), dtype=np.uint8)
    dot = np.full((4, 4), 1, dtype=np.uint8)
    probe = np.full((4, 4), 3, dtype=np.uint8)  # fully transparent probe
    # disposal 2 on the dot frame: the probe frame shows background
    out = decode_gif(
        encode_gif(np.stack([base, dot, probe]), pal, transparent=3, disposal=2)
    )
    assert np.array_equal(out[1, 0, 0], [0, 255, 0])
    assert np.array_equal(out[2, 0, 0], [10, 10, 10])  # bg color index 0
    # disposal 3: the probe shows the canvas as it was BEFORE the dot
    out = decode_gif(
        encode_gif(np.stack([base, dot, probe]), pal, transparent=3, disposal=3)
    )
    assert np.array_equal(out[2, 0, 0], [10, 10, 10])


def test_partial_frame_rectangles():
    """Frames smaller than the logical screen composite at their
    (left, top) offset; the rest of the canvas persists."""
    pal = BLACK_WHITE
    full = encode_gif(np.ones((6, 6), dtype=np.uint8), pal)
    # append a second 2x2 black frame at offset (3, 2) by hand
    body = bytearray(full[:-1])  # drop trailer
    inner = np.zeros((2, 2), dtype=np.uint8)
    sub = encode_gif(inner, pal)
    # reuse the encoder's image block but patch the descriptor offset
    desc_at = sub.index(b"\x2c")
    block = bytearray(sub[desc_at:-1])
    struct.pack_into("<HH", block, 1, 2, 3)  # left=2, top=3
    body += block + b"\x3b"
    out = decode_gif(bytes(body))
    assert out.shape == (2, 6, 6, 3)
    assert np.array_equal(out[1, 3, 2], [0, 0, 0])
    assert np.array_equal(out[1, 0, 0], [255, 255, 255])


def test_corrupt_streams_raise():
    pal = BLACK_WHITE
    good = encode_gif(np.ones((4, 4), dtype=np.uint8), pal)
    for bad in (
        b"",
        b"GIF88a" + good[6:],  # unknown version
        good[:20],  # truncated mid color table
        good[:-10],  # truncated LZW sub-blocks
        good[:-1],  # missing trailer
    ):
        with pytest.raises(GifParseError):
            decode_gif(bad)
    # pixel index beyond the palette
    with pytest.raises(GifParseError, match="color table"):
        img = np.full((2, 2), 3, dtype=np.uint8)
        decode_gif(encode_gif(img, BLACK_WHITE[:1]))


def test_multimodal_kernel_routes_gif():
    from hortacloud_importer_spark.operators.multimodal import _decode_one

    rng = np.random.default_rng(47)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    frames = rng.integers(0, 16, (3, 10, 12), dtype=np.uint8)
    arr = _decode_one("gif", encode_gif(frames, pal), {})
    assert arr.shape == (3, 10, 12, 3)
    assert np.array_equal(arr[1], pal[frames[1]])
