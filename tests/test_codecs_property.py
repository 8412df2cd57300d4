"""Randomized roundtrip sweeps for sources/codecs.py — separate
module so a missing hypothesis shows as a SKIP, not silently absent
coverage."""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from hortacloud_importer_spark.sources import codecs as C  # noqa: E402


@settings(max_examples=30, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=5000),
    block_pow=st.integers(min_value=10, max_value=17),
)
def test_lz4java_roundtrip_property(data, block_pow):
    enc = C.lz4java_block_compress(data, block_size=1 << block_pow)
    assert C.lz4java_block_decompress(enc) == data


@settings(max_examples=30, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=5000),
    typesize=st.sampled_from([1, 2, 3, 4, 8, 16]),
    cname=st.sampled_from(["blosclz", "lz4", "zlib", "zstd", "snappy"]),
    shuffle=st.sampled_from([False, True, "bit"]),
    blocksize=st.sampled_from([0, 256, 1024, 1 << 14]),
)
def test_blosc_roundtrip_property(data, typesize, cname, shuffle, blocksize):
    enc = C.blosc_compress(
        data, typesize=typesize, cname=cname, shuffle=shuffle,
        blocksize=blocksize,
    )
    assert C.blosc_decompress(enc) == data


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=5000))
def test_frame_codecs_roundtrip_property(data):
    assert C.lz4_frame_decompress(C.lz4_frame_compress(data)) == data
    assert C.numcodecs_lz4_decompress(C.numcodecs_lz4_compress(data)) == data


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=20),
    h=st.integers(min_value=1, max_value=20),
    channels=st.sampled_from([1, 3, 4]),
    subtract_green=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_webp_lossless_roundtrip_property(w, h, channels, subtract_green, seed):
    import numpy as np

    from hortacloud_importer_spark.sources.webp import decode_webp, encode_webp

    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_webp(encode_webp(img, subtract_green=subtract_green))
    want = img if img.ndim == 3 else np.repeat(img[:, :, None], 3, axis=2)
    if want.shape[-1] == 4 and (want[:, :, 3] == 255).all():
        want = want[:, :, :3]
    assert np.array_equal(out, want)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=16),
    ncol=st.sampled_from([2, 5, 17, 256]),
    interlace=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_roundtrip_property(w, h, ncol, interlace, seed):
    import numpy as np

    from hortacloud_importer_spark.sources.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    img = rng.integers(0, ncol, (h, w), dtype=np.uint8)
    out = decode_gif(encode_gif(img, pal, interlace=interlace))
    assert out.shape == (1, h, w, 3)
    assert np.array_equal(out[0], pal[img])
