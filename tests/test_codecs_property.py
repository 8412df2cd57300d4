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
