"""Hypothesis property tests: downsample semantics over random dims,
zero densities, and filters (SURVEY.md §5.2.2). Spark per example, so
example counts are kept small; the fixed-seed matrix in
tests/test_volume.py covers the fast path."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hortacloud_importer_spark.volume import downsample_voxels, mipmap_dimension

from tests.test_volume import df_to_vol, np_downsample, vol_to_df

dims_st = st.tuples(
    st.integers(1, 9), st.integers(1, 9), st.integers(1, 9)
)


@pytest.mark.parametrize("filter_", ["mean", "max", "arthur"])
@given(dims=dims_st, seed=st.integers(0, 2**31 - 1), zero_p=st.floats(0.0, 1.0))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_downsample_property(spark, filter_, dims, seed, zero_p):
    rng = np.random.default_rng(seed)
    vol = rng.integers(0, 1 << 16, size=dims).astype(np.int64)
    vol[rng.random(size=dims) < zero_p] = 0
    got = df_to_vol(
        downsample_voxels(vol_to_df(spark, vol), dims, filter_),
        tuple(mipmap_dimension(1, d) for d in dims),
    )
    assert np.array_equal(got, np_downsample(vol, filter_)), (dims, seed, zero_p)


@pytest.mark.parametrize("filter_", ["mean", "max", "arthur"])
@given(dims=dims_st, seed=st.integers(0, 2**31 - 1), zero_p=st.floats(0.0, 1.0))
@settings(max_examples=40, deadline=None)
def test_np_halve_property(filter_, dims, seed, zero_p):
    """The fused-kernel mip step (np_halve, pure NumPy — no Spark per
    example, so the budget is wider) equals the loop-based reference
    mirror over random dims, zero densities, and filters."""
    from hortacloud_importer_spark.volume.downsample import np_halve

    rng = np.random.default_rng(seed)
    vol = rng.integers(0, 1 << 16, size=dims).astype(np.int64)
    vol[rng.random(size=dims) < zero_p] = 0
    got = np_halve(vol, filter_)
    assert np.array_equal(got, np_downsample(vol, filter_)), (dims, seed, zero_p)


@pytest.mark.parametrize("filter_", ["mean", "max", "arthur"])
@given(
    dims=dims_st,
    seed=st.integers(0, 2**31 - 1),
    axes=st.tuples(st.booleans(), st.booleans(), st.booleans()),
)
@settings(max_examples=25, deadline=None)
def test_np_halve_axes_property(filter_, dims, seed, axes):
    """Partial-axes halving (the XY-only first-mip option) equals the
    full-halve of a volume where the untouched axes are lifted out:
    halving axis-by-axis must match the reference mirror applied to
    each kept-axis slab independently."""
    from hortacloud_importer_spark.volume.downsample import np_halve

    rng = np.random.default_rng(seed)
    vol = rng.integers(0, 1 << 16, size=dims).astype(np.int64)
    vol[rng.random(size=dims) < 0.3] = 0
    got = np_halve(vol, filter_, axes=axes)
    # reference: bucket per-voxel with identity maps on frozen axes
    def ref():
        from tests.test_volume import np_child_index

        maps = [
            [np_child_index(j, d) if h else j for j in range(d)]
            for d, h in zip(dims, axes)
        ]
        odims = tuple(
            mipmap_dimension(1, d) if h else d for d, h in zip(dims, axes)
        )
        buckets = {}
        for z in range(dims[0]):
            for y in range(dims[1]):
                for x in range(dims[2]):
                    key = (maps[0][z], maps[1][y], maps[2][x])
                    buckets.setdefault(key, []).append(int(vol[z, y, x]))
        out = np.zeros(odims, dtype=np.int64)
        for key, vals in buckets.items():
            a = np.array(vals, dtype=np.int64)
            nz = a[a != 0]
            if filter_ == "mean":
                v = int(nz.mean()) if nz.size else 0
            elif filter_ == "max":
                v = int(nz.max()) if nz.size else 0
            else:
                s = np.sort(a)[::-1]
                v = int(s[1]) if len(s) > 1 and s[1] != 0 else int(s[0])
            out[key] = v
        return out

    assert np.array_equal(got, ref()), (dims, seed, axes)
