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
