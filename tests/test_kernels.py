"""J1-J3 grouped-map kernels + A7 layout rewrite."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hortacloud_importer_spark.operators.kernels import (
    _kernel_box,
    downsample_blocks_kernel,
)
from hortacloud_importer_spark.sources.block_store import rewrite_layout
from hortacloud_importer_spark.volume import blockify, synthetic_volume


def test_box_kernel_via_apply_in_pandas(spark):
    v = synthetic_volume(spark, 8, 8, 8, channels=2)
    blocks = blockify(v, (4, 4, 4))
    out = downsample_blocks_kernel(blocks, "box")
    rows = out.collect()
    assert len(rows) == 16
    assert all(r["shape"] == [2, 2, 2] and len(r["voxels"]) == 8 for r in rows)
    # spot-check one block against NumPy
    src = {
        (r["zi"], r["yi"], r["xi"], r["channel"]): np.asarray(r["voxels"]).reshape(4, 4, 4)
        for r in blocks.collect()
    }
    for r in rows:
        want = _kernel_box(src[(r["zi"], r["yi"], r["xi"], r["channel"])])
        assert np.array_equal(np.asarray(r["voxels"]).reshape(2, 2, 2), want)


@pytest.mark.parametrize("kernel", ["spline3", "aa"])
def test_neighborhood_kernels_run_via_spark(spark, kernel):
    """spline3/aa run on the clean-room NumPy path (scipy/skimage
    absent here — probe in FIXTURES.md) through the same
    applyInPandas plumbing as box."""
    v = synthetic_volume(spark, 8, 8, 8, channels=1)
    blocks = blockify(v, (8, 8, 8))
    rows = downsample_blocks_kernel(blocks, kernel).collect()
    assert len(rows) == 1
    assert rows[0]["shape"] == [4, 4, 4]
    assert len(rows[0]["voxels"]) == 64


def test_spline3_preserves_constants_and_ramps():
    """Cubic B-splines reproduce polynomials up to degree 3: a
    constant volume stays constant and a linear ramp is sampled
    exactly at ndimage.zoom's edge-aligned coordinates j*(n-1)/(m-1)."""
    from hortacloud_importer_spark.operators.kernels import _spline_zoom_half

    const = np.full((8, 8, 8), 1234.0)
    out = _spline_zoom_half(const)
    assert out.shape == (4, 4, 4)
    assert np.allclose(out, 1234.0, atol=1e-9)

    ramp = np.broadcast_to(
        np.arange(8, dtype=np.float64)[:, None, None], (8, 8, 8)
    ).copy()
    out = _spline_zoom_half(ramp)
    want = np.arange(4) * (7.0 / 3.0)
    # integer output coords (the edge samples) hit the interpolation
    # condition exactly; non-integer coords deviate only by the mirror
    # boundary's geometric tail (|pole|^d ~ 0.07^... < 0.02 here)
    assert np.allclose(out[0], 0.0, atol=1e-9)
    assert np.allclose(out[3], 7.0, atol=1e-9)
    assert np.allclose(out, want[:, None, None], atol=0.02)


def test_spline3_impulse_symmetric():
    from hortacloud_importer_spark.operators.kernels import _spline_zoom_half

    vol = np.zeros((9, 9, 9))
    vol[4, 4, 4] = 100.0
    out = _spline_zoom_half(vol)
    # 9 -> round(4.5) = 4 output samples at coords 0, 8/3, 16/3, 8 —
    # symmetric about the impulse, so the response must be symmetric
    # under reversal in every axis
    assert out.shape == (4, 4, 4)
    assert np.allclose(out, out[::-1, ::-1, ::-1], atol=1e-9)


def test_aa_preserves_constants_and_halves_ramp():
    from hortacloud_importer_spark.operators.kernels import _kernel_aa

    const = np.full((8, 8, 8), 777, dtype=np.int64)
    out = _kernel_aa(const)
    assert out.shape == (4, 4, 4)
    assert np.array_equal(out, np.full((4, 4, 4), 777))

    ramp = (
        np.broadcast_to(np.arange(8, dtype=np.int64)[:, None, None] * 100, (8, 8, 8))
        .copy()
    )
    out = _kernel_aa(ramp)
    # away from the boundary, Gaussian blur preserves a linear ramp and
    # the factor-2 center-aligned resample is the pairwise mean 2j+0.5
    for j in (1, 2):
        assert abs(int(out[j, 2, 2]) - (200 * j + 50)) <= 1


def test_spline3_clean_corner_sampling_identity():
    """The oracle-backing identity: cubic-spline half-zoom of a
    4-sample axis evaluates the interpolating spline at integer input
    coords {0, 3}, so the 4^3 output is exactly the corner samples
    (queries/sinks.py::_kernel_custom_oracle)."""
    from hortacloud_importer_spark.operators.kernels import (
        _kernel_spline3_clean,
    )

    rng = np.random.default_rng(11)
    for _ in range(50):
        vol = rng.integers(0, 65536, (4, 4, 4)).astype(np.int64)
        out = _kernel_spline3_clean(vol)
        assert np.array_equal(out, vol[np.ix_([0, 3], [0, 3], [0, 3])])


def test_aa_clean_tensor_product_identity_and_margin(spark, sf_dir):
    """aa's clean pipeline is linear, so aa_half_weights(4) applied
    per axis must reproduce it bit-for-bit after rint; and on the
    driver fixture grid the pre-rint values keep a >= 1e-4 margin from
    every .5 boundary, so DuckDB's independently-ordered float sums
    round to the same integers (the oracle's correctness argument)."""
    from hortacloud_importer_spark.operators.kernels import (
        _kernel_aa_clean,
        aa_half_weights,
    )
    from hortacloud_importer_spark.queries.volume import _DIM, _voxels
    from hortacloud_importer_spark.volume import densify

    c = np.asarray(aa_half_weights(4))
    grid = np.zeros((_DIM, _DIM, _DIM), dtype=np.int64)
    for r in densify(_voxels(spark, sf_dir), spark, (_DIM,) * 3).collect():
        grid[r["z"], r["y"], r["x"]] = r["intensity"]
    min_margin = 1.0
    for zi in range(_DIM // 4):
        for yi in range(_DIM // 4):
            for xi in range(_DIM // 4):
                blk = grid[
                    zi * 4 : zi * 4 + 4,
                    yi * 4 : yi * 4 + 4,
                    xi * 4 : xi * 4 + 4,
                ]
                alt = np.einsum(
                    "oi,pj,qk,ijk->opq", c, c, c, blk.astype(np.float64)
                )
                assert np.array_equal(
                    np.rint(alt).astype(np.int64), _kernel_aa_clean(blk)
                )
                frac = np.abs(alt - np.floor(alt) - 0.5)
                min_margin = min(min_margin, float(frac.min()))
    assert min_margin > 1e-4, min_margin


def test_parity_with_scipy_if_present():
    scipy = pytest.importorskip("scipy")
    from scipy import ndimage

    from hortacloud_importer_spark.operators.kernels import _spline_zoom_half

    rng = np.random.default_rng(7)
    vol = rng.integers(0, 65535, (8, 8, 8)).astype(np.float64)
    ours = _spline_zoom_half(vol)
    theirs = ndimage.zoom(vol, 0.5, mode="mirror")
    assert np.allclose(ours, theirs, atol=1.0)


def test_rewrite_layout_roundtrip(spark, tmp_path):
    v = synthetic_volume(spark, 8, 8, 8)
    root = str(tmp_path / "sorted")
    rewrite_layout(v, root, ["z", "y", "x"])
    back = spark.read.parquet(root)
    assert back.count() == 512
    assert back.exceptAll(v).count() == 0
    # range scan pushes the predicate to the parquet scan
    plan = (
        back.filter((F.col("z") >= 2) & (F.col("z") < 4))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(z,2)" in plan
