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
def test_scipy_kernels_gated(spark, kernel):
    """scipy/skimage are absent in this container: the kernels must
    fail with a clear NotImplementedError, not an ImportError."""
    v = synthetic_volume(spark, 4, 4, 4)
    blocks = blockify(v, (4, 4, 4))
    with pytest.raises(Exception) as exc_info:
        downsample_blocks_kernel(blocks, kernel).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


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
