"""Grouped-map downsample kernels (SURVEY.md §2.J1-J3).

The reference has four downsample kernels; two (``area``/mean and
``2ndmax``) are pure group aggregates and live in
volume/downsample.py as single hash-aggregates — the fast path. The
other two need a *neighborhood*, not a group, so they cannot be
Catalyst aggregates:

- ``aa`` (anti-aliased, tiff2octree.py:244-251): skimage
  ``downscale_local_mean`` with dtype-preserving rescale.
- ``spline3`` (tiff2octree.py:258-261): scipy ``ndimage.zoom(0.5)``
  cubic interpolation.

Both are expressed the Spark-first way for per-block imperative
kernels: ``groupBy(block).applyInPandas`` over Arrow batches (J1/J2),
with the scipy/skimage dependency gated behind an import-try — this
container ships neither, so the kernels raise a clear error while a
deterministic ``box`` kernel proves the identical plumbing.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _kernel_spline3(vol: np.ndarray) -> np.ndarray:
    try:
        from scipy import ndimage
    except ImportError as exc:
        raise NotImplementedError(
            "spline3 downsample needs scipy (not in this container); "
            "use 'mean'/'max'/'arthur' (volume.downsample) or 'box'"
        ) from exc
    return ndimage.zoom(vol, 0.5)


def _kernel_aa(vol: np.ndarray) -> np.ndarray:
    try:
        from skimage.transform import downscale_local_mean
    except ImportError as exc:
        raise NotImplementedError(
            "aa downsample needs skimage (not in this container); "
            "use 'mean'/'max'/'arthur' (volume.downsample) or 'box'"
        ) from exc
    return downscale_local_mean(vol, (2, 2, 2)).astype(vol.dtype)


def _kernel_box(vol: np.ndarray) -> np.ndarray:
    """Dependency-free 2x2x2 box mean (plain mean, zeros included) —
    the even-dims neighborhood kernel used to test the plumbing."""
    dz, dy, dx = (s // 2 for s in vol.shape)
    v = vol[: dz * 2, : dy * 2, : dx * 2]
    return (
        v.reshape(dz, 2, dy, 2, dx, 2)
        .mean(axis=(1, 3, 5))
        .astype(vol.dtype)
    )


KERNELS: dict[str, Callable[[np.ndarray], np.ndarray]] = {
    "spline3": _kernel_spline3,
    "aa": _kernel_aa,
    "box": _kernel_box,
}

_OUT_SCHEMA = (
    "zi int, yi int, xi int, channel int, voxels array<int>, shape array<int>"
)


def downsample_blocks_kernel(blocks: DataFrame, kernel: str) -> DataFrame:
    """Apply a neighborhood kernel per block: blocks schema in (from
    volume.model.blockify), halved blocks out. One Arrow-batched task
    per block group; payloads never visit the driver."""
    fn = KERNELS[kernel]

    def run(key, pdf):
        zi, yi, xi, ch = (int(k) for k in key)
        row = pdf.iloc[0]
        bz, by, bx = (int(s) for s in row["shape"])
        vol = np.asarray(row["voxels"], dtype=np.int64).reshape(bz, by, bx)
        out = fn(vol)
        return pd.DataFrame(
            [
                {
                    "zi": zi,
                    "yi": yi,
                    "xi": xi,
                    "channel": ch,
                    "voxels": out.ravel().astype(np.int64).tolist(),
                    "shape": list(out.shape),
                }
            ]
        )

    return blocks.groupBy("zi", "yi", "xi", "channel").applyInPandas(
        run, _OUT_SCHEMA
    )
