"""Grouped-map downsample kernels (SURVEY.md §2.J1-J3).

The reference has four downsample kernels; two (``area``/mean and
``2ndmax``) are pure group aggregates and live in
volume/downsample.py as single hash-aggregates — the fast path. The
other two need a *neighborhood*, not a group, so they cannot be
Catalyst aggregates:

- ``aa`` (anti-aliased, tiff2octree.py:244-251): Gaussian
  anti-alias blur + half-size resample (skimage ``resize(...,
  anti_aliasing=True)`` semantics).
- ``spline3`` (tiff2octree.py:258-261): cubic B-spline interpolation
  at half resolution (scipy ``ndimage.zoom(0.5)`` semantics).

Both are expressed the Spark-first way for per-block imperative
kernels: ``groupBy(block).applyInPandas`` over Arrow batches (J1/J2).
When scipy/skimage are importable they are used directly; in this
container (probe in FIXTURES.md: both absent) a clean-room NumPy
implementation of the same public algorithms runs instead — the
separable Gaussian (sigma = (factor-1)/2 = 0.5, skimage's
anti-aliasing default) and Unser's recursive cubic-B-spline prefilter
+ tensor-product evaluation. Boundary handling is mirror; parity with
the library versions is asserted to 1 intensity step by gated tests
that activate when the libraries exist.
"""

from __future__ import annotations

import math
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# --- clean-room NumPy neighborhood kernels ---------------------------------

_CUBIC_POLE = math.sqrt(3.0) - 2.0  # the single pole of the cubic B-spline


def _mirror_idx(idx: np.ndarray, n: int) -> np.ndarray:
    """Reflect indices about the edge SAMPLES (period 2n-2), the
    classic 'mirror' boundary."""
    if n == 1:
        return np.zeros_like(idx)
    period = 2 * n - 2
    idx = np.abs(idx) % period
    return np.where(idx >= n, period - idx, idx)


def _prefilter_axis(c: np.ndarray, axis: int) -> np.ndarray:
    """Unser's recursive cubic-B-spline prefilter along one axis
    (mirror boundary): turns samples into B-spline coefficients so
    the spline interpolates (not just approximates) the input."""
    z = _CUBIC_POLE
    c = np.moveaxis(c.astype(np.float64, copy=True), axis, 0)
    n = c.shape[0]
    if n > 1:
        c *= (1.0 - z) * (1.0 - 1.0 / z)  # per-pole gain (= 6 for cubic)
        horizon = int(math.ceil(math.log(1e-15) / math.log(abs(z))))
        if horizon < n:
            # truncated geometric init (error < 1e-15)
            zk = z ** np.arange(1, horizon)
            c[0] = c[0] + np.tensordot(zk, c[1:horizon], axes=(0, 0))
        else:
            # exact init over one period of the mirror-extended signal
            k = np.arange(2 * n - 2)
            src = np.concatenate([np.arange(n), np.arange(n - 2, 0, -1)])
            zk = z**k
            c[0] = np.tensordot(zk, c[src], axes=(0, 0)) / (
                1.0 - z ** (2 * n - 2)
            )
        for k in range(1, n):  # causal pass
            c[k] += z * c[k - 1]
        c[n - 1] = (z / (z * z - 1.0)) * (c[n - 1] + z * c[n - 2])
        for k in range(n - 2, -1, -1):  # anti-causal pass
            c[k] = z * (c[k + 1] - c[k])
    return np.moveaxis(c, 0, axis)


def _bspline3(t: np.ndarray) -> np.ndarray:
    t = np.abs(t)
    return np.where(
        t < 1.0,
        2.0 / 3.0 - t * t + 0.5 * t**3,
        np.where(t < 2.0, ((2.0 - t) ** 3) / 6.0, 0.0),
    )


def _resample_axis_cubic(coef: np.ndarray, axis: int, out_len: int) -> np.ndarray:
    """Evaluate the cubic spline at ndimage.zoom's output coordinates
    j * (in-1)/(out-1) along one axis (edge-aligned mapping)."""
    coef = np.moveaxis(coef, axis, 0)
    n = coef.shape[0]
    zoomf = (n - 1) / (out_len - 1) if out_len > 1 else 0.0
    coords = np.arange(out_len) * zoomf
    base = np.floor(coords).astype(np.int64)
    out = np.zeros((out_len,) + coef.shape[1:], dtype=np.float64)
    extra = (slice(None),) + (None,) * (coef.ndim - 1)
    for off in (-1, 0, 1, 2):
        idx = base + off
        w = _bspline3(coords - idx)
        out += w[extra] * coef[_mirror_idx(idx, n)]
    return np.moveaxis(out, 0, axis)


def _spline_zoom_half(vol: np.ndarray) -> np.ndarray:
    """ndimage.zoom(vol, 0.5) restated: per-axis prefilter, then
    tensor-product cubic evaluation at the half grid."""
    out_shape = tuple(int(round(s * 0.5)) for s in vol.shape)
    c = vol.astype(np.float64)
    for ax in range(c.ndim):
        c = _prefilter_axis(c, ax)
    for ax, ol in enumerate(out_shape):
        c = _resample_axis_cubic(c, ax, ol)
    return c


def _gaussian_axis(v: np.ndarray, axis: int, sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    v = np.moveaxis(v, axis, 0)
    n = v.shape[0]
    out = np.zeros_like(v, dtype=np.float64)
    idx = np.arange(n)
    for off, w in zip(range(-radius, radius + 1), k):
        out += w * v[_mirror_idx(idx + off, n)]
    return np.moveaxis(out, 0, axis)


def _kernel_spline3_clean(vol: np.ndarray) -> np.ndarray:
    """Clean-room cubic-spline half-zoom, never the library path —
    deterministic regardless of what's importable (oracle mode)."""
    out = _spline_zoom_half(vol.astype(np.float64))
    return np.rint(out).astype(vol.dtype)


def _kernel_aa_clean(vol: np.ndarray) -> np.ndarray:
    """Clean-room anti-aliased half-downsample, never the library
    path: Gaussian anti-alias (sigma = (factor-1)/2 = 0.5) then the
    center-aligned linear half-resample — which at exactly factor 2
    degenerates to the 2x2x2 pairwise mean."""
    blurred = vol.astype(np.float64)
    for ax in range(blurred.ndim):
        blurred = _gaussian_axis(blurred, ax, sigma=0.5)
    dz, dy, dx = (s // 2 for s in blurred.shape)
    v = blurred[: dz * 2, : dy * 2, : dx * 2]
    down = v.reshape(dz, 2, dy, 2, dx, 2).mean(axis=(1, 3, 5))
    return np.rint(down).astype(vol.dtype)


def _kernel_spline3(vol: np.ndarray) -> np.ndarray:
    try:
        from scipy import ndimage

        return ndimage.zoom(vol, 0.5)
    except ImportError:
        return _kernel_spline3_clean(vol)


def _kernel_aa(vol: np.ndarray) -> np.ndarray:
    try:
        from skimage.transform import resize
        from skimage import util

        half = tuple(s >> 1 for s in vol.shape)
        # reference passes uint16 scratch (tiff2octree.py:247-249)
        as_u16 = np.clip(vol, 0, 65535).astype(np.uint16)
        return util.img_as_uint(resize(as_u16, half, anti_aliasing=True)).astype(
            vol.dtype
        )
    except ImportError:
        return _kernel_aa_clean(vol)


def aa_half_weights(n: int) -> list[list[float]]:
    """The (n/2) x n linear operator equivalent to `aa`'s clean-room
    pipeline along ONE axis of an n-sample block: mirror-boundary
    Gaussian blur (sigma 0.5, radius 2) followed by the pairwise mean.
    Because the whole kernel is linear, the 3-D output is the tensor
    product of this matrix applied per axis — which is how the DuckDB
    oracle reproduces it (queries/sinks.py::vol_kernel_custom). The
    final np.rint absorbs float summation-order differences: the
    driver fixture's closest approach to a .5 boundary is ~3e-4
    (asserted in tests/test_kernels.py), eleven orders of magnitude
    above double rounding noise."""
    radius, sigma = 2, 0.5
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    blur = np.zeros((n, n))
    for off, w in zip(range(-radius, radius + 1), k):
        for o in range(n):
            blur[o, _mirror_idx(np.array([o + off]), n)[0]] += w
    half = (blur[0::2] + blur[1::2]) / 2.0
    return half.tolist()


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
    # *_clean: bypass the library try — the deterministic oracle mode
    "spline3_clean": _kernel_spline3_clean,
    "aa_clean": _kernel_aa_clean,
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
                    "voxels": out.ravel().astype(np.int64),
                    "shape": list(out.shape),
                }
            ]
        )

    return blocks.groupBy("zi", "yi", "xi", "channel").applyInPandas(
        run, _OUT_SCHEMA
    )
