"""2x2x2 tumbling-window downsample with the reference's three
reduction semantics (SURVEY.md §2.D1-D3).

Semantics restated from the reference (clean-room, cited):
- ``mean``: average of the *non-zero* contributing parents (zero means
  "no data"; ktx/util.py:151-158 converts zeros to NaN and nanmeans),
  NaN->0 on all-zero groups, truncated back to the integer dtype.
- ``max``: max of non-zero parents, 0 if none (ktx/util.py:159-163).
- ``arthur`` (2nd-max): sort contributing parents, take the second
  largest; if that is zero/no-data, fall back to the largest
  (ktx/util.py:164-171). Zeros are NOT excluded before sorting.

Odd-dimension rule (ktx/util.py:87-126): when a parent dimension is
``2k+1`` with child dimension ``k >= 2``, each child voxel normally
owns parents ``(2i, 2i+1)``, but one pivot child ``p = k // 2`` owns
three parents ``(2p, 2p+1, 2p+2)``; children right of the pivot shift
by one. Parent dims 1 and 3 collapse without zeroing. This mapping is
expressed below as a per-coordinate Catalyst expression, so the whole
downsample is ONE hash aggregate — partial aggregation map-side, no
window, no UDF, linear scaling at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FILTERS = ("mean", "max", "arthur")


def mipmap_dimension(level: int, full: int) -> int:
    """OpenGL mipmap dim: max(1, floor(full / 2^level)) (ktx/util.py:34-36)."""
    return max(1, full // (2**level))


def child_index(j: Column, in_len: int) -> Column:
    """Child coordinate owning parent index ``j`` along a dimension of
    size ``in_len`` (one halving step)."""
    out_len = mipmap_dimension(1, in_len)
    if in_len <= 3 or out_len == 1:
        return F.lit(0)
    if in_len == 2 * out_len:  # even: plain pairs
        return F.shiftright(j, 1)
    # odd with out_len >= 2: pivot child keeps three parents
    p = out_len // 2
    return (
        F.when(j <= 2 * p + 1, F.shiftright(j, 1))
        .when(j == 2 * p + 2, F.lit(p))
        .otherwise(F.shiftright(j - 1, 1))
    ).cast("int")


def _agg_expr(filter_: str) -> Column:
    nz = F.nullif(F.col("intensity"), F.lit(0))
    if filter_ == "mean":
        # nanmean -> nan_to_num -> astype(int): truncation, not rounding
        return F.coalesce(
            F.floor(F.avg(nz)).cast("int"), F.lit(0)
        )
    if filter_ == "max":
        return F.coalesce(F.max(nz), F.lit(0))
    if filter_ == "arthur":
        arr = F.sort_array(F.collect_list("intensity"), asc=False)
        first = F.try_element_at(arr, F.lit(1))
        second = F.try_element_at(arr, F.lit(2))
        return F.coalesce(F.nullif(second, F.lit(0)), first, F.lit(0))
    raise ValueError(f"unknown filter {filter_!r}; have {FILTERS}")


def downsample_voxels(
    voxels: DataFrame,
    dims: tuple[int, int, int],
    filter_: str = "arthur",
) -> DataFrame:
    """One halving step over a voxels DataFrame of logical size
    ``dims = (dz, dy, dx)``. Returns the child voxels (same schema).

    The plan is scan -> project (child-coordinate bit math) ->
    hash-aggregate. At scale the shuffle moves exactly one row per
    child voxel per partial — an 8x reduction per level.
    """
    dz, dy, dx = dims
    cz = child_index(F.col("z"), dz).alias("z")
    cy = child_index(F.col("y"), dy).alias("y")
    cx = child_index(F.col("x"), dx).alias("x")
    return (
        voxels.groupBy(cz, cy, cx, "channel")
        .agg(_agg_expr(filter_).cast("int").alias("intensity"))
    )
