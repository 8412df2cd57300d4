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

    Round-14 optimization note: an 8-parity-slot rewrite of the
    ``arthur`` collect_list aggregate (8 conditional MAX slots keyed
    by (z%2, y%2, x%2), 2nd-max as a row-level sort of the slots —
    plain codegen instead of ObjectHashAggregate) was implemented,
    oracle-verified, and REJECTED on an interleaved A/B at sf0.1: the
    slot form ran ~1.5x SLOWER on the 64^3/6-level pyramid (8 sparse
    aggregate buffers + the per-child array sort cost more than the
    tiny 8-element list collection they replace). The collect_list
    form stays.
    """
    dz, dy, dx = dims
    cz = child_index(F.col("z"), dz).alias("z")
    cy = child_index(F.col("y"), dy).alias("y")
    cx = child_index(F.col("x"), dx).alias("x")
    return (
        voxels.groupBy(cz, cy, cx, "channel")
        .agg(_agg_expr(filter_).cast("int").alias("intensity"))
    )


def np_child_indices(in_len: int) -> "object":
    """Vectorized :func:`child_index`: parent index -> child index for
    one axis (identical branch structure, NumPy instead of Catalyst).
    Used by the in-executor block kernels (pipelines/ktx.py fused
    path), where a block's voxels are already local to one task."""
    import numpy as np

    out_len = mipmap_dimension(1, in_len)
    j = np.arange(in_len, dtype=np.int64)
    if in_len <= 3 or out_len == 1:
        return np.zeros(in_len, dtype=np.int64)
    if in_len == 2 * out_len:
        return j >> 1
    p = out_len // 2
    return np.where(
        j <= 2 * p + 1, j >> 1, np.where(j == 2 * p + 2, p, (j - 1) >> 1)
    )


def np_halve(
    vol: "object",
    filter_: str,
    axes: tuple[bool, bool, bool] = (True, True, True),
) -> "object":
    """One halving step over a dense (z, y, x) NumPy block — the
    in-executor mirror of :func:`downsample_voxels` (same zero-is-NULL
    kernels, same odd-pivot mapping; property-tested equal in
    tests/test_volume.py). ``axes`` selects which dimensions halve
    (the XY-only first-mip option, ktx/util.py:183-192, is
    ``(False, True, True)``).

    Bucketing is one bincount/maximum.at pass per reduction — no
    Python loops — so a 512^3 block halves in tens of milliseconds,
    which is what makes the fused per-block KTX conversion a map-only
    job instead of a shuffle cascade."""
    import numpy as np

    vol = np.asarray(vol)
    odims = tuple(
        mipmap_dimension(1, d) if h else d for d, h in zip(vol.shape, axes)
    )
    oz, oy, ox = odims
    n = oz * oy * ox
    # int32 bucket indexes halve the dominant temporary (one index per
    # input voxel); a 512^3 block's output is ~2^24, far under 2^31
    itype = np.int32 if n < 2**31 else np.int64
    maps = [
        (np_child_indices(d) if h else np.arange(d, dtype=np.int64)).astype(
            itype
        )
        for d, h in zip(vol.shape, axes)
    ]
    idx = (
        (maps[0][:, None, None] * itype(oy) + maps[1][None, :, None])
        * itype(ox)
        + maps[2][None, None, :]
    ).ravel()
    # values keep their input dtype (comparisons and gathers only);
    # mean sums go through float64 bincount weights regardless
    v = vol.ravel()
    if not np.issubdtype(v.dtype, np.integer):
        v = v.astype(np.int64)
    if filter_ == "mean":
        nzm = v != 0
        s = np.bincount(idx[nzm], weights=v[nzm].astype(np.float64), minlength=n)
        c = np.bincount(idx[nzm], minlength=n)
        out = np.zeros(n, dtype=np.int64)
        has = c > 0
        out[has] = np.floor(s[has] / c[has]).astype(np.int64)
    elif filter_ == "max":
        out = np.zeros(n, dtype=np.int64)
        nzm = v != 0
        np.maximum.at(out, idx[nzm], v[nzm])
    elif filter_ == "arthur":
        size = np.bincount(idx, minlength=n)
        m1 = np.zeros(n, dtype=np.int64)
        np.maximum.at(m1, idx, v)
        at_max = v == m1[idx]
        cnt_max = np.bincount(idx[at_max], minlength=n)
        m2 = np.zeros(n, dtype=np.int64)
        np.maximum.at(m2, idx[~at_max], v[~at_max])
        second = np.where(cnt_max >= 2, m1, m2)
        out = np.where((size > 1) & (second != 0), second, m1)
    else:
        raise ValueError(f"unknown filter {filter_!r}; have {FILTERS}")
    return out.reshape(odims)


def halve_blocks(
    blocks: DataFrame, filter_: str, halve_first: bool = False
) -> DataFrame:
    """One pyramid halving step at BLOCK granularity — the grouped-map
    dual of ``blockify(downsample_voxels(unblockify(b)))``.

    Two physically different plans, byte-identical results:

    - ``halve_first=False`` (works for any block dims): assemble each
      parent's 8 sibling child blocks into a ``(2bz, 2by, 2bx)`` array
      and halve the canvas with :func:`np_halve`. ONE shuffle per
      level, but it carries the FULL child level.
    - ``halve_first=True`` (requires all-even block dims): halve every
      block IN PLACE first (a map-only stage — no shuffle), then
      regroup the 8x-smaller halves into parents. The level shuffle
      now moves child-level/8 bytes; the round-6 scale soak measured
      the difference at ~8x on the dominant pyramid stage (SOAK.md).
      Legal exactly when no 2-voxel halving group straddles a sibling
      boundary: even block dims make every level's extent even (no
      odd-pivot) and pair groups ``(2i, 2i+1)`` never cross an even
      boundary. An odd block axis WOULD cross (the pair at the
      boundary spans two siblings), so the kernel validates and
      raises — callers with odd dims keep the assemble-first plan.

    Equality with the global Catalyst downsample is pinned by the
    fused-vs-unfused store byte-identity test
    (tests/test_octree_pipeline.py) plus a direct halve_first-vs-
    assemble-first equality test; np_halve itself is property-tested.
    Missing octants (skip-empty store read-backs) densify to zero.
    """
    if not halve_first:
        return _octant_regroup(blocks, lambda big: np_halve(big, filter_))

    import pandas as pd

    # the halved intermediates ship as raw little-endian uint16
    # (lossless: every downsample of uint16 stays in range) — half the
    # raw shuffle bytes of an int32 list array, and the payload moves
    # as ONE Arrow buffer instead of a list conversion
    out_schema = (
        "zi int, yi int, xi int, channel int,"
        " shape array<int>, voxels binary"
    )

    def halve_each(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for row in pdf.itertuples():
                bz, by, bx = (int(s) for s in row.shape)
                if bz % 2 or by % 2 or bx % 2:
                    raise ValueError(
                        "halve_first needs even block dims, got "
                        f"({bz}, {by}, {bx})"
                    )
                arr = np.asarray(row.voxels, dtype=np.int32).reshape(
                    bz, by, bx
                )
                out = np_halve(arr, filter_)
                if int(out.max(initial=0)) > 0xFFFF:
                    # a >16-bit source (e.g. a uint32 N5 volume) would
                    # silently WRAP in the uint16 payload and compound
                    # per level — unlike the assemble-first plan,
                    # which only narrows once at the sink. Surface it.
                    raise ValueError(
                        "halve_first uint16 payload overflow "
                        f"(max {int(out.max())}): the source has "
                        ">16-bit intensities; build with fused=False "
                        "or pre-requantize to uint16"
                    )
                rows.append(
                    {
                        "zi": int(row.zi),
                        "yi": int(row.yi),
                        "xi": int(row.xi),
                        "channel": int(row.channel),
                        "shape": list(out.shape),
                        "voxels": out.astype("<u2").tobytes(),
                    }
                )
            yield pd.DataFrame(rows)

    return _octant_regroup(
        blocks.mapInPandas(halve_each, out_schema),
        lambda big: big,
        payload="u2bin",
    )


def assemble_halved_blocks(halved: DataFrame) -> DataFrame:
    """Re-assemble 8 half-size sibling blocks into one full-size parent
    block — the packed-array dual of ``blockify(unblockify(halved))``
    that the kernel-filter build path (aa/spline3, which halve INSIDE
    each block via operators/kernels.py) needs between levels. Same
    single-shuffle shape as :func:`halve_blocks`, minus the halving:
    the children are already at target resolution. Missing octants
    zero-fill."""
    return _octant_regroup(halved, lambda big: big)


def _octant_regroup(blocks: DataFrame, finish, payload: str = "array") -> DataFrame:
    """Shared octant-assembly kernel: group 8 siblings per parent
    block, place each by its coordinate parity bits into a double-size
    canvas (missing octants stay zero), then apply ``finish`` to the
    canvas (np_halve for the pyramid step, identity for kernel-halved
    re-assembly). ``payload="u2bin"`` reads raw uint16 bytes (the
    halve-first intermediate) instead of int list arrays."""
    import pandas as pd

    out_schema = (
        "zi int, yi int, xi int, channel int,"
        " shape array<int>, voxels array<int>"
    )

    def regroup(key, pdf):
        import numpy as np

        zi, yi, xi, ch = (int(k) for k in key)
        bz, by, bx = (int(s) for s in pdf.iloc[0]["shape"])
        big = np.zeros((2 * bz, 2 * by, 2 * bx), dtype=np.int32)
        for row in pdf.itertuples():
            oz, oy, ox = int(row.zi) & 1, int(row.yi) & 1, int(row.xi) & 1
            vox = (
                np.frombuffer(row.voxels, dtype="<u2")
                if payload == "u2bin"
                else np.asarray(row.voxels, dtype=np.int32)
            )
            big[
                oz * bz : (oz + 1) * bz,
                oy * by : (oy + 1) * by,
                ox * bx : (ox + 1) * bx,
            ] = vox.reshape(bz, by, bx)
        out = finish(big)
        return pd.DataFrame(
            [
                {
                    "zi": zi,
                    "yi": yi,
                    "xi": xi,
                    "channel": ch,
                    "shape": list(out.shape),
                    "voxels": out.ravel(),
                }
            ]
        )

    return blocks.groupBy(
        F.shiftright("zi", 1).alias("zi"),
        F.shiftright("yi", 1).alias("yi"),
        F.shiftright("xi", 1).alias("xi"),
        F.col("channel"),
    ).applyInPandas(regroup, out_schema)
