"""Multi-level mipmap/octree pyramid (SURVEY.md §2.D13).

The reference builds the pyramid level by level with a barrier between
levels (tiff2octree.py:1062-1120 loops nlevels-1 -> 1, one
dask.compute per level; ktx/util.py:195-220 is the in-memory mipmap
analog). Here each level is one hash-aggregate over the previous
level's DataFrame; persisting level k before deriving k+1 replaces the
reference's materialize-to-filesystem barrier (SURVEY.md §4 O13) and
keeps lineage short. Voxel counts shrink ~8x per level, so the whole
cascade costs ~1.14x the leaf scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from hortacloud_importer_spark.volume.downsample import (
    downsample_voxels,
    mipmap_dimension,
)


def build_pyramid(
    leaf_voxels: DataFrame,
    dims: tuple[int, int, int],
    nlevels: int,
    filter_: str = "arthur",
    persist: bool = True,
) -> DataFrame:
    """All mipmap levels as one DataFrame with a ``level`` column.

    level 0 = input; level k halves each dim of level k-1 (down to 1,
    OpenGL convention, ktx/util.py:223-239). Each intermediate level is
    persisted MEMORY_AND_DISK while its child is derived, then the
    union of all levels is returned.
    """
    levels = [leaf_voxels.withColumn("level", F.lit(0))]
    cur = leaf_voxels
    cur_dims = dims
    handles = []
    for lv in range(1, nlevels):
        if persist:
            cur = cur.persist(StorageLevel.MEMORY_AND_DISK)
            handles.append(cur)
        nxt = downsample_voxels(cur, cur_dims, filter_)
        cur_dims = tuple(mipmap_dimension(1, d) for d in cur_dims)
        levels.append(nxt.withColumn("level", F.lit(lv)))
        cur = nxt
    out = levels[0]
    for df in levels[1:]:
        out = out.unionByName(df)
    return out
