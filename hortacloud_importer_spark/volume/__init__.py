"""Volumetric block/voxel data model (SURVEY.md §1.5, §2.A/§2.D).

The reference's central abstraction is a dense chunked 4-D array
(z, y, x, channel) partitioned into octree blocks
(tiff2octree.py:635-691). Here that becomes two relational views:

- ``voxels``: one row per (z, y, x, channel) with an ``intensity``
  column — the exploded view every relational operator works on.
- ``blocks``: one row per (block, channel) with the payload as a flat
  ``array<int>`` in zyx order — the transport/storage view, capped at
  leaf-block size (< 512^3 voxels per the reference's
  calc_optimal_nlevels, tiff2octree.py:618-626; we default far
  smaller so a row stays ~MBs).
"""

from hortacloud_importer_spark.volume.model import (  # noqa: F401
    blockify,
    densify,
    octree_path,
    synthetic_volume,
    unblockify,
)
from hortacloud_importer_spark.volume.downsample import (  # noqa: F401
    child_index,
    downsample_voxels,
    mipmap_dimension,
)
from hortacloud_importer_spark.volume.pyramid import build_pyramid  # noqa: F401
