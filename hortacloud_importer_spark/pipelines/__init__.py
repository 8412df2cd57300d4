"""End-to-end pipeline compositions (the reference's main programs)."""

from hortacloud_importer_spark.pipelines.octree import (  # noqa: F401
    build_octree,
    optimal_nlevels,
    stack_voxels,
)
from hortacloud_importer_spark.pipelines.crop import (  # noqa: F401
    crop_chunk_store,
    crop_octree,
)
from hortacloud_importer_spark.pipelines.ktx import (  # noqa: F401
    block_mip_chain,
    tiff_octree_to_ktx,
)
