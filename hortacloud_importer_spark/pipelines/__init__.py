"""End-to-end pipeline compositions (the reference's main programs)."""

from hortacloud_importer_spark.pipelines.octree import build_octree  # noqa: F401
