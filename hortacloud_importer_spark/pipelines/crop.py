"""Windowed sub-volume export: octree store -> TIFF slice directory.

The reference cuts windows out of its inputs to feed block generation
and the viewer (``get_cropped_image_n5_zarr`` tiff2octree.py:351-383,
``get_cropped_image_rasterio`` :281-292); this is the same read as a
user-facing export: crop a half-open voxel window from ONE octree
level of a ``tiff_blocks`` store into a slice directory
(``default.{ch}.{z}.tif``, window-local z) that the octree
subcommand/scan can ingest right back.

Scale shape: block files outside the window are pruned on
path-derived coordinates BEFORE any decode
(sources/block_store.path_block_coords), voxels re-key to
window-local coordinates in a narrow projection, absent voxels
densify to zero (skip-empty stores drop all-zero blocks), and each
output slice is encoded and written by executors — the driver only
ever sees per-slice accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hortacloud_importer_spark.sources.block_store import (
    read_tiff_block_store,
    store_channels,
)
from hortacloud_importer_spark.volume.model import densify, unblockify

_Window = tuple[tuple[int, int], tuple[int, int], tuple[int, int]]


def crop_octree(
    spark: SparkSession,
    store_root: str,
    out_dir: str,
    window: _Window,
    depth: int,
    block_dims: tuple[int, int, int],
    dtype: str = "uint16",
    channels: int | None = None,
) -> DataFrame:
    """Export ``window`` = ((z0,z1), (y0,y1), (x0,x1)) of octree level
    ``depth`` as a slice directory. Returns per-slice accounting
    (z, channel, n_nonzero).

    ``channels`` (count) skips channel discovery; when omitted it is
    derived from the store's file NAMES (no payload decode)."""
    (z0, z1), (y0, y1), (x0, x1) = window
    if not (z0 < z1 and y0 < y1 and x0 < x1):
        raise ValueError(f"empty window {window}")
    dims = (z1 - z0, y1 - y0, x1 - x0)

    blocks = read_tiff_block_store(
        spark, store_root, window=window, block_dims=block_dims, depth=depth
    )
    vox = (
        unblockify(blocks)
        .filter(
            (F.col("z") >= z0) & (F.col("z") < z1)
            & (F.col("y") >= y0) & (F.col("y") < y1)
            & (F.col("x") >= x0) & (F.col("x") < x1)
        )
        .select(
            (F.col("z") - z0).alias("z"),
            (F.col("y") - y0).alias("y"),
            (F.col("x") - x0).alias("x"),
            "channel",
            "intensity",
        )
    )
    # channel count from file paths, NOT from the decoded blocks: a
    # distinct() over the block frame would run the whole window's
    # TIFF decode a second time just to learn a handful of ids
    n_channels = channels if channels else max(
        1, len(store_channels(spark, store_root))
    )
    dense = densify(vox, spark, dims, channels=n_channels)

    dz, dy, dx = dims
    key = (F.col("y") * dx + F.col("x")).cast("long")
    packed = F.struct(key.alias("k"), F.col("intensity").alias("v"))
    slices = (
        dense.groupBy("z", "channel")
        .agg(F.sort_array(F.collect_list(packed)).alias("kv"))
        .select(
            "z",
            "channel",
            F.transform("kv", lambda s: s["v"]).alias("pixels"),
        )
    )

    out_schema = "z int, channel int, n_nonzero long"

    def write(batches):
        import numpy as np
        import pandas as pd
        from pyarrow import fs as pafs

        from hortacloud_importer_spark.sources.tiff import encode_tiff

        if "://" in out_dir:
            filesystem, base = pafs.FileSystem.from_uri(out_dir)
        else:
            filesystem, base = pafs.LocalFileSystem(), out_dir
        filesystem.create_dir(base, recursive=True)
        local = isinstance(filesystem, pafs.LocalFileSystem)
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                page = (
                    np.asarray(row.pixels, dtype=np.int64)
                    .reshape(dy, dx)
                    .astype(np.dtype(dtype))
                )
                name = f"default.{int(row.channel)}.{int(row.z):05d}.tif"
                staged = f"{base}/.{name}.tmp" if local else f"{base}/{name}"
                with filesystem.open_output_stream(staged) as fh:
                    fh.write(encode_tiff(page[None, ...]))
                if local:
                    filesystem.move(staged, f"{base}/{name}")
                out.append(
                    {
                        "z": int(row.z),
                        "channel": int(row.channel),
                        "n_nonzero": int(np.count_nonzero(page)),
                    }
                )
            yield pd.DataFrame(out)

    return slices.mapInPandas(write, out_schema)
