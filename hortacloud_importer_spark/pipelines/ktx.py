"""The reference's second main program: TIFF octree -> KTX octree.

ktx_from_rendered_tiff.py's driver flow (:331-427) walks octree
nodes, loads each node's rendered TIFF brick, computes the brick's
own mipmap chain (the bounded-state cascade), and writes one
``block_..._ch.ktx`` per node holding the full chain.
``tiff_octree_to_ktx`` is that run as one declarative plan:

- scan: ``read_tiff_block_store`` (binaryFile + clean-room decode on
  executors, coordinates from octree path digits);
- per-block mips: each halving step is ONE hash aggregate over
  block-local coordinates (the same zero-is-NULL kernels and
  odd-pivot mapping as the global pyramid, volume/downsample.py) —
  blocks never leave their executors' partitions logically: the key
  (zi, yi, xi, channel) rides every row;
- re-pack: the blockify sort-key trick turns each mip level back into
  a zyx-ordered payload array;
- sink: ``ktx_encode_blocks`` (one grouped-map task per block
  serializes the level chain) -> the ``ktx_files`` DataSource writer
  (idempotent names, manifest commit).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hortacloud_importer_spark.sources.block_store import (
    read_tiff_block_store,
)
from hortacloud_importer_spark.sources.datasource import (
    _pa_fs,
    register_volume_sources,
)
from hortacloud_importer_spark.sources.ktx import ktx_encode_blocks
from hortacloud_importer_spark.volume.downsample import (
    _agg_expr,
    child_index,
    mipmap_dimension,
)

_KEY = ["zi", "yi", "xi", "channel"]


def block_mip_chain(
    blocks: DataFrame,
    block_dims: tuple[int, int, int],
    n_mips: int,
    filter_: str = "arthur",
) -> DataFrame:
    """(zi, yi, xi, channel, shape, voxels) -> the same rows plus
    ``level`` 1..n_mips-1 downsampled WITHIN each block — the per-node
    chain a KTX file stores. Every level is one hash aggregate; the
    block key rides along, so no per-block Python loop exists anywhere.
    """
    bz, by, bx = block_dims
    frames = [
        blocks.select(*_KEY, "shape", "voxels").withColumn("level", F.lit(0))
    ]
    pos = F.col("pos")
    cur = blocks.select(*_KEY, F.posexplode("voxels").alias("pos", "intensity"))
    cur = cur.select(
        *_KEY,
        F.floor(pos / (by * bx)).cast("int").alias("lz"),
        (F.floor(pos / bx) % by).cast("int").alias("ly"),
        (pos % bx).cast("int").alias("lx"),
        "intensity",
    )
    dims_k = block_dims
    for k in range(1, n_mips):
        cz = child_index(F.col("lz"), dims_k[0]).alias("lz")
        cy = child_index(F.col("ly"), dims_k[1]).alias("ly")
        cx = child_index(F.col("lx"), dims_k[2]).alias("lx")
        cur = cur.groupBy(*_KEY, cz, cy, cx).agg(
            _agg_expr(filter_).cast("int").alias("intensity")
        )
        dims_k = tuple(mipmap_dimension(1, d) for d in dims_k)
        mz, my, mx = dims_k
        packed = F.struct(
            ((F.col("lz") * my + F.col("ly")) * mx + F.col("lx"))
            .cast("long")
            .alias("k"),
            F.col("intensity").alias("v"),
        )
        frames.append(
            cur.groupBy(*_KEY)
            .agg(F.sort_array(F.collect_list(packed)).alias("kv"))
            .select(
                *_KEY,
                F.transform("kv", lambda s: s["v"]).alias("voxels"),
                F.array(*[F.lit(int(d)) for d in dims_k]).alias("shape"),
                F.lit(k).alias("level"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def tiff_octree_to_ktx(
    spark: SparkSession,
    store_root: str,
    out_dir: str,
    block_dims: tuple[int, int, int],
    n_mips: int,
    filter_: str = "arthur",
    depth: int | None = None,
    interleave: bool = False,
) -> DataFrame:
    """Convert a ``tiff_blocks`` octree store into a KTX block store.

    ``depth`` selects one octree level (None = every block); the
    stored blocks at that depth must share ``block_dims`` (true for
    any store pipelines/octree.py built). Returns a one-row summary
    (n_files, n_blocks, n_mips) read back from the sink manifest.
    """
    register_volume_sources(spark)
    blocks = read_tiff_block_store(spark, store_root)
    if depth is not None:
        blocks = blocks.filter(F.col("depth") == depth)
    chain = block_mip_chain(blocks, block_dims, n_mips, filter_)
    (
        ktx_encode_blocks(chain, interleave=interleave)
        .write.format("ktx_files")
        .mode("append")
        .save(out_dir)
    )
    filesystem, base = _pa_fs(out_dir)
    with filesystem.open_input_stream(f"{base}/_MANIFEST.json") as fh:
        manifest = json.loads(fh.read())
    return spark.createDataFrame(
        [(len(manifest["files"]), int(manifest["n_rows"]), n_mips)],
        "n_files long, n_blocks long, n_mips int",
    )
