"""Voxel/block schemas, synthetic volumes, octree path keys.

Spark-first restatement of the reference's array model:
- virtual chunked array (tiff2octree.py:689 ``da.zeros`` placeholder)
  -> a lazily-evaluated DataFrame built from ``spark.range`` — nothing
  materializes until an action, and the generator is a narrow map
  (zero shuffles) that scales linearly with executors.
- octree path key (tiff2octree.py:263-279 ``get_octree_relative_path``)
  -> pure Catalyst bit-arithmetic column, usable for ``partitionBy``
  and partition pruning.
- blockify / unblockify (tiff2octree.py:220-225 ``blockify``;
  ktx/util.py:242-262 interleave) -> groupBy + sorted collect /
  posexplode with div-mod local coordinates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_INTENSITY = 1 << 16  # uint16 ceiling (ktx/__init__.py:173-181)


def synthetic_volume(
    spark: SparkSession,
    dim_z: int,
    dim_y: int,
    dim_x: int,
    channels: int = 1,
    zero_fraction_mod: int = 5,
    seed: int = 7,
) -> DataFrame:
    """Deterministic dense volume as a voxels DataFrame.

    Intensity = xxhash64(z,y,x,c,seed) folded into uint16, with every
    ``zero_fraction_mod``-th hash forced to 0 to exercise the
    zero-is-NULL semantics (SURVEY.md §1.2). Pure narrow plan: one
    range scan, div/mod projections, no shuffle, no driver data.
    """
    n = dim_z * dim_y * dim_x * channels
    df = spark.range(n)
    c = (F.col("id") % channels).cast("int")
    rest = F.col("id") / channels
    x = (F.floor(rest) % dim_x).cast("int")
    rest = F.floor(rest) / dim_x
    y = (F.floor(rest) % dim_y).cast("int")
    z = (F.floor(F.floor(rest) / dim_y)).cast("int")
    h = F.xxhash64(z, y, x, c, F.lit(seed))
    intensity = F.when(
        F.pmod(h, F.lit(zero_fraction_mod)) == 0, F.lit(0)
    ).otherwise(F.pmod(h, F.lit(MAX_INTENSITY))).cast("int")
    return df.select(
        z.alias("z"),
        y.alias("y"),
        x.alias("x"),
        c.alias("channel"),
        intensity.alias("intensity"),
    )


def densify(
    voxels: DataFrame,
    spark: SparkSession,
    dims: tuple[int, int, int],
    channels: int = 1,
) -> DataFrame:
    """Sparse -> dense voxels: materialize absent coordinates as 0.

    The engine's relational form is sparse (absent row == zero == "no
    data", matching the reference's skip-empty storage,
    tiff2octree.py:312); dense export boundaries (KTX payloads, A8)
    need every coordinate present. Grid generation is a narrow range
    scan; the join is a right outer on the coordinate key.
    """
    n = dims[0] * dims[1] * dims[2] * channels
    grid = spark.range(n)
    c = (F.col("id") % channels).cast("int")
    rest = F.col("id") / channels
    x = (F.floor(rest) % dims[2]).cast("int")
    rest = F.floor(rest) / dims[2]
    y = (F.floor(rest) % dims[1]).cast("int")
    z = (F.floor(F.floor(rest) / dims[1])).cast("int")
    grid = grid.select(
        z.alias("z"), y.alias("y"), x.alias("x"), c.alias("channel")
    )
    return grid.join(voxels, ["z", "y", "x", "channel"], "left").select(
        "z",
        "y",
        "x",
        "channel",
        F.coalesce("intensity", F.lit(0)).cast("int").alias("intensity"),
    )


def octree_path(
    z: Column | str,
    y: Column | str,
    x: Column | str,
    nlevels: int,
    sep: str = "/",
) -> Column:
    """Octree directory path for a leaf-block coordinate.

    Digit per level, most-significant bit first:
    ``1 + x_bit + 2*y_bit + 4*z_bit`` (tiff2octree.py:263-279). With
    ``nlevels`` levels there are 2^(nlevels-1) leaf blocks per axis.
    The result is a Morton-like space-filling key: lexicographic order
    on the path clusters spatially adjacent blocks, which is exactly
    what you want for partition pruning on windowed reads (A4).
    """
    z, y, x = F.col(z) if isinstance(z, str) else z, (
        F.col(y) if isinstance(y, str) else y
    ), (F.col(x) if isinstance(x, str) else x)
    digits = []
    for bit in range(nlevels - 2, -1, -1):
        xb = F.shiftright(x, bit).bitwiseAND(F.lit(1))
        yb = F.shiftright(y, bit).bitwiseAND(F.lit(1))
        zb = F.shiftright(z, bit).bitwiseAND(F.lit(1))
        digits.append((F.lit(1) + xb + yb * 2 + zb * 4).cast("string"))
    if not digits:
        return F.lit("")
    return F.concat_ws(sep, *digits)


def blockify(
    voxels: DataFrame, block_dims: tuple[int, int, int]
) -> DataFrame:
    """voxels -> blocks: one row per (block coord, channel) with the
    payload as a flat zyx-ordered int array.

    The sort key packs local (z,y,x) into one long so a single
    ``sort_array`` of ``struct<key, intensity>`` yields zyx order —
    one hash aggregate, map-side combinable, no window shuffle.
    Payload rows stay bounded by block_dims (the reference caps leaves
    below 512^3, tiff2octree.py:618-626).
    """
    bz, by, bx = block_dims
    zi = (F.col("z") / bz).cast("int")
    yi = (F.col("y") / by).cast("int")
    xi = (F.col("x") / bx).cast("int")
    lz = F.col("z") % bz
    ly = F.col("y") % by
    lx = F.col("x") % bx
    key = (lz * by + ly) * bx + lx
    packed = F.struct(
        key.cast("long").alias("k"), F.col("intensity").alias("v")
    )
    return (
        voxels.groupBy(
            zi.alias("zi"), yi.alias("yi"), xi.alias("xi"), "channel"
        )
        .agg(F.sort_array(F.collect_list(packed)).alias("kv"))
        .select(
            "zi",
            "yi",
            "xi",
            "channel",
            F.transform(F.col("kv"), lambda s: s["v"]).alias("voxels"),
            F.array(
                F.lit(bz), F.lit(by), F.lit(bx)
            ).alias("shape"),
        )
    )


def unblockify(blocks: DataFrame) -> DataFrame:
    """blocks -> voxels: posexplode the payload, recover global coords
    via div/mod on the position (the dual of blockify; J4/H5)."""
    bz = F.col("shape")[0]
    by = F.col("shape")[1]
    bx = F.col("shape")[2]
    exploded = blocks.select(
        "zi",
        "yi",
        "xi",
        "channel",
        bz.alias("bz"),
        by.alias("by"),
        bx.alias("bx"),
        F.posexplode("voxels").alias("pos", "intensity"),
    )
    lz = (F.col("pos") / (F.col("by") * F.col("bx"))).cast("int")
    rem = F.col("pos") % (F.col("by") * F.col("bx"))
    ly = (rem / F.col("bx")).cast("int")
    lx = (rem % F.col("bx")).cast("int")
    return exploded.select(
        (F.col("zi") * F.col("bz") + lz).cast("int").alias("z"),
        (F.col("yi") * F.col("by") + ly).cast("int").alias("y"),
        (F.col("xi") * F.col("bx") + lx).cast("int").alias("x"),
        "channel",
        "intensity",
    )
