"""§2.D1-D3/D13/H2/H5 — volumetric operators, oracle-checked.

The volume engine itself is property-tested against NumPy
(tests/test_volume.py); these queries additionally register the SAME
operator implementations over a voxel grid derived deterministically
from `lineitem`, so the driver's DuckDB gate covers the downsample
semantics (zero-is-NULL mean/max, arthur 2nd-max), the multi-level
cascade, the octree path key, and the blockify payload ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hortacloud_importer_spark.catalog import table
from hortacloud_importer_spark.registry import register
from hortacloud_importer_spark.volume.downsample import downsample_voxels
from hortacloud_importer_spark.volume.model import blockify, octree_path
from hortacloud_importer_spark.volume.pyramid import build_pyramid

_DIM = 16  # 16^3 voxel grid derived from lineitem keys

# Shared voxel grid: coordinates from the three keys, intensity from
# the price (zeros injected to exercise zero-is-NULL). MAX dedupes
# colliding coordinates identically in both engines.
_VOX_SQL = f"""
SELECT l_orderkey % {_DIM} AS z, l_partkey % {_DIM} AS y, l_suppkey % {_DIM} AS x,
       MAX(CASE WHEN l_linenumber % 5 = 0 THEN 0
                ELSE CAST(ROUND(l_extendedprice * 100) AS BIGINT) % 65536 END)
         AS intensity
FROM lineitem
GROUP BY 1, 2, 3
"""


def _voxels(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    intensity = F.when(F.col("l_linenumber") % 5 == 0, F.lit(0)).otherwise(
        cents % 65536
    )
    return (
        li.groupBy(
            (F.col("l_orderkey") % _DIM).cast("int").alias("z"),
            (F.col("l_partkey") % _DIM).cast("int").alias("y"),
            (F.col("l_suppkey") % _DIM).cast("int").alias("x"),
        )
        .agg(F.max(intensity).cast("int").alias("intensity"))
        .withColumn("channel", F.lit(0))
    )


# One even halving step in SQL (dims even -> child = j // 2).
def _ds_sql(agg: str, src: str) -> str:
    return f"""
SELECT z // 2 AS z, y // 2 AS y, x // 2 AS x, {agg} AS intensity
FROM ({src})
GROUP BY 1, 2, 3
"""


_MEAN = "CAST(COALESCE(FLOOR(AVG(NULLIF(intensity, 0))), 0) AS INTEGER)"
_MAX = "CAST(COALESCE(MAX(NULLIF(intensity, 0)), 0) AS INTEGER)"
_ARTHUR = """CAST(COALESCE(
    NULLIF(list_sort(list(intensity), 'DESC')[2], 0),
    list_sort(list(intensity), 'DESC')[1], 0) AS INTEGER)"""


def _drop_channel(df: DataFrame) -> DataFrame:
    return df.select("z", "y", "x", "intensity")


@register("vol_downsample_mean", "D1", oracle=_ds_sql(_MEAN, _VOX_SQL), driver=False)
def vol_downsample_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 2x2x2 window mean with zero-is-NULL (D1): the
    reference's nanmean area-downsample (ktx/util.py:151-158) as one
    hash aggregate over child-coordinate bit math."""
    return _drop_channel(
        downsample_voxels(_voxels(spark, sf_dir), (_DIM, _DIM, _DIM), "mean")
    )


@register("vol_downsample_max", "D2", oracle=_ds_sql(_MAX, _VOX_SQL), driver=False)
def vol_downsample_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 2x2x2 window max over non-zero (D2; ktx/util.py:159-163)."""
    return _drop_channel(
        downsample_voxels(_voxels(spark, sf_dir), (_DIM, _DIM, _DIM), "max")
    )


@register("vol_downsample_2ndmax", "D3", oracle=_ds_sql(_ARTHUR, _VOX_SQL))
def vol_downsample_2ndmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The signature "arthur" 2nd-max (D3): second-brightest subvoxel,
    falling back to the brightest when the 2nd is zero/no-data
    (ktx/util.py:164-171)."""
    return _drop_channel(
        downsample_voxels(_voxels(spark, sf_dir), (_DIM, _DIM, _DIM), "arthur")
    )


@register(
    "vol_cascade",
    "D13",
    oracle=_ds_sql(_ARTHUR, _ds_sql(_ARTHUR, _VOX_SQL)),
)
def vol_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level pyramid cascade (D13): level 2 of the arthur pyramid,
    16^3 -> 8^3 -> 4^3 — each level one hash aggregate consuming the
    previous level (tiff2octree.py:1062-1120)."""
    pyr = build_pyramid(
        _voxels(spark, sf_dir), (_DIM, _DIM, _DIM), 3, "arthur", persist=False
    )
    return pyr.filter(F.col("level") == 2).select("z", "y", "x", "intensity")


@register(
    "vol_pyramid_throughput",
    "D13+D3",
    driver=False,
    oracle="""
SELECT CAST(level AS INTEGER) AS level,
       CAST(n_voxels AS BIGINT) AS n_voxels,
       CAST(checksum AS BIGINT) AS checksum
FROM (VALUES
  (0, 262144, 6856243010),
  (1, 32768, 1548439780),
  (2, 4096, 231531221),
  (3, 512, 30536338),
  (4, 64, 3893735),
  (5, 8, 490780)
) AS t(level, n_voxels, checksum)
""",
)
def vol_pyramid_throughput(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-engine throughput probe, now ORACLE-EXACT via the same
    VALUES pin as vol_octree_build: full 6-level arthur pyramid over a
    64^3 synthetic volume (262k voxels, sf-independent) — the
    benchmark's measure of the core downsample cascade. The synthetic
    volume is a seeded deterministic hash and the 2nd-max cascade is
    exact integer arithmetic, so the per-level counts AND intensity
    checksums are fixed constants; a lost level, a wrong kernel, or a
    voxel drop anywhere in the cascade breaks the hash."""
    from hortacloud_importer_spark.volume import build_pyramid, synthetic_volume

    dims = (64, 64, 64)
    v = synthetic_volume(spark, *dims, channels=1)
    pyr = build_pyramid(v, dims, 6, "arthur")
    return pyr.groupBy("level").agg(
        F.count("*").alias("n_voxels"),
        F.sum("intensity").cast("bigint").alias("checksum"),
    )


@register(
    "vol_octree_path",
    "H2+A6",
    driver=False,
    oracle=f"""
SELECT z, y, x,
       CONCAT(
         CAST(1 + ((x // 8) % 2) + 2 * ((y // 8) % 2) + 4 * ((z // 8) % 2) AS VARCHAR),
         '/',
         CAST(1 + ((x // 4) % 2) + 2 * ((y // 4) % 2) + 4 * ((z // 4) % 2) AS VARCHAR),
         '/',
         CAST(1 + ((x // 2) % 2) + 2 * ((y // 2) % 2) + 4 * ((z // 2) % 2) AS VARCHAR),
         '/',
         CAST(1 + (x % 2) + 2 * (y % 2) + 4 * (z % 2) AS VARCHAR)
       ) AS path
FROM ({_VOX_SQL})
""",
)
def vol_octree_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Octree path partition key (H2): per-level octant digits 1-8 from
    coordinate bits, MSB first (tiff2octree.py:263-279). This column is
    what A6 partitions storage by."""
    v = _voxels(spark, sf_dir)
    return v.select(
        "z", "y", "x", octree_path("z", "y", "x", 5).alias("path")
    )


@register(
    "vol_blockify",
    "H5+J4",
    oracle=f"""
SELECT z // 4 AS zi, y // 4 AS yi, x // 4 AS xi,
       array_to_string(list(intensity ORDER BY ((z % 4) * 4 + (y % 4)) * 4 + (x % 4)), ',')
         AS voxels_csv
FROM ({_VOX_SQL})
GROUP BY 1, 2, 3
""",
)
def vol_blockify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blockify (H5/J4 dual): voxels -> per-block zyx-ordered payload
    arrays (tiff2octree.py:220-225's reshape, relationally). Note the
    oracle's ORDER BY is exactly the packed sort key blockify uses."""
    b = blockify(_voxels(spark, sf_dir), (4, 4, 4))
    return b.select(
        F.col("zi").cast("long"),
        F.col("yi").cast("long"),
        F.col("xi").cast("long"),
        # serialize the payload at the query boundary: external
        # canonicalizers hash scalar cells only, and the CSV pins the
        # zyx packing order explicitly
        F.array_join(
            F.transform("voxels", lambda v: v.cast("string")), ","
        ).alias("voxels_csv"),
    )
