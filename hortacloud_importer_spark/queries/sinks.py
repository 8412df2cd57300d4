"""§2.A7/A8/A9/J1-J3 — sink/codec/kernel query registrations.

These are rows-only (binary sinks and layout rewrites aren't
SQL-comparable); each runs the full distributed pipeline and returns
verifiable accounting rows. Byte-exactness is covered by
tests/test_ktx.py (golden-byte) and tests/test_kernels.py.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hortacloud_importer_spark.registry import register


@register(
    "ktx_roundtrip",
    "A8+A9",
    oracle="""
SELECT CAST(t.range AS INTEGER) AS level,
       CAST(2 AS BIGINT) AS n_blocks,
       CAST(2 * 2 * ((8 >> t.range) * (8 >> t.range) * (8 >> t.range))
            AS BIGINT) AS total_bytes,
       CAST(8 AS INTEGER) AS depth
FROM range(3) t
""",
)
def ktx_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8+A9, oracle-exact accounting: synthetic volume -> pyramid ->
    per-block KTX encode (applyInPandas) -> decode (mapInPandas) ->
    per-level byte accounting. The DuckDB oracle re-derives every cell
    from the pyramid geometry: an 8^3 x 2-channel volume blockified at
    full level dims yields one KTX file per channel (n_blocks = 2
    rows/mip level); mip-l payload is (8 >> l)^3 voxels x itemsize 2 x
    2 channels = 4*(8>>l)^3 bytes — the 8x-per-level shrink; the
    header depth is the level-0 block extent (8). A codec bug anywhere
    in the header/mip-chain/padding round trip changes these sums
    (byte-level golden tests live in tests/test_ktx.py)."""
    from hortacloud_importer_spark.sources.ktx import (
        ktx_decode_blocks,
        ktx_encode_blocks,
    )
    from hortacloud_importer_spark.volume import (
        blockify,
        build_pyramid,
        mipmap_dimension,
        synthetic_volume,
    )

    dims = (8, 8, 8)
    v = synthetic_volume(spark, *dims, channels=2)
    pyr = build_pyramid(v, dims, 3, "arthur", persist=False)
    per_level = []
    d = dims
    for lv in range(3):
        per_level.append(
            blockify(pyr.filter(F.col("level") == lv), d).withColumn(
                "level", F.lit(lv)
            )
        )
        d = tuple(mipmap_dimension(1, x) for x in d)
    stacked = per_level[0]
    for b in per_level[1:]:
        stacked = stacked.unionByName(b)
    decoded = ktx_decode_blocks(ktx_encode_blocks(stacked))
    return decoded.groupBy("level").agg(
        F.count("*").alias("n_blocks"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("pixel_depth").alias("depth"),
    )


@register(
    "sink_layout_rewrite",
    "A7",
    oracle="""
SELECT COUNT(*) AS n_rows, SUM(l_quantity) AS total_qty
FROM lineitem
WHERE l_orderkey % 4 = 0 AND l_orderkey >= 1000 AND l_orderkey < 2000
""",
)
def sink_layout_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7, oracle-exact: rewrite a table sorted by its access key with
    bounded row groups (the tiled-TIFF analog), read it back, and
    return the range-scan accounting over the rewritten layout. The
    DuckDB oracle computes the same accounting from the ORIGINAL
    table, so a rewrite that drops/duplicates/corrupts rows fails the
    hash even though the layout itself isn't SQL-visible (layout
    properties — sorted row groups, bounded group size — are asserted
    in tests/test_block_store.py). l_quantity values are whole
    numbers, so the double sum is order-insensitive exact."""
    from hortacloud_importer_spark.sources.block_store import rewrite_layout

    # one deterministic quarter of the table: the reference rewrites
    # per-tile, not whole-store, and the correctness sweep shouldn't
    # pay a full-table write to prove the layout property
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_orderkey") % 4 == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )
    out = tempfile.mkdtemp(prefix="layout_rewrite_") + "/lineitem_sorted"
    rewrite_layout(li, out, ["l_orderkey", "l_linenumber"])
    back = spark.read.parquet(out)
    return back.filter(
        (F.col("l_orderkey") >= 1000) & (F.col("l_orderkey") < 2000)
    ).agg(
        F.count("*").alias("n_rows"),
        F.sum("l_quantity").alias("total_qty"),
    )


@register(
    "vol_kernel_box",
    "J1+J2",
    oracle="""
WITH grid AS (
  SELECT t1.range AS z, t2.range AS y, t3.range AS x
  FROM range(16) t1 CROSS JOIN range(16) t2 CROSS JOIN range(16) t3
),
vox AS (
  SELECT l_orderkey % 16 AS z, l_partkey % 16 AS y, l_suppkey % 16 AS x,
         MAX(CASE WHEN l_linenumber % 5 = 0 THEN 0
                  ELSE CAST(ROUND(l_extendedprice * 100) AS BIGINT) % 65536 END)
           AS intensity
  FROM lineitem
  GROUP BY 1, 2, 3
),
dense AS (
  SELECT g.z, g.y, g.x, COALESCE(v.intensity, 0) AS intensity
  FROM grid g LEFT JOIN vox v ON v.z = g.z AND v.y = g.y AND v.x = g.x
),
win AS (
  SELECT z // 2 AS wz, y // 2 AS wy, x // 2 AS wx,
         CAST(SUM(intensity) // 8 AS BIGINT) AS wv
  FROM dense
  GROUP BY 1, 2, 3
)
SELECT 'box' AS kernel,
       CAST(wz // 2 AS INTEGER) AS zi,
       CAST(wy // 2 AS INTEGER) AS yi,
       CAST(wx // 2 AS INTEGER) AS xi,
       CAST(0 AS INTEGER) AS channel,
       CAST(SUM(wv) AS BIGINT) AS payload_sum
FROM win
GROUP BY 2, 3, 4
""",
)
def vol_kernel_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2, oracle-exact: the grouped-map neighborhood-kernel path
    (applyInPandas over Arrow batches) with the dependency-free `box`
    2x2x2 mean over the lineitem-derived 16^3 grid (densified — the
    kernel path needs full blocks, matching the reference's dense
    scratch arrays, tiff2octree.py:220-225). The box mean of 8
    non-negative ints truncates like floor(sum/8) == sum // 8, so
    DuckDB reproduces every output voxel with integer grid math; the
    oracle sums each half-res block payload. The library-shaped aa /
    spline3 kernels ride the same applyInPandas plumbing in
    vol_kernel_custom (J3, rows-only + parity-tested)."""
    from hortacloud_importer_spark.operators.kernels import (
        downsample_blocks_kernel,
    )
    from hortacloud_importer_spark.queries.volume import _DIM, _voxels
    from hortacloud_importer_spark.volume import blockify, densify

    v = densify(_voxels(spark, sf_dir), spark, (_DIM, _DIM, _DIM))
    blocks = blockify(v, (4, 4, 4))
    return downsample_blocks_kernel(blocks, "box").select(
        F.lit("box").alias("kernel"),
        "zi", "yi", "xi", "channel",
        F.aggregate(
            "voxels", F.lit(0).cast("bigint"), lambda a, b: a + b
        ).alias("payload_sum"),
    )


@register(
    "vol_octree_build",
    "A6+A11+D13",
    driver=False,
    oracle="""
SELECT CAST(level AS INTEGER) AS level,
       CAST(n_blocks_written AS BIGINT) AS n_blocks_written,
       CAST(n_voxels AS BIGINT) AS n_voxels
FROM (VALUES (0, 64, 32768), (1, 8, 4096), (2, 1, 512))
  AS t(level, n_blocks_written, n_voxels)
""",
)
def vol_octree_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throughput probe AND oracle-exact accounting: the full
    build_octree pipeline (pipelines/octree.py — scan-free synthetic
    leaf, 3-level pyramid, octree ZLIB-TIFF sink with manifest) over
    a 32^3 volume. The returned per-level manifest accounting is a
    fixed constant — the synthetic volume is a seeded deterministic
    hash, so every run writes exactly 64/8/1 non-empty 8^3 blocks
    carrying 32768/4096/512 voxels — and the VALUES oracle pins it:
    a skip-empty regression, a lost pyramid level, or a manifest
    commit bug all break the hash. Voxel-level correctness of the
    same composition is pinned file-by-file in
    tests/test_octree_pipeline.py."""
    from hortacloud_importer_spark.pipelines import build_octree
    from hortacloud_importer_spark.volume import synthetic_volume

    out = tempfile.mkdtemp(prefix="octree_bench_") + "/store"
    v = synthetic_volume(spark, 32, 32, 32, zero_fraction_mod=5)
    # channels=1 is a property of the synthetic source, stated instead
    # of rediscovered: DataFrame callers that omit it pay a
    # countDistinct(channel) aggregate over the whole volume — a full
    # extra job before the build starts (round-14, guide §2.4)
    return build_octree(
        spark, v, out, nlevels=3, filter_="arthur", dims=(32, 32, 32),
        channels=1,
    )


def _kernel_custom_oracle() -> str:
    """DuckDB oracle for the two neighborhood kernels over the
    lineitem-derived densified 16^3 grid, 4^3 blocks:

    - ``spline3`` (cubic B-spline zoom 0.5, tiff2octree.py:258-261):
      at half-zoom on a 4-sample axis the spline is EVALUATED at
      integer input coordinates j*(n-1)/(out-1) = {0, 3} — and a
      prefiltered interpolating spline reproduces its samples exactly
      at integer coords, so the output is corner-sampling. Pure
      integer SQL; np.rint recovers the exact integers (analytic
      identity, float error ~1e-12).
    - ``aa`` (Gaussian anti-aliased half-resize,
      tiff2octree.py:244-251): the clean-room pipeline is linear, so
      its per-axis action is a 2x4 matrix (aa_half_weights) and the
      3-D result is the tensor product — one weighted sum per output
      voxel. Weights are baked as repr() literals (exact double
      round-trip); the trailing ROUND absorbs summation-order ulps
      (margin to .5 asserted ~3e-4 in tests/test_kernels.py).
    """
    from hortacloud_importer_spark.operators.kernels import aa_half_weights

    c = aa_half_weights(4)
    wrows = ",\n    ".join(
        f"({o}, {i}, CAST({c[o][i]!r} AS DOUBLE))"
        for o in range(2)
        for i in range(4)
    )
    return f"""
WITH grid AS (
  SELECT t1.range AS z, t2.range AS y, t3.range AS x
  FROM range(16) t1 CROSS JOIN range(16) t2 CROSS JOIN range(16) t3
),
vox AS (
  SELECT l_orderkey % 16 AS z, l_partkey % 16 AS y, l_suppkey % 16 AS x,
         MAX(CASE WHEN l_linenumber % 5 = 0 THEN 0
                  ELSE CAST(ROUND(l_extendedprice * 100) AS BIGINT) % 65536 END)
           AS intensity
  FROM lineitem
  GROUP BY 1, 2, 3
),
dense AS (
  SELECT g.z, g.y, g.x, COALESCE(v.intensity, 0) AS intensity
  FROM grid g LEFT JOIN vox v ON v.z = g.z AND v.y = g.y AND v.x = g.x
),
aa_w(o, i, w) AS (VALUES
    {wrows}
),
aa_out AS (
  SELECT d.z // 4 AS zi, d.y // 4 AS yi, d.x // 4 AS xi,
         wz.o AS oz, wy.o AS oy, wx.o AS ox,
         SUM(wz.w * wy.w * wx.w * d.intensity) AS s
  FROM dense d
  JOIN aa_w wz ON wz.i = d.z % 4
  JOIN aa_w wy ON wy.i = d.y % 4
  JOIN aa_w wx ON wx.i = d.x % 4
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT 'aa' AS kernel, CAST(zi AS INTEGER) AS zi, CAST(yi AS INTEGER) AS yi,
       CAST(xi AS INTEGER) AS xi, CAST(0 AS INTEGER) AS channel,
       CAST(SUM(CAST(ROUND(s) AS BIGINT)) AS BIGINT) AS payload_sum
FROM aa_out GROUP BY 2, 3, 4
UNION ALL
SELECT 'spline3' AS kernel, CAST(z // 4 AS INTEGER) AS zi,
       CAST(y // 4 AS INTEGER) AS yi, CAST(x // 4 AS INTEGER) AS xi,
       CAST(0 AS INTEGER) AS channel, CAST(SUM(intensity) AS BIGINT) AS payload_sum
FROM dense
WHERE z % 4 IN (0, 3) AND y % 4 IN (0, 3) AND x % 4 IN (0, 3)
GROUP BY 2, 3, 4
"""


@register(
    "vol_ktx_convert",
    "A8+D4+D10+J1",
    driver=False,
    oracle="""
SELECT CAST(n_files AS BIGINT) AS n_files,
       CAST(n_blocks AS BIGINT) AS n_blocks,
       CAST(n_mips AS INTEGER) AS n_mips
FROM (VALUES (9, 9, 3)) AS t(n_files, n_blocks, n_mips)
""",
)
def vol_ktx_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throughput probe AND oracle-exact accounting (the two-level
    32^3 store converts every run to exactly 9 committed KTX blocks —
    8 leaves + 1 root — with 3-mip chains; the VALUES oracle pins the
    manifest commit count): the full tiff_octree_to_ktx pass
    (pipelines/ktx.py) over a 32^3 two-level octree store — store scan
    + clean-room TIFF decode, per-(block, channel) histogram/percentile
    statistics, uint16->uint8 requantization, per-block mip chains,
    viewer-metadata KTX encode, manifest commit. The source store is
    built once per machine under /tmp (transform.txt is the completion
    sentinel, written last); each run converts into a fresh output
    dir, so the probe times the conversion, not the store build. The
    e2e correctness of the same composition is pinned in
    tests/test_ktx_metadata.py."""
    import os

    from hortacloud_importer_spark.pipelines import (
        build_octree,
        tiff_octree_to_ktx,
    )
    from hortacloud_importer_spark.volume import synthetic_volume

    base = f"{tempfile.gettempdir()}/spark_graft_ktxbench_32_2"
    store = f"{base}/store"
    if not os.path.exists(f"{store}/transform.txt"):
        # Build under a unique scratch dir, then atomically rename into
        # place, so a concurrent bench invocation can never observe (or
        # write into) a half-built store: whichever rename wins becomes
        # the shared store, the loser discards its copy.
        scratch = tempfile.mkdtemp(prefix="ktxbench_build_") + "/store"
        v = synthetic_volume(spark, 32, 32, 32, zero_fraction_mod=5)
        build_octree(
            spark, v, scratch, nlevels=2, filter_="arthur",
            dims=(32, 32, 32), channels=1,
        )
        os.makedirs(base, exist_ok=True)
        try:
            os.rename(scratch, store)
        except OSError:
            if not os.path.exists(f"{store}/transform.txt"):
                raise
    out = tempfile.mkdtemp(prefix="ktx_bench_") + "/ktx"
    return tiff_octree_to_ktx(
        spark,
        store,
        out,
        block_dims=(16, 16, 16),
        n_mips=3,
        filter_="arthur",
        downsample_intensity=True,
    )


@register("vol_kernel_custom", "J3", oracle=_kernel_custom_oracle())
def vol_kernel_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3, oracle-exact: the reference's two library-shaped
    neighborhood kernels — `aa` (Gaussian anti-aliased resize,
    tiff2octree.py:244-251) and `spline3` (cubic B-spline zoom,
    :258-261) — over the same applyInPandas plumbing that
    vol_kernel_box proves, on the lineitem-derived densified 16^3
    grid. The driver query runs the *_clean kernel variants (the
    clean-room NumPy implementations of the same public algorithms,
    operators/kernels.py) so the result is deterministic whether or
    not scipy/skimage are importable; the library-preferring `aa` /
    `spline3` production kernels are pinned to the clean duals by
    gated parity tests (tests/test_kernels.py). The DuckDB oracle
    re-derives both kernels in SQL: spline3 as corner-sampling (exact
    spline interpolation at integer coords) and aa as a baked 2x4
    linear operator applied per axis — see _kernel_custom_oracle."""
    from hortacloud_importer_spark.operators.kernels import (
        downsample_blocks_kernel,
    )
    from hortacloud_importer_spark.queries.volume import _DIM, _voxels
    from hortacloud_importer_spark.volume import blockify, densify

    v = densify(_voxels(spark, sf_dir), spark, (_DIM, _DIM, _DIM))
    blocks = blockify(v, (4, 4, 4))
    out = None
    for kernel in ("aa", "spline3"):
        part = downsample_blocks_kernel(blocks, f"{kernel}_clean").select(
            F.lit(kernel).alias("kernel"),
            "zi", "yi", "xi", "channel",
            F.aggregate(
                "voxels", F.lit(0).cast("bigint"), lambda a, b: a + b
            ).alias("payload_sum"),
        )
        out = part if out is None else out.unionByName(part)
    return out
