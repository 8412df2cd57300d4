"""The reference's second main program: TIFF octree -> KTX octree.

ktx_from_rendered_tiff.py's driver flow (:331-427) walks octree
nodes, loads each node's rendered TIFF brick, computes the brick's
own mipmap chain (the bounded-state cascade), and writes one
``block_..._ch.ktx`` per node holding the full chain.
``tiff_octree_to_ktx`` is that run as one declarative plan:

- scan: ``read_tiff_block_store`` (binaryFile + clean-room decode on
  executors, coordinates from octree path digits);
- convert (default, ``fused=True``): the whole per-block pass —
  input stats, requant, optional XY halving, the in-block mip chain,
  KTX encode — as ONE executor kernel per block
  (``ktx_convert_blocks_fused``): a map-only plan with zero shuffles
  (one groupBy only when interleaving channels), because every step
  is block-local, exactly like the reference's one-task-per-node
  execution;
- convert (``fused=False`` dual, byte-identical and test-pinned):
  distributed aggregates — ``channel_block_stats`` (histogram
  shuffle + window CDF), Catalyst ``requantize_blocks``,
  ``block_mip_chain`` (one hash aggregate + re-pack per level) — for
  blocks too large for a single task's memory;
- sink: ``ktx_encode_blocks`` / the fused kernel's rows -> the
  ``ktx_files`` DataSource writer (idempotent names, sharded
  manifest commit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hortacloud_importer_spark.sources import manifest
from hortacloud_importer_spark.sources.block_store import (
    read_tiff_block_store,
)
from hortacloud_importer_spark.sources.datasource import (
    register_volume_sources,
)
from hortacloud_importer_spark.sources.ktx import ktx_encode_blocks
from hortacloud_importer_spark.volume.downsample import (
    _agg_expr,
    child_index,
    mipmap_dimension,
)

_KEY = ["zi", "yi", "xi", "channel"]


def _block_key(blocks: DataFrame) -> list[str]:
    return [
        c for c in ("zi", "yi", "xi", "depth", "channel") if c in blocks.columns
    ]


def channel_block_stats(blocks: DataFrame) -> DataFrame:
    """Per-(block, channel) input-intensity statistics — the
    reference's pass-1 per-channel histogram walk
    (ktx_from_rendered_tiff.py:433-530) as ONE fused plan per store:
    all 101 exact non-zero percentiles, zero/total counts, and the
    black/white/gamma intensity-downsample params (D4+D5+D6+D10,
    grouped by block key instead of globally — same shape as
    queries/flagship.py::channel_stats).

    Output columns: block key + ``stats_percentiles`` (array<long>,
    101 entries), ``stats_zero_count``, ``stats_total_count``,
    ``black_level``, ``white_level``, ``gamma0`` — the passthrough
    schema sources/ktx.py::ktx_encode_blocks consumes. The only
    shuffle is the (key, intensity) histogram groupBy, whose output is
    bounded by 65,536 bins per block-channel regardless of voxels."""
    from pyspark.sql import Window

    from hortacloud_importer_spark.operators import requant as R

    key = _block_key(blocks)
    vox = blocks.select(*key, F.explode("voxels").alias("i"))
    full_hist = vox.groupBy(*key, "i").agg(F.count("*").alias("bin_count"))
    order = Window.partitionBy(*key).orderBy("i")
    whole = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    nz_count = F.when(F.col("i") > 0, F.col("bin_count"))
    cdf = full_hist.withColumn("cum_count", F.sum(nz_count).over(order)).withColumn(
        "total_nonzero", F.sum(nz_count).over(whole)
    )
    nz_i = "CASE WHEN i > 0 THEN i END"
    # The 101 percentile aggregates land in ONE array column instead
    # of 101 named columns: the per-block variant of the flagship's
    # plan would otherwise thread 101 columns through three nested
    # projections, and Catalyst's analysis time on that width (not the
    # execution) dominated the whole pass (measured ~2.5s of a 4.6s
    # stats step at 9 blocks). Values are identical — the moments
    # below fold the array left-to-right exactly like the column-wise
    # reduce in operators/requant.band_moments.
    pct_exprs = [F.expr(f"CAST(COALESCE(MIN({nz_i}), 0) AS BIGINT)")]
    for p in range(1, 100):
        pct_exprs.append(
            F.expr(
                "CAST(COALESCE(MIN(CASE WHEN (100.0D * cum_count)"
                f" / total_nonzero >= {float(p)}D THEN i END), 0) AS BIGINT)"
            )
        )
    pct_exprs.append(F.expr(f"CAST(COALESCE(MAX({nz_i}), 0) AS BIGINT)"))
    pctl = cdf.groupBy(*key).agg(
        F.array(*pct_exprs).alias("stats_percentiles"),
        F.sum("bin_count").alias("stats_total_count"),
        F.coalesce(
            F.sum(F.when(F.col("i") == 0, F.col("bin_count"))),
            F.lit(0).cast("bigint"),
        ).alias("stats_zero_count"),
    )
    arr = F.col("stats_percentiles")
    band = F.slice(arr, R.MIN_QUANTILE + 1, len(R.BAND))  # p20..p95
    n = float(len(R.BAND))
    s1 = F.aggregate(band, F.lit(0).cast("long"), lambda a, b: a + b)
    s2 = F.aggregate(
        band, F.lit(0).cast("long"), lambda a, b: a + b * b
    )
    mean = s1 / F.lit(n)
    stddev = F.sqrt(s2 / F.lit(n) - mean * mean)
    p20 = F.element_at(arr, R.MIN_QUANTILE + 1)
    p95 = F.element_at(arr, R.MAX_BASE_QUANTILE + 1)
    p100 = F.element_at(arr, 101)
    white = F.floor(p95 + F.lit(R.MAX_SIGMA_BUFFER) * stddev)
    white = F.greatest(white, F.floor(F.lit(R.MAX_PROPORTION) * p100))
    white = F.least(white, p100.cast("bigint"))
    white = F.greatest(white, F.lit(254).cast("bigint"))
    black = F.greatest(
        F.least(p20.cast("bigint"), white - F.lit(253)),
        F.lit(1).cast("bigint"),
    )
    return pctl.select(
        *key,
        "stats_percentiles",
        "stats_zero_count",
        "stats_total_count",
        black.alias("black_level"),
        white.alias("white_level"),
        F.lit(0.5).alias("gamma0"),
    )


def requantize_blocks(blocks: DataFrame, stats: DataFrame) -> DataFrame:
    """uint16 -> uint8 intensity requantization of block payloads with
    per-(block, channel) params — the reference's pass-2 transform
    (ktx_from_rendered_tiff.py:346-365), as a Catalyst
    ``F.transform`` over the voxel arrays (no explode, no Python):
    shift by black, floor small values at 1, preserve zero as no-data,
    scale by 1/range, clamp at 1, gamma-correct, expand to 0-254,
    ceil. Association mirrors the NumPy mirror
    (volume/geometry.py::requantize) exactly."""
    key = _block_key(blocks)
    joined = blocks.join(
        stats.select(*key, "black_level", "white_level", "gamma0"), key, "left"
    )
    black = F.coalesce(F.col("black_level").cast("double"), F.lit(1.0))
    white = F.coalesce(F.col("white_level").cast("double"), F.lit(65535.0))
    gamma = F.coalesce(F.col("gamma0"), F.lit(0.5))
    rng = F.greatest(F.lit(1.0), white - black)

    def requant(v):
        t = v.cast("double") - black
        t = F.when(t <= 1.0, F.lit(1.0)).otherwise(t)
        t = F.when(v == 0, F.lit(0.0)).otherwise(t)
        t = t * (F.lit(1.0) / rng)
        t = F.when(t >= 1.0, F.lit(1.0)).otherwise(t)
        t = F.pow(t, gamma) * F.lit(254.0)
        return F.ceil(t).cast("int")

    return joined.withColumn("voxels", F.transform("voxels", requant)).drop(
        "black_level", "white_level", "gamma0"
    )


def downsample_blocks_xy(
    blocks: DataFrame,
    block_dims: tuple[int, int, int],
    filter_: str = "arthur",
) -> DataFrame:
    """Halve block payloads in X and Y only (z untouched) — the
    reference's optional first-mip spatial downsample
    (downsample_array_xy, ktx/util.py:184-192), as one hash aggregate
    with the same zero-is-NULL kernel and odd-pivot mapping as the
    z-halving chain."""
    key = _block_key(blocks)
    bz, by, bx = block_dims
    my, mx = mipmap_dimension(1, by), mipmap_dimension(1, bx)
    pos = F.col("pos")
    vox = blocks.select(
        *key, F.posexplode("voxels").alias("pos", "intensity")
    ).select(
        *key,
        F.floor(pos / (by * bx)).cast("int").alias("lz"),
        child_index((F.floor(pos / bx) % by).cast("int"), by).alias("ly"),
        child_index((pos % bx).cast("int"), bx).alias("lx"),
        "intensity",
    )
    agg = vox.groupBy(*key, "lz", "ly", "lx").agg(
        _agg_expr(filter_).cast("int").alias("intensity")
    )
    packed = F.struct(
        ((F.col("lz") * my + F.col("ly")) * mx + F.col("lx"))
        .cast("long")
        .alias("k"),
        F.col("intensity").alias("v"),
    )
    return (
        agg.groupBy(*key)
        .agg(F.sort_array(F.collect_list(packed)).alias("kv"))
        .select(
            *key,
            F.array(F.lit(bz), F.lit(my), F.lit(mx)).alias("shape"),
            F.transform("kv", lambda s: s["v"]).alias("voxels"),
        )
    )


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
    A ``depth`` column (octree level of the block, from
    read_tiff_block_store) joins the key when present so whole-store
    conversions keep same-coordinate blocks at different levels apart.
    """
    key = _KEY + (["depth"] if "depth" in blocks.columns else [])
    bz, by, bx = block_dims
    frames = [
        blocks.select(*key, "shape", "voxels").withColumn("level", F.lit(0))
    ]
    pos = F.col("pos")
    cur = blocks.select(*key, F.posexplode("voxels").alias("pos", "intensity"))
    cur = cur.select(
        *key,
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
        cur = cur.groupBy(*key, cz, cy, cx).agg(
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
            cur.groupBy(*key)
            .agg(F.sort_array(F.collect_list(packed)).alias("kv"))
            .select(
                *key,
                F.transform("kv", lambda s: s["v"]).alias("voxels"),
                F.array(*[F.lit(int(d)) for d in dims_k]).alias("shape"),
                F.lit(k).alias("level"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _block_file_groups(
    spark: SparkSession,
    store_root: str,
    depth: int | None = None,
    per_channel: bool = False,
) -> DataFrame:
    """All committed block files of a store as PATH rows:
    (zi, yi, xi, depth[, channel], paths array<string>). Metadata only
    — grouped mode shuffles PATHS (a few hundred bytes per block),
    never payloads; ``per_channel`` mode (one row per file, channel
    from the name) needs no shuffle at all. Each kernel task then
    reads its own block's file(s) — the reference's one-task-per-block
    I/O model (ktx_from_rendered_tiff.py:331-427) — and a resume
    anti-join upstream of this listing touches no payload either."""
    from hortacloud_importer_spark.sources.block_store import (
        _committed_only,
        path_block_coords,
    )

    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.tif")
        .load(store_root)
        .select("path")
    )
    files = _committed_only(spark, files, store_root)
    zi_c, yi_c, xi_c, depth_c = path_block_coords(store_root)
    files = files.select("path", zi_c, yi_c, xi_c, depth_c)
    if depth is not None:
        files = files.filter(F.col("_depth") == depth)
    if per_channel:
        ch = F.regexp_extract("path", r"default\.(\d+)\.tif$", 1)
        rows = (
            files.filter(ch != "")
            .select(
                F.col("_zi").alias("zi"),
                F.col("_yi").alias("yi"),
                F.col("_xi").alias("xi"),
                F.col("_depth").alias("depth"),
                ch.cast("int").alias("channel"),
                F.array("path").alias("paths"),
            )
        )
        # same explicit spread as the grouped mode (see below): after
        # a resume anti-join the few-KiB metadata exchange would
        # otherwise AQE-coalesce and serialize the conversion
        return rows.repartition(spark.sparkContext.defaultParallelism)
    # same admission rule as per_channel mode: only files the store's
    # channel naming scheme claims (default.<n>.tif) join a group — a
    # stray foo.tif inside a block directory must not crash the fused
    # kernel's channel parse (it filters out here exactly as it does
    # from the per-file rows above)
    groups = (
        files.filter(
            F.regexp_extract("path", r"default\.(\d+)\.tif$", 1) != ""
        )
        .groupBy(
            F.col("_zi").alias("zi"),
            F.col("_yi").alias("yi"),
            F.col("_xi").alias("xi"),
            F.col("_depth").alias("depth"),
        )
        .agg(F.sort_array(F.collect_list("path")).alias("paths"))
    )
    # explicit spread: the groups shuffle is a few KiB, so AQE
    # coalesces it to ONE partition — which would serialize the
    # CPU-heavy per-block conversion downstream (the round-6 soak
    # caught exactly this: one 312s task). An explicit partition count
    # is respected by AQE; round-robin balances blocks whose cost
    # varies by level.
    return groups.repartition(spark.sparkContext.defaultParallelism)


def ktx_convert_blocks_fused(
    blocks: DataFrame,
    n_mips: int,
    filter_: str = "arthur",
    interleave: bool = False,
    geometry=None,
    downsample_intensity: bool = False,
    downsample_xy: bool = False,
    store_root: str | None = None,
) -> DataFrame:
    """The whole per-block KTX conversion — input statistics, requant,
    optional XY halving, the in-block mip chain, encode — as ONE
    executor-side kernel per block.

    Every step of the reference's pass-2 is block-local (one task per
    node, ktx_from_rendered_tiff.py:331-427): stats/percentiles/
    requant params are per (block, channel), the mip chain never
    crosses a block boundary, and the KTX blob serializes one block.
    Expressing that as distributed aggregates (the ``fused=False``
    path) costs a histogram shuffle, a window sort, two shuffles per
    mip level, and a stats join — all to regroup rows that START
    grouped. This kernel keeps the grouping: the single-channel form
    is ``mapInPandas`` over the scan — a map-ONLY plan, zero
    shuffles at any store size — and the interleaved form pays exactly
    one shuffle (channels of a block live in separate files). Blocks
    are bounded by construction (each came from one TIFF file), so the
    in-memory NumPy chain is safe; values are pinned to the
    distributed duals by np_halve property tests and the fused-vs-
    unfused byte-identity test.
    """
    import numpy as np
    import pandas as pd

    from hortacloud_importer_spark.sources.ktx import (
        _interleaved_block_row,
        _single_block_row,
        interleave_channels,
    )
    from hortacloud_importer_spark.sources.ktx import KTX_SCHEMA
    from hortacloud_importer_spark.volume import geometry as G
    from hortacloud_importer_spark.volume.downsample import np_halve

    has_depth = "depth" in blocks.columns
    itemsize = 1 if downsample_intensity else 2
    dtype = np.uint8 if itemsize == 1 else np.uint16
    need_stats = geometry is not None or downsample_intensity

    def convert_one(voxels, shape) -> tuple[list[bytes], dict | None, tuple]:
        # int32 is lossless here (uint16 inputs, uint8 after
        # requant) and halves the kernel's peak block memory
        arr = np.asarray(voxels, dtype=np.int32).reshape(
            tuple(int(s) for s in shape)
        )
        st = None
        if need_stats:
            hist = np.bincount(arr.ravel(), minlength=G.N_BINS)
            st = {
                "percentiles": G.nonzero_percentiles(hist),
                "zero_count": int(hist[0]),
                "total_count": int(arr.size),
            }
            if downsample_intensity:
                b, w, g = G.intensity_downsample_params(st["percentiles"])
                st["black"], st["white"], st["gamma0"] = float(b), float(w), g
        if downsample_intensity:
            arr = G.requantize(
                arr, st["black"], st["white"], st["gamma0"]
            ).astype(np.int32)
        if downsample_xy:
            arr = np_halve(arr, filter_, axes=(False, True, True))
        levels = [arr]
        for _ in range(1, n_mips):
            arr = np_halve(arr, filter_)
            levels.append(arr)
        return levels, st, levels[0].shape

    def fused_single(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                levels, st, shape = convert_one(row.voxels, row.shape)
                out.append(
                    _single_block_row(
                        int(row.zi),
                        int(row.yi),
                        int(row.xi),
                        int(row.depth) if has_depth else 0,
                        int(row.channel),
                        [lv.astype(dtype).tobytes() for lv in levels],
                        shape,
                        itemsize,
                        geometry,
                        st,
                        has_depth,
                    )
                )
            yield pd.DataFrame(out)

    def interleaved_row(zi, yi, xi, depth, items):
        """items: (channel, voxels, shape) per channel, any order."""
        chans, per_ch, stats_list = [], [], []
        for ch, voxels, shape_in in sorted(items, key=lambda t: t[0]):
            levels, st, shape = convert_one(voxels, shape_in)
            chans.append(int(ch))
            per_ch.append(levels)
            stats_list.append(st)
        mip_bytes = [
            interleave_channels(
                [np.ascontiguousarray(ch[lv], dtype=dtype) for ch in per_ch]
            ).tobytes()
            for lv in range(n_mips)
        ]
        return _interleaved_block_row(
            zi, yi, xi, depth, chans, mip_bytes, shape,
            itemsize, geometry,
            stats_list if geometry is not None else None,
            has_depth,
        )

    def fused_interleaved(key, pdf):
        if has_depth:
            zi, yi, xi, depth = (int(k) for k in key)
        else:
            (zi, yi, xi), depth = (int(k) for k in key), 0
        items = [
            (int(row.channel), row.voxels, row.shape)
            for row in pdf.itertuples()
        ]
        return pd.DataFrame([interleaved_row(zi, yi, xi, depth, items)])

    def fused_filegroups(batches):
        import re as _re

        from hortacloud_importer_spark.sources.datasource import _pa_fs
        from hortacloud_importer_spark.sources.tiff import decode_tiff

        filesystem, base = _pa_fs(store_root)
        prefix = f"{store_root.rstrip('/')}/"
        chan_re = _re.compile(r"default\.(\d+)\.tif$")
        single = not interleave  # per_channel rows: one file per row
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                items = []
                for path in row.paths:
                    m = chan_re.search(path)
                    if m is None:
                        raise ValueError(
                            f"block file {path!r} does not follow the "
                            "store's default.<channel>.tif naming — "
                            "cannot assign it a channel for KTX "
                            "conversion"
                        )
                    rel = path.split(prefix, 1)[-1]
                    with filesystem.open_input_stream(
                        f"{base.rstrip('/')}/{rel}"
                    ) as fh:
                        arr = decode_tiff(fh.read())[..., 0]
                    items.append((int(m.group(1)), arr, arr.shape))
                zi, yi, xi = int(row.zi), int(row.yi), int(row.xi)
                depth = int(row.depth) if has_depth else 0
                if single:
                    if len(items) != 1:
                        raise ValueError(
                            "interleave=False file-group rows must "
                            f"carry exactly one file, got {len(items)}"
                            " — grouped (multi-channel) rows need "
                            "interleave=True"
                        )
                    ch, voxels, shape_in = items[0]
                    levels, st, shape = convert_one(voxels, shape_in)
                    out.append(
                        _single_block_row(
                            zi, yi, xi, depth, ch,
                            [lv.astype(dtype).tobytes() for lv in levels],
                            shape, itemsize, geometry, st, has_depth,
                        )
                    )
                else:
                    out.append(interleaved_row(zi, yi, xi, depth, items))
            yield pd.DataFrame(out)

    if store_root is not None:
        # file-group mode: `blocks` carries PATH rows, not payloads —
        # at most one metadata shuffle (the interleave channel-pairing
        # groupBy) moves paths (see _block_file_groups); each kernel
        # task reads its block's file(s), exactly the reference's
        # one-task-per-block I/O model. A resume filter upstream acts
        # on paths, so committed blocks are never even opened.
        return blocks.mapInPandas(fused_filegroups, KTX_SCHEMA)
    if interleave:
        key = ["zi", "yi", "xi"] + (["depth"] if has_depth else [])
        return blocks.groupBy(*key).applyInPandas(
            fused_interleaved, KTX_SCHEMA
        )
    return blocks.mapInPandas(fused_single, KTX_SCHEMA)


def tiff_octree_to_ktx(
    spark: SparkSession,
    store_root: str,
    out_dir: str,
    block_dims: tuple[int, int, int],
    n_mips: int,
    filter_: str = "arthur",
    depth: int | None = None,
    interleave: bool = False,
    downsample_intensity: bool = False,
    downsample_xy: bool = False,
    with_metadata: bool = True,
    specimen_id: str | None = None,
    fused: bool = True,
    delete_source: bool = False,
    resume: bool = False,
    lz4: bool = False,
) -> DataFrame:
    """Convert a ``tiff_blocks`` octree store into a KTX block store.

    ``depth`` selects one octree level (None = every block); the
    stored blocks at that depth must share ``block_dims`` (true for
    any store pipelines/octree.py built). Returns a one-row summary
    (n_files, n_blocks, n_mips) read back from the sink manifest.

    When the store carries a root ``transform.txt`` (build_octree
    writes one; the reference requires one,
    ktx_from_rendered_tiff.py:34-48) and ``with_metadata`` is on, each
    KTX header gets the reference's full viewer KV payload — geometry
    walk + per-channel statistics — and ``transform.txt`` is copied
    beside the KTX output (tiff2octree.py:894-901).

    Reference pass-2 options (convert_block_ktx_path,
    tiff2octree.py:454-498):
    ``downsample_intensity`` requantizes uint16 payloads to uint8 with
    per-(block, channel) black/white/gamma estimated from the block's
    own histogram (ktx_from_rendered_tiff.py:346-365; the header still
    reports the INPUT-intensity statistics + reconstruction triple);
    ``downsample_xy`` halves X/Y once before the mip chain
    (ktx/util.py:184-192). ``n_mips`` counts levels AFTER the XY
    halving.

    ``lz4`` writes LZ4-frame ``.ktx.lz4`` side-compressed files (the
    reference's dev-only ``LZ4.exe`` post-pass over the store,
    ktx_from_rendered_tiff.py:565-583, folded into the per-executor
    write); ``decode_ktx`` and every reader handle both transparently.

    ``delete_source`` mirrors the reference's ``--ktxonly`` space
    reclaim (tiff2octree.py:508-515, 1153-1162): after the KTX
    manifest commits, the converted source ``.tif`` blocks below the
    root are deleted (a distributed map over the listing — no driver
    set), and the root-level ``default.{ch}.tif`` files are moved
    beside the KTX output's parent directory, exactly where the
    reference leaves its lowest-resolution slices.
    """
    register_volume_sources(spark)
    if fused:
        # path rows instead of decoded payloads (round-6 soak: the
        # payload-grouped interleave shuffled ~1 GiB at 2 GiB scale):
        # single-channel mode is one row per file with zero shuffle;
        # interleave pairs a block's channel files with a paths-only
        # groupBy. Resume below then filters on paths, so committed
        # blocks are never opened, let alone decoded.
        blocks = _block_file_groups(
            spark, store_root, depth, per_channel=not interleave
        )
    else:
        blocks = read_tiff_block_store(spark, store_root)
        if depth is not None:
            blocks = blocks.filter(F.col("depth") == depth)
    if resume:
        # the reference's pass-2 resume skips blocks whose .ktx output
        # already exists (tiff2octree.py:400-402, per-file
        # os.path.exists); here: one anti-join of the work list
        # against the OUTPUT store's manifest on the expected file
        # name. In fused mode the work list is PATH rows, so committed
        # blocks are never opened; in the fused=False fallback the
        # anti-join sits above the decode (those blocks are read once,
        # then dropped — the price of the giant-block fallback)
        done = manifest.committed_files_df(spark, out_dir)
        if done is not None:
            has_depth = "depth" in blocks.columns
            tag = (
                F.when(
                    F.col("depth") > 0,
                    F.concat(F.lit("_d"), F.col("depth").cast("string")),
                ).otherwise(F.lit(""))
                if has_depth
                else F.lit("")
            )
            ch = (
                F.lit("-1")
                if interleave
                else F.col("channel").cast("string")
            )
            rel = F.concat(
                F.lit("block_"),
                F.col("zi").cast("string"), F.lit("_"),
                F.col("yi").cast("string"), F.lit("_"),
                F.col("xi").cast("string"),
                tag,
                F.lit("_ch"), ch,
                F.lit(".ktx.lz4" if lz4 else ".ktx"),
            )
            blocks = (
                blocks.withColumn("rel", rel)
                .join(done, "rel", "left_anti")
                .drop("rel")
            )
    raw_blocks = None
    if not fused:
        # One store read for the whole pass: the decoded blocks feed
        # the stats aggregate AND every mip-chain union branch —
        # without the persist each consumer re-runs the binaryFile
        # scan + TIFF decode (2 + n_mips store reads at 100 TB; the
        # reference's two-pass design reads each file twice). The
        # fused path has exactly one consumer, so it skips the cache.
        from pyspark import StorageLevel

        blocks = raw_blocks = blocks.persist(StorageLevel.MEMORY_AND_DISK)

    from hortacloud_importer_spark.volume.geometry import (
        OctreeGeometry,
        read_transform_txt,
    )

    transform = read_transform_txt(store_root)
    geometry = None
    if with_metadata and transform is not None:
        geometry = OctreeGeometry.from_transform(
            transform,
            block_dims,
            specimen_id=specimen_id
            or store_root.rstrip("/").rsplit("/", 1)[-1],
            mipmap_filter=filter_,
            downsample_xy=downsample_xy,
            downsample_intensity=downsample_intensity,
        )

    if fused:
        # the default: the whole conversion as one executor-side
        # kernel per block — a map-only plan (one shuffle when
        # interleaving), see ktx_convert_blocks_fused
        (
            ktx_convert_blocks_fused(
                blocks,
                n_mips=n_mips,
                filter_=filter_,
                interleave=interleave,
                geometry=geometry,
                downsample_intensity=downsample_intensity,
                downsample_xy=downsample_xy,
                store_root=store_root,
            )
            .write.format("ktx_files")
            .option("lz4", str(lz4).lower())
            .mode("append")
            .save(out_dir)
        )
    else:
        stats = None
        if geometry is not None or downsample_intensity:
            # pass-1 statistics of the INPUT intensities, shared by
            # the requant transform and the header KV; persisted
            # because both consumers would otherwise recompute the
            # histogram aggregate
            stats = channel_block_stats(blocks).persist()
        itemsize = 2
        if downsample_intensity:
            blocks = requantize_blocks(blocks, stats)
            itemsize = 1
        out_block_dims = block_dims
        if downsample_xy:
            blocks = downsample_blocks_xy(blocks, block_dims, filter_)
            bz, by, bx = block_dims
            out_block_dims = (
                bz,
                mipmap_dimension(1, by),
                mipmap_dimension(1, bx),
            )
        chain = block_mip_chain(blocks, out_block_dims, n_mips, filter_)
        if stats is not None:
            chain = chain.join(stats, _block_key(blocks), "left")
        (
            ktx_encode_blocks(
                chain,
                itemsize=itemsize,
                interleave=interleave,
                geometry=geometry,
            )
            .write.format("ktx_files")
            .option("lz4", str(lz4).lower())
            .mode("append")
            .save(out_dir)
        )
        if stats is not None:
            stats.unpersist()
    if raw_blocks is not None:
        raw_blocks.unpersist(blocking=False)
    if transform is not None:
        # the reference copies transform.txt beside the KTX output
        # verbatim (tiff2octree.py:894-901)
        from hortacloud_importer_spark.sources.datasource import (
            _copy_file,
            _pa_fs,
        )

        src_fs, src_base = _pa_fs(store_root)
        dst_fs, dst_base = _pa_fs(out_dir)
        dst_fs.create_dir(dst_base, recursive=True)
        _copy_file(
            src_fs,
            f"{src_base.rstrip('/')}/transform.txt",
            dst_fs,
            f"{dst_base.rstrip('/')}/transform.txt",
        )
    # distinct committed-file count via the manifest-shard DataFrame
    # (one file per block in this sink, so n_blocks == n_files); the
    # count is a Spark job over shard text files, never a driver set
    n_files = int(manifest.committed_files_df(spark, out_dir).distinct().count())
    if delete_source:
        _reclaim_source_store(spark, store_root, out_dir, depth)
    return spark.createDataFrame(
        [(n_files, n_files, n_mips)],
        "n_files long, n_blocks long, n_mips int",
    )


def _reclaim_source_store(
    spark: SparkSession,
    store_root: str,
    out_dir: str,
    depth: int | None,
) -> None:
    """The reference's ``--ktxonly`` cleanup: delete converted source
    blocks below the root (tiff2octree.py:508-515 — per-block, after
    its KTX is written; here after the whole commit, so a failed run
    never deletes anything), then move the root ``default.{ch}.tif``
    files next to the KTX output's parent (:1153-1162). The delete is
    a map over the path listing — executor-side, no driver set.
    ``depth=0`` (root-only conversion) never deletes: the root slices
    are MOVED, matching the reference's level > 1 guard."""
    import posixpath

    import pandas as pd

    from hortacloud_importer_spark.sources.block_store import (
        path_block_coords,
    )
    from hortacloud_importer_spark.sources.datasource import (
        _copy_file,
        _pa_fs,
    )

    def move_root_slices():
        # root slices move beside the KTX root (driver-side: one file
        # per channel by construction)
        src_fs, src_base = _pa_fs(store_root)
        parent = posixpath.dirname(out_dir.rstrip("/")) or "."
        if parent.rstrip("/") == store_root.rstrip("/"):
            return
        dst_fs, dst_base = _pa_fs(parent)
        from pyarrow import fs as pafs

        dst_fs.create_dir(dst_base, recursive=True)
        infos = src_fs.get_file_info(
            pafs.FileSelector(src_base, recursive=False)
        )
        for i in infos:
            if i.type != pafs.FileType.File:
                continue
            name = i.base_name
            if not (name.startswith("default.") and name.endswith(".tif")):
                continue
            _copy_file(
                src_fs, i.path, dst_fs, f"{dst_base.rstrip('/')}/{name}"
            )
            src_fs.delete_file(i.path)

    if depth == 0:
        move_root_slices()
        return

    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.tif")
        .load(store_root)
        .select("path")
    )
    _, _, _, depth_c = path_block_coords(store_root)
    files = files.select("path", depth_c)
    # the reference keeps the root level (level > 1 guard); a
    # depth-restricted conversion only reclaims that depth
    cond = F.col("_depth") >= 1
    if depth is not None:
        cond = F.col("_depth") == depth
    doomed = files.filter(cond).select("path")
    root_norm = store_root

    def rm(batches):
        filesystem, base = _pa_fs(root_norm)
        for pdf in batches:
            n = 0
            for row in pdf.itertuples():
                rel = row.path.split(f"{root_norm.rstrip('/')}/", 1)[-1]
                try:
                    filesystem.delete_file(f"{base.rstrip('/')}/{rel}")
                    n += 1
                except FileNotFoundError:
                    pass  # idempotent under task retries; any other
                    # failure (permissions, read-only mount) must
                    # surface, not read as a successful reclaim
            yield pd.DataFrame({"n": [n]})

    doomed.mapInPandas(rm, "n long").agg(F.sum("n")).collect()
    if depth is None:
        move_root_slices()
