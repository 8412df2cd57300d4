"""End-to-end octree build: slice TIFFs -> leaf blocks -> pyramid ->
octree-of-ZLIB-TIFF store with manifest + resume — the reference's
main-program flow (tiff2octree.py:1236-1366) as one composition."""

from __future__ import annotations

import glob

import numpy as np
import pytest
from pyarrow import fs as pafs

from hortacloud_importer_spark.sources import manifest
from hortacloud_importer_spark.sources.tiff import decode_tiff, encode_tiff

_FS = pafs.LocalFileSystem()


def _write_slices(d, vol):
    d.mkdir(parents=True, exist_ok=True)
    for z, sl in enumerate(vol):
        (d / f"default.0.{z:03d}.tif").write_bytes(encode_tiff(sl[None, ...]))


def test_build_octree_end_to_end_with_resume(spark, tmp_path):
    from hortacloud_importer_spark.pipelines import build_octree

    rng = np.random.default_rng(17)
    vol = rng.integers(1, 250, (8, 8, 8), dtype=np.uint8)  # all non-zero
    _write_slices(tmp_path / "slices", list(vol))
    out = str(tmp_path / "octree")

    summary = {
        r["level"]: (r["n_blocks_written"], r["n_voxels"])
        for r in build_octree(
            spark, str(tmp_path / "slices"), out, nlevels=2, filter_="max"
        ).collect()
    }
    # level 0: 2^3 leaf blocks; level 1: the root block
    assert summary[0] == (8, 512)
    assert summary[1] == (1, 64)

    committed = sorted(manifest.committed_files(_FS, out))
    files = sorted(
        p.split(f"{out}/")[1] for p in glob.glob(f"{out}/**/*.tif", recursive=True)
    )
    assert files == committed
    assert files == [f"{d}/default.0.tif" for d in "12345678"] + ["default.0.tif"]

    # leaf blocks hold the original voxels at the right octant
    for zi in range(2):
        for yi in range(2):
            for xi in range(2):
                digit = 1 + xi + 2 * yi + 4 * zi
                got = decode_tiff(
                    (tmp_path / "octree" / str(digit) / "default.0.tif").read_bytes()
                )[..., 0]
                want = vol[
                    zi * 4 : zi * 4 + 4, yi * 4 : yi * 4 + 4, xi * 4 : xi * 4 + 4
                ]
                assert np.array_equal(got, want.astype(np.uint16))

    # the root block is the 2x2x2 non-zero max (zero-is-NULL max; all
    # values non-zero here, so the plain window max)
    root = decode_tiff((tmp_path / "octree" / "default.0.tif").read_bytes())[..., 0]
    want_root = vol.reshape(4, 2, 4, 2, 4, 2).max(axis=(1, 3, 5))
    assert np.array_equal(root, want_root.astype(np.uint16))

    # resume: a second run anti-joins every block away via the manifest
    resumed = {
        r["level"]: r["n_blocks_written"]
        for r in build_octree(
            spark, str(tmp_path / "slices"), out, nlevels=2, filter_="max"
        ).collect()
    }
    assert resumed == {0: 0, 1: 0}
    assert sorted(manifest.committed_files(_FS, out)) == committed


def test_build_octree_pads_non_divisible_dims_multichannel(spark, tmp_path):
    """dims (7,6,5) x 2 channels, nlevels=2: edge blocks zero-pad to
    the (4,3,3) block grid instead of scrambling or crashing; every
    stored voxel matches the padded source per channel."""
    from hortacloud_importer_spark.pipelines import build_octree
    from hortacloud_importer_spark.sources.block_store import (
        read_tiff_block_store,
    )

    rng = np.random.default_rng(23)
    vol = rng.integers(1, 60000, (2, 7, 6, 5), dtype=np.uint16)  # (ch, z, y, x)
    rows = [
        (int(z), int(y), int(x), int(c), int(vol[c, z, y, x]))
        for c in range(2)
        for z in range(7)
        for y in range(6)
        for x in range(5)
    ]
    voxels = spark.createDataFrame(
        rows, "z int, y int, x int, channel int, intensity int"
    )
    out = str(tmp_path / "odd_octree")
    summary = {
        r["level"]: r["n_blocks_written"]
        for r in build_octree(
            spark, voxels, out, nlevels=2, filter_="max", dims=(7, 6, 5)
        ).collect()
    }
    assert summary == {0: 16, 1: 2}  # 8 leaf blocks + root, per channel

    padded = np.zeros((2, 8, 6, 6), dtype=np.uint16)
    padded[:, :7, :, :5] = vol
    back = read_tiff_block_store(spark, out)
    leaf = [r for r in back.collect() if r["depth"] == 1]
    assert len(leaf) == 16
    assert all(r["shape"] == [4, 3, 3] for r in leaf)
    for r in leaf:
        zi, yi, xi, c = r["zi"], r["yi"], r["xi"], r["channel"]
        want = padded[
            c, zi * 4 : zi * 4 + 4, yi * 3 : yi * 3 + 3, xi * 3 : xi * 3 + 3
        ]
        assert np.array_equal(
            np.array(r["voxels"], dtype=np.uint16).reshape(4, 3, 3), want
        ), (zi, yi, xi, c)


def test_tiff_octree_to_ktx_full_chain(spark, tmp_path):
    """The reference's second main program: TIFF octree -> per-block
    mip chains -> KTX store. Verifies mip 0 equals the stored block
    and mip 1 equals the independent NumPy window-max."""
    from pyspark.sql import functions as F

    from hortacloud_importer_spark.pipelines import (
        build_octree,
        tiff_octree_to_ktx,
    )
    from hortacloud_importer_spark.sources.ktx import ktx_decode_blocks

    rng = np.random.default_rng(29)
    vol = rng.integers(1, 60000, (8, 8, 8), dtype=np.uint16)  # all non-zero
    rows = [
        (int(z), int(y), int(x), 0, int(vol[z, y, x]))
        for z in range(8)
        for y in range(8)
        for x in range(8)
    ]
    voxels = spark.createDataFrame(
        rows, "z int, y int, x int, channel int, intensity int"
    )
    store = str(tmp_path / "tiff_store")
    build_octree(spark, voxels, store, nlevels=2, filter_="max", dims=(8, 8, 8))

    ktx_out = str(tmp_path / "ktx_store")
    summary = tiff_octree_to_ktx(
        spark, store, ktx_out, block_dims=(4, 4, 4), n_mips=3,
        filter_="max", depth=1,
    ).first()
    assert summary["n_files"] == 8  # one KTX per leaf block
    assert summary["n_blocks"] == 8

    decoded = ktx_decode_blocks(
        spark.read.format("binaryFile")
        .load(f"{ktx_out}/*.ktx")
        .select(F.col("content").alias("ktx"))
    ).collect()
    assert len(decoded) == 8 * 3  # 3 mips per block
    for r in decoded:
        # recover block coords from the metadata-free decode: match by
        # payload against every block at this mip level
        if r["level"] == 0:
            arr = np.array(r["voxels"], dtype=np.uint16).reshape(4, 4, 4)
            found = any(
                np.array_equal(
                    arr,
                    vol[zi * 4 : zi * 4 + 4, yi * 4 : yi * 4 + 4, xi * 4 : xi * 4 + 4],
                )
                for zi in range(2)
                for yi in range(2)
                for xi in range(2)
            )
            assert found
        elif r["level"] == 1:
            arr = np.array(r["voxels"], dtype=np.uint16).reshape(2, 2, 2)
            found = any(
                np.array_equal(
                    arr,
                    vol[zi * 4 : zi * 4 + 4, yi * 4 : yi * 4 + 4, xi * 4 : xi * 4 + 4]
                    .reshape(2, 2, 2, 2, 2, 2)
                    .max(axis=(1, 3, 5)),
                )
                for zi in range(2)
                for yi in range(2)
                for xi in range(2)
            )
            assert found
        else:
            assert len(r["voxels"]) == 1  # 1^3 root mip


def test_build_octree_from_two_channel_slices(spark, tmp_path):
    """channels=2: per-channel z-ordered scans feed one build; each
    channel's leaf files land beside each other under the octants."""
    from hortacloud_importer_spark.pipelines import build_octree

    rng = np.random.default_rng(37)
    d = tmp_path / "slices2"
    d.mkdir()
    vols = {}
    for ch in range(2):
        vol = rng.integers(1, 250, (4, 4, 4)).astype(np.uint8)
        vols[ch] = vol
        for z in range(4):
            (d / f"default.{ch}.{z:03d}.tif").write_bytes(
                encode_tiff(vol[z][None, ...])
            )
    out = str(tmp_path / "oct2")
    summary = {
        r["level"]: r["n_blocks_written"]
        for r in build_octree(
            spark, str(d), out, nlevels=2, filter_="max", channels=2
        ).collect()
    }
    assert summary == {0: 16, 1: 2}
    for ch in range(2):
        for zi, yi, xi in [(0, 0, 0), (1, 1, 1)]:
            digit = 1 + xi + 2 * yi + 4 * zi
            got = decode_tiff(
                (tmp_path / "oct2" / str(digit) / f"default.{ch}.tif").read_bytes()
            )[..., 0]
            want = vols[ch][
                zi * 2 : zi * 2 + 2, yi * 2 : yi * 2 + 2, xi * 2 : xi * 2 + 2
            ]
            assert np.array_equal(got, want.astype(np.uint16)), (ch, zi, yi, xi)


def test_build_octree_with_neighborhood_kernel_filter(spark, tmp_path):
    """-d aa|spline parity (tiff2octree.py:244-261): non-level-0
    levels come from the grouped-map kernel applied per block, then 8
    half-size siblings re-assemble into each child block — matching
    the reference's per-block map_blocks kernels. Root block must
    equal the NumPy kernel applied to each leaf block, assembled."""
    from hortacloud_importer_spark.operators.kernels import KERNELS
    from hortacloud_importer_spark.pipelines import build_octree

    rng = np.random.default_rng(53)
    vol = rng.integers(1, 60000, (8, 8, 8)).astype(np.uint16)
    _write_slices(tmp_path / "slices_aa", list(vol))

    for kernel in ("aa", "spline3"):
        out = str(tmp_path / f"oct_{kernel}")
        summary = {
            r["level"]: r["n_blocks_written"]
            for r in build_octree(
                spark,
                str(tmp_path / "slices_aa"),
                out,
                nlevels=2,
                filter_=kernel,
            ).collect()
        }
        assert summary == {0: 8, 1: 1}
        root = decode_tiff(
            (tmp_path / f"oct_{kernel}" / "default.0.tif").read_bytes()
        )[..., 0]
        want = np.zeros((4, 4, 4), dtype=np.int64)
        fn = KERNELS[kernel]
        for zi in range(2):
            for yi in range(2):
                for xi in range(2):
                    blk = vol[
                        zi * 4 : zi * 4 + 4,
                        yi * 4 : yi * 4 + 4,
                        xi * 4 : xi * 4 + 4,
                    ].astype(np.int64)
                    want[
                        zi * 2 : zi * 2 + 2,
                        yi * 2 : yi * 2 + 2,
                        xi * 2 : xi * 2 + 2,
                    ] = fn(blk)
        assert np.array_equal(root.astype(np.int64), want), kernel


def test_build_octree_rejects_bad_filters(spark, tmp_path):
    from hortacloud_importer_spark.pipelines import build_octree
    from hortacloud_importer_spark.volume import synthetic_volume

    v = synthetic_volume(spark, 4, 4, 4)
    with pytest.raises(ValueError, match="unknown filter"):
        build_octree(spark, v, str(tmp_path / "x"), 2, filter_="nope", dims=(4, 4, 4))
    # odd block dims with a neighborhood kernel would drop planes
    with pytest.raises(ValueError, match="even block dims"):
        build_octree(
            spark,
            synthetic_volume(spark, 6, 6, 6),
            str(tmp_path / "y"),
            2,
            filter_="aa",
            dims=(6, 6, 6),
        )


def test_optimal_nlevels_matches_reference_rule():
    """calc_optimal_nlevels dual (tiff2octree.py:617-625): smallest
    level count whose leaf blocks fall under 512^3."""
    from hortacloud_importer_spark.pipelines import optimal_nlevels

    assert optimal_nlevels((8, 8, 8)) == 1
    assert optimal_nlevels((512, 512, 512)) == 2
    assert optimal_nlevels((511, 511, 511)) == 1
    assert optimal_nlevels((1024, 1024, 1024)) == 3
    # non-cubic: only the PRODUCT matters
    assert optimal_nlevels((2048, 512, 128)) == 2


@pytest.mark.parametrize("filt", ["arthur", "mean", "max"])
def test_fused_build_matches_global_aggregate_byte_for_byte(
    spark, tmp_path, filt
):
    """halve_blocks (grouped-map per parent block, one packed-array
    shuffle per level) produces the same store, byte for byte, as the
    global unblockify->downsample_voxels->blockify chain — including
    odd block extents (dims 20^3 / 3 levels -> 5^3 blocks), where the
    equality rests on 2x2x2 cubes never crossing a parent's region."""
    import os

    from hortacloud_importer_spark.pipelines import build_octree
    from hortacloud_importer_spark.volume import synthetic_volume

    stores = []
    for fused in (True, False):
        out = str(tmp_path / f"store_{filt}_{fused}")
        v = synthetic_volume(spark, 20, 20, 20, zero_fraction_mod=4)
        build_octree(
            spark,
            v,
            out,
            nlevels=3,
            filter_=filt,
            dims=(20, 20, 20),
            fused=fused,
        ).count()
        stores.append(out)
    a, b = stores
    fa = sorted(
        os.path.relpath(p, a)
        for p in glob.glob(f"{a}/**/*.tif", recursive=True)
    )
    fb = sorted(
        os.path.relpath(p, b)
        for p in glob.glob(f"{b}/**/*.tif", recursive=True)
    )
    assert fa == fb and fa
    for f in fa:
        assert (
            open(os.path.join(a, f), "rb").read()
            == open(os.path.join(b, f), "rb").read()
        ), f


def test_fused_kernel_build_matches_voxel_row_assembly(spark, tmp_path):
    """assemble_halved_blocks (packed re-assembly after the aa/spline3
    per-block kernels) produces the same store byte-for-byte as the
    blockify(unblockify(...)) voxel-row path."""
    import os

    from hortacloud_importer_spark.pipelines import build_octree
    from hortacloud_importer_spark.volume import synthetic_volume

    stores = []
    for fused in (True, False):
        out = str(tmp_path / f"kstore_{fused}")
        v = synthetic_volume(spark, 16, 16, 16, zero_fraction_mod=5)
        build_octree(
            spark,
            v,
            out,
            nlevels=2,
            filter_="aa",
            dims=(16, 16, 16),
            fused=fused,
        ).count()
        stores.append(out)
    a, b = stores
    fa = sorted(
        os.path.relpath(p, a)
        for p in glob.glob(f"{a}/**/*.tif", recursive=True)
    )
    fb = sorted(
        os.path.relpath(p, b)
        for p in glob.glob(f"{b}/**/*.tif", recursive=True)
    )
    assert fa == fb and fa
    for f in fa:
        assert (
            open(os.path.join(a, f), "rb").read()
            == open(os.path.join(b, f), "rb").read()
        ), f


def test_fused_slice_ingest_matches_voxel_path(spark, tmp_path):
    """The packed-tile leaf ingest (_slices_to_blocks) builds the same
    store, byte for byte, as the voxel-row scan + densify + blockify
    path — odd dims exercise the y/x/z canvas padding."""
    import os

    from hortacloud_importer_spark.pipelines import build_octree

    rng = np.random.default_rng(31)
    vol = rng.integers(0, 60000, (7, 6, 5)).astype(np.uint16)
    _write_slices(tmp_path / "fslices", list(vol))
    stores = []
    for fused in (True, False):
        out = str(tmp_path / f"fstore_{fused}")
        build_octree(
            spark,
            str(tmp_path / "fslices"),
            out,
            nlevels=2,
            filter_="max",
            fused=fused,
        ).count()
        stores.append(out)
    a, b = stores
    fa = sorted(
        os.path.relpath(p, a)
        for p in glob.glob(f"{a}/**/*.tif", recursive=True)
    )
    fb = sorted(
        os.path.relpath(p, b)
        for p in glob.glob(f"{b}/**/*.tif", recursive=True)
    )
    assert fa == fb and fa
    for f in fa:
        assert (
            open(os.path.join(a, f), "rb").read()
            == open(os.path.join(b, f), "rb").read()
        ), f


def test_fused_ingest_clips_slices_beyond_padded_grid(spark, tmp_path):
    """A slice dir with more files than the caller's dims must clip in
    the fused tile ingest exactly like the voxel path's densify grid
    join — a stray z would otherwise alias onto an in-grid octree
    path."""
    import os

    from hortacloud_importer_spark.pipelines import build_octree

    rng = np.random.default_rng(37)
    vol = rng.integers(1, 60000, (9, 6, 5)).astype(np.uint16)
    _write_slices(tmp_path / "clipslices", list(vol))  # 9 files, dims say 7
    stores = []
    for fused in (True, False):
        out = str(tmp_path / f"clipstore_{fused}")
        build_octree(
            spark,
            str(tmp_path / "clipslices"),
            out,
            nlevels=2,
            filter_="max",
            dims=(7, 6, 5),
            fused=fused,
        ).count()
        stores.append(out)
    a, b = stores
    fa = sorted(
        os.path.relpath(p, a)
        for p in glob.glob(f"{a}/**/*.tif", recursive=True)
    )
    fb = sorted(
        os.path.relpath(p, b)
        for p in glob.glob(f"{b}/**/*.tif", recursive=True)
    )
    assert fa == fb and fa
    for f in fa:
        assert (
            open(os.path.join(a, f), "rb").read()
            == open(os.path.join(b, f), "rb").read()
        ), f
