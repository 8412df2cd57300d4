"""The fused per-block KTX converter (pipelines/ktx.py::
ktx_convert_blocks_fused): byte-identical to the distributed-aggregate
path across every pass-2 option, with a map-only physical plan.

The reference's KTX pass is one task per octree node
(ktx_from_rendered_tiff.py:331-427); the fused path keeps that
block-locality — stats, requant, XY halving, mip chain, and encode all
run inside one executor kernel — so the single-channel conversion
plans with ZERO exchanges at any store size."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from hortacloud_importer_spark.pipelines import (
    build_octree,
    tiff_octree_to_ktx,
)
from hortacloud_importer_spark.volume import synthetic_volume


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fused") / "store")
    v = synthetic_volume(spark, 16, 16, 16, zero_fraction_mod=5)
    build_octree(
        spark, v, root, nlevels=2, filter_="arthur", dims=(16, 16, 16)
    )
    return root


def _convert(spark, store, tmp, fused, **kw):
    out = str(tmp / f"ktx_{fused}_{'_'.join(sorted(kw))}")
    tiff_octree_to_ktx(
        spark,
        store,
        out,
        block_dims=(8, 8, 8),
        n_mips=3,
        filter_="arthur",
        fused=fused,
        **kw,
    ).count()
    return out


def _files(root):
    return {
        os.path.relpath(p, root): open(p, "rb").read()
        for p in glob.glob(f"{root}/**/*.ktx", recursive=True)
    }


@pytest.mark.parametrize(
    "kw",
    [
        {"downsample_intensity": True, "downsample_xy": True},
        {"interleave": True},
    ],
    ids=["requant_xy_metadata", "interleave"],
)
def test_fused_matches_unfused_byte_for_byte(spark, store, tmp_path, kw):
    a = _files(_convert(spark, store, tmp_path, True, **kw))
    b = _files(_convert(spark, store, tmp_path, False, **kw))
    assert sorted(a) == sorted(b) and len(a) == 9
    assert all(a[f] == b[f] for f in a)


def test_fused_single_channel_plan_has_no_exchange(spark, store):
    """The structural point of the fused path: one map stage, no
    shuffle — the conversion scales as a pure map job."""
    from hortacloud_importer_spark.pipelines.ktx import (
        ktx_convert_blocks_fused,
    )
    from hortacloud_importer_spark.sources.block_store import (
        read_tiff_block_store,
    )

    blocks = read_tiff_block_store(spark, store)
    plan = (
        ktx_convert_blocks_fused(blocks, n_mips=3, filter_="arthur")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "MapInPandas" in plan


def test_np_halve_axes_variant_matches_catalyst_xy(spark):
    """np_halve(axes=(False, True, True)) == downsample_blocks_xy on
    the same block (the XY-only first-mip option, ktx/util.py:184-192).
    """
    from hortacloud_importer_spark.pipelines.ktx import downsample_blocks_xy
    from hortacloud_importer_spark.volume.downsample import np_halve

    rng = np.random.default_rng(3)
    vol = rng.integers(0, 1 << 16, size=(4, 6, 5)).astype(np.int64)
    vol[rng.random(size=vol.shape) < 0.3] = 0
    rows = [(0, 0, 0, 0, [4, 6, 5], [int(v) for v in vol.ravel()])]
    blocks = spark.createDataFrame(
        rows,
        "zi int, yi int, xi int, channel int, shape array<int>,"
        " voxels array<int>",
    )
    for filt in ("mean", "max", "arthur"):
        got = downsample_blocks_xy(blocks, (4, 6, 5), filt).first()
        want = np_halve(vol, filt, axes=(False, True, True))
        assert tuple(got["shape"]) == want.shape
        assert np.array_equal(
            np.asarray(got["voxels"]).reshape(want.shape), want
        ), filt


def test_delete_source_reclaims_store_after_commit(spark, tmp_path):
    """delete_source (the reference's --ktxonly cleanup,
    tiff2octree.py:508-515, 1153-1162): sub-root source blocks are
    deleted after the KTX manifest commits, root default.{ch}.tif
    files move beside the KTX output's parent, and the KTX store
    itself is complete."""
    root = str(tmp_path / "reclaim" / "store")
    v = synthetic_volume(spark, 16, 16, 16, zero_fraction_mod=5)
    build_octree(
        spark, v, root, nlevels=2, filter_="arthur", dims=(16, 16, 16)
    )
    out = str(tmp_path / "reclaim" / "ktx")
    res = tiff_octree_to_ktx(
        spark,
        root,
        out,
        block_dims=(8, 8, 8),
        n_mips=2,
        filter_="arthur",
        delete_source=True,
    ).first()
    assert res["n_files"] == 9
    # all 8 leaf (depth-1) blocks reclaimed; the root file moved next
    # to the KTX output (same parent dir as the store here)
    assert glob.glob(f"{root}/*/default.*.tif") == []
    assert not os.path.exists(f"{root}/default.0.tif")
    parent = str(tmp_path / "reclaim")
    assert os.path.exists(f"{parent}/default.0.tif")
    assert len(glob.glob(f"{out}/**/*.ktx", recursive=True)) == 9


def test_delete_source_depth0_moves_root_instead_of_deleting(
    spark, tmp_path
):
    """A root-only conversion (depth=0) with delete_source must MOVE
    the root slices beside the KTX output, never delete them — the
    reference's level > 1 guard (tiff2octree.py:508)."""
    root = str(tmp_path / "d0" / "store")
    v = synthetic_volume(spark, 16, 16, 16, zero_fraction_mod=5)
    build_octree(
        spark, v, root, nlevels=2, filter_="arthur", dims=(16, 16, 16)
    )
    out = str(tmp_path / "d0" / "ktx")
    tiff_octree_to_ktx(
        spark,
        root,
        out,
        block_dims=(16, 16, 16),
        n_mips=2,
        filter_="arthur",
        depth=0,
        delete_source=True,
    ).count()
    # leaf blocks untouched, root file moved (not deleted)
    assert len(glob.glob(f"{root}/*/default.*.tif")) == 8
    assert not os.path.exists(f"{root}/default.0.tif")
    assert os.path.exists(str(tmp_path / "d0" / "default.0.tif"))


@pytest.fixture(scope="module")
def store2ch(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fused2ch") / "store")
    v = synthetic_volume(spark, 16, 16, 16, channels=2, zero_fraction_mod=5)
    build_octree(
        spark, v, root, nlevels=2, filter_="arthur", dims=(16, 16, 16),
        channels=2,
    )
    return root


def test_filegroup_interleave_matches_unfused_byte_for_byte(
    spark, store2ch, tmp_path
):
    """SOAK.md finding: the payload-grouped interleave shuffled every
    decoded block. The fused pipeline now plans per-block FILE groups
    (paths shuffle, payloads don't) — output must stay byte-identical
    to the distributed dual, now over a genuinely multi-channel
    store."""
    a = _files(
        _convert(spark, store2ch, tmp_path, True, interleave=True,
                 downsample_intensity=True)
    )
    b = _files(
        _convert(spark, store2ch, tmp_path, False, interleave=True,
                 downsample_intensity=True)
    )
    assert sorted(a) == sorted(b) and len(a) == 9
    assert all(a[f] == b[f] for f in a)


def test_filegroup_interleave_shuffles_paths_not_payloads(spark, store2ch):
    """Plan shape: the only exchange feeds the PATH collect_list; the
    conversion itself is MapInPandas over (block, paths) rows — no
    grouped-map over decoded payload rows anywhere."""
    from hortacloud_importer_spark.pipelines.ktx import (
        _block_file_groups,
        ktx_convert_blocks_fused,
    )

    groups = _block_file_groups(spark, store2ch)
    out = ktx_convert_blocks_fused(
        groups, n_mips=3, filter_="arthur", interleave=True,
        store_root=store2ch,
    )
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan  # no payload regroup
    assert "collect_list(path" in plan  # the metadata-only shuffle
    # and the scan feeding it projects paths only, never content
    assert "content" not in plan


def test_block_file_groups_depth_filter_and_channels(spark, store2ch):
    """The file-group planner: one row per block with BOTH channel
    files, path-derived coordinates, and a working depth filter."""
    from hortacloud_importer_spark.pipelines.ktx import _block_file_groups

    rows = {
        (r["zi"], r["yi"], r["xi"], r["depth"]): list(r["paths"])
        for r in _block_file_groups(spark, store2ch).collect()
    }
    # 16^3 / 2 levels: 8 leaf blocks at depth 1 + 1 root at depth 0
    assert len(rows) == 9
    assert all(len(p) == 2 for p in rows.values())  # both channels
    assert all(
        p[0].endswith("default.0.tif") and p[1].endswith("default.1.tif")
        for p in rows.values()
    )
    deep = {
        (r["zi"], r["yi"], r["xi"])
        for r in _block_file_groups(spark, store2ch, depth=1).collect()
    }
    assert deep == {(z, y, x) for z in range(2) for y in range(2) for x in range(2)}


def test_ktx_resume_skips_committed_blocks(spark, store, tmp_path):
    """A11 for the KTX pass (reference: per-file os.path.exists skip,
    tiff2octree.py:400-402): resume anti-joins the work list against
    the OUTPUT manifest — already-converted blocks are neither decoded
    nor rewritten."""
    import os

    out = str(tmp_path / "resume_ktx")
    # first pass: one octree level only
    tiff_octree_to_ktx(
        spark, store, out, block_dims=(8, 8, 8), n_mips=3,
        filter_="arthur", depth=1,
    ).count()
    first = {
        p: os.path.getmtime(os.path.join(out, p)) for p in os.listdir(out)
        if p.endswith(".ktx")
    }
    assert len(first) == 8

    # resumed full conversion: fills in the root, leaves depth-1 alone
    res = tiff_octree_to_ktx(
        spark, store, out, block_dims=(8, 8, 8), n_mips=3,
        filter_="arthur", resume=True,
    ).first()
    now = {p for p in os.listdir(out) if p.endswith(".ktx")}
    assert len(now) == 9
    for name, mtime in first.items():
        assert os.path.getmtime(os.path.join(out, name)) == mtime, name
    assert res["n_files"] == 9  # manifest union counts everything

    # resuming again converts nothing new (all committed): files
    # untouched AND the committed set does not change
    from pyarrow import fs as pafs

    from hortacloud_importer_spark.sources import manifest

    before = manifest.committed_files(pafs.LocalFileSystem(), out)
    tiff_octree_to_ktx(
        spark, store, out, block_dims=(8, 8, 8), n_mips=3,
        filter_="arthur", resume=True,
    ).count()
    for name, mtime in first.items():
        assert os.path.getmtime(os.path.join(out, name)) == mtime, name
    assert manifest.committed_files(pafs.LocalFileSystem(), out) == before


def test_ktx_resume_never_opens_committed_source_blocks(spark, store, tmp_path):
    """Resume must be payload-free in fused mode: after converting
    depth 1, CORRUPT those source blocks — a resume that re-read them
    would crash; the path-level anti-join completes and converts only
    the root."""
    import glob as _glob
    import os

    out = str(tmp_path / "resume_pathonly")
    tiff_octree_to_ktx(
        spark, store, out, block_dims=(8, 8, 8), n_mips=3,
        filter_="arthur", depth=1,
    ).count()
    # truncate every depth-1 source file (committed outputs exist)
    for p in _glob.glob(f"{store}/*/default.*.tif"):
        with open(p, "wb") as fh:
            fh.write(b"garbage, not a TIFF")
    try:
        tiff_octree_to_ktx(
            spark, store, out, block_dims=(8, 8, 8), n_mips=3,
            filter_="arthur", resume=True,
        ).count()
        assert len([p for p in os.listdir(out) if p.endswith(".ktx")]) == 9
    finally:
        # the module-scoped store fixture is shared: rebuild it
        import shutil

        shutil.rmtree(store, ignore_errors=True)
        v = synthetic_volume(spark, 16, 16, 16, zero_fraction_mod=5)
        build_octree(
            spark, v, store, nlevels=2, filter_="arthur", dims=(16, 16, 16)
        )


def test_block_file_groups_skip_stray_tif(spark, tmp_path):
    """ADVICE r6: grouped (interleave) mode must apply the same
    default.<n>.tif admission predicate per_channel mode does — a
    stray .tif inside a foreign (manifest-less) store previously
    crashed the fused kernel's channel parse with AttributeError."""
    import shutil

    from hortacloud_importer_spark.pipelines.ktx import (
        _block_file_groups,
        ktx_convert_blocks_fused,
    )
    from hortacloud_importer_spark.sources.tiff import encode_tiff

    root = str(tmp_path / "store")
    v = synthetic_volume(spark, 8, 8, 8, zero_fraction_mod=5)
    build_octree(spark, v, root, nlevels=1, filter_="arthur", dims=(8, 8, 8))
    # make it a foreign store (no manifest -> listing is not filtered
    # by the commit semi-join) and drop in a non-conforming file
    shutil.rmtree(os.path.join(root, "_manifest"))
    stray = os.path.join(root, "notes.tif")
    with open(stray, "wb") as fh:
        fh.write(
            encode_tiff(np.ones((1, 4, 4), dtype=np.uint8))
        )

    groups = _block_file_groups(spark, root)
    all_paths = [p for r in groups.collect() for p in r["paths"]]
    assert all(p.endswith("default.0.tif") for p in all_paths)
    assert not any(p.endswith("notes.tif") for p in all_paths)

    # and the fused conversion over those groups completes
    out = ktx_convert_blocks_fused(
        _block_file_groups(spark, root), n_mips=2, filter_="arthur",
        interleave=True, store_root=root,
    )
    assert out.count() == 1


def test_fused_filegroups_names_offending_path(spark):
    """If a non-conforming path ever reaches the fused kernel (e.g. a
    caller-built group row), the error names the file instead of an
    opaque AttributeError."""
    from pyspark.sql import functions as F

    from hortacloud_importer_spark.pipelines.ktx import (
        ktx_convert_blocks_fused,
    )

    rows = spark.createDataFrame(
        [(0, 0, 0, 0, ["/nowhere/block/custom_name.tif"])],
        "zi int, yi int, xi int, depth int, paths array<string>",
    )
    out = ktx_convert_blocks_fused(
        rows, n_mips=2, filter_="arthur", interleave=True,
        store_root="/nowhere",
    )
    with pytest.raises(Exception, match="default.<channel>.tif"):
        out.count()


def test_ktx_lz4_side_compression_roundtrip(spark, store, tmp_path):
    """A8 option: lz4=True writes LZ4-frame .ktx.lz4 files (the
    reference's LZ4.exe post-pass, ktx_from_rendered_tiff.py:565-583,
    folded into the executor write); decode_ktx reads them
    transparently, and the decoded levels are byte-identical to the
    uncompressed store's."""
    from hortacloud_importer_spark.sources.ktx import ktx_decode_blocks

    plain = _convert(spark, store, tmp_path, True)
    lz = str(tmp_path / "ktx_lz4")
    tiff_octree_to_ktx(
        spark, store, lz, block_dims=(8, 8, 8), n_mips=3,
        filter_="arthur", lz4=True,
    ).count()

    lz_files = sorted(glob.glob(f"{lz}/*.ktx.lz4"))
    assert len(lz_files) == 9 and not glob.glob(f"{lz}/*.ktx")
    # LZ4 frame magic on every side-compressed file
    for p in lz_files:
        with open(p, "rb") as fh:
            assert fh.read(4) == b"\x04\x22\x4d\x18"

    def decoded(root, pattern):
        df = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", pattern)
            .load(root)
            .selectExpr("content as ktx", "path")
        )
        rows = ktx_decode_blocks(df).collect()
        return {
            (r["zi"], r["yi"], r["xi"], r["depth"], r["channel"], r["level"]):
                list(r["voxels"])
            for r in rows
        }

    a = decoded(plain, "*.ktx")
    b = decoded(lz, "*.ktx.lz4")
    assert a == b


def test_ktx_lz4_resume_skips_committed(spark, store, tmp_path):
    """Resume with lz4 on: the anti-join's expected name carries the
    .ktx.lz4 suffix, so committed compressed blocks are skipped."""
    import os

    out = str(tmp_path / "resume_lz4")
    tiff_octree_to_ktx(
        spark, store, out, block_dims=(8, 8, 8), n_mips=3,
        filter_="arthur", depth=1, lz4=True,
    ).count()
    first = {
        p: os.path.getmtime(os.path.join(out, p))
        for p in os.listdir(out)
        if p.endswith(".ktx.lz4")
    }
    assert len(first) == 8
    tiff_octree_to_ktx(
        spark, store, out, block_dims=(8, 8, 8), n_mips=3,
        filter_="arthur", lz4=True, resume=True,
    ).count()
    after = {
        p: os.path.getmtime(os.path.join(out, p))
        for p in os.listdir(out)
        if p.endswith(".ktx.lz4")
    }
    assert len(after) == 9  # root block added
    for p, t in first.items():
        assert after[p] == t  # committed blocks untouched
