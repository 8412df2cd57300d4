"""End-to-end octree build: slice TIFFs -> leaf blocks -> pyramid ->
octree-of-ZLIB-TIFF store with manifest + resume — the reference's
main-program flow (tiff2octree.py:1236-1366) as one composition."""

from __future__ import annotations

import glob
import json

import numpy as np

from hortacloud_importer_spark.sources.tiff import decode_tiff, encode_tiff


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

    man = json.loads((tmp_path / "octree" / "_MANIFEST.json").read_text())
    files = sorted(
        p.split(f"{out}/")[1] for p in glob.glob(f"{out}/**/*.tif", recursive=True)
    )
    assert files == man["files"]
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
    man2 = json.loads((tmp_path / "octree" / "_MANIFEST.json").read_text())
    assert man2["files"] == man["files"]
