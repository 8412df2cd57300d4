"""Commit/resume contract of the dataloader shard-index store
(pipelines/shard_store.py — round-13 ask #6): resume writes only
missing shards, uncommitted leftovers are inert to readers, files
carry the within-shard read order, and the store's accounting matches
the in-memory corpus_shard deal."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hortacloud_importer_spark.pipelines.shard_store import (
    read_shard_store,
    shard_index,
    write_shard_store,
)


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    return shard_index(spark, sf_dir).cache()


def test_write_then_resume_writes_only_missing_shards(
    spark, sf_dir, index, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("store_resume") / "store")
    first = write_shard_store(
        spark, index.filter(F.col("shard") < 3), root
    )
    assert sorted(r["shard"] for r in first) == [0, 1, 2]

    second = write_shard_store(spark, index, root)
    assert sorted(r["shard"] for r in second) == [3, 4, 5, 6, 7]

    # fully committed: a third run is a no-op (and appends no files)
    assert write_shard_store(spark, index, root) == []

    back = read_shard_store(spark, root)
    assert back.count() == index.count()
    assert sorted(
        r["shard"] for r in back.select("shard").distinct().collect()
    ) == list(range(8))


def test_uncommitted_leftover_is_inert(spark, index, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("store_stray") / "store")
    write_shard_store(spark, index, root)
    # a killed writer's stray file: right name, right schema, NO
    # manifest entry — the read-back must not surface it as data
    stray_dir = os.path.join(root, "shard=99")
    os.makedirs(stray_dir)
    one = pq.read_table(os.path.join(root, "shard=0", "index.parquet"))
    pq.write_table(one, os.path.join(stray_dir, "index.parquet"))

    back = read_shard_store(spark, root)
    shards = {r["shard"] for r in back.select("shard").distinct().collect()}
    assert 99 not in shards
    assert shards == set(range(8))


def test_files_carry_within_shard_read_order(
    spark, index, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("store_order") / "store")
    write_shard_store(spark, index, root)
    t = pq.read_table(os.path.join(root, "shard=0", "index.parquet"))
    rows = list(
        zip(
            t.column("u").to_pylist(),
            t.column("seq_id").to_pylist(),
            t.column("seq_off").to_pylist(),
        )
    )
    assert rows == sorted(rows)
    assert len(rows) > 0


def test_store_accounting_matches_corpus_shard(
    spark, sf_dir, index, tmp_path_factory
):
    from hortacloud_importer_spark.queries.dedup import corpus_shard

    root = str(tmp_path_factory.mktemp("store_acct") / "store")
    write_shard_store(spark, index, root)
    got = {
        r["shard"]: r["shard_tokens"]
        for r in read_shard_store(spark, root)
        .groupBy("shard")
        .agg(F.sum("n_tok").alias("shard_tokens"))
        .collect()
    }
    want = {
        r["shard"]: r["shard_tokens"]
        for r in corpus_shard(spark, sf_dir).collect()
    }
    assert got == want


def test_read_without_manifest_refuses(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("store_nomani") / "store")
    os.makedirs(root)
    with pytest.raises(FileNotFoundError):
        read_shard_store(spark, root)
