"""Bucketed (co-located) tables for shuffle-free joins (§4 O6/O7).

The reference co-locates work by construction: every octree block's
inputs are read directly from its own files, so its "joins" (channel
zip C1, parent-child C2) never move data between workers
(tiff2octree.py:407-431). On Spark the equivalent storage contract is
hash bucketing: two tables bucketed by the same key into the same
bucket count join WITHOUT a shuffle on either side — at 100 TB this
turns the biggest recurring cost of fact-fact joins into a map-side
zip. Verified by tests/test_bucketed.py asserting the physical plan
has zero Exchange operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: list[str],
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and sorted) by ``keys``. Sorting
    within buckets additionally lets sort-merge join skip its sort."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left: str, right: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables — Catalyst sees matching
    output partitionings and plans SMJ with no Exchange."""
    return spark.table(left).join(spark.table(right), on=on, how=how)
