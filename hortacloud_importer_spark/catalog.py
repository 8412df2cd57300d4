"""Fixture-table catalog.

Mirrors the reference's "source discovery" responsibilities
(tiff2octree.py:653-691 infers schema from the first input file;
spark.read.parquet does the same from parquet footers). One loader per
driver-generated table; schemas are inferred from parquet metadata —
never hand-declared, matching the reference's infer-then-freeze policy
(SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; have {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(table(spark, sf_dir, n) for n in names)
