"""Driver contract for the spark-graft builder (PySpark target).

Thin view over hortacloud_importer_spark.registry: every operator in
SURVEY.md §2 registers a named query (and, when SQL-expressible, a
DuckDB oracle) there; this module just re-exports them in the
driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hortacloud_importer_spark.registry import driver_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: fused channel-statistics query (SURVEY.md §7.1) at sf0.001."""
    from hortacloud_importer_spark.queries.flagship import channel_stats

    return channel_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Consolidated driver-facing set (≤ 50 entries, scalar-only output
    # columns, every SURVEY §2 row covered). The wider local registry
    # (redundant variants, bench-only probes) stays pytest-verified via
    # hortacloud_importer_spark.registry.all_queries().
    return {name: spec.fn for name, spec in driver_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in driver_queries().items()
        if spec.oracle is not None
    }
