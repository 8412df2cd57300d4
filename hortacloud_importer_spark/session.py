"""SparkSession factory for local testing and benchmarking.

The production deployment would submit against a real cluster; the
settings here mirror what we'd set cluster-side: AQE on (runtime
re-planning, skew-join handling, partition coalescing), Arrow on
(vectorized pandas UDF transfer), and shuffle partitions sized to the
available parallelism rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hortacloud-importer-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource readers (sources/datasource.py) prune chunk
        # partitions from pushed z/y/x range filters
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            cpus if cpus != "*" else str(os.cpu_count() or 8),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
