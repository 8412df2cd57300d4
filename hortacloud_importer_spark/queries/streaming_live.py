"""§2.I1/I2 — live Structured Streaming registrations (rows-only).

Unlike the batch duals in streaming_duals.py, this runs a REAL
streaming query (file source -> applyInPandasWithState -> memory
sink, availableNow trigger) inside the registry entry, so the driver
gate exercises the stateful path itself. Level-by-level equality with
the batch pyramid is asserted in tests/test_streaming.py.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hortacloud_importer_spark.registry import register


@register("stream_cascade", "I1+I2", oracle=None)
def stream_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I2 rows-only: synthetic slices streamed through the bounded-
    state mipmap cascade; returns per-level slice/voxel accounting.
    Deterministic input -> deterministic output rows."""
    from hortacloud_importer_spark.streaming.cascade import streaming_cascade
    from hortacloud_importer_spark.volume import synthetic_volume

    # 4^3: small enough that the correctness sweep pays for the
    # streaming-machinery overhead only once, not for data volume
    # (the full-size cascade is covered by tests/test_streaming.py)
    dims = (4, 4, 4)
    v = synthetic_volume(spark, *dims, channels=1)
    slices = (
        v.groupBy("z")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        ((F.col("y") * dims[2]) + F.col("x")).cast("long").alias("k"),
                        F.col("intensity").cast("long").alias("v"),
                    )
                )
            ).alias("kv")
        )
        .select(
            F.lit(0).alias("zi"),
            F.lit(0).alias("yi"),
            F.lit(0).alias("xi"),
            F.lit(0).alias("channel"),
            "z",
            F.lit(dims[1]).alias("height"),
            F.lit(dims[2]).alias("width"),
            F.transform("kv", lambda s: s["v"]).alias("voxels"),
        )
    )
    workdir = tempfile.mkdtemp(prefix="stream_cascade_")
    slices.coalesce(1).write.parquet(f"{workdir}/in")
    stream = spark.readStream.schema(slices.schema).parquet(f"{workdir}/in")
    sink = f"stream_cascade_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_cascade(stream, dims, "arthur")
        .writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", f"{workdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(sink).groupBy("level").agg(
        F.count("*").alias("n_slices"),
        F.sum(F.aggregate("voxels", F.lit(0).cast("bigint"), lambda a, b: a + b)).alias(
            "voxel_sum"
        ),
    )
