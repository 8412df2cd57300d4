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


# Engine-neutral deterministic 4^3 volume: pure integer arithmetic on
# the coordinates (no xxhash64, which DuckDB cannot reproduce), with
# every coordinate-sum divisible by 5 forced to zero so the cascade's
# zero-is-NULL fallback is exercised. The SAME expression appears in
# the oracle SQL below, so input volumes are bit-identical.
_A, _B, _C = 73856093, 19349663, 83492791


def _portable_volume(spark: SparkSession, dims) -> DataFrame:
    dz, dy, dx = dims
    df = spark.range(dz * dy * dx)
    x = (F.col("id") % dx).cast("long")
    y = (F.floor(F.col("id") / dx) % dy).cast("long")
    z = F.floor(F.col("id") / (dx * dy)).cast("long")
    s = z * F.lit(_A) + y * F.lit(_B) + x * F.lit(_C)
    v = F.when(s % 5 == 0, F.lit(0).cast("long")).otherwise(s % 65535)
    return df.select(
        z.cast("int").alias("z"),
        y.cast("int").alias("y"),
        x.cast("int").alias("x"),
        v.alias("intensity"),
    )


# DuckDB mirror of the bounded-state cascade's arithmetic for even
# dims: each level-k voxel is the arthur reduction (2nd-largest incl.
# zeros, zero falling back to the largest — ktx/util.py:164-171 /
# streaming/cascade.py::_reduce) of its 2x2x2 parents. The streaming
# query emits levels 1..2 for a 4^3 block; the oracle reproduces the
# per-level slice count and voxel sum the query returns.
_ARTHUR = "COALESCE(NULLIF(arr[2], 0), arr[1], 0)"
_STREAM_CASCADE_SQL = f"""
WITH g AS (
  SELECT z.range AS z, y.range AS y, x.range AS x,
         CAST(z.range * {_A} + y.range * {_B} + x.range * {_C} AS BIGINT) AS s
  FROM range(4) z, range(4) y, range(4) x
),
l0 AS (
  SELECT z, y, x, CASE WHEN s % 5 = 0 THEN 0 ELSE s % 65535 END AS v FROM g
),
l1 AS (
  SELECT z, y, x, {_ARTHUR} AS v FROM (
    SELECT z // 2 AS z, y // 2 AS y, x // 2 AS x,
           list(v ORDER BY v DESC) AS arr
    FROM l0 GROUP BY 1, 2, 3)
),
l2 AS (
  SELECT z, y, x, {_ARTHUR} AS v FROM (
    SELECT z // 2 AS z, y // 2 AS y, x // 2 AS x,
           list(v ORDER BY v DESC) AS arr
    FROM l1 GROUP BY 1, 2, 3)
)
SELECT CAST(1 AS INT) AS level, COUNT(DISTINCT z) AS n_slices,
       CAST(SUM(v) AS BIGINT) AS voxel_sum
FROM l1
UNION ALL
SELECT CAST(2 AS INT) AS level, COUNT(DISTINCT z) AS n_slices,
       CAST(SUM(v) AS BIGINT) AS voxel_sum
FROM l2
"""


@register("stream_cascade", "I1+I2", oracle=_STREAM_CASCADE_SQL)
def stream_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I2, oracle-checked: engine-neutral deterministic slices streamed
    through the REAL bounded-state mipmap cascade
    (applyInPandasWithState); the DuckDB oracle mirrors the cascade
    arithmetic level by level (arthur kernel over 2x2x2 parents) and
    must reproduce the per-level slice/voxel accounting exactly. The
    stateful path itself is unchanged — only the input volume is
    generated with portable arithmetic instead of xxhash64."""
    from hortacloud_importer_spark.streaming.cascade import streaming_cascade

    # 4^3: small enough that the correctness sweep pays for the
    # streaming-machinery overhead only once, not for data volume
    # (the full-size cascade is covered by tests/test_streaming.py)
    dims = (4, 4, 4)
    v = _portable_volume(spark, dims)
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
