"""I5: the foreachBatch idempotent sink — re-delivering a batch (the
task-retry / recovery case) must not duplicate output."""

from __future__ import annotations

from pyspark.sql import functions as F

from hortacloud_importer_spark.streaming.windows import idempotent_foreach_batch


def test_batch_redelivery_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "sink")

    def write(df, batch_id):
        # idempotence contract: output is keyed by batch_id and
        # overwritten wholesale on redelivery
        (
            df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .parquet(f"{out}/batch_id={batch_id}")
        )

    sink = idempotent_foreach_batch(write)
    batch0 = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    sink(batch0, 0)
    first = spark.read.parquet(f"{out}/batch_id=0").count()
    # redeliver the SAME batch (simulates recovery after a sink failure)
    sink(batch0, 0)
    sink(batch0, 0)
    assert spark.read.parquet(f"{out}/batch_id=0").count() == first == 100
    # a different batch lands separately
    sink(spark.range(7).select("id", F.lit(0).alias("v")), 1)
    assert spark.read.parquet(f"{out}/batch_id=1").count() == 7
    assert spark.read.parquet(f"{out}/batch_id=0").count() == 100
