"""Watermarked window aggregations + idempotent sink (§2.I3/I4/I5).

These run identically over batch and streaming DataFrames (the batch
duals are the oracle-checked ``stream_*`` queries in
queries/streaming_duals.py); on a streaming input the watermark bounds
state, which is the Spark analog of the reference's strictly-ordered,
bounded-deque stream (ktx_from_rendered_tiff.py:262-265 keeps <= 3
slices because its input arrives in z order — a watermark is how you
state that same ordering promise when arrival order is only
approximately sorted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame,
    duration: str = "1 hour",
    watermark: str | None = "10 minutes",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """I3: tumbling count/sum per window (the 2-slices -> 1 reduction
    generalized to time; ktx_from_rendered_tiff.py:269-296)."""
    df = events.withWatermark(ts, watermark) if watermark and events.isStreaming else events
    return df.groupBy(F.window(ts, duration).alias("win")).agg(
        F.count("*").alias("n"), F.sum(value).alias("total")
    )


def sliding_agg(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str | None = "10 minutes",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """I4: sliding window — each event lands in duration/slide windows."""
    df = events.withWatermark(ts, watermark) if watermark and events.isStreaming else events
    return df.groupBy(F.window(ts, duration, slide).alias("win")).agg(
        F.count("*").alias("n"), F.avg(value).alias("avg_value")
    )


def session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "10 minutes",
    ts: str = "ts",
    key: str = "user_id",
    value: str = "value",
) -> DataFrame:
    """I4: session window with inactivity gap, keyed."""
    df = events.withWatermark(ts, watermark) if watermark and events.isStreaming else events
    return df.groupBy(
        F.col(key), F.session_window(ts, gap).alias("win")
    ).agg(F.count("*").alias("n"), F.sum(value).alias("total"))


def idempotent_foreach_batch(write_fn):
    """I5: exactly-once-style sink — the reference's marker/sentinel
    resume files (tiff2octree.py:1328-1355) become checkpointed batch
    ids; ``write_fn(df, batch_id)`` must be idempotent per batch_id
    (e.g. overwrite a batch_id-derived partition)."""

    def _apply(df: DataFrame, batch_id: int) -> None:
        write_fn(df, batch_id)

    return _apply


def streaming_dedup(
    docs: DataFrame,
    watermark: str = "1 hour",
    ts: str = "ts",
    text: str = "text",
) -> DataFrame:
    """K1 as a streaming operator (I5-adjacent): exact dedup over a
    document stream — first arrival of each content fingerprint wins,
    re-crawls within the watermark horizon are dropped.
    ``dropDuplicatesWithinWatermark`` bounds the fingerprint state the
    same way the reference's resume set bounds re-work: state holds
    only fingerprints younger than the watermark, so executor memory
    is O(recent window), never O(corpus). Exactly-once-per-fingerprint
    beyond the horizon needs the batch K1 pass (dedup_exact) — the
    standard streaming-ingest + periodic-compaction split."""
    out = docs.withColumn("fp", F.md5(text))
    if docs.isStreaming:
        return out.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(["fp"])
    return out.dropDuplicates(["fp"])
