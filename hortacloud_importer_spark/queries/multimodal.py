"""§2.K4 — multimodal query registrations.

The decode/feature kernels are rows-only (binary payloads aren't
SQL-comparable), but the byte-length accounting over real fixture
data IS oracle-checked, which pins down the payload plumbing
(documents.text -> binary -> Arrow batch -> decode -> stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hortacloud_importer_spark.catalog import table
from hortacloud_importer_spark.operators.multimodal import (
    media_features,
    resize_images,
    sample_frames,
    synthetic_media,
)
from hortacloud_importer_spark.registry import register


def _doc_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as raw8 'audio' payloads (1 x n_bytes x 1)."""
    # the fixture is one small parquet file -> one input split -> one
    # Python worker; spread the Arrow batches across workers before the
    # decode kernel (at real scale the source has many splits and this
    # repartition is unnecessary — splits already parallelize)
    d = table(spark, sf_dir, "documents").repartition(16, "doc_id")
    payload = F.encode("text", "UTF-8")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.lit("raw8").alias("format"),
        payload.alias("payload"),
        F.struct(
            F.lit(1).alias("height"),
            F.octet_length(payload).cast("int").alias("width"),
            F.lit(1).alias("channels"),
            F.lit(8000).alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ).alias("meta"),
    )


@register(
    "mm_doc_bytes",
    "K4",
    oracle="""
SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes
FROM documents
""",
)
def mm_doc_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 payload plumbing, oracle-checked: text -> binary column ->
    mapInPandas decode -> per-item byte count must equal DuckDB's
    octet_length."""
    return media_features(_doc_media(spark, sf_dir)).select("media_id", "n_bytes")


@register("mm_doc_features", "K4", oracle=None, driver=False)
def mm_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 rows-only: full feature extraction (intensity stats + 16-bin
    histogram) over fixture-derived payloads."""
    return media_features(_doc_media(spark, sf_dir))


@register("mm_resize_features", "K4", oracle=None, driver=False)
def mm_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 rows-only: synthetic raw8 images -> nearest-neighbor resize
    to 8x8 -> features; exercises the compose-by-schema pipeline."""
    media = synthetic_media(spark, 64, "image")
    return media_features(resize_images(media, 8, 8))


@register("mm_frame_sample", "K4", oracle=None, driver=False)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 rows-only: video frame sampling (every 2nd frame) -> per-
    frame features (the 1->N explode dual, J4)."""
    media = synthetic_media(spark, 16, "video")
    return media_features(sample_frames(media, 2))


def _feat_tagged(df: DataFrame, facet: str) -> DataFrame:
    """FEATURES_SCHEMA -> scalar-only driver schema (hist16 -> CSV)."""
    return df.select(
        F.lit(facet).alias("facet"),
        "media_id",
        "n_bytes",
        "mean_intensity",
        "min_intensity",
        "max_intensity",
        F.array_join(F.transform("hist16", lambda v: v.cast("string")), ",").alias(
            "hist16_csv"
        ),
    )


@register("mm_features", "K4", oracle=None, driver=False)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated K4 query (local registry; K4's driver evidence is
    mm_doc_bytes hash-green plus scan_tiff_stack, which drives the
    same media_features operator oracle-exact), union-with-tag:
    `doc` = full feature extraction over fixture-derived raw8
    payloads; `resize` = synthetic images -> nearest-neighbor 8x8
    resize -> features (compose-by-schema); `frames` = video frame
    sampling (every 2nd frame) -> per-frame features (the 1->N
    explode dual, J4). The 16-bin histogram is serialized to CSV so
    every output column is a scalar the external canonicalizer can
    hash. Standalone variants stay registered driver=False."""
    doc = _feat_tagged(media_features(_doc_media(spark, sf_dir)), "doc")
    rs = _feat_tagged(
        media_features(resize_images(synthetic_media(spark, 64, "image"), 8, 8)),
        "resize",
    )
    fr = _feat_tagged(
        media_features(sample_frames(synthetic_media(spark, 16, "video"), 2)),
        "frames",
    )
    return doc.unionByName(rs).unionByName(fr)
