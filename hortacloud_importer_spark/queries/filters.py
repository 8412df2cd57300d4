"""§2.B — projections, filters, predicates.

All Catalyst-native: projections prune columns at the parquet scan,
predicates push down to row-group skipping. The reference analogs are
band selection (tiff2octree.py:287), spatial crops (:649), non-empty
checks (:312), and filename pattern filters (:663,:409).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hortacloud_importer_spark.catalog import table
from hortacloud_importer_spark.registry import register


@register(
    "project",
    "B1",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
)
def project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column selection (B1): band read ≡ select; Catalyst prunes the
    scan to exactly these columns (ReadSchema in .explain)."""
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "filter_range",
    "B2",
    oracle="""
SELECT l_orderkey, l_linenumber
FROM lineitem
WHERE l_quantity >= 10 AND l_quantity < 40 AND l_discount >= 0.02 AND l_discount <= 0.08
""",
)
def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive range predicate (B2): spatial crop dual
    (tiff2octree.py:649, 1058)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") < 40)
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.08)
    ).select("l_orderkey", "l_linenumber")


@register(
    "filter_nonzero",
    "B3",
    oracle="SELECT COUNT(*) AS n FROM lineitem WHERE l_discount > 0",
)
def filter_nonzero(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-empty predicate (B3): `img_data.max() > 0` skip
    (tiff2octree.py:312) as a row filter."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_discount") > 0).agg(F.count("*").alias("n"))


@register(
    "filter_like",
    "B4",
    oracle="""
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_type LIKE '%BRASS%' OR regexp_matches(p_name, '^[a-f]')
""",
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern filters (B4): endswith/glob/regex filename matching
    (tiff2octree.py:663, 409, 471-472) ≡ LIKE / rlike."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%BRASS%") | F.col("p_name").rlike("^[a-f]")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "clamp",
    "B5",
    oracle="""
SELECT l_orderkey, l_linenumber,
       LEAST(GREATEST(l_extendedprice, 1000.0), 50000.0) AS clamped
FROM lineitem
""",
)
def clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamp expressions (B5): white/black level clamps
    (ktx_from_rendered_tiff.py:354-365, 513-527) ≡ least/greatest."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.least(F.greatest("l_extendedprice", F.lit(1000.0)), F.lit(50000.0)).alias(
            "clamped"
        ),
    )


@register(
    "filter_in",
    "B6",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n
FROM orders
WHERE o_orderstatus IN ('F', 'P') AND o_orderpriority <> '5-LOW'
GROUP BY 1
""",
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / <> predicates (B6)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderstatus").isin("F", "P")
            & (F.col("o_orderpriority") != "5-LOW")
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


@register(
    "filter_null",
    "B6",
    oracle="""
SELECT COUNT(CASE WHEN NULLIF(l_discount, 0) IS NULL THEN 1 END) AS n_null,
       COUNT(NULLIF(l_discount, 0)) AS n_nonzero
FROM lineitem WHERE NULLIF(l_discount, 0) IS NULL OR l_discount > 0
""",
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL + zero-is-NULL boundary (B6/§1.2): nullif(x, 0) at the
    ingest boundary gives the reference's "zero means no data" Spark
    null semantics for free (ktx/util.py:151-153)."""
    li = table(spark, sf_dir, "lineitem").withColumn(
        "nz", F.nullif(F.col("l_discount"), F.lit(0))
    )
    return li.filter(F.col("nz").isNull() | (F.col("l_discount") > 0)).agg(
        F.count(F.when(F.col("nz").isNull(), True)).alias("n_null"),
        F.count("nz").alias("n_nonzero"),
    )
