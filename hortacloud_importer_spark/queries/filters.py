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
    "filter_project_clamp",
    "B1+B2+B3+B4+B5+B6",
    oracle="""
SELECT p_partkey, p_name,
       LEAST(GREATEST(p_retailprice, 1000.0), 1500.0) AS clamped,
       COALESCE(NULLIF(p_size % 5, 0), -1) AS size_mod_nz
FROM part
WHERE p_retailprice >= 950.0 AND p_retailprice < 1800.0
  AND p_size > 0
  AND (p_type LIKE '%BRASS%' OR regexp_matches(p_name, '^[a-f]'))
  AND p_size IN (1, 2, 3, 5, 8, 13, 21, 34)
""",
)
def filter_project_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated B-family driver query: column projection (B1), a
    conjunctive range predicate (B2, spatial-crop dual), non-zero check
    (B3, `img_data.max() > 0` as a filter), LIKE/regex pattern match
    (B4, filename filters), clamp projection (B5, white/black levels),
    and IN + zero-is-NULL boundary predicates (B6) — one scan, every
    predicate pushed to the parquet reader. The single-op variants stay
    registered driver=False for plan/pushdown tests."""
    p = table(spark, sf_dir, "part")
    return (
        p.filter(
            (F.col("p_retailprice") >= 950.0)
            & (F.col("p_retailprice") < 1800.0)
            & (F.col("p_size") > 0)
            & (
                F.col("p_type").like("%BRASS%")
                | F.col("p_name").rlike("^[a-f]")
            )
            & F.col("p_size").isin(1, 2, 3, 5, 8, 13, 21, 34)
        )
        .select(
            "p_partkey",
            "p_name",
            F.least(
                F.greatest("p_retailprice", F.lit(1000.0)), F.lit(1500.0)
            ).alias("clamped"),
            F.coalesce(
                F.nullif(F.col("p_size") % 5, F.lit(0)), F.lit(-1)
            ).alias("size_mod_nz"),
        )
    )


@register(
    "project",
    "B1",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    driver=False,
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
driver=False,
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
driver=False,
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
driver=False,
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
driver=False,
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
driver=False,
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
driver=False,
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
