"""§2.G — set operations.

Reference analogs: multi-dir input unions (tiff2octree.py:1204,
1282-1287) and the resume difference "all blocks minus existing"
(tiff2octree.py:359-368, 399-403).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hortacloud_importer_spark.catalog import table
from hortacloud_importer_spark.operators.exactness import sum_money, sum_money_sql
from hortacloud_importer_spark.registry import register


@register(
    "set_union",
    "G1",
    driver=False,
    oracle=f"""
SELECT l_linestatus, COUNT(*) AS n, {sum_money_sql("l_extendedprice", "revenue")}
FROM (
  SELECT l_linestatus, l_extendedprice FROM lineitem WHERE l_orderkey % 2 = 0
  UNION ALL
  SELECT l_linestatus, l_extendedprice FROM lineitem WHERE l_orderkey % 2 = 1
) GROUP BY 1
""",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (G1): two input partitions re-unioned (Spark union ==
    bag semantics, no dedup shuffle)."""
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") % 2 == 0).select("l_linestatus", "l_extendedprice")
    b = li.filter(F.col("l_orderkey") % 2 == 1).select("l_linestatus", "l_extendedprice")
    return (
        a.unionByName(b)
        .groupBy("l_linestatus")
        .agg(F.count("*").alias("n"), sum_money("l_extendedprice", "revenue"))
    )


@register(
    "set_except",
    "G2",
    driver=False,
    oracle="""
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (G2): the resume difference — full work-list minus
    completed outputs. Distinct semantics (like SQL EXCEPT); the
    anti-join variant is C4."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return c.select("c_custkey").subtract(
        o.select(F.col("o_custkey").alias("c_custkey"))
    )


@register(
    "set_intersect",
    "G3",
    driver=False,
    oracle="""
SELECT c_custkey FROM customer
INTERSECT
SELECT o_custkey AS c_custkey FROM orders
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (G3): customers that did order."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return c.select("c_custkey").intersect(
        o.select(F.col("o_custkey").alias("c_custkey"))
    )


@register(
    "set_ops",
    "G1+G2+G3",
    oracle=f"""
SELECT 'union:' || l_linestatus AS facet, COUNT(*) AS a,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS b
FROM (
  SELECT l_linestatus, l_extendedprice FROM lineitem WHERE l_orderkey % 2 = 0
  UNION ALL
  SELECT l_linestatus, l_extendedprice FROM lineitem WHERE l_orderkey % 2 = 1
) GROUP BY 1
UNION ALL
SELECT 'except' AS facet, COUNT(*) AS a, CAST(CAST(SUM(c_custkey) AS BIGINT) AS DOUBLE) AS b
FROM (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)
UNION ALL
SELECT 'intersect' AS facet, COUNT(*) AS a, CAST(CAST(SUM(c_custkey) AS BIGINT) AS DOUBLE) AS b
FROM (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)
""",
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated G-family driver query, union-with-tag: `union:*` =
    UNION ALL re-merge of two input splits (G1, bag semantics — no
    dedup shuffle), `except` = resume difference work-list minus
    completed (G2, distinct semantics), `intersect` = customers that
    did order (G3). Except/intersect facets reduce to (count, key-sum)
    so the schema is uniformly scalar. The standalone variants stay
    registered driver=False."""
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") % 2 == 0).select("l_linestatus", "l_extendedprice")
    b = li.filter(F.col("l_orderkey") % 2 == 1).select("l_linestatus", "l_extendedprice")
    union_f = (
        a.unionByName(b)
        .groupBy("l_linestatus")
        .agg(F.count("*").alias("a"), sum_money("l_extendedprice", "b"))
        .select(
            F.concat(F.lit("union:"), "l_linestatus").alias("facet"), "a", "b"
        )
    )
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    keys_c = c.select("c_custkey")
    keys_o = o.select(F.col("o_custkey").alias("c_custkey"))
    exc = keys_c.subtract(keys_o).agg(
        F.count("*").alias("a"), F.sum("c_custkey").cast("double").alias("b")
    ).select(F.lit("except").alias("facet"), "a", "b")
    inter = keys_c.intersect(keys_o).agg(
        F.count("*").alias("a"), F.sum("c_custkey").cast("double").alias("b")
    ).select(F.lit("intersect").alias("facet"), "a", "b")
    return union_f.unionByName(exc).unionByName(inter)
