"""Composite analytics (SURVEY.md §2 B+C+D+F composites).

Classic decision-support shapes (shipping-priority, regional-volume)
exercising multi-way joins + filters + aggregates + top-k in one
plan — the "a user of the reference could run every query they run
today, plus ordinary analytics" claim, oracle-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hortacloud_importer_spark.catalog import table
from hortacloud_importer_spark.registry import register


@register(
    "q_ship_priority",
    "B+C1+D+F3",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       o_orderdate_s, o_orderpriority
FROM (
  SELECT l.l_orderkey, l.l_extendedprice, l.l_discount,
         STRFTIME(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_s, o.o_orderpriority
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
    AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
)
GROUP BY l_orderkey, o_orderdate_s, o_orderpriority
ORDER BY revenue_cents DESC, o_orderdate_s, l_orderkey
LIMIT 10
""",
)
def q_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority composite: selective dim filter -> two joins
    -> revenue aggregate -> global top-10 (TakeOrdered). The customer
    side is filtered BEFORE the join, so only matching keys shuffle;
    AQE picks broadcast when the filtered side is small."""
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1995-03-15"
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    joined = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .select(
            "l_orderkey",
            rev.alias("cents"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
            "o_orderpriority",
        )
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate_s", "o_orderpriority").agg(
        F.sum("cents").alias("revenue_cents")
    )
    return (
        agg.orderBy(F.col("revenue_cents").desc(), "o_orderdate_s", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue_cents", "o_orderdate_s", "o_orderpriority")
    )


@register(
    "q_regional_volume",
    "B+C3+C1+D",
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN supplier s ON s.s_nationkey = n.n_nationkey
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
WHERE r.r_name = 'ASIA'
GROUP BY n_name
""",
)
def q_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regional-volume composite: the dim chain region->nation->
    supplier is tiny and broadcasts end-to-end (C3), so the only big
    shuffle is the final per-nation aggregate of lineitem."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    dims = F.broadcast(
        r.join(n, n["n_regionkey"] == r["r_regionkey"]).join(
            s, s["s_nationkey"] == n["n_nationkey"]
        ).select("s_suppkey", "n_name")
    )
    return (
        li.join(dims, li["l_suppkey"] == dims["s_suppkey"])
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue_cents"))
    )
