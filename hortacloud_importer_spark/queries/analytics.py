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
    driver=False,
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


@register(
    "q_market_share",
    "B+C1+C3+D6+H4",
    driver=False,
    oracle="""
WITH sales AS (
  SELECT CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) AS cents,
         ns.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o    ON l.l_orderkey = o.o_orderkey
  JOIN customer c  ON o.o_custkey = c.c_custkey
  JOIN nation nc   ON c.c_nationkey = nc.n_nationkey
  JOIN region r    ON nc.n_regionkey = r.r_regionkey
  JOIN supplier s  ON l.l_suppkey = s.s_suppkey
  JOIN nation ns   ON s.s_nationkey = ns.n_nationkey
  JOIN part p      ON l.l_partkey = p.p_partkey
  WHERE r.r_name = 'ASIA'
    AND p.p_type = 'PROMO'
    AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_12' THEN cents ELSE 0 END) AS DOUBLE)
             / CAST(SUM(cents) AS DOUBLE), 6) AS mkt_share
FROM sales
GROUP BY o_year
""",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-share composite (TPC-H Q8 shape): nation appears in TWO
    roles (customer side filters the market region; supplier side
    names the share nation), plus a conditional-sum share per year.
    Scale posture: region->nation is broadcast into customer, the
    surviving ASIA customers shuffle-join orders, lineitem joins that
    on l_orderkey; part and supplier->nation are broadcast. Revenue is
    summed in integer cents (bigint) so both engines add exactly; the
    final share is the only float, rounded to 6 dp."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nc = table(spark, sf_dir, "nation").alias("nc")
    ns = table(spark, sf_dir, "nation").alias("ns")
    # customer side: broadcast the tiny region+nation chain into customer,
    # keeping only ASIA customers before any big join
    asia_cust = (
        table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nc.join(r, F.col("nc.n_regionkey") == r["r_regionkey"]).select(
                    F.col("nc.n_nationkey").alias("cnat")
                )
            ),
            F.col("c_nationkey") == F.col("cnat"),
        )
        .select("c_custkey")
    )
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    # supplier side: 10 rows + 25 rows — always broadcast
    supp = F.broadcast(
        table(spark, sf_dir, "supplier")
        .join(ns, F.col("s_nationkey") == F.col("ns.n_nationkey"))
        .select("s_suppkey", F.col("ns.n_name").alias("supp_nation"))
    )
    p = F.broadcast(
        table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    sales = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(asia_cust, o["o_custkey"] == asia_cust["c_custkey"])
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            cents.alias("cents"),
            "supp_nation",
        )
    )
    home = F.sum(
        F.when(F.col("supp_nation") == "NATION_12", F.col("cents")).otherwise(
            F.lit(0).cast("bigint")
        )
    )
    return sales.groupBy("o_year").agg(
        F.round(
            home.cast("double") / F.sum("cents").cast("double"), 6
        ).alias("mkt_share")
    )


@register(
    "q_top_supplier",
    "C1+D13+F3",
    driver=False,
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_cents
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_cents = (SELECT MAX(total_cents) FROM rev)
""",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-supplier composite (TPC-H Q15 shape): an aggregate reused
    twice — once as the join input, once reduced to its global max
    (the scalar-subquery pattern). The 1-row max is cross-broadcast
    back onto the per-supplier revenue, so the second pass over rev
    is a broadcast filter, not a re-aggregation of lineitem; ties all
    surface (no arbitrary pick)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    rev = li.groupBy("l_suppkey").agg(F.sum(cents).alias("total_cents"))
    top = F.broadcast(rev.agg(F.max("total_cents").alias("max_cents")))
    s = table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(top)
        .filter(F.col("total_cents") == F.col("max_cents"))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_cents")
    )


@register(
    "q_cust_order_dist",
    "C5+D1+D4",
    driver=False,
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
)
def q_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-order-count distribution (TPC-H Q13 shape): left outer
    join with a compound ON predicate (the priority filter must live
    in the join condition, not a WHERE, or zero-order customers
    vanish), then a count-of-counts re-aggregation — a histogram over
    an aggregate, the relational dual of D4 over D1. Both groupBys
    shuffle on keys that shrink monotonically (customers -> distinct
    counts), so the second shuffle is tiny at any scale."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))
