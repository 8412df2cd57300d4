"""§2.E/F — window functions, sorts, top-k.

Reference analogs: the percentile CDF walk is an ordered cumulative
sum (ktx_from_rendered_tiff.py:458-470), the mipmap z-cascade is a
sliding 3-row frame (:262-296), and 2nd-max is a rank-within-group
(ktx/util.py:165-171). Every window here is partitioned by a key —
at 100 TB an unpartitioned window would serialize onto one task, so
the one intentionally-global example (sort_rownum) documents that
caveat and keys the frame where possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hortacloud_importer_spark.catalog import table
from hortacloud_importer_spark.operators.exactness import cents
from hortacloud_importer_spark.registry import register


@register(
    "win_cumsum",
    "E1",
    driver=False,
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT)
       / 100.0 AS running_total
FROM orders
""",
)
def win_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered cumulative sum (E1): the CDF accumulation
    (ktx_from_rendered_tiff.py:458-470) as a running total per
    customer. Cents-exact; orderkey tiebreak makes the frame
    deterministic."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents("o_totalprice")).over(w) / F.lit(100.0)).alias("running_total"),
    )


@register(
    "win_sliding",
    "E2",
    oracle="""
SELECT user_id, event_id,
       (CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
             OVER w AS BIGINT) / 100.0) / COUNT(*) OVER w AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
)
def win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 3-row frame (E2): the mipmap z-cascade's ≤3-slice deque
    (ktx_from_rendered_tiff.py:262-296) ≡ rowsBetween(-2, 0)."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    mavg = (F.sum(cents("value")).over(w) / F.lit(100.0)) / F.count("*").over(w)
    return e.select("user_id", "event_id", mavg.alias("moving_avg"))


@register(
    "win_rank",
    "E3",
    driver=False,
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice AS price
FROM (
  SELECT l_orderkey, l_linenumber, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC, l_linenumber) AS rn
  FROM lineitem
) WHERE rn = 2
""",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank within group (E3): sorted-subvoxel indexing [-2]
    (ktx/util.py:165-171) ≡ row_number = 2 per group."""
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), "l_linenumber"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 2)
        .select("l_orderkey", "l_linenumber", F.col("l_extendedprice").alias("price"))
    )


@register(
    "win_lag",
    "E4",
    driver=False,
    oracle="""
SELECT user_id, event_id,
       value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta,
       LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
       FIRST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_event
FROM events
""",
)
def win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value (E4): consecutive-slice deltas. Same-
    operand double subtraction is IEEE-exact in both engines."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_id").over(w).alias("first_event"),
    )


@register(
    "win_ntile",
    "E4",
    driver=False,
    oracle="""
SELECT tile, COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
FROM (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
  FROM orders
) GROUP BY 1
""",
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile (E4): percentile bucketing — the dual of D5's quantile
    vector, in the scale-safe form: no `NTILE OVER (ORDER BY ...)`
    global window ever sees the table. Row numbers come from the
    two-pass range-partition pattern (operators/rownum.py) and the
    tile from the closed-form NTILE mapping — same plan shape as
    sort_rownum, asserted in tests/test_plans.py."""
    from hortacloud_importer_spark.operators.rownum import (
        global_row_numbers,
        ntile_from_rownum,
    )

    o = table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    numbered = global_row_numbers(o, ["o_totalprice", "o_orderkey"], npartitions=32)
    n_total = o.agg(F.count("*").alias("_total"))
    return (
        numbered.join(F.broadcast(n_total))
        .select(
            "o_totalprice",
            ntile_from_rownum(F.col("rn"), F.col("_total"), 10).alias("tile"),
        )
        .groupBy("tile")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@register(
    "sort_global",
    "F1",
    oracle="""
SELECT n_name, n_regionkey,
       ROW_NUMBER() OVER (ORDER BY n_regionkey, n_name) AS rank
FROM nation
""",
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort (F1): intra-group value sort (ktx/util.py:165).
    The rank column materializes the order so the order-insensitive
    hash still verifies it. Spark's orderBy is a range-partitioned
    distributed sort — scales; row_number needs the single-partition
    window only because we materialize the rank, dim-sized here."""
    n = table(spark, sf_dir, "nation")
    w = Window.orderBy("n_regionkey", "n_name")
    return n.select("n_name", "n_regionkey", F.row_number().over(w).alias("rank"))


@register(
    "sort_rownum",
    "F2+E4",
    oracle="""
SELECT event_id,
       ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
       NTILE(10) OVER (ORDER BY ts, event_id) AS tile
FROM events
""",
)
def sort_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered row numbering (F2) + exact global NTILE (E4), both in
    the scale-safe form: z-order assignment from sorted file lists
    (tiff2octree.py:1034) as the two-pass zipWithIndex pattern —
    range-partition on the key, per-partition counts prefix-summed
    into offsets, local row_number + offset (operators/rownum.py).
    The tile comes from the closed-form NTILE mapping over rn and the
    broadcast total count — no `OVER (ORDER BY ...)` window ever sees
    the fact table; tests/test_plans.py asserts the scan side feeds no
    Exchange SinglePartition."""
    from hortacloud_importer_spark.operators.rownum import (
        global_row_numbers,
        ntile_from_rownum,
    )

    e = table(spark, sf_dir, "events").select("event_id", "ts")
    numbered = global_row_numbers(e, ["ts", "event_id"], npartitions=32)
    n_total = e.agg(F.count("*").alias("_total"))
    return (
        numbered.join(F.broadcast(n_total))
        .select(
            "event_id",
            "rn",
            ntile_from_rownum(F.col("rn"), F.col("_total"), 10).alias("tile"),
        )
    )


@register(
    "topk",
    "F3",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (F3): 2nd-max generalizes to top-k
    (tiff2octree.py:240-241). Window row_number ≤ k — Spark pushes a
    per-partition top-k (WindowGroupLimit) before the shuffle."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "limit_k",
    "F3",
    driver=False,
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
)
def limit_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (F3): orderBy().limit(k) compiles to TakeOrdered —
    per-partition heaps + driver merge of k rows, never a full sort."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "win_denserank",
    "E4",
    driver=False,
    oracle="""
SELECT l_orderkey, l_linenumber,
       DENSE_RANK() OVER (PARTITION BY l_orderkey
                          ORDER BY l_quantity DESC, l_linenumber) AS drnk
FROM lineitem WHERE l_orderkey % 50 = 0
""",
)
def win_denserank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank (E4): rank without gaps per order by quantity."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_quantity").desc(), "l_linenumber"
    )
    return li.select(
        "l_orderkey", "l_linenumber", F.dense_rank().over(w).alias("drnk")
    )


@register(
    "win_firstlast",
    "E4",
    driver=False,
    oracle="""
SELECT l_orderkey, l_linenumber,
       FIRST_VALUE(l_quantity) OVER w AS first_qty,
       LAST_VALUE(l_quantity) OVER w AS last_qty
FROM lineitem
WHERE l_orderkey % 50 = 0
WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def win_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value (E4) over the full partition frame (the
    default growing frame makes last_value useless — the explicit
    unbounded frame is the portable form)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_quantity").over(w).alias("first_qty"),
        F.last("l_quantity").over(w).alias("last_qty"),
    )


@register(
    "win_suite",
    "E3+E4",
    oracle="""
SELECT user_id, event_id,
       ROW_NUMBER() OVER w_ts AS rn,
       RANK() OVER w_val AS rnk,
       DENSE_RANK() OVER w_val AS drnk,
       NTILE(4) OVER w_ts AS tile,
       value - LAG(value) OVER w_ts AS delta,
       LEAD(event_type) OVER w_ts AS next_type,
       FIRST_VALUE(event_id) OVER w_ts AS first_event,
       LAST_VALUE(event_id) OVER w_full AS last_event
FROM events
WINDOW w_ts AS (PARTITION BY user_id ORDER BY ts, event_id),
       w_val AS (PARTITION BY user_id ORDER BY value DESC),
       w_full AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def win_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated E3+E4 driver query: the full ranking-function
    surface (row_number/rank/dense_rank/ntile/lag/lead/first/last)
    in ONE window pass per user. All window specs share the partition
    key, so Catalyst plans a single hash exchange on user_id and sorts
    within it (two sort orders -> two local sorts, zero extra
    shuffles). ntile here is per-partition (bounded groups); the
    scale-safe GLOBAL ntile is sort_rownum's closed-form path.
    rank/dense_rank order by value alone — ties share a rank, which is
    deterministic output even though intra-tie row order isn't.
    The single-function variants stay registered driver=False."""
    e = table(spark, sf_dir, "events")
    w_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_val = Window.partitionBy("user_id").orderBy(F.col("value").desc())
    w_full = w_ts.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        F.row_number().over(w_ts).alias("rn"),
        F.rank().over(w_val).alias("rnk"),
        F.dense_rank().over(w_val).alias("drnk"),
        F.ntile(4).over(w_ts).alias("tile"),
        (F.col("value") - F.lag("value").over(w_ts)).alias("delta"),
        F.lead("event_type").over(w_ts).alias("next_type"),
        F.first("event_id").over(w_ts).alias("first_event"),
        F.last("event_id").over(w_full).alias("last_event"),
    )
