"""§2.D — aggregations.

The reference's reductions are the 2×2×2 spatial-window downsamples
(mean/max/2nd-max, tiff2octree.py:237-256; ktx/util.py:149-180), the
65,536-bin histogram (small_memory_histogram.py:17-40), and the
statistics that feed requantization (ktx_from_rendered_tiff.py:433-530).
Each is one Catalyst hash-aggregate here: partial (map-side) + final
aggregation is the engine-native version of the reference's
"per-page partials merged with +=".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hortacloud_importer_spark.catalog import table
from hortacloud_importer_spark.operators.exactness import (
    avg_money,
    avg_money_sql,
    cents,
    stats_money,
    stats_money_sql,
    sum_money,
    sum_money_sql,
)
from hortacloud_importer_spark.registry import register


@register(
    "agg_mean",
    "D1",
    driver=False,
    oracle=f"""
SELECT l_orderkey // 100 AS grp, COUNT(*) AS n, {avg_money_sql("l_quantity", "mean_qty")}
FROM lineitem GROUP BY 1
""",
)
def agg_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window mean (D1): downscale_local_mean over 2×2×2
    subvoxels (tiff2octree.py:253-256) ≡ groupBy(derived key).avg —
    here the key is a coarsened orderkey, exactly like (z//2,y//2,x//2)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy(
        (F.col("l_orderkey") / 100).cast("bigint").alias("grp")
    ).agg(F.count("*").alias("n"), avg_money("l_quantity", "mean_qty"))


@register(
    "agg_max",
    "D2",
    driver=False,
    oracle="""
SELECT l_orderkey // 100 AS grp, MAX(l_extendedprice) AS max_price
FROM lineitem GROUP BY 1
""",
)
def agg_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window max (D2): nanmax over subvoxel axis
    (ktx/util.py:159-163)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy(
        (F.col("l_orderkey") / 100).cast("bigint").alias("grp")
    ).agg(F.max("l_extendedprice").alias("max_price"))


@register(
    "agg_2ndmax",
    "D3",
    driver=False,
    oracle="""
SELECT l_orderkey,
       COALESCE(NULLIF(MAX(CASE WHEN rnk = 2 THEN l_extendedprice END), 0),
                MAX(CASE WHEN rnk = 1 THEN l_extendedprice END)) AS second_max
FROM (
  SELECT l_orderkey, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC, l_linenumber) AS rnk
  FROM lineitem
) GROUP BY 1 HAVING COUNT(*) >= 2
""",
)
def agg_2ndmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature 2nd-max aggregate (D3, "arthur"): blockify → sort →
    take [-2] (tiff2octree.py:220-242), with the KTX zero-fix — if the
    2nd-max is zero use the max instead (ktx/util.py:164-171).
    Spark-side: sort_array(collect_list) — group sizes are bounded
    (≤ 8 subvoxels in the reference, ≤ 7 lines per order here), so the
    collected array is O(1) per group and the whole thing is a single
    hash aggregate, no window shuffle."""
    li = table(spark, sf_dir, "lineitem")
    # try_element_at: single-line groups exist and ANSI element_at would
    # raise before the >=2 filter is applied (plan-shape dependent)
    arr = F.sort_array(F.collect_list("l_extendedprice"), asc=False)
    second = F.try_element_at(arr, F.lit(2))
    first = F.try_element_at(arr, F.lit(1))
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.coalesce(F.nullif(second, F.lit(0.0)), first).alias("second_max"),
            F.count("*").alias("_n"),
        )
        .filter(F.col("_n") >= 2)
        .drop("_n")
    )


@register(
    "agg_histogram",
    "D4",
    oracle="""
SELECT CAST(FLOOR(l_quantity / 5.0) AS BIGINT) AS bucket, COUNT(*) AS n
FROM lineitem GROUP BY 1
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram (D4): per-page numpy.histogram partials
    merged with += (small_memory_histogram.py:17-40) ≡ partial+final
    hash aggregation on the bucket key."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.floor(F.col("l_quantity") / 5.0).alias("bucket")
    ).agg(F.count("*").alias("n"))


@register(
    "agg_countif",
    "D6",
    driver=False,
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       COUNT(CASE WHEN l_discount = 0 THEN 1 END) AS n_zero,
       (100.0 * COUNT(CASE WHEN l_discount = 0 THEN 1 END)) / COUNT(*) AS pct_zero
FROM lineitem GROUP BY 1
""",
)
def agg_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-fraction (D6): percent_zero_intensity
    (ktx_from_rendered_tiff.py:225-228)."""
    li = table(spark, sf_dir, "lineitem")
    n_zero = F.count(F.when(F.col("l_discount") == 0, True))
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        n_zero.alias("n_zero"),
        ((F.lit(100.0) * n_zero) / F.count("*")).alias("pct_zero"),
    )


_MEAN_SQL, _STD_SQL = stats_money_sql("l_quantity")


@register(
    "agg_stats",
    "D7",
    driver=False,
    oracle=f"""
SELECT l_returnflag, COUNT(*) AS n,
       {_MEAN_SQL} AS mean_qty, {_STD_SQL} AS stddev_qty
FROM lineitem GROUP BY 1
""",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/stddev (D7): moments over the percentile band for the
    white level (ktx_from_rendered_tiff.py:500-511); population
    variance from exact integer moment sums (see operators.exactness)."""
    li = table(spark, sf_dir, "lineitem")
    mean, std = stats_money("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), mean.alias("mean_qty"), std.alias("stddev_qty")
    )


@register(
    "agg_minmax_nz",
    "D8",
    driver=False,
    oracle="""
SELECT l_returnflag,
       MIN(NULLIF(l_discount, 0)) AS min_nz, MAX(NULLIF(l_discount, 0)) AS max_nz,
       MIN(l_discount) AS min_all
FROM lineitem GROUP BY 1
""",
)
def agg_minmax_nz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max non-zero (D8): zero-is-NULL min/max scan
    (ktx_from_rendered_tiff.py:444-452) via nullif + null-ignoring agg."""
    li = table(spark, sf_dir, "lineitem")
    nz = F.nullif(F.col("l_discount"), F.lit(0))
    return li.groupBy("l_returnflag").agg(
        F.min(nz).alias("min_nz"),
        F.max(nz).alias("max_nz"),
        F.min("l_discount").alias("min_all"),
    )


@register(
    "agg_rms",
    "D9",
    driver=False,
    oracle="""
SELECT event_type,
       SQRT((CAST(SUM(CAST(ROUND(value * 100) AS BIGINT) * CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 10000.0) / COUNT(value)) AS rms
FROM events GROUP BY 1
""",
)
def agg_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RMS (D9): nominal resolution sqrt(mean(square(r)))
    (ktx_from_rendered_tiff.py:203-207); exact integer second moment."""
    ev = table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("bigint")
    rms = F.sqrt((F.sum(c * c) / F.lit(10000.0)) / F.count("value"))
    return ev.groupBy("event_type").agg(rms.alias("rms"))


@register(
    "agg_distinct",
    "D11",
    oracle="""
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n
FROM orders GROUP BY 1
""",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count (D11). (approx_count_distinct is exposed in
    dedup stats — rows-only, HLL sketches don't hash-match.)"""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"), F.count("*").alias("n")
    )


@register("agg_approx_distinct", "D11", oracle=None, driver=False)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx distinct (D11), rows-only: HLL sketch at 1% target error
    — the 100 TB path where an exact distinct shuffle is unaffordable;
    sketches merge map-side so the shuffle carries registers, not
    keys. (Sketch values are engine-specific, hence no SQL oracle.)"""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("n_cust_approx"),
        F.count("*").alias("n"),
    )


@register(
    "agg_rollup",
    "D12",
    driver=False,
    oracle=f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {sum_money_sql("l_quantity", "sum_qty")}
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup (D12): the pyramid's per-level re-aggregation of one
    measure (tiff2octree.py:1078) is a hierarchical rollup."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), sum_money("l_quantity", "sum_qty")
    )


@register(
    "agg_cascade",
    "D13",
    driver=False,
    oracle=f"""
WITH per_order AS (
  SELECT o_custkey, CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS order_cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_orderkey, o_custkey
)
SELECT o_custkey, COUNT(*) AS n_orders,
       (CAST(SUM(order_cents) AS BIGINT) / 100.0) / COUNT(*) AS avg_order_total
FROM per_order GROUP BY 1
""",
)
def agg_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascaded multi-level aggregation (D13): level k consumes level
    k+1's output (downsample_octree_blocks, tiff2octree.py:1062-1120) —
    here sum-per-order re-aggregated to avg-per-customer. At scale the
    second stage shuffles only the first stage's (small) output."""
    li, o = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "orders")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.sum(cents).alias("order_cents"))
    )
    return per_order.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        ((F.sum("order_cents") / F.lit(100.0)) / F.count("*")).alias("avg_order_total"),
    )


@register(
    "agg_cube",
    "D12",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
       COUNT(*) AS n, {sum_money_sql("l_quantity", "sum_qty")}
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube (D12): all 2^n subtotal combinations in one pass — the
    engine expands each input row into its grouping-set keys before
    the shuffle, so it is still a single partial+final aggregate, not
    2^n scans. grouping_id disambiguates a real NULL key from a
    subtotal row."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count("*").alias("n"),
        sum_money("l_quantity", "sum_qty"),
    )


@register(
    "agg_grouping_sets",
    "D12",
    driver=False,
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
       COUNT(*) AS n, {sum_money_sql("l_quantity", "sum_qty")}
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets (D12): the pyramid's per-level totals
    (levels = sets) computed in one aggregate instead of a union of
    three scans."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count("*").alias("n"),
        sum_money("l_quantity", "sum_qty"),
    )


_M_MEAN_SQL, _M_STD_SQL = stats_money_sql("l_quantity")


@register(
    "agg_moments",
    "D1+D2+D6+D7+D8+D9",
    oracle=f"""
SELECT l_returnflag,
       COUNT(*) AS n,
       {avg_money_sql("l_quantity", "mean_qty")},
       MAX(l_extendedprice) AS max_price,
       COUNT(CASE WHEN l_discount = 0 THEN 1 END) AS n_zero,
       (100.0 * COUNT(CASE WHEN l_discount = 0 THEN 1 END)) / COUNT(*) AS pct_zero,
       {_M_MEAN_SQL} AS mean2_qty, {_M_STD_SQL} AS stddev_qty,
       MIN(NULLIF(l_discount, 0)) AS min_nz, MAX(NULLIF(l_discount, 0)) AS max_nz,
       SQRT((CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)
                      * CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) / 10000.0)
            / COUNT(l_quantity)) AS rms_qty
FROM lineitem GROUP BY 1
""",
)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated D-family moments driver query: ONE scan + ONE
    map-side-combined hash aggregate computes the tumbling mean (D1,
    zero-is-NULL nanmean dual), max (D2), zero-fraction/count_if (D6),
    mean/stddev (D7, exact integer moment sums), non-zero min/max (D8)
    and RMS (D9) — the reference computes all of these in its single
    stats pass too (ktx_from_rendered_tiff.py:433-530). The single-op
    variants stay registered driver=False for per-op tests/bench.
    At 100 TB this is the preferred shape: every extra aggregate
    column is free relative to a second scan of the fact table."""
    li = table(spark, sf_dir, "lineitem")
    qc = cents("l_quantity")
    n_zero = F.count(F.when(F.col("l_discount") == 0, True))
    nz_disc = F.nullif(F.col("l_discount"), F.lit(0))
    mean2, std = stats_money("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        avg_money("l_quantity", "mean_qty"),
        F.max("l_extendedprice").alias("max_price"),
        n_zero.alias("n_zero"),
        ((F.lit(100.0) * n_zero) / F.count("*")).alias("pct_zero"),
        mean2.alias("mean2_qty"),
        std.alias("stddev_qty"),
        F.min(nz_disc).alias("min_nz"),
        F.max(nz_disc).alias("max_nz"),
        F.sqrt((F.sum(qc * qc) / F.lit(10000.0)) / F.count("l_quantity")).alias(
            "rms_qty"
        ),
    )
