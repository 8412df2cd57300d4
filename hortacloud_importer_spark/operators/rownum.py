"""Scale-safe global row numbering (SURVEY §2.F2) + exact NTILE.

The reference assigns z-order indices from one sorted file list
(tiff2octree.py:1034) — trivially single-node. The distributed dual
must NOT be `row_number() OVER (ORDER BY ...)`: that plan funnels the
whole input through one task (Exchange SinglePartition). This module
implements the classic two-pass "zipWithIndex" pattern in DataFrame
ops only:

1. range-partition on the sort key (distributed sort, the same
   exchange a global orderBy uses);
2. count rows per range partition — a tiny n_partitions-row side;
3. prefix-sum those counts (a window over the TINY side only) into
   per-partition offsets, broadcast them back;
4. local row_number within each range partition + offset.

The only single-partition window runs over n_partitions rows, never
over the data. The fact side is exchanged twice (range + hash on the
partition id) — both full-parallelism shuffles; at 100 TB you size
`npartitions` like any shuffle. tests/test_plans.py asserts the scan
side never feeds an Exchange SinglePartition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_numbers(
    df: DataFrame,
    order_cols: list[str | Column],
    npartitions: int | None = None,
    rn_col: str = "rn",
) -> DataFrame:
    """Append a 1-based global row number following `order_cols`.

    The order defined by `order_cols` must be total (include a unique
    tiebreaker) or the numbering is nondeterministic — same contract
    as ROW_NUMBER without a unique ORDER BY.
    """
    spark = df.sparkSession
    n = int(npartitions or spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = df.repartitionByRange(n, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_n"))
    # prefix sum over <= n rows: the single-partition window is bounded
    # by the partition COUNT, not the data
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(rn_col, (F.col("_off") + F.row_number().over(w_local)).cast("bigint"))
        .drop("_pid", "_off")
    )


def ntile_from_rownum(rn: Column, total: Column, k: int) -> Column:
    """Exact SQL NTILE(k) from a global row number and the total count.

    NTILE semantics: with N = total rows, q = N div k, r = N mod k,
    the first r tiles have q+1 rows, the rest q. Closed form — no
    global window. `total` is typically a broadcast 1-row aggregate.
    """
    # floor-division via floor(double): exact while operands < 2^53 —
    # i.e. up to ~9e15 rows, far beyond any real table
    qf = F.floor(total / F.lit(k)).cast("bigint")
    r = (total.cast("bigint") % F.lit(k)).cast("bigint")
    big = r * (qf + 1)  # rows covered by the (q+1)-sized tiles
    in_big = F.floor((rn - 1) / (qf + 1)).cast("bigint") + 1
    in_small = r + F.floor((rn - big - 1) / F.greatest(qf, F.lit(1))).cast("bigint") + 1
    return F.when(rn <= big, in_big).otherwise(in_small).cast("int")
