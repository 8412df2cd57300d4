"""Exact integer percentiles via histogram + cumulative-window CDF walk.

Re-expresses the reference's per-channel percentile computation
(reference: ktx/octree/ktx_from_rendered_tiff.py:433-479): build a
histogram of NON-ZERO integer intensities (zero means "no data"),
accumulate counts in intensity order, and for each integer percentile p
take the smallest intensity whose cumulative percentage reaches p.
percentile[0] = min non-zero, percentile[100] = max non-zero.

Spark-first design, 100 TB posture:
- stage 1 is a groupBy on (group, intensity): a partial-aggregated
  shuffle whose output cardinality is bounded by distinct intensities
  per group (the reference bounds it at 65,536 bins) — tiny regardless
  of input row count;
- stage 2 is a window over that compact histogram, partitioned by the
  group key, so state per partition is bounded by the bin count;
- stage 3 is one more groupBy producing a single row per group.
Nothing is ever collected to the driver; all arithmetic stays in
whole-stage codegen.

The cumulative percentage is computed as (100.0 * cum) / total — the
exact expression shape matters: both this implementation and the DuckDB
oracle SQL use the same association so IEEE doubles match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def nonzero_histogram(
    df: DataFrame, group_cols: Sequence[str], intensity_col: str
) -> DataFrame:
    """Histogram of non-zero intensities per group (D4).

    Mirrors small_memory_histogram.py:17-40 (per-page partials merged
    by '+=') — Spark's partial/final hash aggregation is exactly that
    merge, done engine-side.
    """
    return (
        df.filter(F.col(intensity_col) > 0)
        .groupBy(*group_cols, intensity_col)
        .agg(F.count("*").alias("bin_count"))
    )


def with_cdf(hist: DataFrame, group_cols: Sequence[str], intensity_col: str) -> DataFrame:
    """Annotate a histogram with cumulative count and percentage (E1)."""
    order = Window.partitionBy(*group_cols).orderBy(intensity_col)
    whole = (
        Window.partitionBy(*group_cols)
        .orderBy(intensity_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return hist.withColumn("cum_count", F.sum("bin_count").over(order)).withColumn(
        "total_nonzero", F.sum("bin_count").over(whole)
    )


def percentile_exprs(intensity_col: str, percentiles: Sequence[int]) -> list[Column]:
    """Aggregate expressions: p -> smallest intensity with cdf% >= p.

    Expects with_cdf() columns. p=0 maps to min non-zero and p=100 to
    max non-zero (ktx_from_rendered_tiff.py:471-473).
    """
    # One parsed SQL string per percentile instead of ~6 Column calls:
    # each Column operation is a py4j round-trip, and for a ~100-entry
    # percentile vector the driver-side construction cost exceeded the
    # aggregate's execution. The D suffix keeps literals DoubleType
    # (matching F.lit floats), so values stay bit-identical.
    exprs: list[Column] = []
    for p in percentiles:
        if p == 0:
            exprs.append(F.min(intensity_col).alias("p0"))
        elif p == 100:
            exprs.append(F.max(intensity_col).alias("p100"))
        else:
            exprs.append(
                F.expr(
                    "min(CASE WHEN (100.0D * cum_count) / total_nonzero"
                    f" >= {float(p)}D THEN {intensity_col} END)"
                ).alias(f"p{p}")
            )
    return exprs


def exact_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    intensity_col: str,
    percentiles: Sequence[int],
) -> DataFrame:
    """End-to-end: rows -> one row per group with pNN columns."""
    hist = with_cdf(nonzero_histogram(df, group_cols, intensity_col), group_cols, intensity_col)
    return hist.groupBy(*group_cols).agg(*percentile_exprs(intensity_col, percentiles))


def percentile_oracle_cte(
    source_sql: str, group_col: str, intensity_sql: str, percentiles: Sequence[int]
) -> str:
    """DuckDB CTE mirroring exact_percentiles bit-for-bit.

    `source_sql` must produce columns (grp, i); intensity must already
    be an integer expression. Produces a relation (grp, p0, ..., p100).
    """
    cols = []
    for p in percentiles:
        if p == 0:
            cols.append("MIN(i) AS p0")
        elif p == 100:
            cols.append("MAX(i) AS p100")
        else:
            cols.append(f"MIN(CASE WHEN pct >= {float(p)} THEN i END) AS p{p}")
    return f"""
hist AS (
  SELECT grp, i, COUNT(*) AS bin_count
  FROM ({source_sql}) src
  WHERE i > 0
  GROUP BY grp, i
),
cdf AS (
  SELECT grp, i,
         SUM(bin_count) OVER (PARTITION BY grp ORDER BY i) AS cum_count,
         SUM(bin_count) OVER (PARTITION BY grp) AS total_nonzero
  FROM hist
),
pctl AS (
  SELECT grp, {", ".join(cols)}
  FROM (SELECT grp, i, (100.0 * cum_count) / total_nonzero AS pct FROM cdf) t
  GROUP BY grp
)
""".strip()


def approx_percentile_rank_error(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    pcts: Sequence[float],
    accuracy: int = 10000,
) -> DataFrame:
    """Measure percentile_approx's error CONTRACT against exact ranks,
    fully distributed (round-13 ask #6: tested, not asserted).

    The GK/KLL-style sketch behind percentile_approx guarantees that
    the returned element's rank is within n/accuracy of the target
    rank q*n. This checker recomputes each returned value's TRUE rank
    interval [rank_lt+1, rank_le] (its 1-based positions in the sorted
    group) with exact conditional counts, and emits the distance from
    the target rank to that interval as ``rank_err`` — 0 whenever the
    contract held exactly.

    Shape: one percentile_approx aggregate (mergeable map-side), then
    the tiny (groups x len(pcts)) approx table BROADCASTS back onto
    the data for one conditional-count aggregate (row fanout
    len(pcts), map-side combined). A verification harness, not a hot
    path — but still one that never collects data rows or sorts
    globally, so it runs at any scale the main query runs."""
    gc = list(group_cols)
    ap = df.groupBy(*gc).agg(
        F.percentile_approx(value_col, list(pcts), accuracy).alias("_ap"),
        F.count(value_col).alias("n"),
    )
    qarr = F.array(*[F.lit(float(q)) for q in pcts])
    ap = ap.select(
        *gc, "n", F.posexplode("_ap").alias("_qi", "approx_value")
    ).withColumn("q", F.element_at(qarr, F.col("_qi") + 1)).drop("_qi")
    j = df.select(*gc, F.col(value_col).alias("_v")).join(
        F.broadcast(ap), gc
    )
    ranks = j.groupBy(*gc, "q", "approx_value", "n").agg(
        F.sum((F.col("_v") < F.col("approx_value")).cast("long")).alias(
            "rank_lt"
        ),
        F.sum((F.col("_v") <= F.col("approx_value")).cast("long")).alias(
            "rank_le"
        ),
    )
    # target rank q*n, clamped to >= 1: the smallest element occupies
    # rank 1, so q=0's target is rank 1, not rank 0
    target = F.greatest(F.lit(1.0), F.col("q") * F.col("n").cast("double"))
    err = F.greatest(
        F.lit(0.0),
        (F.col("rank_lt") + 1).cast("double") - target,
        target - F.col("rank_le").cast("double"),
    )
    return ranks.select(
        *gc,
        "q",
        "approx_value",
        "n",
        "rank_lt",
        "rank_le",
        err.alias("rank_err"),
    )
