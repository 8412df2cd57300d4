"""Flagship query: per-group channel statistics (SURVEY.md §7.1).

Fuses D4 (histogram) + D5 (exact percentiles) + D6 (zero fraction) +
D7 (band moments) + D10 (requant params) — the heart of the
reference's KTX pass 1 (ktx/octree/ktx_from_rendered_tiff.py:433-530)
— over the `lineitem` fixture: intensity := floor(l_extendedprice *
l_discount) (so l_discount = 0 rows play the "zero means no data"
role), group := l_returnflag.

Plan shape (100 TB posture): scan -> map-side-combined groupBy on
(group, intensity) -> window over the compact histogram -> one-row-
per-group agg -> broadcast join of the tiny zero-count side -> pure
column math. The only full-data shuffle is the histogram groupBy,
whose output is bounded by bins-per-group, not input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hortacloud_importer_spark.catalog import table
from hortacloud_importer_spark.operators import percentile as P
from hortacloud_importer_spark.operators import requant as R
from hortacloud_importer_spark.registry import register

# Deciles + the requant band p20..p95 + extremes.
_PCTS = sorted({0, 100, *range(0, 101, 10), *R.BAND})
_REPORTED = ["p0", "p10", "p20", "p50", "p90", "p95", "p100"]

_INTENSITY_SQL = "CAST(FLOOR(l_extendedprice * l_discount) AS BIGINT)"


def channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    grouped = li.select(
        F.col("l_returnflag").alias("grp"),
        F.floor(F.col("l_extendedprice") * F.col("l_discount")).alias("i"),
    )

    # ONE scan, NO join: the full (group, intensity) histogram keeps
    # the i=0 bin; the CDF window counts only non-zero bins (the zero
    # bin gets a NULL cumulative, so percentile picks skip it), and the
    # final per-group aggregate reads zero-fraction totals off the same
    # rows. Plan: scan -> partial+final histogram agg -> window(grp) ->
    # one agg -> column math. Two histogram-sized exchanges total.
    # (A naive "reuse the histogram for a separate zeros branch" does
    # NOT fuse: Catalyst pushes the i>0 filter below the aggregate on
    # one branch, so the exchanges differ and ReuseExchange can't fire.)
    from pyspark.sql import Window

    full_hist = grouped.groupBy("grp", "i").agg(F.count("*").alias("bin_count"))
    order = Window.partitionBy("grp").orderBy("i")
    whole = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    nz_count = F.when(F.col("i") > 0, F.col("bin_count"))
    cdf = full_hist.withColumn("cum_count", F.sum(nz_count).over(order)).withColumn(
        "total_nonzero", F.sum(nz_count).over(whole)
    )

    # expression strings parse JVM-side in one py4j call each — the
    # Column-object form cost more driver time to CONSTRUCT (~1s of
    # py4j round-trips for this vector) than the aggregate takes to
    # run; D-suffixed literals keep DoubleType semantics bit-identical
    nz_i = "CASE WHEN i > 0 THEN i END"
    pct_exprs = []
    for p in _PCTS:
        if p == 0:
            pct_exprs.append(F.expr(f"min({nz_i})").alias("p0"))
        elif p == 100:
            pct_exprs.append(F.expr(f"max({nz_i})").alias("p100"))
        else:
            pct_exprs.append(
                F.expr(
                    "min(CASE WHEN (100.0D * cum_count) / total_nonzero"
                    f" >= {float(p)}D THEN i END)"
                ).alias(f"p{p}")
            )
    pctl = cdf.groupBy("grp").agg(
        *pct_exprs,
        F.sum("bin_count").alias("total_rows"),
        F.coalesce(
            F.sum(F.when(F.col("i") == 0, F.col("bin_count"))), F.lit(0).cast("bigint")
        ).alias("zero_count"),
    )

    mean, stddev = R.band_moments()
    stats = pctl.select(
        "grp", "total_rows", "zero_count", *_REPORTED, mean, stddev
    ).select("*", *R.requant_params())
    return stats.select(
        F.col("grp").alias("l_returnflag"),
        "total_rows",
        "zero_count",
        ((F.lit(100.0) * F.col("zero_count")) / F.col("total_rows")).alias("pct_zero"),
        *_REPORTED,
        "mean_p",
        "stddev_p",
        "black_level",
        "white_level",
        "gamma",
    )


def _oracle() -> str:
    mean, stddev = R.band_moments_sql()
    rq = R.requant_params_sql(mean, stddev)
    cte = P.percentile_oracle_cte(
        f"SELECT l_returnflag AS grp, {_INTENSITY_SQL} AS i FROM lineitem",
        "grp",
        "i",
        _PCTS,
    )
    return f"""
WITH {cte},
zeros AS (
  SELECT l_returnflag AS grp,
         COUNT(*) AS total_rows,
         COUNT(CASE WHEN {_INTENSITY_SQL} = 0 THEN TRUE END) AS zero_count
  FROM lineitem GROUP BY 1
)
SELECT p.grp AS l_returnflag,
       z.total_rows, z.zero_count,
       (100.0 * z.zero_count) / z.total_rows AS pct_zero,
       {", ".join(_REPORTED)},
       {mean} AS mean_p, {stddev} AS stddev_p,
       {rq["black_level"]} AS black_level,
       {rq["white_level"]} AS white_level,
       {rq["gamma"]} AS gamma
FROM pctl p JOIN zeros z USING (grp)
""".strip()


register("agg_requant_params", "D4+D5+D6+D7+D10", _oracle())(channel_stats)


@register("agg_approx_percentile", "D5", oracle=None, driver=False)
def approx_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx deciles (D5 scale variant), rows-only: percentile_approx
    (KLL-style sketch, mergeable map-side) — at 100 TB the exact
    histogram method still wins when intensities are bounded ints
    (65,536 bins max), but unbounded/continuous domains need the
    sketch. Accuracy vs the exact method is bounded by the 10,000
    accuracy parameter."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag")).agg(
        F.percentile_approx(
            "l_extendedprice", [i / 10 for i in range(11)], 10000
        ).alias("deciles")
    )


@register(
    "agg_percentile",
    "D5+E1",
    oracle=f"""
WITH {P.percentile_oracle_cte(
        "SELECT l_returnflag AS grp, CAST(FLOOR(l_extendedprice) AS BIGINT) AS i FROM lineitem",
        "grp", "i", list(range(0, 101, 10)))}
SELECT grp AS l_returnflag, {", ".join(f"p{p}" for p in range(0, 101, 10))}
FROM pctl
""".strip(),
)
def deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deciles of floor(l_extendedprice) per return flag — the
    reference's 101-percentile vector (ktx_from_rendered_tiff.py:441-473)
    reduced to deciles, via histogram + cumulative window (not
    percentile_approx: exactness is required for the oracle hash, and
    the histogram method IS the reference algorithm)."""
    li = table(spark, sf_dir, "lineitem")
    src = li.select(
        F.col("l_returnflag").alias("grp"), F.floor("l_extendedprice").alias("i")
    )
    out = P.exact_percentiles(src, ["grp"], "i", list(range(0, 101, 10)))
    return out.withColumnRenamed("grp", "l_returnflag")
