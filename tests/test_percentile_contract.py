"""percentile_approx's error contract, measured not asserted (round-13
ask #6): the sketch's returned element must sit within n/accuracy ranks
of the target rank q*n. operators/percentile.py::
approx_percentile_rank_error recomputes exact rank intervals
distributed-side; these tests pin the max observed error on a known
array (must be exactly 0 at full accuracy) and on the lineitem fixture
under the production accuracy parameter. tools/soak_sf1.py runs the
same checker at sf1 for the at-scale soak row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hortacloud_importer_spark.catalog import table
from hortacloud_importer_spark.operators.percentile import (
    approx_percentile_rank_error,
)

_DECILES = [i / 10 for i in range(11)]


def test_known_array_zero_error_at_high_accuracy(spark):
    # 1..1000 in one group: with accuracy >> n the sketch is exact, so
    # every decile's rank interval must contain the target rank.
    df = spark.range(1, 1001).select(
        F.lit("g").alias("grp"), F.col("id").alias("v")
    )
    rows = approx_percentile_rank_error(
        df, ["grp"], "v", _DECILES, accuracy=100000
    ).collect()
    assert len(rows) == 11
    assert max(r["rank_err"] for r in rows) == 0.0


def test_planted_skew_error_is_measured_not_hidden(spark):
    # A group where one value holds 90% of the mass: the rank interval
    # of that value is wide, so the checker must report 0 error for
    # quantiles inside it and nonzero only if the sketch missed.
    vals = [1] * 900 + list(range(2, 102))
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, v int"
    )
    rows = approx_percentile_rank_error(
        df, ["grp"], "v", _DECILES, accuracy=100000
    ).collect()
    by_q = {round(r["q"], 1): r for r in rows}
    # q=0.5 must return the heavy value, whose interval [1, 900]
    # contains rank 500 -> zero error
    assert by_q[0.5]["approx_value"] == 1
    assert by_q[0.5]["rank_err"] == 0.0
    assert max(r["rank_err"] for r in rows) == 0.0


def test_fixture_deciles_within_contract(spark, sf_dir):
    """agg_approx_percentile's production parameters (deciles of
    l_extendedprice by return flag, accuracy=10000) on the fixture:
    every returned decile's rank error must be within the documented
    n/accuracy bound (+1 rank of discreteness slack)."""
    li = table(spark, sf_dir, "lineitem")
    rows = approx_percentile_rank_error(
        li, ["l_returnflag"], "l_extendedprice", _DECILES, accuracy=10000
    ).collect()
    assert len(rows) == 3 * 11
    worst = max(r["rank_err"] for r in rows)
    bound = max(r["n"] for r in rows) / 10000 + 1
    assert worst <= bound, (worst, bound)
