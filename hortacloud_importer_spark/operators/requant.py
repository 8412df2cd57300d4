"""Intensity requantization parameters (black / white / gamma).

Re-expresses `_compute_intensity_downsample_params`
(reference: ktx/octree/ktx_from_rendered_tiff.py:481-530): from the
integer percentile vector of a channel, derive the black level (the
20th-percentile floor, clamped), the white level (95th percentile plus
6 standard deviations of the 20..95 percentile band, clamped into
[max(254, 0.75*max), max]), and gamma = 0.5.

Numerical note: the reference accumulates mean/variance with a Python
loop; we compute the same moments from exact integer sums
(sum p_i and sum p_i^2 over the 76-element band), which is equal up to
floating-point summation order and — crucially for the oracle check —
bit-identical between Spark and DuckDB because both evaluate the same
expression tree over exact integers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MIN_QUANTILE = 20
MAX_BASE_QUANTILE = 95
MAX_SIGMA_BUFFER = 6.0
MAX_PROPORTION = 0.75
BAND = list(range(MIN_QUANTILE, MAX_BASE_QUANTILE + 1))  # 76 percentiles


def band_moments() -> tuple[Column, Column]:
    """(mean, stddev) over percentile columns p20..p95 (already computed).

    Built as ONE parsed SQL expression per output instead of a
    reduce() over 152 Column objects: each Column operation is a py4j
    round-trip, and the driver-side construction cost of the column
    form (~0.5s) dwarfed the execution of the expression itself. The
    parsed tree is the same left-associated sum, so values are
    bit-identical (the ``D`` suffixes keep the literals DoubleType,
    matching the old ``F.lit`` floats)."""
    n = float(len(BAND))
    s1 = " + ".join(f"p{p}" for p in BAND)
    s2 = " + ".join(f"p{p} * p{p}" for p in BAND)
    mean = f"(({s1}) / {n}D)"
    var = f"(({s2}) / {n}D - {mean} * {mean})"
    return F.expr(mean).alias("mean_p"), F.expr(f"SQRT({var})").alias("stddev_p")


def requant_params() -> list[Column]:
    """black_level / white_level / gamma from pNN + mean_p/stddev_p cols.

    Clamp chain mirrors ktx_from_rendered_tiff.py:512-529:
      white = floor(p95 + 6*stddev)            # sigma buffer
      white = max(white, floor(0.75 * p100))   # at least 3/4 of true max
      white = min(white, p100)                 # never above true max
      white = max(white, 254)                  # at least 8-bit range
      black = max(min(p20, white - 253), 1)    # >=253 interval, >=1
    """
    w = (
        f"CAST(FLOOR(p{MAX_BASE_QUANTILE}"
        f" + {MAX_SIGMA_BUFFER}D * stddev_p) AS BIGINT)"
    )
    w = f"GREATEST({w}, CAST(FLOOR({MAX_PROPORTION}D * p100) AS BIGINT))"
    w = f"LEAST({w}, CAST(p100 AS BIGINT))"
    w = f"GREATEST({w}, CAST(254 AS BIGINT))"
    b = (
        f"GREATEST(LEAST(CAST(p{MIN_QUANTILE} AS BIGINT), {w} - 253),"
        " CAST(1 AS BIGINT))"
    )
    return [
        F.expr(b).alias("black_level"),
        F.expr(w).alias("white_level"),
        F.lit(0.5).alias("gamma"),
    ]


def band_moments_sql() -> tuple[str, str]:
    """DuckDB expressions mirroring band_moments() bit-for-bit."""
    n = float(len(BAND))
    s1 = " + ".join(f"p{p}" for p in BAND)
    s2 = " + ".join(f"p{p} * p{p}" for p in BAND)
    mean = f"(({s1}) / {n})"
    var = f"(({s2}) / {n} - {mean} * {mean})"
    return mean, f"SQRT({var})"


def requant_params_sql(mean_sql: str, stddev_sql: str) -> dict[str, str]:
    """DuckDB expressions for black/white/gamma over a pctl relation."""
    w = f"CAST(FLOOR(p{MAX_BASE_QUANTILE} + {MAX_SIGMA_BUFFER} * {stddev_sql}) AS BIGINT)"
    w = f"GREATEST({w}, CAST(FLOOR({MAX_PROPORTION} * p100) AS BIGINT))"
    w = f"LEAST({w}, CAST(p100 AS BIGINT))"
    w = f"GREATEST({w}, CAST(254 AS BIGINT))"
    b = f"GREATEST(LEAST(CAST(p{MIN_QUANTILE} AS BIGINT), {w} - 253), CAST(1 AS BIGINT))"
    return {"black_level": b, "white_level": w, "gamma": "0.5"}
