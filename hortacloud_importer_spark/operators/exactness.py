"""Exact, engine-portable arithmetic helpers.

The driver's correctness gate is an order-insensitive VALUE-HASH match
between Spark and DuckDB. Double summation is order-dependent, so any
`SUM(double)` can differ in the last ulp between engines. Fixture money
/ measure columns carry two decimals, so we sum exact integer cents and
convert once at the end — both engines then evaluate the identical
IEEE expression tree and produce bit-identical doubles.

Rules applied throughout the query modules:
- SUM/AVG/STDDEV over 2-decimal doubles -> integer-cents sums.
- DuckDB `SUM(BIGINT)` returns HUGEINT -> always `CAST(... AS BIGINT)`.
- Spark `CAST(double AS BIGINT)` truncates while DuckDB rounds ->
  always go through an explicit FLOOR()/ROUND() first.
- avoid `pow`/`exp`/`ln` in checked outputs (libm may differ in the
  last ulp between JVM and DuckDB); `sqrt` is IEEE-correctly-rounded
  and safe.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: str | Column) -> Column:
    """Exact integer cents from a 2-decimal double column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def cents_sql(expr: str) -> str:
    """DuckDB mirror of cents()."""
    return f"CAST(ROUND({expr} * 100) AS BIGINT)"


def sum_money(col: str | Column, alias: str) -> Column:
    """SUM over a money column, exact, emitted as double."""
    return (F.sum(cents(col)) / F.lit(100.0)).alias(alias)


def sum_money_sql(expr: str, alias: str) -> str:
    return f"CAST(SUM({cents_sql(expr)}) AS BIGINT) / 100.0 AS {alias}"


def avg_money(col: str | Column, alias: str) -> Column:
    """AVG over a money column: (sum_cents / 100.0) / n, exact."""
    c = F.col(col) if isinstance(col, str) else col
    return ((F.sum(cents(c)) / F.lit(100.0)) / F.count(c)).alias(alias)


def avg_money_sql(expr: str, alias: str) -> str:
    return f"(CAST(SUM({cents_sql(expr)}) AS BIGINT) / 100.0) / COUNT({expr}) AS {alias}"


def stats_money(col: str | Column) -> tuple[Column, Column]:
    """(mean, population stddev) via exact integer moment sums.

    var = E[x^2] - E[x]^2 over exact cents sums; both engines evaluate
    the identical expression tree. (Population variance — documented
    engine semantics; the two-pass sample formula would need a second
    shuffle for no benefit here.)
    """
    c = F.col(col) if isinstance(col, str) else col
    cc = cents(c)
    n = F.count(c)
    mean = (F.sum(cc) / F.lit(100.0)) / n
    ex2 = (F.sum(cc * cc) / F.lit(10000.0)) / n
    var = ex2 - mean * mean
    return mean, F.sqrt(var)


def stats_money_sql(expr: str) -> tuple[str, str]:
    cc = cents_sql(expr)
    mean = f"((CAST(SUM({cc}) AS BIGINT) / 100.0) / COUNT({expr}))"
    ex2 = f"((CAST(SUM({cc} * {cc}) AS BIGINT) / 10000.0) / COUNT({expr}))"
    return mean, f"SQRT({ex2} - {mean} * {mean})"
