"""spark.sql surface parity (SURVEY.md §1.5 / §2.B-H composite).

The engine's operators are exposed through the DataFrame API
elsewhere; this family proves the SQL entry point: ONE ANSI string is
executed verbatim by both Spark SQL and the DuckDB oracle. The query
is the classic pricing-summary shape (scan -> filter -> wide
aggregate -> order), i.e. the reference's pass-1 statistics written
as SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hortacloud_importer_spark.catalog import TABLES, table
from hortacloud_importer_spark.registry import register

# Money sums in exact cents so both engines hash identically.
_PRICING_SQL = """
SELECT l_returnflag,
       l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS sum_disc_price_cents,
       CAST(MIN(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS min_qty_cents,
       CAST(MAX(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS max_qty_cents
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def _register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)


@register("sql_pricing_summary", "B+D+F via SQL", oracle=_PRICING_SQL, driver=False)
def sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME SQL text runs on Spark (via temp views over the
    catalog) and on DuckDB — zero dialect translation, proving the
    engine's SQL surface matches its DataFrame surface."""
    _register_views(spark, sf_dir)
    return spark.sql(_PRICING_SQL)
