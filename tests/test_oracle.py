"""Every registered query with an oracle must match DuckDB exactly.

This is the local mirror of the driver's CORRECTNESS gate, run at
sf0.001 for speed (the driver uses sf0.01).
"""

from __future__ import annotations

import pytest

from hortacloud_importer_spark.registry import all_queries
from hortacloud_importer_spark.testing.compare import compare_query

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query(name, spark, sf_dir, oracle_con):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only smoke: runs and has a schema
        assert df.schema.fields
        return
    res = compare_query(name, df, oracle_con, spec.oracle)
    assert res.ok, str(res)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert q, "queries() must not be empty"
