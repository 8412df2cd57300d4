"""Catalog: table loading + infer-then-freeze schema validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hortacloud_importer_spark.catalog import (
    TABLES,
    SchemaMismatch,
    freeze_schema,
    load,
    table,
    validate_schema,
)


def test_all_tables_load(spark, sf_dir):
    for t in TABLES:
        df = table(spark, sf_dir, t)
        assert df.columns, t
    assert len(load(spark, sf_dir, "nation", "region")) == 2


def test_unknown_table_rejected(spark, sf_dir):
    with pytest.raises(KeyError):
        table(spark, sf_dir, "not_a_table")


def test_schema_freeze_and_validate(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    frozen = freeze_schema(li)
    # identical input passes through
    assert validate_schema(li, frozen) is li
    # a diverging input (dropped column) fails fast
    with pytest.raises(SchemaMismatch, match="schema mismatch in day2"):
        validate_schema(li.drop("l_tax"), frozen, source="day2")
    # a type change fails too
    with pytest.raises(SchemaMismatch):
        validate_schema(
            li.withColumn("l_quantity", F.col("l_quantity").cast("int")), frozen
        )


def test_events_ts_is_microsecond_timestamp(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
