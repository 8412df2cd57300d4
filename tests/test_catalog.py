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


def test_events_both_physical_ts_schemas(spark, tmp_path):
    """The driver has shipped events.parquet with two physical ts types:
    INT64 TIMESTAMP(NANOS) (rounds 1-2) and TIMESTAMP(MICROS)/NTZ
    (round 3+). _events must normalize both to the same TimestampType
    values — this is what broke 9 driver queries in CORRECTNESS_r03."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        datetime.datetime(2024, 1, 1, 0, 0, 7, 179575),
        datetime.datetime(2024, 5, 31, 23, 59, 59, 999999),
    ]
    base = {"event_id": pa.array([0, 1], pa.int64())}

    nanos_dir = tmp_path / "nanos"
    micros_dir = tmp_path / "micros"
    for d, unit in ((nanos_dir, "ns"), (micros_dir, "us")):
        d.mkdir()
        t = pa.table({**base, "ts": pa.array(rows, pa.timestamp(unit))})
        pq.write_table(t, d / "events.parquet", version="2.6")

    out = {}
    for d in (nanos_dir, micros_dir):
        ev = table(spark, str(d), "events")
        assert dict(ev.dtypes)["ts"] == "timestamp", d.name
        out[d.name] = [r["ts"] for r in ev.orderBy("event_id").collect()]
    assert out["nanos"] == out["micros"] == rows


def test_table_cache_returns_same_plan_per_session(spark, sf_dir):
    """table() memoizes the analyzed DataFrame per (session, dir,
    name): repeated loads must not re-read parquet footers, and the
    cache key must separate different sf dirs."""
    from hortacloud_importer_spark import catalog

    a = catalog.table(spark, sf_dir, "nation")
    b = catalog.table(spark, sf_dir, "nation")
    assert a is b
    key = (spark.sparkContext.applicationId, sf_dir, "nation")
    assert catalog._CACHE[key] is a
    # a different dir is a different entry (never served stale data)
    other = sf_dir.replace("sf0.001", "sf0.01")
    c = catalog.table(spark, other, "nation")
    assert c is not a
