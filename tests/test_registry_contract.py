"""The driver-facing query set must satisfy the external gate's shape.

The external correctness gate (a) records at most ~50 queries per
round and (b) canonicalizes results with a pandas sort + hash that
only handles scalar cells. This contract pins both properties plus
full SURVEY §2 coverage, so a regression shows up here before it
shows up as missing driver evidence.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from hortacloud_importer_spark.registry import all_queries, driver_queries

# SURVEY.md §2 operator rows. A11 (existence check / resume) is mapped
# to the C4 resume anti-join (see COVERAGE.md "rows covered without a
# dedicated query").
SURVEY_ROWS = (
    [f"A{i}" for i in range(1, 11)]
    + [f"B{i}" for i in range(1, 7)]
    + [f"C{i}" for i in range(1, 7)]
    + [f"D{i}" for i in range(1, 14)]
    + [f"E{i}" for i in range(1, 5)]
    + [f"F{i}" for i in range(1, 4)]
    + [f"G{i}" for i in range(1, 4)]
    + [f"H{i}" for i in range(1, 9)]
    + [f"I{i}" for i in range(1, 6)]
    + [f"J{i}" for i in range(1, 5)]
    + [f"K{i}" for i in range(1, 6)]
)

DRIVER = driver_queries()


def _covered_rows(specs) -> set[str]:
    rows: set[str] = set()
    for spec in specs.values():
        for sec in re.split(r"[+]", spec.section):
            rows.add(sec.strip())
    return rows


def test_driver_set_fits_the_checked_window():
    assert len(DRIVER) <= 50, (
        f"driver set has {len(DRIVER)} entries; the external gate only "
        "records ~50 — consolidate variants (driver=False) until it fits"
    )


def test_driver_set_covers_every_survey_row():
    covered = _covered_rows(DRIVER)
    missing = [r for r in SURVEY_ROWS if r not in covered]
    assert not missing, f"§2 rows with no driver-facing query: {missing}"


def test_local_registry_is_a_superset():
    assert set(DRIVER) <= set(all_queries())
    assert _covered_rows(DRIVER) <= _covered_rows(all_queries())


def test_driver_set_mostly_oracle_checked():
    no_oracle = sorted(n for n, s in DRIVER.items() if s.oracle is None)
    # rows-only is reserved for genuinely non-SQL-expressible ops
    # (binary codecs, live streaming, engine-specific hashes)
    assert len(no_oracle) <= 8, no_oracle


@pytest.mark.parametrize("name", sorted(DRIVER))
def test_driver_query_output_is_scalar_only(name, spark, sf_dir):
    """The external canonicalizer pandas-sorts every output column;
    array/struct/map cells raise `unhashable type` there. Serialize
    them (array_join / to_json) at the query boundary instead."""
    df = DRIVER[name].fn(spark, sf_dir)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, f"{name} emits non-scalar columns {bad}"
