"""Query registry — the single source of truth behind __spark_entry__.py.

Every operator declared in SURVEY.md §2 registers one named query here,
with an optional DuckDB oracle SQL string. The driver contract
(queries()/oracle_sql()) is a thin view over this registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    section: str  # SURVEY.md §2 row id(s), e.g. "D10"
    doc: str = ""
    driver: bool = True  # exposed through __spark_entry__.queries()


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, section: str, oracle: str | None = None, driver: bool = True):
    """Decorator: register fn(spark, sf_dir) -> DataFrame under `name`.

    ``driver=False`` keeps a query in the local registry (pytest oracle
    mirror, bench, plan tests) without exposing it through the driver
    contract — used for redundant variants whose §2 row is covered by a
    consolidated driver-facing query, and for bench-only throughput
    probes. The driver-facing set is kept ≤ 50 entries with scalar-only
    output columns (tests/test_registry_contract.py) so the external
    correctness gate checks every entry.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name, fn, oracle, section, (fn.__doc__ or "").strip(), driver
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import for side effect: populates REGISTRY.
    from hortacloud_importer_spark import queries as _  # noqa: F401

    return dict(sorted(REGISTRY.items()))


def driver_queries() -> dict[str, QuerySpec]:
    """The consolidated driver-facing subset (every SURVEY §2 row is
    represented; each output column is scalar so external result
    canonicalizers can sort/hash rows)."""
    return {n: s for n, s in all_queries().items() if s.driver}
