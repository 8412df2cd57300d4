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


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, section: str, oracle: str | None = None):
    """Decorator: register fn(spark, sf_dir) -> DataFrame under `name`."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, section, (fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import for side effect: populates REGISTRY.
    from hortacloud_importer_spark import queries as _  # noqa: F401

    return dict(sorted(REGISTRY.items()))
