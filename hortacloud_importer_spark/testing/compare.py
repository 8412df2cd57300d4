"""Strict Spark-vs-DuckDB oracle comparison.

Deliberately stricter than any plausible driver check: rows are
compared value-for-value after a column-name sort and an
order-insensitive row sort. Floats must match BIT-FOR-BIT; when they
don't but agree within 1e-9 relative, the mismatch is reported as
"close" so float-determinism bugs are visible and fixable rather than
silently tolerated.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field

import duckdb

from hortacloud_importer_spark.catalog import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    schema_spark: list[str] = field(default_factory=list)
    schema_oracle: list[str] = field(default_factory=list)
    detail: str = ""

    def __str__(self) -> str:
        status = "PASS" if self.ok else "FAIL"
        msg = f"{status} {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        if self.detail:
            msg += f" | {self.detail}"
        return msg


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    """Normalize a cell for order-insensitive comparison."""
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x).__name__), str(x)) for x in row
    )


def _cells_equal(a, b) -> tuple[bool, bool]:
    """(exact, close) for one cell pair."""
    if a is None or b is None:
        eq = a is None and b is None
        return eq, eq
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False, False
        if fa == fb or (math.isnan(fa) and math.isnan(fb)):
            return True, True
        denom = max(abs(fa), abs(fb), 1e-30)
        return False, abs(fa - fb) / denom < 1e-9
    if isinstance(a, tuple) and isinstance(b, tuple):
        if len(a) != len(b):
            return False, False
        exact = close = True
        for x, y in zip(a, b):
            e, c = _cells_equal(x, y)
            exact &= e
            close &= c
        return exact, close
    eq = a == b
    return eq, eq


def compare_query(name, spark_df, con, sql) -> CompareResult:
    sp_cols = sorted(spark_df.columns)
    sp_rows = [tuple(_norm(r[c]) for c in sp_cols) for r in spark_df.collect()]

    res = con.execute(sql)
    du_cols_raw = [d[0] for d in res.description]
    du_order = sorted(range(len(du_cols_raw)), key=lambda i: du_cols_raw[i])
    du_cols = [du_cols_raw[i] for i in du_order]
    du_rows = [tuple(_norm(row[i]) for i in du_order) for row in res.fetchall()]

    out = CompareResult(
        name,
        ok=False,
        spark_rows=len(sp_rows),
        oracle_rows=len(du_rows),
        schema_spark=sp_cols,
        schema_oracle=du_cols,
    )
    if sp_cols != du_cols:
        out.detail = f"column mismatch: spark={sp_cols} oracle={du_cols}"
        return out
    if len(sp_rows) != len(du_rows):
        out.detail = "row-count mismatch"
        return out

    sp_rows.sort(key=_sort_key)
    du_rows.sort(key=_sort_key)
    n_exact = n_close = 0
    first_bad = None
    for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
        exact, close = _cells_equal(a, b)
        n_exact += exact
        n_close += close
        if not close and first_bad is None:
            first_bad = (i, a, b)
    if first_bad is not None:
        i, a, b = first_bad
        out.detail = f"value mismatch at sorted row {i}:\n  spark : {a}\n  oracle: {b}"
        return out
    out.ok = True
    if n_exact < len(sp_rows):
        out.detail = f"WARNING {len(sp_rows) - n_exact}/{len(sp_rows)} rows only float-close, not bit-exact"
    return out
