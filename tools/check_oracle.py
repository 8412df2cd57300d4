#!/usr/bin/env python
"""Local oracle runner: compare every registered query against DuckDB.

Usage: python tools/check_oracle.py [--sf SF_DIR] [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hortacloud_importer_spark.registry import all_queries
from hortacloud_importer_spark.session import get_spark
from hortacloud_importer_spark.testing.compare import compare_query, duckdb_connect


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    specs = all_queries()
    names = args.names or list(specs)
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}; registered: {sorted(specs)}")
        return 2
    spark = get_spark("oracle-check")
    con = duckdb_connect(args.sf)

    failures = 0
    rows_only = 0
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            df = spec.fn(spark, args.sf)
            if spec.oracle is None:
                n = df.count()
                print(f"ROWS-ONLY {name}: {n} rows ({time.time()-t0:.1f}s)")
                rows_only += 1
                continue
            res = compare_query(name, df, con, spec.oracle)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        print(f"{res} ({time.time()-t0:.1f}s)")
        failures += 0 if res.ok else 1
    print(
        f"\n{len(names) - failures - rows_only} ok, {rows_only} rows-only, "
        f"{failures} failed, of {len(names)}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
