#!/usr/bin/env python
"""Dump .explain('formatted') for registry queries to plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [names...]
  tag    subdirectory under plans/ and the _before/_after suffix,
         e.g. "r14/before" writes plans/r14/<name>_before.txt.
Defaults to the bench HEADLINE set when no names are given.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hortacloud_importer_spark.registry import all_queries
from hortacloud_importer_spark.session import get_spark


def main() -> None:
    if len(sys.argv) < 2 or "/" not in sys.argv[1]:
        raise SystemExit("usage: capture_plans.py <round>/<before|after> [names...]")
    rnd, suffix = sys.argv[1].split("/", 1)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", rnd)
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark("capture-plans")
    specs = all_queries()
    import bench

    names = sys.argv[2:] or [n for n in bench.HEADLINE if n in specs]
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
