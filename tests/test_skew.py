"""Salted aggregation: equality with plain aggregation + plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hortacloud_importer_spark.operators.skew import salted_sum_count


def test_salted_equals_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        r["l_returnflag"]: (r["total"], r["n"])
        for r in salted_sum_count(li, ["l_returnflag"], "l_quantity").collect()
    }
    want = {
        r["l_returnflag"]: (r["total"], r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("total"), F.count("l_quantity").alias("n"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert got[k][0] == pytest.approx(want[k][0], rel=1e-12)


def test_salted_is_two_stage(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = (
        salted_sum_count(li, ["l_returnflag"], "l_quantity")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # two distinct hash-partitionings: (key, salt) then (key); the salt
    # appears as an internal _groupingexpression in the physical plan
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Exchange hashpartitioning(l_returnflag" in plan
    assert "_groupingexpression" in plan


def test_salt_determinism(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    a = salted_sum_count(li, ["l_returnflag"], "l_quantity").collect()
    b = salted_sum_count(li, ["l_returnflag"], "l_quantity").collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
