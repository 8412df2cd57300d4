"""Multi-executor execution proof (SURVEY.md §4: "design for
multi-executor via partitioning").

Everything else in the suite runs single-JVM ``local[N]``, which can
hide cluster-only failure modes: un-serializable task closures,
driver-state leaking into kernels, broadcasts that silently became
driver references, Python workers missing module state. Spark's
``local-cluster[2,4,2048]`` master launches REAL worker JVMs with
separate Python workers and a network shuffle — the closest a test
gets to a cluster without one. This runs the full fused build +
interleaved KTX conversion there (in a subprocess: a second master
cannot coexist with the session fixture's) and requires the store
and KTX bytes to match the single-JVM run EXACTLY.

Found-by-this-test (kept as documentation): executors do not inherit
the driver's sys.path — the package must ship via --py-files /
executorEnv.PYTHONPATH on a real cluster, which is what the
subprocess configures.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

from hortacloud_importer_spark.pipelines import build_octree, tiff_octree_to_ktx
from hortacloud_importer_spark.volume import synthetic_volume

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """
import sys, json
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.appName("lc")
    .master("local-cluster[2,4,2048]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.python.filterPushdown.enabled", "true")
    .config("spark.executor.memory", "2g")
    .config("spark.executorEnv.PYTHONPATH", {repo!r})
    .config("spark.ui.enabled", "false")
    .getOrCreate())
from hortacloud_importer_spark.pipelines import build_octree, tiff_octree_to_ktx
from hortacloud_importer_spark.volume import synthetic_volume
v = synthetic_volume(spark, 16, 16, 16, zero_fraction_mod=5)
build_octree(spark, v, {store!r}, nlevels=2, filter_="arthur",
             dims=(16, 16, 16)).collect()
res = tiff_octree_to_ktx(spark, {store!r}, {ktx!r}, block_dims=(8, 8, 8),
    n_mips=3, filter_="arthur", interleave=True,
    downsample_intensity=True).first()
print("RESULT " + json.dumps(dict(res.asDict())))
spark.stop()
"""


def _files(root: str, pattern: str) -> dict[str, bytes]:
    return {
        os.path.relpath(p, root): open(p, "rb").read()
        for p in glob.glob(f"{root}/**/{pattern}", recursive=True)
    }


def test_fused_pipelines_byte_identical_under_real_executors(
    spark, tmp_path
):
    # same basenames on both sides: specimen_id defaults to the store
    # dir name and is baked into every KTX header's KV payload
    (tmp_path / "lc").mkdir()
    (tmp_path / "l").mkdir()
    lc_store, lc_ktx = str(tmp_path / "lc" / "store"), str(tmp_path / "lc" / "ktx")
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER.format(repo=_REPO, store=lc_store, ktx=lc_ktx)],
        capture_output=True,
        text=True,
        timeout=360,
        cwd=_REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert '"n_files": 9' in proc.stdout, proc.stdout

    local_store, local_ktx = str(tmp_path / "l" / "store"), str(tmp_path / "l" / "ktx")
    v = synthetic_volume(spark, 16, 16, 16, zero_fraction_mod=5)
    build_octree(
        spark, v, local_store, nlevels=2, filter_="arthur", dims=(16, 16, 16)
    ).collect()
    tiff_octree_to_ktx(
        spark, local_store, local_ktx, block_dims=(8, 8, 8), n_mips=3,
        filter_="arthur", interleave=True, downsample_intensity=True,
    ).count()

    for root_a, root_b, pat in (
        (lc_store, local_store, "*.tif"),
        (lc_ktx, local_ktx, "*.ktx"),
    ):
        a, b = _files(root_a, pat), _files(root_b, pat)
        assert sorted(a) == sorted(b), (pat, sorted(a), sorted(b))
        assert all(a[f] == b[f] for f in a), pat
