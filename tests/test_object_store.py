"""Object-store integration evidence (SURVEY A3/A6/A11): the engine's
IO runs against S3-style stores, not just the local filesystem.

Two independent proofs, matching the engine's two IO stacks:

1. **pyarrow surfaces** (Python DataSource scans, the tiff_blocks /
   ktx sinks, resume probes) against a real in-process S3 REST
   endpoint (tests/s3_stub.py) over ``s3://`` URIs — ListObjectsV2,
   ranged GETs, multipart uploads, the lot. Also pins the
   ``s3a:// -> s3://`` alias (clusters configure the Hadoop spelling;
   pyarrow only speaks ``s3://``).

2. **Hadoop-FileSystem surfaces** (driver-side hierarchy discovery,
   N5 attribute JSON) via a compiled shim FileSystem registered as
   ``fs.s3a.impl`` — proving the listing code is scheme-agnostic
   given any classpath implementation, exactly how hadoop-aws plugs
   into a real cluster. Runs in a subprocess so the shim can ride the
   driver classpath without disturbing the shared test session.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from s3_stub import S3Stub  # noqa: E402

from hortacloud_importer_spark.sources.datasource import (  # noqa: E402
    _list_files,
    _pa_fs,
    _read_bytes,
    register_volume_sources,
)
from hortacloud_importer_spark.sources.tiff import (  # noqa: E402
    decode_tiff,
    encode_tiff,
)


def test_s3a_alias_maps_to_pyarrow_s3():
    from pyarrow.fs import S3FileSystem

    fs, path = _pa_fs("s3a://bucket/key?endpoint_override=http://127.0.0.1:1")
    assert isinstance(fs, S3FileSystem)
    assert path == "bucket/key"


def test_s3_tiff_volume_scan(spark):
    """A1/A2 over an object store: slice TIFFs live only in the S3
    endpoint; the tiff_volume DataSource lists and decodes them on
    executors through pyarrow's S3 client."""
    with S3Stub() as s3:
        s3.store.buckets.add("vol")
        want = {}
        for z in range(4):
            arr = ((np.arange(64) * (z + 1)) % 251).astype(np.uint8)
            want[z] = arr
            s3.store.objects[("vol", f"stack/default.0.{z:03d}.tif")] = (
                encode_tiff(arr.reshape(1, 8, 8))
            )
        register_volume_sources(spark)
        vox = (
            spark.read.format("tiff_volume")
            .load(s3.uri("vol", "stack"))
            .groupBy("z")
            .agg({"intensity": "sum", "*": "count"})
            .collect()
        )
        got = {r["z"]: (r["sum(intensity)"], r["count(1)"]) for r in vox}
        assert got == {
            z: (int(a.sum()), 64) for z, a in want.items()
        }


def test_s3_tiff_blocks_sink_writes_multipart(spark):
    """A6/A7 sink to an object store: blockify rows written via the
    tiff_blocks DataSourceWriter land as real zlib TIFF objects (one
    multipart upload each) plus a manifest shard; payloads read back
    byte-exactly through the same endpoint."""
    rng = np.random.default_rng(5)
    vol = rng.integers(1, 4096, size=(2, 4, 4, 4), dtype=np.int64)
    # two channels at one block position -> two objects
    rows = [
        (0, 0, 0, ch, [4, 4, 4], [int(v) for v in vol[ch].ravel()])
        for ch in range(2)
    ]
    with S3Stub() as s3:
        s3.store.buckets.add("out")
        register_volume_sources(spark)
        df = spark.createDataFrame(
            rows,
            "zi int, yi int, xi int, channel int, shape array<int>,"
            " voxels array<bigint>",
        )
        root = s3.uri("out", "octree")
        df.coalesce(1).write.format("tiff_blocks").option(
            "nlevels", "1"
        ).mode("append").save(root)
        keys = sorted(k for (_, k) in s3.store.objects)
        assert any(k.endswith("default.0.tif") for k in keys)
        assert any("_manifest" in k or "manifest" in k for k in keys), keys
        # byte-level read-back through the endpoint
        files = [
            f for f in _list_files(root)
            if f.partition("?")[0].endswith(".tif")
        ]
        assert len(files) == 2
        for f in files:
            name = f.partition("?")[0].rsplit("/", 1)[-1]
            ch = int(name.split(".")[1])
            pages = decode_tiff(_read_bytes(f))
            assert pages.shape == (4, 4, 4, 1)
            assert np.array_equal(
                pages[:, :, :, 0].astype(np.int64), vol[ch]
            )


def test_s3_resume_probe_fresh_store(spark):
    """A11 resume: the pyarrow existence probe recognizes a fresh
    object-store prefix (nothing committed -> run everything) without
    needing a JVM S3 connector."""
    from hortacloud_importer_spark.sources.block_store import resume_filter

    work = spark.range(3).selectExpr(
        "0 as zi", "0 as yi", "cast(id as int) as xi", "0 as channel"
    )
    with S3Stub() as s3:
        s3.store.buckets.add("rs")
        fresh = resume_filter(work, spark, s3.uri("rs", "store"))
        assert fresh.count() == 3


_SHIM_JAVA = """
import java.net.URI;
public class S3aLocalFileSystem
    extends org.apache.hadoop.fs.RawLocalFileSystem {
  @Override public URI getUri() { return URI.create("s3a:///"); }
}
"""

_SUBPROC = """
import sys
from pyspark.sql import SparkSession

shim_dir, store = sys.argv[1], sys.argv[2]
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.driver.extraClassPath", shim_dir)
    .config("spark.hadoop.fs.s3a.impl", "S3aLocalFileSystem")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from hortacloud_importer_spark.sources.hierarchy import discover_hierarchy
from hortacloud_importer_spark.sources.n5 import _read_json

layout = discover_hierarchy(spark, "s3a://" + store)
assert layout == {0: [0, 1], 1: [0]}, layout
attrs = _read_json(spark, "s3a://" + store + "/c0/s0/attributes.json")
assert attrs["dimensions"] == [8, 8, 4], attrs
print("S3A_OK")
"""


@pytest.mark.skipif(
    not os.path.exists("/usr/bin/javac"), reason="no JDK for the shim"
)
def test_s3a_hadoop_fs_listing(tmp_path):
    """A3 discovery + A5 attrs over ``s3a://`` URIs through the Hadoop
    FileSystem API: a shim fs.s3a.impl on the driver classpath (local
    disk behind it) stands in for hadoop-aws; the engine's listing
    code runs unchanged."""
    import json

    import pyspark

    # shim classpath
    shim = tmp_path / "shim"
    shim.mkdir()
    (shim / "S3aLocalFileSystem.java").write_text(_SHIM_JAVA)
    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    cp = ":".join(
        os.path.join(jars, j)
        for j in os.listdir(jars)
        if j.startswith("hadoop-client-api")
    )
    subprocess.run(
        ["javac", "-cp", cp, "S3aLocalFileSystem.java"],
        cwd=shim, check=True, capture_output=True,
    )
    # an n5-ish hierarchy on local disk, addressed via s3a:///
    store = tmp_path / "n5"
    for d in ("c0/s0", "c0/s1", "c1/s0"):
        (store / d).mkdir(parents=True)
    (store / "c0/s0/attributes.json").write_text(
        json.dumps({"dimensions": [8, 8, 4], "dataType": "uint16"})
    )
    script = tmp_path / "probe.py"
    script.write_text(_SUBPROC)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, str(script), str(shim), str(store)],
        capture_output=True, text=True, timeout=240, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "S3A_OK" in r.stdout
