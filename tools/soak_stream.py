#!/usr/bin/env python3
"""Streaming kill-restart soak (VERDICT r8 #5): SIGKILL the driver
JVM mid-stream and prove exactly-once resume of the `tiff_volume`
stream source + stateful mipmap cascade from checkpoints alone.

Unlike tests/test_streaming.py's graceful stop/restart, nothing here
is allowed to flush: phase A runs the stream under an unbounded
processing-time trigger and the parent kills the WHOLE process group
with SIGKILL once a few micro-batches have committed (typically
mid-batch, leaving orphan part-files in the sink and a torn state
snapshot attempt in the checkpoint). Phase B restarts from the same
checkpoint on a 200 ms processing-time trigger and drains by polling
the Spark-visible sink (Python micro-batch sources lack
Trigger.AvailableNow). The verdict requires:

- every (level, z) daughter slice of the full pyramid present EXACTLY
  once in the Spark-visible sink (file-sink _spark_metadata dedupe),
- every voxel byte-identical to an in-process NumPy replay of the
  same bounded-state cascade kernel over the same slices,
- orphan part-files from the killed batch (if any) are counted and
  shown to be excluded by the metadata log.

Appends a '# STREAM KILL-RESTART SOAK' section to SOAK.md.

Usage: python tools/soak_stream.py            (orchestrator)
       python tools/soak_stream.py --worker A|B  (internal)
"""

from __future__ import annotations

import glob
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIX = "/tmp/spark_graft_soak_stream"
SLICES = f"{FIX}/slices"
OUT = f"{FIX}/out"
CKPT = f"{FIX}/ckpt"
VERDICT = f"{FIX}/verdict.json"
DIMS = (64, 64, 64)  # z, y, x
PER_BATCH = 4
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")


def _volume():
    import numpy as np

    rng = np.random.default_rng(20260815)
    vol = rng.integers(0, 65536, DIMS, dtype=np.uint16)
    vol[vol % 5 == 0] = 0  # realistic zero fraction (zero-is-NULL path)
    return vol


def make_fixture() -> None:
    from hortacloud_importer_spark.sources.tiff import encode_tiff

    if os.path.exists(f"{SLICES}/done"):
        return
    os.makedirs(SLICES, exist_ok=True)
    vol = _volume()
    for z in range(DIMS[0]):
        with open(f"{SLICES}/slice.{z:04d}.tif", "wb") as fh:
            fh.write(encode_tiff(vol[z][None, ...], compression="zlib"))
    with open(f"{SLICES}/done", "w") as fh:
        fh.write("ok")


def _spark():
    from pyspark.sql import SparkSession

    from hortacloud_importer_spark.sources.datasource import (
        register_volume_sources,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .appName("soak_stream")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    register_volume_sources(spark)
    return spark


def _stream_query(spark, trigger: dict):
    from pyspark.sql import functions as F

    from hortacloud_importer_spark.streaming.cascade import streaming_cascade

    slices = (
        spark.readStream.format("tiff_volume")
        .option("emit", "slices")
        .option("max_slices_per_batch", PER_BATCH)
        .load(SLICES)
        .select(
            F.lit(0).alias("zi"),
            F.lit(0).alias("yi"),
            F.lit(0).alias("xi"),
            F.lit(0).alias("channel"),
            "z",
            "height",
            "width",
            "voxels",
        )
    )
    return (
        streaming_cascade(slices, DIMS, "arthur")
        .writeStream.format("parquet")
        .option("path", OUT)
        .option("checkpointLocation", CKPT)
        .trigger(**trigger)
        .start()
    )


def worker_a() -> None:
    """Run micro-batches until killed; never stops on its own."""
    spark = _spark()
    q = _stream_query(spark, {"processingTime": "0 seconds"})
    q.awaitTermination()  # parent SIGKILLs the process group


def worker_b() -> None:
    """Resume from the checkpoint, drain, then validate exactly-once.

    Python micro-batch sources have no Trigger.AvailableNow support
    (the engine's tests poll processing-time triggers for the same
    reason, tests/test_datasource.py:231), so drain by polling the
    Spark-visible sink until the full pyramid arrives."""
    import numpy as np

    from hortacloud_importer_spark.streaming.cascade import MipmapCascade

    expected_total = 0
    d = list(DIMS)
    from hortacloud_importer_spark.volume.downsample import mipmap_dimension

    while max(d) > 1:
        d = [mipmap_dimension(1, x) for x in d]
        expected_total += d[0]

    spark = _spark()
    q = _stream_query(spark, {"processingTime": "200 milliseconds"})

    def visible():
        try:
            return spark.read.parquet(OUT).count()
        except Exception:
            return 0

    deadline = time.time() + 600
    while visible() < expected_total and time.time() < deadline:
        time.sleep(0.5)
    time.sleep(1)  # let the final batch commit settle
    q.stop()
    q.awaitTermination(60)

    # Spark-visible rows (file sink consults _spark_metadata)
    rows = spark.read.parquet(OUT).collect()
    got = {}
    dups = []
    for r in rows:
        key = (r["level"], r["z"])
        if key in got:
            dups.append(key)
        got[key] = np.asarray(r["voxels"], dtype=np.int64).reshape(
            r["height"], r["width"]
        )

    # independent replay of the bounded-state kernel
    vol = _volume()
    cascade = MipmapCascade(DIMS, "arthur")
    want = {}
    for z in range(DIMS[0]):
        for level, cz, daughter in cascade.feed(
            z, vol[z].astype(np.int64)
        ):
            want[(level, cz)] = daughter

    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    mismatched = [
        k for k in want if k in got and not np.array_equal(got[k], want[k])
    ]

    raw_parts = len(glob.glob(f"{OUT}/part-*"))
    committed_rows = len(rows)
    verdict = {
        "expected_slices": len(want),
        "visible_slices": len(got),
        "duplicates": [list(k) for k in dups],
        "missing": [list(k) for k in missing],
        "extra": [list(k) for k in extra],
        "value_mismatches": [list(k) for k in mismatched],
        "raw_part_files": raw_parts,
        "committed_rows": committed_rows,
        "ok": not (dups or missing or extra or mismatched),
    }
    with open(VERDICT, "w") as fh:
        json.dump(verdict, fh, indent=1)


def _commits(ckpt: str = CKPT) -> int:
    return len(
        [
            f
            for f in glob.glob(f"{ckpt}/commits/*")
            if not f.endswith(".tmp") and not f.endswith(".crc")
        ]
    )


# --- scenario 2: streaming dedup (dropDuplicatesWithinWatermark) ----
#
# 60 one-doc JSON files, event time advancing 1 minute per doc,
# watermark 5 minutes, ONE file per micro-batch. Duplicate plan
# (chosen so the outcome is independent of where batch boundaries or
# the SIGKILL land — the state-expiry threshold is ~12 docs with this
# geometry, and both dup distances sit far from it):
#   i % 10 == 3 -> text copies doc i-2  (inside the horizon: DROPPED;
#                  doc 3's source doc 1 commits BEFORE the kill, so
#                  this also proves fingerprint state survives SIGKILL)
#   i % 10 == 7, i >= 30 -> text copies doc i-30 (far past the
#                  horizon: fingerprint expired, RE-EMITTED)
DDOCS = 60
DDEDUP = f"{FIX}/dedup"
DDIR = f"{DDEDUP}/docs"
DOUT = f"{DDEDUP}/out"
DCKPT = f"{DDEDUP}/ckpt"
DVERDICT = f"{DDEDUP}/verdict.json"


def _dedup_doc(i: int) -> dict:
    if i % 10 == 3:
        src = i - 2
    elif i % 10 == 7 and i >= 30:
        src = i - 30
    else:
        src = i
    return {
        "doc_id": i,
        "ts": f"2026-01-01 10:{i:02d}:00",
        "text": f"document body number {src} lorem ipsum",
    }


def make_dedup_fixture() -> None:
    if os.path.exists(f"{DDIR}/done"):
        return
    os.makedirs(DDIR, exist_ok=True)
    base = time.time() - 3600
    for i in range(DDOCS):
        p = f"{DDIR}/doc.{i:04d}.json"
        with open(p, "w") as fh:
            fh.write(json.dumps(_dedup_doc(i)) + "\n")
        # file-stream batches follow mtime order: pin it to doc order
        os.utime(p, (base + i, base + i))
    with open(f"{DDIR}/done", "w") as fh:
        fh.write("ok")
    os.utime(f"{DDIR}/done", (base - 10, base - 10))


def _dedup_query(spark, trigger: dict):
    from hortacloud_importer_spark.streaming.windows import streaming_dedup

    docs = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .json(f"{DDIR}/*.json")  # not the fixture's `done` marker
    )
    return (
        streaming_dedup(docs, watermark="5 minutes")
        .writeStream.format("parquet")
        .option("path", DOUT)
        .option("checkpointLocation", DCKPT)
        .trigger(**trigger)
        .start()
    )


def worker_da() -> None:
    spark = _spark()
    q = _dedup_query(spark, {"processingTime": "0 seconds"})
    q.awaitTermination()  # parent SIGKILLs the process group


def worker_db() -> None:
    drops = {i for i in range(DDOCS) if i % 10 == 3}
    reemits = {i for i in range(DDOCS) if i % 10 == 7 and i >= 30}
    expected = set(range(DDOCS)) - drops

    spark = _spark()
    q = _dedup_query(spark, {"processingTime": "200 milliseconds"})

    def visible():
        try:
            return spark.read.parquet(DOUT).count()
        except Exception:
            return 0

    deadline = time.time() + 600
    while visible() < len(expected) and time.time() < deadline:
        time.sleep(0.5)
    time.sleep(1)
    q.stop()
    q.awaitTermination(60)

    rows = spark.read.parquet(DOUT).collect()
    got = [r["doc_id"] for r in rows]
    verdict = {
        "expected_docs": len(expected),
        "visible_docs": len(got),
        "duplicates": sorted(
            {d for d in got if got.count(d) > 1}
        ),
        "missing": sorted(expected - set(got)),
        "extra": sorted(set(got) - expected),
        "dropped_recrawls_stayed_dropped": sorted(
            drops & set(got)
        ) == [],
        "past_horizon_reemitted": sorted(reemits - set(got)) == [],
        "ok": (
            sorted(got) == sorted(expected)
            and len(got) == len(expected)
        ),
    }
    with open(DVERDICT, "w") as fh:
        json.dump(verdict, fh, indent=1)


def run_dedup_scenario() -> "dict | None":
    import shutil

    make_dedup_fixture()
    for d in (DOUT, DCKPT):
        shutil.rmtree(d, ignore_errors=True)
    if os.path.exists(DVERDICT):
        os.unlink(DVERDICT)

    kill_after = 3  # one-file batches committed before the SIGKILL
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", "DA"],
        start_new_session=True,
    )
    killed_at = None
    try:
        while True:
            if proc.poll() is not None:
                print("worker DA exited prematurely", file=sys.stderr)
                return None
            n = _commits(DCKPT)
            if n >= kill_after:
                killed_at = n
                os.killpg(proc.pid, signal.SIGKILL)
                break
            time.sleep(0.2)
    finally:
        if proc.poll() is None:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
    proc.wait()
    t_kill = time.time() - t0
    print(
        f"dedup phase A: SIGKILL after {killed_at} committed one-doc "
        f"micro-batches ({t_kill:.1f}s)"
    )
    t1 = time.time()
    rc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", "DB"]
    ).returncode
    t_resume = time.time() - t1
    if rc != 0 or not os.path.exists(DVERDICT):
        print("worker DB failed", file=sys.stderr)
        return None
    v = json.load(open(DVERDICT))
    v["killed_at"] = killed_at
    v["kill_sec"] = round(t_kill, 1)
    v["resume_sec"] = round(t_resume, 1)
    # the commit poll is racy (0.2s): only claim a state-store
    # straddle if a (i-2, i) duplicate pair REALLY spans the kill
    # point (source doc i-2 committed before it, re-crawl doc i after)
    straddle = [
        i for i in range(3, DDOCS, 10) if i - 2 < killed_at <= i
    ]
    if straddle:
        i = straddle[0]
        v["straddle_note"] = (
            f"The doc-{i}/doc-{i - 2} duplicate pair STRADDLES it — "
            f"doc {i - 2}'s fingerprint lives only in the checkpointed"
            f" state store when doc {i} arrives post-resume."
        )
    else:
        v["straddle_note"] = (
            "No within-horizon duplicate pair happened to straddle "
            "this kill point (the commit poll overshot); the "
            "exactly-once and drop/re-emit checks below still hold, "
            "but the state-survival evidence for THIS run comes from "
            "the re-emit set only — re-run for a straddling kill."
        )
    v["straddling_pairs"] = straddle
    print(json.dumps(v, indent=1))
    return v


def main() -> int:
    import shutil

    make_fixture()
    for d in (OUT, CKPT):
        shutil.rmtree(d, ignore_errors=True)
    if os.path.exists(VERDICT):
        os.unlink(VERDICT)

    total_batches = -(-DIMS[0] // PER_BATCH)
    kill_after = 3  # commits before the SIGKILL

    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", "A"],
        start_new_session=True,  # own process group: kill takes the JVM
    )
    killed_at = None
    try:
        while True:
            if proc.poll() is not None:
                print("worker A exited prematurely", file=sys.stderr)
                return 1
            n = _commits()
            if n >= kill_after:
                killed_at = n
                os.killpg(proc.pid, signal.SIGKILL)
                break
            time.sleep(0.2)
    finally:
        if proc.poll() is None:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
    proc.wait()
    t_kill = time.time() - t0
    print(
        f"phase A: SIGKILL after {killed_at} committed micro-batches "
        f"(~{killed_at * PER_BATCH}/{DIMS[0]} slices, {t_kill:.1f}s)"
    )

    t1 = time.time()
    rc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", "B"]
    ).returncode
    t_resume = time.time() - t1
    if rc != 0 or not os.path.exists(VERDICT):
        print("worker B failed", file=sys.stderr)
        return 1
    v = json.load(open(VERDICT))
    print(json.dumps(v, indent=1))
    if not v["ok"]:
        return 1

    dv = run_dedup_scenario()
    if dv is None or not dv["ok"]:
        print("streaming-dedup scenario failed", file=sys.stderr)
        return 1

    section = [
        "# STREAM KILL-RESTART SOAK — exactly-once under SIGKILL",
        "",
        "Generated by `tools/soak_stream.py`: the `tiff_volume` stream "
        "source + stateful mipmap cascade (applyInPandasWithState) run "
        "as a separate driver process, SIGKILLed (whole process group, "
        "no flush) mid-stream, then resumed from the checkpoint in a "
        "fresh process on a 200 ms processing-time trigger, drained by "
        "polling the Spark-visible sink (Python micro-batch sources "
        "lack Trigger.AvailableNow).",
        "",
        f"- Volume: {DIMS[0]} z-slices x {DIMS[1]}x{DIMS[2]} uint16 "
        f"ZLIB TIFFs, {PER_BATCH} slices per micro-batch "
        f"({total_batches} batches total).",
        f"- SIGKILL landed after **{killed_at} committed micro-batches** "
        f"(~{killed_at * PER_BATCH}/{DIMS[0]} slices, {t_kill:.1f}s in); "
        f"resume + drain took {t_resume:.1f}s.",
        f"- Result: **{v['visible_slices']}/{v['expected_slices']} "
        "pyramid slices visible exactly once** — 0 duplicates, 0 "
        "missing, 0 value mismatches vs an in-process NumPy replay of "
        "the same bounded-state kernel.",
        f"- The sink directory held {v['raw_part_files']} raw part-files; "
        "the Spark-visible row count came from the file-sink "
        "`_spark_metadata` log, which is what excludes any orphan "
        "part-file the killed batch left behind — reading the directory "
        "as bare parquet (bypassing the log) is NOT exactly-once, and "
        "downstream consumers must go through the sink's table, not its "
        "files.",
        "- Checkpointed state (the pickled cascade, <= 3 slices x "
        "levels per key) replayed the half-fed level buffers: the "
        "deepest mip (one slice) needs parents from both sides of the "
        "kill point and came out byte-identical.",
        "",
        "## Scenario 2: streaming dedup "
        "(dropDuplicatesWithinWatermark) under SIGKILL",
        "",
        "The LIVE `streaming_dedup` wrapper (streaming/windows.py — "
        "the operator whose batch dual `stream_dedup` is oracle-exact)"
        " over a 60-doc file stream, one doc per micro-batch, event "
        "time +1 min/doc, watermark 5 min. Re-crawls at distance 2 "
        "(inside the horizon) must DROP; re-crawls at distance 30 "
        "(fingerprint expired) must RE-EMIT — the semantics the batch "
        "dual pins, here proven to survive a SIGKILL: the kill lands "
        f"after **{dv['killed_at']} one-doc batches** "
        f"({dv['kill_sec']}s in). {dv['straddle_note']}",
        "",
        f"- Result: **{dv['visible_docs']}/{dv['expected_docs']} docs "
        "visible exactly once** — 0 duplicates, 0 missing, 0 extra "
        f"(resume + drain {dv['resume_sec']}s).",
        "- All 6 within-horizon re-crawls stayed dropped: "
        f"{dv['dropped_recrawls_stayed_dropped']}; all 3 past-horizon "
        f"re-crawls re-emitted: {dv['past_horizon_reemitted']} — the "
        "re-emit-past-horizon contract holds across the state-store "
        "resume, and the dup distances (2 and 30 vs the ~12-doc "
        "expiry threshold) make the outcome independent of where "
        "batch boundaries or the kill land.",
        "",
    ]
    path = os.path.join(REPO, "SOAK.md")
    text = ""
    marker = "# STREAM KILL-RESTART SOAK"
    if os.path.exists(path):
        text = open(path).read()
        start = 0 if text.startswith(marker) else text.find("\n" + marker)
        if start >= 0:
            nxt = text.find("\n# ", start + 1)
            text = text[:start] + (text[nxt:] if nxt >= 0 else "")
    if text and not text.endswith("\n"):
        text += "\n"
    with open(path, "w") as fh:
        fh.write(text + "\n".join(section))
    print("SOAK.md updated")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        which = sys.argv[2]
        if which in ("A", "B"):
            make_fixture()
            worker_a() if which == "A" else worker_b()
        else:
            make_dedup_fixture()
            worker_da() if which == "DA" else worker_db()
        sys.exit(0)
    sys.exit(main())
