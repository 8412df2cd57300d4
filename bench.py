#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hortacloud_importer_spark.registry import all_queries
from hortacloud_importer_spark.session import get_spark

# Calibration anchor + expected band for the default headline set at
# sf0.1 (REF_CALIB is BENCH_r10's recorded calib_spin_sec; the band is
# the expected min-of-3 total on an idle host at that calibration).
# The emitted calib_normalized_value = value * REF_CALIB / calib_spin_sec
# rescales a contended capture back to reference-host speed so the
# artifact adjudicates itself instead of costing a judge session.
# Round-14 repin (SOAK.md # BENCH REPIN r14): the headline set grew
# 34 -> 38 (q_dataset_build, corpus_shard, dedup_minhash,
# text_ngram_ppx_norm); the interleaved A/B vs the pinned r8 rev put
# the SHARED-34 sum-of-mins ratio at 1.047 (host-or-noise, no flagged
# per-query regression) and the measured min-of-3 increment of the
# four additions at 5.99 s, so the 24-28 s band shifts by the
# increment (+~1 s width for the added per-query jitter).
REF_CALIB = 0.2407
BAND = (29.0, 34.0)

# Headline set: flagship + one representative per operator family.
# Grown as coverage widens; anything registered can be benched via argv.
HEADLINE = [
    # flagship + aggregates
    "agg_requant_params",
    "agg_percentile",
    "agg_2ndmax",
    "agg_histogram",
    # scans / filters
    "project",
    "filter_range",
    # joins
    "join_inner",
    "join_broadcast",
    "join_anti",
    # windows / sorts
    "win_cumsum",
    "win_rank",
    "topk",
    # sets / streaming duals
    "set_union",
    "stream_tumbling",
    "stream_session",
    # volume engine
    "vol_downsample_2ndmax",
    "vol_cascade",
    "vol_pyramid_throughput",
    "vol_n5_throughput",
    # composite analytics
    "q_ship_priority",
    "q_regional_volume",
    "q_market_share",
    "q_top_supplier",
    "q_cust_order_dist",
    # extensions: dedup / text / similarity / multimodal
    "dedup_exact",
    "dedup_ngram_jaccard",
    "text_wordcount",
    "text_quality",
    "sim_topk",
    "mm_doc_bytes",
    # r4 additions: the oracle-exact ANN + MinHash/SimHash paths and
    # the end-to-end octree-build pipeline
    "sim_ann",
    "dedup_approx",
    "vol_octree_build",
    # r5 addition: the full octree->KTX conversion (stats + requant +
    # mip chains + viewer metadata + manifest commit)
    "vol_ktx_convert",
    # r14 additions (round-13 ask #4): the LLM dataset-build story —
    # the crawl->shards composite, the shard deal, the portable capped
    # MinHash, and one normalized-token text op. Band repinned with a
    # fresh interleaved A/B (SOAK.md # BENCH REPIN r14).
    "q_dataset_build",
    "corpus_shard",
    "dedup_minhash",
    "text_ngram_ppx_norm",
]

# Queries whose final stage is a count-prunable aggregate (count of a
# groupBy = distinct keys, so Catalyst skips the value aggregates and
# records a partly fictional wall — the round-11 soak lesson): bench
# triggers these with a full-row checksum instead of .count().
FULL_AGG = {
    "q_dataset_build",
    "corpus_shard",
    "dedup_minhash",
    "text_ngram_ppx_norm",
}


def _trigger(df, name: str) -> None:
    """Execute a headline query fully. Plain .count() for queries whose
    final aggregate is non-prunable; the FULL_AGG set gets a checksum
    aggregate over every output column so nothing prunes."""
    if name in FULL_AGG:
        from pyspark.sql import functions as F

        df.agg(
            F.sum(
                F.crc32(
                    F.concat_ws(
                        "\x1f",
                        *[F.col(c).cast("string") for c in df.columns],
                    )
                )
            )
        ).collect()
    else:
        df.count()


def calib_normalize(total: float, calib_spin_sec: float | None) -> float:
    """Rescale a measured total to reference-host speed. The calib spin
    is a fixed CPU workload, so a contended/slow host shows calib >
    REF_CALIB and its inflated total must be DEFLATED by REF_CALIB/calib
    (not multiplied by calib/REF_CALIB — easy to invert by accident)."""
    calib = calib_spin_sec or REF_CALIB
    return round(total * REF_CALIB / calib, 3)


def band_verdict(normalized: float) -> str:
    lo, hi = BAND
    if normalized < lo:
        return "below"
    return "inside" if normalized <= hi else "above"


def band_distance_pct(normalized: float) -> float:
    """Signed distance from the band as a percentage of the nearest
    edge: 0.0 inside, +0.5 means 0.5% above the ceiling. The calib
    spin carries ~±3% sampling noise, so a sub-3% 'above' is the
    noise floor, not a regression — this field lets a reader see that
    without recomputing."""
    lo, hi = BAND
    if normalized < lo:
        return round(100.0 * (normalized - lo) / lo, 2)
    if normalized > hi:
        return round(100.0 * (normalized - hi) / hi, 2)
    return 0.0


def _host_fingerprint() -> dict:
    """Identify the machine state a bench run executed under, so a
    round-over-round delta can be attributed to code vs host (round 8
    burned hours proving a 12% 'regression' was a mid-round reboot).
    boot_id changes on every reboot; the calibration microbench is a
    fixed single-threaded CPU workload whose time moves with governor
    / contention, independent of any Spark code."""
    fp: dict = {}
    try:
        with open("/proc/sys/kernel/random/boot_id") as fh:
            fp["boot_id"] = fh.read().strip()
    except OSError:
        fp["boot_id"] = None
    try:
        with open("/proc/loadavg") as fh:
            fp["loadavg_1m"] = float(fh.read().split()[0])
    except (OSError, ValueError):
        fp["loadavg_1m"] = None
    try:
        with open(
            "/sys/devices/system/cpu/cpu0/cpufreq/scaling_governor"
        ) as fh:
            fp["cpu_governor"] = fh.read().strip()
    except OSError:
        fp["cpu_governor"] = None
    fp["cpus"] = os.cpu_count()
    # ~1-2 s fixed integer workload; best-of-3 to shed one-off stalls
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0
        for i in range(2_000_000):
            acc = (acc * 1103515245 + i) & 0xFFFFFFFF
        best = min(best, time.perf_counter() - t0)
    fp["calib_spin_sec"] = round(best, 4)
    return fp


def _read_loadavg() -> float | None:
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except (OSError, ValueError):
        return None


def _parse_steal_sec(stat_line: str, clk_tck: float) -> float | None:
    """Pure parser for the aggregate cpu line of /proc/stat:
    cpu user nice system idle iowait irq softirq steal ... — returns
    the cumulative steal in seconds, or None when the line carries no
    steal field (old kernels) or is not the aggregate cpu line.
    Factored out of the reader so tests pin it against fixed fixtures
    instead of the live /proc/stat (r14 ADVICE)."""
    parts = stat_line.split()
    if not parts or parts[0] != "cpu" or len(parts) < 9:
        return None
    try:
        return float(parts[8]) / clk_tck
    except ValueError:
        return None


def _read_steal_sec() -> float | None:
    """Cumulative hypervisor steal time (seconds) from /proc/stat.

    Round-14 finding: this VM suffers intermittent steal waves (2-10
    vCPUs taken for minutes at a time) that the idle gate and the
    single-threaded calib spin BOTH miss — loadavg only counts our own
    runnable tasks, and steal accrues only while a workload is trying
    to run, so a pre-flight check reads clean and the wave then lands
    on the timed region (a 38-query run recorded 59.3 s under a wave
    vs 29.1 s minutes later; SOAK.md # STEAL ADJUDICATION r14). The
    delta across the timed region, emitted below, makes the capture
    self-adjudicating for this failure mode too."""
    try:
        with open("/proc/stat") as fh:
            line = fh.readline()
        return _parse_steal_sec(line, os.sysconf("SC_CLK_TCK"))
    except (OSError, ValueError):
        return None


def _await_idle() -> tuple[float | None, float, bool]:
    """Pre-flight gate: spin-wait until the 1-min load drops below
    $SPARK_GRAFT_BENCH_MAXLOAD (default 0.8) or the wait exceeds
    $SPARK_GRAFT_BENCH_IDLE_TIMEOUT seconds (default 1800). Returns
    (load_at_release, waited_sec, gate_satisfied). Makes the artifact
    self-validating: a capture that started under contention says so
    in its own fingerprint instead of reading as a fake regression
    (rounds 7-9 each burned hours proving exactly that; round 12's
    default-2.0 gate admitted a run at loadavg 1.77 that recorded a
    +31% phantom regression, hence the tighter default + longer wait)."""
    threshold = float(os.environ.get("SPARK_GRAFT_BENCH_MAXLOAD", "0.8"))
    timeout = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_TIMEOUT", "1800"))
    t0 = time.time()
    while True:
        load = _read_loadavg()
        if load is None:
            return None, round(time.time() - t0, 1), False
        if load < threshold:
            return load, round(time.time() - t0, 1), True
        if time.time() - t0 > timeout:
            return load, round(time.time() - t0, 1), False
        print(
            f"bench: waiting for idle host (load {load:.2f} >= "
            f"{threshold})",
            file=sys.stderr,
        )
        time.sleep(10.0)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    loadavg_pre, idle_wait, idle_ok = _await_idle()
    # Fingerprint BEFORE rep 1 so the recorded load/calibration reflect
    # the state the timings actually ran under, not the post-run state.
    host = _host_fingerprint()
    host["loadavg_pre"] = loadavg_pre
    host["idle_wait_sec"] = idle_wait
    host["idle_gate_ok"] = idle_ok
    spark = get_spark("bench")
    specs = all_queries()
    names = sys.argv[1:] or [n for n in HEADLINE if n in specs]

    # Warm the JVM + parquet footers once so timings measure the queries.
    _trigger(specs[names[0]].fn(spark, sf_dir), names[0])
    for probe in ("vol_n5_throughput", "vol_ktx_convert"):
        if probe in names:
            # first call builds its one-time /tmp store; warm it out of
            # the timed loop so the probe measures decode/convert, not
            # store creation
            specs[probe].fn(spark, sf_dir).count()

    # Best-of-REPS per query: this box is a shared VM, and a noisy
    # neighbor during one execution otherwise reads as a fake 2x
    # "regression" round-over-round. min() is the standard estimator
    # for the code's own cost under external noise; reps are disclosed
    # in the output line.
    # Reps are interleaved (pass over the whole list, then repeat) so a
    # query's executions land minutes apart: contention waves on a
    # shared host span many seconds, and back-to-back reps would both
    # sit inside the same wave.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    # Round-15 (r14 verdict #1): the capture must ACT on its own steal
    # telemetry, not just record it — a steal wave landing on one rep
    # poisons that rep's minima (a serial-stage query read 3x under a
    # wave in BENCH_r14). Steal is sampled per rep pass; a pass whose
    # run-average steal exceeds the 0.5-vCPU contamination threshold
    # (the tools/bench_ab.py discard rule) is DISCARDED and re-run, up
    # to STEAL_MAX_RETRIES extra passes per rep. Retries exhausted =
    # the contaminated pass is kept (minima across the other reps
    # absorb it) and the capture says so in host.steal_kept_contaminated.
    steal_thresh = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_CPS", "0.5"))
    steal_max_retries = int(
        os.environ.get("SPARK_GRAFT_BENCH_STEAL_RETRIES", "2")
    )
    # Round-15 (r14 verdict #3): cold-plan reps. minhash/simhash
    # signature caches are plan-matched by the CacheManager ACROSS
    # reps (the r14 driver tail logged "Asked to cache already cached
    # data"), so min-of-reps silently took a warm-cache rep for the
    # dedup family. Clearing the cache before every timed execution
    # makes each measurement compute from the parquet inputs.
    # Env-gated ONLY so the methodology delta itself is measurable by
    # interleaved A/B (tools/exp_env_ab.py); default is the honest cold
    # mode.
    cold_cache = os.environ.get("SPARK_GRAFT_BENCH_COLDCACHE", "1") != "0"
    steal_pre = _read_steal_sec()
    t_timed0 = time.time()
    timings: dict[str, float] = {name: float("inf") for name in names}
    steal_cps_reps: list[float | None] = []
    steal_discarded = 0
    steal_kept_contaminated = 0
    for _ in range(reps):
        for attempt in range(steal_max_retries + 1):
            pass_timings: dict[str, float] = {}
            rep_steal0 = _read_steal_sec()
            rep_t0 = time.time()
            for name in names:
                if cold_cache:
                    spark.catalog.clearCache()
                t0 = time.time()
                _trigger(specs[name].fn(spark, sf_dir), name)
                pass_timings[name] = time.time() - t0
            rep_steal1 = _read_steal_sec()
            rep_cps = None
            if rep_steal0 is not None and rep_steal1 is not None:
                rep_cps = round(
                    (rep_steal1 - rep_steal0)
                    / max(time.time() - rep_t0, 1e-9),
                    3,
                )
            contaminated = rep_cps is not None and rep_cps > steal_thresh
            if contaminated and attempt < steal_max_retries:
                steal_discarded += 1
                print(
                    f"bench: rep pass DISCARDED (steal {rep_cps} vCPUs "
                    f"avg > {steal_thresh}) — re-running",
                    file=sys.stderr,
                )
                continue
            if contaminated:
                steal_kept_contaminated += 1
                print(
                    f"bench: KEPT CONTAMINATED rep pass (steal {rep_cps} "
                    "vCPUs avg, retries exhausted)",
                    file=sys.stderr,
                )
            steal_cps_reps.append(rep_cps)
            for name, t in pass_timings.items():
                timings[name] = min(timings[name], t)
            break
    timings = {name: round(t, 3) for name, t in timings.items()}

    host["loadavg_post"] = _read_loadavg()
    steal_post = _read_steal_sec()
    if steal_pre is not None and steal_post is not None:
        # Steal accrued across the timed region, and the average number
        # of vCPUs the hypervisor took while it ran. ~0 on a healthy
        # run; > 0.5 sustained means the timings are contaminated by a
        # steal wave (see _read_steal_sec) and should be re-run, not
        # read as a regression. Since round 15 the rep loop above
        # already discards-and-retries contaminated passes, so this
        # whole-region average (which includes discarded passes) is the
        # pessimistic bound; steal_cps_reps carries the per-KEPT-pass
        # values the minima were actually taken from (r14 ADVICE: a
        # whole-run average dilutes a single-rep wave by 1/reps).
        wall = max(time.time() - t_timed0, 1e-9)
        host["steal_sec"] = round(steal_post - steal_pre, 2)
        host["steal_cps"] = round((steal_post - steal_pre) / wall, 3)
    host["steal_cps_reps"] = steal_cps_reps
    host["steal_discarded_reps"] = steal_discarded
    host["steal_kept_contaminated"] = steal_kept_contaminated
    host["cold_cache_reps"] = cold_cache
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "reps": reps,
        "agg": "min",
        "host": host,
    }
    # Self-adjudicating capture: normalize by the calibration spin so a
    # contended host reads as "inside band (normalized)" instead of a
    # phantom regression. Band verdict only applies to the canonical
    # configuration (default headline set at sf0.1).
    out["calib_normalized_value"] = calib_normalize(
        total, host.get("calib_spin_sec")
    )
    if not sys.argv[1:] and abs(sf - 0.1) < 1e-9:
        out["band"] = list(BAND)
        out["band_verdict"] = band_verdict(out["calib_normalized_value"])
        out["band_distance_pct"] = band_distance_pct(
            out["calib_normalized_value"]
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
