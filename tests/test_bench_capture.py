"""Pin the bench capture's self-adjudication math (round-13 ask #1).

Round 12's driver bench recorded a +31% phantom regression because the
idle gate admitted a run at loadavg 1.77 and the artifact carried no
normalized value — a judge session was spent disproving it. These tests
pin (a) the normalization DIRECTION (a slow host deflates, never
inflates), (b) the band verdict, and (c) the tightened idle-gate
defaults, so a future edit can't silently regress the capture protocol.
"""

import importlib.util
import os

import pytest

_BENCH_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
)
_spec = importlib.util.spec_from_file_location("bench_module", _BENCH_PATH)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_normalization_deflates_on_slow_host():
    # Host 2x slower than reference (calib doubled): a 50 s raw total
    # is really a 25 s run — normalization must DIVIDE by the slowdown.
    assert bench.calib_normalize(50.0, bench.REF_CALIB * 2) == 25.0


def test_normalization_identity_on_reference_host():
    assert bench.calib_normalize(26.0, bench.REF_CALIB) == 26.0


def test_normalization_inflates_on_fast_host():
    # A host 20% faster than reference under-reports; normalize up.
    val = bench.calib_normalize(20.0, bench.REF_CALIB * 0.8)
    assert val == 25.0


def test_normalization_none_calib_falls_back_to_identity():
    assert bench.calib_normalize(26.0, None) == 26.0


def test_band_verdict():
    lo, hi = bench.BAND
    assert bench.band_verdict(lo - 0.1) == "below"
    assert bench.band_verdict(lo) == "inside"
    assert bench.band_verdict((lo + hi) / 2) == "inside"
    assert bench.band_verdict(hi) == "inside"
    assert bench.band_verdict(hi + 0.1) == "above"


def test_band_matches_pinned_repin():
    # r14 repin: 38-query headline set (SOAK.md # BENCH REPIN r14)
    assert bench.BAND == (29.0, 34.0)
    assert bench.REF_CALIB == pytest.approx(0.2407)


def test_idle_gate_defaults_tightened(monkeypatch):
    # The r12 contamination: default MAXLOAD 2.0 admitted loadavg 1.77.
    monkeypatch.delenv("SPARK_GRAFT_BENCH_MAXLOAD", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_BENCH_IDLE_TIMEOUT", raising=False)
    src = open(_BENCH_PATH).read()
    assert '"SPARK_GRAFT_BENCH_MAXLOAD", "0.8"' in src
    assert '"SPARK_GRAFT_BENCH_IDLE_TIMEOUT", "1800"' in src


def test_band_distance_pct():
    lo, hi = bench.BAND
    assert bench.band_distance_pct((lo + hi) / 2) == 0.0
    assert bench.band_distance_pct(hi) == 0.0
    assert bench.band_distance_pct(hi * 1.005) == 0.5
    assert bench.band_distance_pct(lo * 0.99) == -1.0


def test_steal_parser_fixtures():
    # Round-14: hypervisor steal waves (2-10 vCPUs for minutes) are
    # invisible to BOTH the idle gate (loadavg only counts our own
    # runnable tasks) and the calib spin (a pre-run sample misses a
    # wave that lands on the timed region). The capture must therefore
    # carry the steal delta across the timed region. The parser is
    # pinned against FIXED fixtures (r14 ADVICE: the old live-file test
    # was non-hermetic and a no-op on hosts without a steal field):
    # field 9 of the aggregate cpu line, in clock ticks.
    line = "cpu 100 0 200 3000 40 0 5 250 0 0\n"
    assert bench._parse_steal_sec(line, 100.0) == 2.5
    # short line (pre-2.6.11 kernel: no steal field) -> None
    assert bench._parse_steal_sec("cpu 100 0 200 3000\n", 100.0) is None
    # not the aggregate cpu line -> None
    assert (
        bench._parse_steal_sec("cpu0 1 2 3 4 5 6 7 8 9 10\n", 100.0) is None
    )
    # empty / malformed -> None, never a raise
    assert bench._parse_steal_sec("", 100.0) is None
    assert bench._parse_steal_sec("cpu a b c d e f g h i\n", 100.0) is None


def test_steal_reader_live_smoke():
    # at most a smoke assertion against the live file (hermetic tests
    # above carry the real pins)
    val = bench._read_steal_sec()
    assert val is None or (isinstance(val, float) and val >= 0.0)


def test_rep_loop_steal_defenses_present():
    # r14 verdict #1/#3: the rep loop must (a) discard-and-retry a
    # steal-contaminated pass (bounded, stamped in host.*) and
    # (b) clear the SQL cache before each timed execution so
    # min-of-reps measures cold plans. Pin the knobs and the stamps so
    # a refactor can't silently drop the defenses.
    src = open(_BENCH_PATH).read()
    assert '"SPARK_GRAFT_BENCH_STEAL_CPS", "0.5"' in src
    assert '"SPARK_GRAFT_BENCH_STEAL_RETRIES", "2"' in src
    assert '"SPARK_GRAFT_BENCH_COLDCACHE", "1"' in src
    assert "spark.catalog.clearCache()" in src
    for stamp in (
        "steal_cps_reps",
        "steal_discarded_reps",
        "steal_kept_contaminated",
        "cold_cache_reps",
    ):
        assert f'host["{stamp}"]' in src
