"""Smoke tests for the tools/ measurement scripts.

These scripts produce the committed evidence artifacts (KBENCH_r*.json,
the profile decompositions behind BENCH_r* numbers). The TPU-only timing
sweeps can't run in CI, but the shared plumbing can: canary-corrected
timing, committed-fixture loading, and the native-baseline measurement
path (cpu_baseline_time runs end-to-end here).
"""

import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:  # pragma: no cover
    sys.path.insert(0, str(REPO))

from tools import _common  # noqa: E402

SESSION_FIX = REPO / "bench_assets" / "session"


def test_timed_returns_positive_seconds():
    calls = []

    def fn(x):
        calls.append(1)
        return x * 2

    t = _common.timed(fn, np.ones(4), repeats=3, sleep=0)
    # warmup + 3 repeats; canary overhead can exceed the op cost on a
    # fast host, so only sanity-bound the magnitude.
    assert len(calls) == 4
    assert t < 10.0


def test_timed_detailed_matches_timed_contract():
    t, tc, out = _common.timed_detailed(lambda x: x + 1, np.zeros(3), repeats=2, sleep=0)
    assert t >= 0.0
    assert tc <= t  # corrected subtracts a non-negative canary
    np.testing.assert_array_equal(np.asarray(out), np.ones(3))


@pytest.mark.skipif(not SESSION_FIX.exists(), reason="fixture not committed")
def test_load_bench_session_default_is_committed_fixture():
    assert _common.default_session_dir() == str(SESSION_FIX)
    eng = _common.load_bench_session()
    assert eng.num_nodes() > 100  # the two-pass bench session
    assert np.isfinite(np.asarray(eng.state.poses[: eng.num_nodes()])).all()


@pytest.mark.skipif(not SESSION_FIX.exists(), reason="fixture not committed")
def test_cpu_baseline_time_runs(capsys):
    """The C++-baseline measurement path end-to-end on the committed
    session (the denominator of the headline vs_baseline number)."""
    from dpg_slam_tpu.io.logs import native_lib

    if native_lib() is None:
        pytest.skip("native library not built (make -C native)")
    from tools import cpu_baseline_time

    old_argv = sys.argv
    sys.argv = ["cpu_baseline_time"]
    try:
        cpu_baseline_time.main()
    finally:
        sys.argv = old_argv
    outp = capsys.readouterr().out
    assert "native C++ reoptimize:" in outp
    assert "pairs" in outp


def test_tpu_tools_parse():
    """The TPU-only measurement scripts must at least parse (they guard
    production-path regressions; a syntax error would surface only on
    bench day otherwise)."""
    import ast
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent / "tools"
    for name in ("tpu_batch_experiments.py", "tpu_batch_experiments2.py",
                 "profile_batched_solve.py", "kbench.py", "profile2.py",
                 "roofline_r05.py", "parity_jump_study.py",
                 "lanes_quality_sweep.py"):
        ast.parse((root / name).read_text())


def test_bench_batched_helpers_cpu():
    """bench.py's batched-session helpers run end-to-end on CPU: session
    builder shapes, pack/schedule integration, and the from-scratch
    native-C++ baseline wrapper."""
    import bench
    from dpg_slam_tpu import batch

    cfg = bench._bench_config()
    sessions, gts = bench.build_batched_sessions(cfg, n_sessions=2, laps=1)
    assert len(sessions) == len(gts) == 2
    kf_odom, kf_scans, kf_valid, counts = batch.pack_sessions(cfg, sessions)
    assert kf_odom.shape[0] == max(counts)
    assert kf_scans.shape[2] == cfg.scan.num_beams
    fps = bench.bench_cpu_scratch(cfg, sessions[0])
    assert fps > 1.0


def test_bench_phase_degrades_to_default(capsys):
    """A failing bench phase must contribute its default and not raise
    (the artifact survives relay wedge episodes)."""
    import time

    import bench

    t0 = time.perf_counter()

    def boom():
        raise RuntimeError("relay wedged")

    out = bench._phase("demo", t0, boom, (float("nan"), 0))
    assert out == (out[0], 0) and out[0] != out[0]  # nan default passthrough
    err = capsys.readouterr().err
    assert "PHASE FAILED demo" in err and "relay wedged" in err
    assert bench._phase("ok", t0, lambda: 7, None) == 7
