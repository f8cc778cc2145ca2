"""Shared helpers for the tools/ measurement scripts.

These scripts exist to produce the committed evidence artifacts
(KBENCH_r*.json, the profile decompositions behind BENCH_r* numbers);
the helpers here are the parts worth testing: relay-canary-corrected
timing and the committed bench-session fixture loading.
"""

import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

_canary_fn = None
_canary_x = None


def canary():
    """Per-dispatch relay overhead right now. The shared-chip TPU tunnel
    has episodes where EVERY dispatch costs ~25-30 ms; measuring a tiny
    jitted op alongside each timed repeat lets callers subtract the
    episode cost instead of averaging it in."""
    global _canary_fn, _canary_x
    import jax
    import jax.numpy as jnp

    if _canary_fn is None:
        _canary_x = jnp.ones((8,))
        _canary_fn = jax.jit(lambda x: x * 2.0)
        jax.block_until_ready(_canary_fn(_canary_x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(_canary_fn(_canary_x))
        best = min(best, time.perf_counter() - t0)
    return best


def timed(fn, *args, repeats=12, correct_canary=True, sleep=0.05):
    """Best-of-`repeats` wall time of fn(*args) with block_until_ready,
    canary-corrected per repeat (see canary()). Returns seconds."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        c0 = canary() if correct_canary else 0.0
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0 - c0)
        if sleep:
            time.sleep(sleep)
    return best


def timed_detailed(fn, *args, repeats=12, sleep=0.05):
    """Like timed() but returns (best_raw_s, best_corrected_s, last_out)."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    best_corr = float("inf")
    for _ in range(repeats):
        c0 = canary()
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        best_corr = min(best_corr, dt - c0)
        if sleep:
            time.sleep(sleep)
    return best, best_corr, out


def default_session_dir():
    """The committed bench session fixture (bench_assets/session, built by
    tools/build_bench_assets.py) unless BENCH_SESSION points elsewhere."""
    return os.environ.get(
        "BENCH_SESSION", str(REPO / "bench_assets" / "session")
    )


def load_bench_session(path=None):
    from dpg_slam_tpu.utils.checkpoint import load_checkpoint

    return load_checkpoint(path or default_session_dir())
