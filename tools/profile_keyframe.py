"""Profile the online keyframe step on real TPU: frontend vs solve split.

The offline scan form (ONE compiled lax.scan over the continuation
keyframes, bench.bench_tpu_offline's execution shape) is timed in three
variants — full step, frontend-only (no graph solve), and
odometry-only — so the per-keyframe cost splits into solve / frontend /
scan-plumbing without any per-step relay RTT.

Run: timeout 550 python tools/profile_keyframe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from dpg_slam_tpu import engine as eng_mod


def timed_scan(run, state, odom, scans, n_steps, repeats=4):
    out = run(state, odom, scans)
    jax.block_until_ready(out.poses)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run(state, odom, scans)
        jax.block_until_ready(out.poses)
        best = min(best, time.perf_counter() - t0)
        time.sleep(0.03)
    return best / n_steps


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = bench._bench_config()
    import pathlib

    fix = pathlib.Path(bench.__file__).resolve().parent / "bench_assets" / "keyframe"
    from dpg_slam_tpu.utils.checkpoint import load_checkpoint

    eng = load_checkpoint(fix)
    cont = np.load(fix / "continuation.npz")
    scans = jnp.asarray(cont["scans"][:60])
    odom = jnp.asarray(cont["odometry"][:60])
    n_steps = int(scans.shape[0])
    print(f"fixture: {eng.num_nodes()} nodes, {n_steps} continuation scans",
          flush=True)

    state = eng.state
    bucket = eng._solve_bucket(eng.num_nodes() + n_steps + 1)
    method = eng._incremental_method(bucket)
    kcfg = eng._kernel_config()
    print(f"bucket={bucket} method={method}", flush=True)

    @jax.jit
    def run_full(state, odom, scans):
        def body(s, x):
            o, r = x
            s = eng_mod._observe_odometry(kcfg, s, o)
            s = eng_mod._keyframe_step(kcfg, s, r, method, solve_bucket=bucket)
            return s, 0
        s, _ = jax.lax.scan(body, state, (odom, scans))
        return s

    @jax.jit
    def run_frontend(state, odom, scans):
        def body(s, x):
            o, r = x
            s = eng_mod._observe_odometry(kcfg, s, o)
            s = eng_mod._keyframe_frontend(kcfg, s, r)
            return s, 0
        s, _ = jax.lax.scan(body, state, (odom, scans))
        return s

    @jax.jit
    def run_odo(state, odom, scans):
        def body(s, x):
            o, r = x
            s = eng_mod._observe_odometry(kcfg, s, o)
            return s, jnp.sum(r) * jnp.float32(1e-9)
        s, acc = jax.lax.scan(body, state, (odom, scans))
        return s._replace(cumulative_dist=s.cumulative_dist + jnp.sum(acc))

    t_full = timed_scan(run_full, state, odom, scans, n_steps)
    print(f"full step: {t_full*1e3:.2f} ms/kf ({1/t_full:.1f} kf/s)", flush=True)
    t_fe = timed_scan(run_frontend, state, odom, scans, n_steps)
    print(f"frontend only: {t_fe*1e3:.2f} ms/kf", flush=True)
    t_odo = timed_scan(run_odo, state, odom, scans, n_steps)
    print(f"odometry only: {t_odo*1e3:.3f} ms/kf", flush=True)

    print(json.dumps({
        "full_ms_per_kf": round(t_full * 1e3, 3),
        "frontend_ms_per_kf": round(t_fe * 1e3, 3),
        "solve_ms_per_kf": round((t_full - t_fe) * 1e3, 3),
        "odo_ms_per_kf": round(t_odo * 1e3, 3),
        "bucket": bucket, "method": method,
    }))


if __name__ == "__main__":
    main()
