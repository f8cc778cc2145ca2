"""Break down the incremental keyframe solve on TPU (the 90% of the
online keyframe step, per tools/profile_keyframe.py).

Reconstructs the exact production workload: scan the keyframe-fixture
continuation through the full step for n-1 keyframes, apply the FRONTEND
of the last keyframe (new node at its odometry estimate, fresh successive
+ closure factors), and time the pending warm solve — full LM and its
components — via on-device amortized fori_loops (the relay RTT lesson:
amortize, don't model).

Run: timeout 550 python tools/profile_kf_solve.py
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
from dpg_slam_tpu.graph import factor_graph as fg


def amortized(make_body, loop=50, repeats=5):
    @jax.jit
    def looped():
        return jax.lax.fori_loop(0, loop, make_body, jnp.float32(0.0))

    float(looped())  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(looped())
        best = min(best, time.perf_counter() - t0)
        time.sleep(0.03)
    return best / loop


def main():
    print("backend:", jax.default_backend(), flush=True)
    import pathlib

    fix = pathlib.Path(bench.__file__).resolve().parent / "bench_assets" / "keyframe"
    from dpg_slam_tpu.utils.checkpoint import load_checkpoint

    eng = load_checkpoint(fix)
    cont = np.load(fix / "continuation.npz")
    scans = jnp.asarray(cont["scans"][:60])
    odom = jnp.asarray(cont["odometry"][:60])

    state = eng.state
    bucket = eng._solve_bucket(eng.num_nodes() + 61)
    method = eng._incremental_method(bucket)
    kcfg = eng._kernel_config()
    pg = kcfg.pose_graph

    @jax.jit
    def advance(state, odom, scans):
        def body(s, x):
            o, r = x
            s = eng_mod._observe_odometry(kcfg, s, o)
            s = eng_mod._keyframe_step(kcfg, s, r, method, solve_bucket=bucket)
            return s, 0
        s, _ = jax.lax.scan(body, state, (odom, scans))
        return s

    # Production pre-solve state: 59 full keyframes, then the 60th's
    # frontend only — its warm solve is what we time.
    s59 = advance(state, odom[:59], scans[:59])
    s_pre = jax.jit(
        lambda s, o, r: eng_mod._keyframe_frontend(
            kcfg, eng_mod._observe_odometry(kcfg, s, o), r
        )
    )(s59, odom[59], scans[59])
    jax.block_until_ready(s_pre.poses)
    n_nodes = int(jax.device_get(s_pre.num_nodes))
    print(f"pre-solve state: {n_nodes} nodes, bucket={bucket}, "
          f"method={method}", flush=True)

    poses_b = s_pre.poses[:bucket]
    graph = s_pre.graph
    mask_b = s_pre.node_mask[:bucket]

    def warm_solve(p, method_name):
        out, stats = fg.solve.__wrapped__(
            p, graph, mask_b,
            max_iterations=pg.incremental_gn_iterations,
            damping_init=pg.gn_damping_init,
            method=method_name,
            robust_delta=pg.robust_delta,
            gradient_tol=pg.gn_gradient_tol,
            terminate_on_reject=True,
            rel_tol=1e-4,
        )
        return out, stats

    stats = jax.jit(lambda p: warm_solve(p, method)[1])(poses_b)
    print(f"warm solve accepted iterations: "
          f"{int(jax.device_get(stats.iterations))}", flush=True)

    eps = jnp.float32(1e-30)
    results = {}
    for m in ("dense", "dense_pallas", "dense_cg"):
        t = amortized(
            lambda i, acc, m=m: acc
            + jnp.sum(warm_solve(poses_b + jnp.float32(i) * eps, m)[0])
            * jnp.float32(1e-6)
        )
        results[f"solve_{m}_ms"] = round(t * 1e3, 3)
        print(f"warm LM solve [{m}]: {t*1e3:.3f} ms", flush=True)

    # Components: one assemble; assemble + one linear solve.
    def assemble_only(i, acc):
        eq, err = fg._assemble(
            poses_b + jnp.float32(i) * eps, graph, mask_b, pg.robust_delta
        )
        return acc + err * jnp.float32(1e-6) + jnp.sum(eq.rhs) * jnp.float32(1e-9)

    t_as = amortized(assemble_only)
    results["assemble_ms"] = round(t_as * 1e3, 3)
    print(f"one assemble: {t_as*1e3:.3f} ms", flush=True)

    def one_linear(i, acc):
        eq, _ = fg._assemble(
            poses_b + jnp.float32(i) * eps, graph, mask_b, pg.robust_delta
        )
        delta = fg._dense_solve(eq, graph, jnp.float32(1e-4))
        return acc + jnp.sum(delta) * jnp.float32(1e-6)

    t_lin = amortized(one_linear)
    results["assemble_plus_dense_solve_ms"] = round(t_lin * 1e3, 3)
    print(f"assemble + one dense solve: {t_lin*1e3:.3f} ms", flush=True)

    # Finer split: dense-H materialization, Cholesky on a prebuilt H,
    # and the error-only residual sweep (the cheap accept/reject test).
    eq0, _ = jax.jit(
        lambda p: fg._assemble(p, graph, mask_b, pg.robust_delta)
    )(poses_b)
    jax.block_until_ready(eq0.rhs)

    def dense_h_only(i, acc):
        Hf = fg._dense_H(
            eq0._replace(rhs=eq0.rhs + jnp.float32(i) * eps),
            graph, jnp.float32(1e-4),
        )
        return acc + jnp.sum(Hf[0]) * jnp.float32(1e-9)

    t_h = amortized(dense_h_only)
    results["dense_H_ms"] = round(t_h * 1e3, 3)
    print(f"dense_H materialize: {t_h*1e3:.3f} ms", flush=True)

    Hf0 = jax.jit(lambda eq: fg._dense_H(eq, graph, jnp.float32(1e-4)))(eq0)
    jax.block_until_ready(Hf0)

    def cho_only(i, acc):
        L, low = jax.scipy.linalg.cho_factor(
            Hf0 + jnp.float32(i) * eps * jnp.eye(Hf0.shape[0], dtype=Hf0.dtype)
        )
        d = jax.scipy.linalg.cho_solve((L, low), eq0.rhs.reshape(-1))
        return acc + jnp.sum(d) * jnp.float32(1e-6)

    t_cho = amortized(cho_only)
    results["cho_ms"] = round(t_cho * 1e3, 3)
    print(f"cho_factor+solve on prebuilt H: {t_cho*1e3:.3f} ms", flush=True)

    def err_only(i, acc):
        e = fg.total_error(
            poses_b + jnp.float32(i) * eps, graph, pg.robust_delta
        )
        return acc + e * jnp.float32(1e-6)

    t_err = amortized(err_only)
    results["err_only_ms"] = round(t_err * 1e3, 3)
    print(f"error-only sweep: {t_err*1e3:.3f} ms", flush=True)

    results["bucket"] = bucket
    results["accepted_iterations"] = int(jax.device_get(stats.iterations))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
