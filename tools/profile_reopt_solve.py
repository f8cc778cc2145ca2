"""Decompose the reoptimize pack+solve on TPU: LM iteration count,
per-iteration linear-solve cost by method, and the end-to-end pack+solve
time. Two compiled programs only (fits the relay compile budget).

Run: timeout 580 python tools/profile_reopt_solve.py > /tmp/ps.out 2>&1
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tools._common import load_bench_session, timed

from dpg_slam_tpu import engine as eng_mod
from dpg_slam_tpu.graph import factor_graph as fg
from dpg_slam_tpu.ops import icp


def main():
    print("backend:", jax.default_backend(), flush=True)
    eng = load_bench_session()
    state = eng.state
    nb = eng._solve_bucket(int(state.num_nodes))
    node_fields = (
        "poses", "odom_poses", "pass_ids", "node_active",
        "ranges", "labels", "sector_active", "cloud",
        "cloud_mask", "cloud_normals",
    )
    sub = state._replace(**{f: getattr(state, f)[:nb] for f in node_fields})
    rcfg = eng._reopt_config()
    pg = rcfg.pose_graph

    flat = eng_mod._reoptimize_pairs(rcfg, sub)
    flat_src, flat_tgt, flat_valid, seeds, flat_gate = flat

    # Real ICP transforms (one compile) so the solve sees production
    # residual structure, then pack once on device.
    t0 = time.perf_counter()
    res = icp.icp_align(
        sub.cloud[flat_src],
        sub.cloud_mask[flat_src] & flat_valid[:, None],
        sub.cloud[flat_tgt],
        sub.cloud_mask[flat_tgt] & flat_valid[:, None],
        seeds,
        pg,
        tgt_normals=sub.cloud_normals[flat_tgt],
        gate_multiplier=flat_gate,
    )
    jax.block_until_ready(res.transform)
    print(f"icp sweep done (compile+run {time.perf_counter()-t0:.0f}s)", flush=True)

    graph, _ = jax.jit(eng_mod._reoptimize_pack_graph, static_argnums=(0,))(
        rcfg, sub, flat_src, flat_tgt, flat_valid,
        res.transform, res.converged, res.covariance,
    )
    jax.block_until_ready(graph.edge_idx)

    mi = min(pg.gn_max_iterations, pg.gtsam_max_iterations)

    def solve_with(method, rel_tol=pg.gn_tol, max_iterations=mi):
        poses, stats = fg.solve(
            sub.poses, graph, sub.node_mask,
            max_iterations=max_iterations,
            damping_init=pg.gn_damping_init,
            method=method,
            robust_delta=pg.robust_delta,
            rel_tol=rel_tol,
        )
        return poses, stats

    ref_poses = None
    for method in ("dense", "dense_pallas", "dense_cg"):
        t0 = time.perf_counter()
        poses, stats = solve_with(method)
        jax.block_until_ready(poses)
        compile_s = time.perf_counter() - t0
        t = timed(lambda m=method: solve_with(m)[0])
        it = int(stats.iterations)
        print(
            f"solve[{method}] N={nb}: {t*1e3:.2f} ms, accepted_iters={it}, "
            f"err {float(stats.initial_error):.4f}->{float(stats.final_error):.4f} "
            f"(compile {compile_s:.0f}s)",
            flush=True,
        )
        if ref_poses is None:
            ref_poses = np.asarray(poses)
        else:
            dev = float(np.max(np.abs(np.asarray(poses) - ref_poses)))
            print(f"  pose dev vs dense: {dev:.2e}", flush=True)
        # Per-LM-iteration cost: time a 1-iteration solve of the same
        # program shape (no early-exit ambiguity).
        t1 = timed(lambda m=method: solve_with(m, rel_tol=0.0, max_iterations=1)[0])
        print(f"  1-iter solve: {t1*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
