"""Break down the reoptimize LM solve cost on TPU: assemble vs dense_H vs
Cholesky vs full LM with real ICP transforms.

Run: timeout 580 python tools/profile_solve.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from dpg_slam_tpu import engine as eng_mod
from dpg_slam_tpu.graph import factor_graph as fg
from dpg_slam_tpu.ops import icp
from tools._common import load_bench_session, timed


def main():
    eng = load_bench_session()
    state = eng.state
    nb = eng._solve_bucket(int(state.num_nodes))
    node_fields = (
        "poses", "odom_poses", "pass_ids", "node_active",
        "ranges", "labels", "sector_active", "cloud",
        "cloud_mask", "cloud_normals",
    )
    sub = state._replace(**{f: getattr(state, f)[:nb] for f in node_fields})
    cfg = eng.config
    pg = cfg.pose_graph

    flat = eng_mod._reoptimize_pairs(cfg, sub)
    flat_src, flat_tgt, flat_valid, seeds, flat_gate = flat

    # Real ICP transforms (XLA path ok; one compile)
    res = icp.icp_align(
        sub.cloud[flat_src], sub.cloud_mask[flat_src] & flat_valid[:, None],
        sub.cloud[flat_tgt], sub.cloud_mask[flat_tgt] & flat_valid[:, None],
        seeds, dc.replace(pg, use_pallas_icp=False),
        tgt_normals=sub.cloud_normals[flat_tgt], gate_multiplier=flat_gate,
    )
    graph, _ = jax.jit(
        lambda s, t, c, cv: eng_mod._reoptimize_pack_graph(
            cfg, s, flat_src, flat_tgt, flat_valid, t, c, cv)
    )(sub, res.transform, res.converged, res.covariance)
    jax.block_until_ready(graph.edge_idx)
    N = sub.poses.shape[0]
    E = graph.edge_idx.shape[0]
    print(f"N={N} E={E} live_edges={int(graph.num_edges)}", flush=True)

    t = timed(jax.jit(lambda p: eng_mod._reoptimize_pack_graph(
        cfg, sub, flat_src, flat_tgt, flat_valid,
        res.transform, res.converged, res.covariance)[0].edge_meas), sub.poses)
    print(f"pack alone: {t*1e3:.2f} ms", flush=True)

    t = timed(jax.jit(lambda p: fg._assemble(p, graph, sub.node_mask, 2.0)[0].rhs),
              sub.poses)
    print(f"assemble: {t*1e3:.2f} ms", flush=True)

    eq, _ = jax.jit(lambda p: fg._assemble(p, graph, sub.node_mask, 2.0))(sub.poses)
    jax.block_until_ready(eq.rhs)

    t = timed(jax.jit(lambda e: fg._dense_H(e, graph, jnp.float32(1e-4))), eq)
    print(f"dense_H: {t*1e3:.2f} ms", flush=True)

    Hf = jax.jit(lambda e: fg._dense_H(e, graph, jnp.float32(1e-4)))(eq)
    jax.block_until_ready(Hf)

    @jax.jit
    def chol(Hf, rhs):
        L, low = jax.scipy.linalg.cho_factor(Hf)
        return jax.scipy.linalg.cho_solve((L, low), rhs)

    t = timed(chol, Hf, eq.rhs.reshape(-1))
    print(f"cho_factor+solve ({3*N}): {t*1e3:.2f} ms", flush=True)

    for method, label in (("dense", "LM dense"), ("dense_cg", "LM dense_cg")):
        f = jax.jit(lambda p, m=method: fg.solve(
            p, graph, sub.node_mask, max_iterations=pg.gn_max_iterations,
            damping_init=pg.gn_damping_init, method=m,
            robust_delta=pg.robust_delta)[0])
        t = timed(f, sub.poses)
        stats = jax.jit(lambda p, m=method: fg.solve(
            p, graph, sub.node_mask, max_iterations=pg.gn_max_iterations,
            damping_init=pg.gn_damping_init, method=m,
            robust_delta=pg.robust_delta)[1])(sub.poses)
        print(f"{label}: {t*1e3:.2f} ms (accepted {int(stats.iterations)})",
              flush=True)


if __name__ == "__main__":
    main()
