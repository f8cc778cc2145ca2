"""Reproduce/explain the r03->r04 pallas_transform_max_dev jump
(2.7e-07 -> 1.76e-05, BENCH_r03/r04.json) on CPU.

Hypothesis (VERDICT r4): the round-4 error-delta ICP exit makes the XLA
and Pallas paths freeze a pair at DIFFERENT iteration counts when its
fitness improvement straddles the 3e-3 threshold (the two paths compute
fitness with different reduction orders/rounding), so the paths diverge
by one near-converged GN step (~1e-5) instead of accumulated float
rounding (~1e-7).

Method: bench-session successive pairs (committed fixture), icp_align
XLA vs Pallas-interpret, at error_delta_rel_tol = 0 and 3e-3; also each
path's own rel=0-vs-3e-3 self-deviation (how much the exit itself moves
the answer within one path — the scale of "one frozen iteration").

Run: python tools/parity_jump_study.py   (CPU only)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dpg_slam_tpu import geom
from dpg_slam_tpu.ops import icp as icp_mod


def main():
    import bench
    from dpg_slam_tpu.utils.checkpoint import load_checkpoint

    fix = os.path.join(os.path.dirname(__file__), "..", "bench_assets", "session")
    eng = load_checkpoint(fix)
    cfg = bench._bench_config()
    state = eng.state
    n = min(eng.num_nodes(), 65)
    idx_s = jnp.arange(1, n)
    idx_t = idx_s - 1
    src, sm = state.cloud[idx_s], state.cloud_mask[idx_s]
    tgt, tm = state.cloud[idx_t], state.cloud_mask[idx_t]
    seed = geom.between(state.poses[idx_t], state.poses[idx_s])
    gate = jnp.ones((int(n - 1),), jnp.float32)

    from dpg_slam_tpu.ops.icp_pallas import icp_align_pallas

    outs = {}
    convs = {}
    fits = {}
    for rel in (0.0, 3e-3):
        pg = dataclasses.replace(
            cfg.pose_graph,
            use_pallas_icp=False,
            icp_point_to_line=True,
            icp_error_delta_rel_tol=rel,
        )
        res = icp_mod.icp_align(src, sm, tgt, tm, seed, pg, gate_multiplier=gate)
        outs[(rel, False)] = np.asarray(res.transform)
        convs[(rel, False)] = np.asarray(res.converged)
        fits[(rel, False)] = np.asarray(res.fitness)
        res = icp_align_pallas(
            src, sm, tgt, tm, seed, pg, gate_multiplier=gate, interpret=True
        )
        outs[(rel, True)] = np.asarray(res.transform)
        convs[(rel, True)] = np.asarray(res.converged)
        fits[(rel, True)] = np.asarray(res.fitness)

    def dev(a, b):
        d = np.abs(a - b)
        d[:, 2] = np.abs(np.angle(np.exp(1j * (a[:, 2] - b[:, 2]))))
        return d.max(axis=1)

    d0 = dev(outs[(0.0, True)], outs[(0.0, False)])
    d3 = dev(outs[(3e-3, True)], outs[(3e-3, False)])
    self_x = dev(outs[(3e-3, False)], outs[(0.0, False)])
    self_p = dev(outs[(3e-3, True)], outs[(0.0, True)])
    print(f"pairs: {len(d0)}")
    print(f"XLA-vs-Pallas max dev, rel_tol=0:    {d0.max():.3e}")
    print(f"XLA-vs-Pallas max dev, rel_tol=3e-3: {d3.max():.3e}")
    print(f"exit-induced self-dev (XLA path):    {self_x.max():.3e}")
    print(f"exit-induced self-dev (Pallas path): {self_p.max():.3e}")
    worst = int(np.argmax(d3))
    print(
        f"worst pair {worst}: dev(rel=0)={d0[worst]:.2e} dev(rel=3e-3)="
        f"{d3[worst]:.2e} selfX={self_x[worst]:.2e} selfP={self_p[worst]:.2e} "
        f"conv={bool(convs[(3e-3, False)][worst])}/{bool(convs[(3e-3, True)][worst])} "
        f"fit={fits[(3e-3, False)][worst]:.2e}/{fits[(3e-3, True)][worst]:.2e}"
    )
    n_jump = int(np.sum((d3 > 10 * np.maximum(d0, 1e-9))))
    print(f"pairs where cross-path dev grew >10x with the exit on: {n_jump}")
    for rel, d in ((0.0, d0), (3e-3, d3)):
        q = np.quantile(d, [0.5, 0.9, 0.99, 1.0])
        print(f"rel={rel}: dev quantiles p50={q[0]:.1e} p90={q[1]:.1e} "
              f"p99={q[2]:.1e} max={q[3]:.1e}")
    # Pairs whose exit decision perturbed either path: the self-dev tail.
    n_self = int(np.sum((self_x > 1e-6) | (self_p > 1e-6)))
    print(f"pairs the exit moved (>1e-6 self-dev on either path): {n_self}")


if __name__ == "__main__":
    main()
