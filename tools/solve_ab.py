"""A/B the reoptimize LM solve on TPU with a pre-packed graph.

Stage 1 (CPU subprocess via --pack): load the bench session fixture, run
the XLA ICP sweep + graph pack on host CPU, dump the packed graph arrays
to /tmp/solve_ab.npz. Stage 2 (TPU): load the arrays and time fg.solve
configurations (method x rel_tol), reporting accepted-iteration counts
and pose deviation between configurations.

Run:  python tools/solve_ab.py --pack   (CPU, ~1 min)
      timeout 580 python tools/solve_ab.py   (TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PACK = "--pack" in sys.argv
NPZ = "/tmp/solve_ab.npz"

if PACK:
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from dpg_slam_tpu.graph import factor_graph as fg


def pack():
    import dataclasses as dc
    from dpg_slam_tpu import engine as eng_mod
    from dpg_slam_tpu.ops import icp
    from dpg_slam_tpu.utils.checkpoint import load_checkpoint

    eng = load_checkpoint(
        os.environ.get("BENCH_SESSION", "bench_assets/session"))
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
    flat_src, flat_tgt, flat_valid, seeds, flat_gate = eng_mod._reoptimize_pairs(
        cfg, sub)
    res = icp.icp_align(
        sub.cloud[flat_src], sub.cloud_mask[flat_src] & flat_valid[:, None],
        sub.cloud[flat_tgt], sub.cloud_mask[flat_tgt] & flat_valid[:, None],
        seeds, dc.replace(pg, use_pallas_icp=False),
        tgt_normals=sub.cloud_normals[flat_tgt], gate_multiplier=flat_gate,
    )
    graph, _ = eng_mod._reoptimize_pack_graph(
        cfg, sub, flat_src, flat_tgt, flat_valid,
        res.transform, res.converged, res.covariance,
    )
    np.savez(
        NPZ,
        poses=np.asarray(sub.poses),
        node_mask=np.asarray(sub.node_mask),
        prior_idx=np.asarray(graph.prior_idx),
        prior_val=np.asarray(graph.prior_val),
        prior_sqrt_info=np.asarray(graph.prior_sqrt_info),
        num_priors=np.asarray(graph.num_priors),
        edge_idx=np.asarray(graph.edge_idx),
        edge_meas=np.asarray(graph.edge_meas),
        edge_sqrt_info=np.asarray(graph.edge_sqrt_info),
        num_edges=np.asarray(graph.num_edges),
        robust_delta=np.float32(pg.robust_delta or 0.0),
        gn_max_iterations=np.int32(pg.gn_max_iterations),
        gn_damping_init=np.float32(pg.gn_damping_init),
    )
    print("packed ->", NPZ, "edges:", int(graph.num_edges))


def timed(fn, *args, repeats=10):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
        time.sleep(0.05)
    return best, out


def main():
    z = np.load(NPZ)
    graph = fg.FactorGraph(
        prior_idx=jnp.asarray(z["prior_idx"]),
        prior_val=jnp.asarray(z["prior_val"]),
        prior_sqrt_info=jnp.asarray(z["prior_sqrt_info"]),
        num_priors=jnp.asarray(z["num_priors"]),
        edge_idx=jnp.asarray(z["edge_idx"]),
        edge_meas=jnp.asarray(z["edge_meas"]),
        edge_sqrt_info=jnp.asarray(z["edge_sqrt_info"]),
        num_edges=jnp.asarray(z["num_edges"]),
    )
    poses = jnp.asarray(z["poses"])
    node_mask = jnp.asarray(z["node_mask"])
    rd = float(z["robust_delta"]) or None
    its = int(z["gn_max_iterations"])
    damp = float(z["gn_damping_init"])
    print("backend:", jax.default_backend(), "N:", poses.shape[0],
          "E_live:", int(z["num_edges"]), flush=True)

    base = None
    for method, rel_tol in (
        ("dense", 1e-6), ("dense", 1e-5), ("dense_cg", 1e-5), ("cg", 1e-5),
    ):
        f = jax.jit(
            lambda p, m=method, rt=rel_tol: fg.solve(
                p, graph, node_mask, max_iterations=its,
                damping_init=damp, method=m, robust_delta=rd, rel_tol=rt,
            )
        )
        t, (out, stats) = timed(f, poses)
        out = np.asarray(out)
        if base is None:
            base = out
        dev = float(np.max(np.abs(out[np.asarray(node_mask)] -
                                  base[np.asarray(node_mask)])))
        print(f"{method} rel_tol={rel_tol:g}: {t*1e3:.2f} ms  "
              f"accepted={int(stats.iterations)} "
              f"err {float(stats.initial_error):.4f}->"
              f"{float(stats.final_error):.4f}  max pose dev {dev:.2e}",
              flush=True)


if __name__ == "__main__":
    pack() if PACK else main()
