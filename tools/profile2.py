"""Time reoptimize components on TPU from the checkpointed bench session.

Run: timeout 580 python tools/profile2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dpg_slam_tpu import engine as eng_mod
from dpg_slam_tpu.ops import icp
from tools._common import load_bench_session, timed


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

    # Pair enumeration on host for the compacted variants.
    flat = eng_mod._reoptimize_pairs(rcfg, sub)
    flat_src, flat_tgt, flat_valid, seeds, flat_gate = [np.asarray(x) for x in flat]
    live = np.nonzero(flat_valid)[0]
    print(f"nodes={int(state.num_nodes)} bucket={nb} flat={len(flat_valid)} "
          f"live={len(live)}", flush=True)

    # 1. full reoptimize
    t0 = time.perf_counter()
    t_full = timed(lambda s: eng._reoptimize_now(s).poses, state)
    print(f"full _reoptimize_now: {t_full*1e3:.1f} ms "
          f"(compile {time.perf_counter()-t0:.0f}s)", flush=True)

    # 2. compacted one-call Pallas ICP over live pairs only
    from dpg_slam_tpu.ops.icp_pallas import icp_align_pallas

    padB = -len(live) % 256
    idx = np.concatenate([live, np.zeros((padB,), np.int64)])
    lsrc = jnp.asarray(flat_src[idx])
    ltgt = jnp.asarray(flat_tgt[idx])
    lval = jnp.asarray(np.concatenate(
        [np.ones(len(live), bool), np.zeros(padB, bool)]))
    lseed = jnp.asarray(seeds[idx])
    lgate = jnp.asarray(flat_gate[idx])

    @jax.jit
    def icp_pallas_compact(sub, lsrc, ltgt, lval, lseed, lgate):
        return icp_align_pallas(
            sub.cloud[lsrc], sub.cloud_mask[lsrc] & lval[:, None],
            sub.cloud[ltgt], sub.cloud_mask[ltgt] & lval[:, None],
            lseed, pg, tgt_normals=sub.cloud_normals[ltgt],
            gate_multiplier=lgate,
        ).transform

    t0 = time.perf_counter()
    t_c = timed(icp_pallas_compact, sub, lsrc, ltgt, lval, lseed, lgate)
    print(f"pallas ICP compact (B={len(idx)}): {t_c*1e3:.1f} ms "
          f"({t_c/len(live)*1e6:.1f} us/live pair) "
          f"(compile {time.perf_counter()-t0:.0f}s)", flush=True)

    # 3. XLA path, compacted, for reference
    import dataclasses as dc
    pg_xla = dc.replace(pg, use_pallas_icp=False)

    @jax.jit
    def icp_xla_compact(sub, lsrc, ltgt, lval, lseed, lgate):
        return icp.icp_align(
            sub.cloud[lsrc], sub.cloud_mask[lsrc] & lval[:, None],
            sub.cloud[ltgt], sub.cloud_mask[ltgt] & lval[:, None],
            lseed, pg_xla, tgt_normals=sub.cloud_normals[ltgt],
            gate_multiplier=lgate,
        ).transform

    t0 = time.perf_counter()
    t_x = timed(icp_xla_compact, sub, lsrc, ltgt, lval, lseed, lgate)
    print(f"XLA ICP compact (B={len(idx)}): {t_x*1e3:.1f} ms "
          f"(compile {time.perf_counter()-t0:.0f}s)", flush=True)

    # 4. pack+solve alone (use transforms from 2)
    tr = icp_pallas_compact(sub, lsrc, ltgt, lval, lseed, lgate)

    from dpg_slam_tpu.graph import factor_graph as fg

    @jax.jit
    def pack_and_solve(sub):
        fs = jnp.asarray(flat_src)
        ft = jnp.asarray(flat_tgt)
        fv = jnp.asarray(flat_valid)
        transforms = jnp.zeros((len(flat_valid), 3), jnp.float32)
        covs = jnp.broadcast_to(jnp.eye(3) * 0.01, (len(flat_valid), 3, 3))
        conv = jnp.ones((len(flat_valid),), bool)
        graph, _ = eng_mod._reoptimize_pack_graph(
            rcfg, sub, fs, ft, fv, transforms, conv, covs
        )
        poses, _ = fg.solve(
            sub.poses, graph, sub.node_mask,
            max_iterations=pg.gn_max_iterations,
            damping_init=pg.gn_damping_init,
            method=eng.solve_method,
            robust_delta=pg.robust_delta,
        )
        return poses

    t0 = time.perf_counter()
    t_ps = timed(pack_and_solve, sub)
    print(f"pack+solve: {t_ps*1e3:.1f} ms (compile {time.perf_counter()-t0:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main()
