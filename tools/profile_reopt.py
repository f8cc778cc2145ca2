"""Profile the pass-boundary reoptimize on real TPU: where does time go?

Breakdown: pair enumeration, ICP sweep (Pallas vs XLA), graph pack, LM
solve; plus live-pair statistics (how much of the flat N*(1+K) sweep is
dead padding).

Run: timeout 550 python tools/profile_reopt.py
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
from dpg_slam_tpu.ops import icp


def timed(fn, *args, repeats=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = bench._bench_config()
    t0 = time.perf_counter()
    # Committed fixture (bench_assets/session) when its config matches;
    # CPU-subprocess build otherwise — never a rebuild over the TPU relay.
    eng = bench._build_session_on_cpu(t0)
    print(f"session ready in {time.perf_counter()-t0:.1f}s, "
          f"nodes={eng.num_nodes()}", flush=True)

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

    # --- full reoptimize (the headline denominator)
    t_full, _ = timed(lambda: eng._reoptimize_now(state))
    print(f"full _reoptimize_now: {t_full*1e3:.1f} ms", flush=True)

    # --- pair enumeration stats
    flat_src, flat_tgt, flat_valid, seeds, flat_gate = jax.jit(
        eng_mod._reoptimize_pairs.__wrapped__
        if hasattr(eng_mod._reoptimize_pairs, "__wrapped__")
        else eng_mod._reoptimize_pairs,
        static_argnames=("cfg",),
    )(rcfg, sub)
    n_flat = int(flat_src.shape[0])
    n_live = int(jnp.sum(flat_valid))
    print(f"pairs: {n_flat} flat, {n_live} live ({100*n_live/n_flat:.0f}%)",
          flush=True)

    t_pairs, _ = timed(
        jax.jit(lambda s: eng_mod._reoptimize_pairs(rcfg, s)[0]), sub
    )
    print(f"pair enumeration: {t_pairs*1e3:.2f} ms", flush=True)

    # --- ICP sweep alone, as the engine runs it (chunked lax.map)
    @jax.jit
    def icp_sweep(sub, flat_src, flat_tgt, flat_valid, seeds, flat_gate):
        chunk = 256
        def run_chunk(c):
            s = c * chunk
            src_i = jax.lax.dynamic_slice_in_dim(flat_src, s, chunk)
            tgt_i = jax.lax.dynamic_slice_in_dim(flat_tgt, s, chunk)
            val_i = jax.lax.dynamic_slice_in_dim(flat_valid, s, chunk)
            seed_i = jax.lax.dynamic_slice_in_dim(seeds, s, chunk)
            gate_i = jax.lax.dynamic_slice_in_dim(flat_gate, s, chunk)
            return icp.icp_align(
                sub.cloud[src_i], sub.cloud_mask[src_i] & val_i[:, None],
                sub.cloud[tgt_i], sub.cloud_mask[tgt_i] & val_i[:, None],
                seed_i, pg, tgt_normals=sub.cloud_normals[tgt_i],
                gate_multiplier=gate_i,
            )
        n_chunks = flat_src.shape[0] // chunk
        return jax.lax.map(run_chunk, jnp.arange(n_chunks)).transform

    t_icp, _ = timed(icp_sweep, sub, flat_src, flat_tgt, flat_valid, seeds,
                     flat_gate)
    print(f"ICP sweep (chunked lax.map, Pallas={pg.use_pallas_icp}): "
          f"{t_icp*1e3:.1f} ms  ({t_icp/max(n_live,1)*1e6:.1f} us/live pair)",
          flush=True)

    # --- one big Pallas call over ALL pairs (no chunk loop)
    from dpg_slam_tpu.ops.icp_pallas import icp_align_pallas

    @jax.jit
    def icp_onecall(sub, flat_src, flat_tgt, flat_valid, seeds, flat_gate):
        return icp_align_pallas(
            sub.cloud[flat_src], sub.cloud_mask[flat_src] & flat_valid[:, None],
            sub.cloud[flat_tgt], sub.cloud_mask[flat_tgt] & flat_valid[:, None],
            seeds, pg, tgt_normals=sub.cloud_normals[flat_tgt],
            gate_multiplier=flat_gate,
        ).transform

    t_icp1, _ = timed(icp_onecall, sub, flat_src, flat_tgt, flat_valid, seeds,
                      flat_gate)
    print(f"ICP one pallas_call (B={n_flat}): {t_icp1*1e3:.1f} ms "
          f"({t_icp1/max(n_live,1)*1e6:.1f} us/live pair)", flush=True)

    # --- compacted: live pairs only (host-side gather), one call
    live_idx = np.nonzero(np.asarray(flat_valid))[0]
    padB = -len(live_idx) % 256
    live_idx_p = np.concatenate([live_idx, np.zeros((padB,), np.int64)])
    lsrc = jnp.asarray(np.asarray(flat_src)[live_idx_p])
    ltgt = jnp.asarray(np.asarray(flat_tgt)[live_idx_p])
    lval = jnp.asarray(
        np.concatenate([np.ones(len(live_idx), bool), np.zeros(padB, bool)]))
    lseed = jnp.asarray(np.asarray(seeds)[live_idx_p])
    lgate = jnp.asarray(np.asarray(flat_gate)[live_idx_p])
    t_icpc, _ = timed(icp_onecall, sub, lsrc, ltgt, lval, lseed, lgate)
    print(f"ICP compacted (B={len(lsrc)}): {t_icpc*1e3:.1f} ms "
          f"({t_icpc/max(n_live,1)*1e6:.1f} us/live pair)", flush=True)

    # --- pack + solve alone
    res = icp_onecall(sub, flat_src, flat_tgt, flat_valid, seeds, flat_gate)

    @jax.jit
    def pack_and_solve(sub, transforms):
        covs = jnp.broadcast_to(jnp.eye(3) * 0.01, transforms.shape[:1] + (3, 3))
        conv = jnp.ones(transforms.shape[:1], bool)
        graph, _ = eng_mod._reoptimize_pack_graph(
            rcfg, sub, flat_src, flat_tgt, flat_valid, transforms, conv, covs
        )
        poses, _ = fg.solve(
            sub.poses, graph, sub.node_mask,
            max_iterations=pg.gn_max_iterations,
            damping_init=pg.gn_damping_init,
            method=eng.solve_method,
            robust_delta=pg.robust_delta,
        )
        return poses

    t_ps, _ = timed(pack_and_solve, sub, res)
    print(f"pack+solve: {t_ps*1e3:.1f} ms", flush=True)

    print(json.dumps({
        "full_ms": round(t_full * 1e3, 1),
        "icp_chunked_ms": round(t_icp * 1e3, 1),
        "icp_onecall_ms": round(t_icp1 * 1e3, 1),
        "icp_compact_ms": round(t_icpc * 1e3, 1),
        "pack_solve_ms": round(t_ps * 1e3, 1),
        "pairs_flat": n_flat, "pairs_live": n_live,
    }))


if __name__ == "__main__":
    main()
