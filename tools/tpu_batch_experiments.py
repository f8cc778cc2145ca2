"""Batched-session throughput experiments on the real TPU.
Run: timeout 570 python -u /tmp/tpu_batch_experiments.py <phase>
phase 1: no-solve / dense / dense_cg at S=16
phase 2: cg / dense_cg+gn2 / S=32 best
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import functools, dataclasses as dc
from dpg_slam_tpu.io import dataset
from dpg_slam_tpu import batch, engine as eng_mod
from dpg_slam_tpu.ops import icp
import bench

phase = sys.argv[1] if len(sys.argv) > 1 else "dense_cg"
cfg = bench._bench_config()
world = dataset.make_office_world()
wps = dataset.office_loop_waypoints()
wps3 = np.vstack([wps] + [wps[1:]] * 2)

def make_sessions(S):
    out = []
    for i in range(S):
        seq = dataset.simulate_sequence(world, wps3, cfg.scan, step=0.25, seed=11+i,
            odom_noise_transl=0.02, odom_noise_rot=0.008)
        out.append((seq.odometry, seq.scans))
    return out

def run_variant(name, sessions, run_cfg, solve_method, skip_solve=False, bucket=128):
    kf_odom, kf_scans, kf_valid, counts = batch.pack_sessions(run_cfg, sessions)
    total = sum(counts)
    states0 = batch._stack_states(run_cfg, len(sessions))
    ko, ks, kv = jnp.asarray(kf_odom), jnp.asarray(kf_scans), jnp.asarray(kf_valid)
    @jax.jit
    def prog(states, kf_odom, kf_scans, kf_valid):
        observe_odom = eng_mod._observe_odometry.__wrapped__
        K1 = 1 + run_cfg.pose_graph.max_loop_closures_per_node
        def step(states, inp):
            odom, ranges, valid = inp
            Sx = odom.shape[0]
            s1 = jax.vmap(lambda s, o: observe_odom(run_cfg, s, o))(states, odom)
            s2, icp_in, tgt_idx, tgt_valid, est_pose, new_idx = jax.vmap(
                lambda s, r: eng_mod._keyframe_frontend_pre(run_cfg, s, r))(s1, ranges)
            flat = lambda x: x.reshape((Sx * K1,) + x.shape[2:])
            res_flat = icp.icp_align(
                flat(icp_in.src), flat(icp_in.src_mask), flat(icp_in.tgt),
                flat(icp_in.tgt_mask), flat(icp_in.seeds), run_cfg.pose_graph,
                tgt_normals=flat(icp_in.tgt_normals), gate_multiplier=flat(icp_in.gate))
            res = jax.tree_util.tree_map(lambda x: x.reshape((Sx, K1) + x.shape[1:]), res_flat)
            s3 = jax.vmap(lambda s, r, ti, tv, ep, ni: eng_mod._keyframe_frontend_post(
                run_cfg, s, r, ti, tv, ep, ni))(s2, res, tgt_idx, tgt_valid, est_pose, new_idx)
            if skip_solve:
                s4 = s3
            else:
                s4 = jax.vmap(lambda s: eng_mod._keyframe_solve(run_cfg, s, solve_method, bucket))(s3)
            def adopt(new, old):
                v = valid.reshape(valid.shape + (1,) * (new.ndim - 1))
                return jnp.where(v, new, old)
            return jax.tree_util.tree_map(adopt, s4, states), None
        states, _ = jax.lax.scan(step, states, (kf_odom, kf_scans, kf_valid))
        return states
    t0 = time.perf_counter()
    st = prog(states0, ko, ks, kv)
    float(jnp.sum(st.poses))
    tc = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        st = prog(states0, ko, ks, kv)
        float(jnp.sum(st.poses))
        best = min(best, time.perf_counter() - t0)
        time.sleep(0.05)
    print(f"{name}: compile {tc:.1f}s, best {best:.2f}s -> {total/best:.1f} kf/s aggregate", flush=True)

# ONE variant per process invocation: a killed mid-compile client leaves the
# remote compiler grinding for tens of minutes and wedges the shared relay
# (measured twice on 2026-08-21); keep each invocation to a single compile.
kcfg = dc.replace(cfg, pose_graph=dc.replace(cfg.pose_graph, use_pallas_icp=True))
S = int(sys.argv[2]) if len(sys.argv) > 2 else 16
if phase in ("dense", "dense_cg", "cg"):
    run_variant(f"S={S} {phase}", make_sessions(S), kcfg, phase)
elif phase == "gn2":
    g2 = dc.replace(kcfg, pose_graph=dc.replace(kcfg.pose_graph, incremental_gn_iterations=2))
    run_variant(f"S={S} dense_cg gn2", make_sessions(S), g2, "dense_cg")
else:
    raise SystemExit(f"unknown phase {phase}")
