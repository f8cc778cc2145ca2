"""Stage-level on-chip profile of the ROUND-4 (grid-marching) execute_dpg
stages — the measurements (raster scatter 72 ms, punch-through gather
chain 90 ms class) that motivated the round-5 polar redesign. Kept as
provenance; the current hot path no longer runs the dense FREE march
(see change_detection._polar_free_at) and is best profiled with
jax.profiler.trace (works over the axon relay — see CLAUDE.md lore).

Run: timeout 570 python -u tools/profile_dpg.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tools._common import load_bench_session
from dpg_slam_tpu import geom, scan
from dpg_slam_tpu.ops import raster


def amortized(fn, *args, loop=10, repeats=3):
    @jax.jit
    def looped(*a):
        def body(i, acc):
            return acc + fn(i, *a) * jnp.float32(1e-9)
        return jax.lax.fori_loop(0, loop, body, jnp.float32(0.0))

    float(looped(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(looped(*args))
        best = min(best, time.perf_counter() - t0)
        time.sleep(0.03)
    return best / loop


def main():
    print("backend:", jax.default_backend(), flush=True)
    eng = load_bench_session()
    cfg = eng.config
    state = eng.state
    dpg = cfg.dpg
    C, M = dpg.current_pose_chain_len, dpg.max_submap_nodes
    extent, res = dpg.grid_extent_cells, dpg.occ_grid_resolution
    B = cfg.scan.num_beams
    N = state.poses.shape[0]
    S = int(round(cfg.scan.range_max / res))
    print(f"C={C} M={M} extent={extent} res={res} B={B} march={S}", flush=True)

    # Stand-in chain/submap selections (shapes match execute_dpg's).
    chain_idx = jnp.arange(C)
    chain_poses = state.poses[chain_idx]
    chain_lidar = chain_poses
    chain_ranges = state.ranges[chain_idx]
    centroid = jnp.mean(chain_poses[:, :2], axis=0)
    origin = centroid - 0.5 * extent * res
    pts_laser = scan.points_in_laser_frame(chain_ranges, cfg.scan)
    chain_pts = geom.apply(chain_lidar[:, None, :], pts_laser)
    occ = state.cloud_mask[chain_idx][:, : B] if False else jnp.ones((C, B), bool)

    sub_idx = jnp.arange(M)
    sub_poses = state.poses[sub_idx]
    sub_ranges = state.ranges[sub_idx]
    sub_pts = geom.apply(
        sub_poses[:, None, :], scan.points_in_laser_frame(sub_ranges, cfg.scan)
    )
    occ_m = jnp.ones((M, B), bool)

    def t_raster_chain(i, lp, pts, rg):
        g = raster.rasterize_scans(
            lp + i * jnp.float32(1e-30), pts, rg, occ, occ, origin, extent, res, S
        )
        return jnp.sum(g).astype(jnp.float32)

    t = amortized(t_raster_chain, chain_lidar, chain_pts, chain_ranges, loop=5)
    print(f"raster chain (C={C}):   {t*1e3:7.2f} ms", flush=True)

    def t_raster_sub(i, lp, pts, rg):
        g = raster.rasterize_scans(
            lp + i * jnp.float32(1e-30), pts, rg, occ_m, occ_m, origin, extent, res, S
        )
        return jnp.sum(g).astype(jnp.float32)

    t = amortized(t_raster_sub, sub_poses, sub_pts, sub_ranges, loop=5)
    print(f"raster submap (M={M}):  {t*1e3:7.2f} ms", flush=True)

    # Local re-registration ICP (C pairs, P=icp_max_points src vs T=2048 tgt).
    from dpg_slam_tpu.ops import icp as icp_mod

    T2 = dpg.local_reg_max_points
    tgt_pts = sub_pts.reshape(M * B, 2)[:: max(1, (M * B) // T2)][:T2]
    tgt_ok = jnp.ones((tgt_pts.shape[0],), bool)

    def t_localreg(i, src, sm, tp):
        reg = icp_mod.icp_align(
            src, sm,
            jnp.broadcast_to(tp[None] + i * jnp.float32(1e-30), (C,) + tp.shape),
            jnp.broadcast_to(tgt_ok[None], (C, tp.shape[0])),
            chain_poses, cfg.pose_graph,
            gate_multiplier=jnp.ones((C,), jnp.float32),
        )
        return jnp.sum(reg.transform)

    t = amortized(
        t_localreg, state.cloud[chain_idx], state.cloud_mask[chain_idx], tgt_pts,
        loop=5,
    )
    print(f"local-reg ICP (C={C}, T={T2}): {t*1e3:7.2f} ms", flush=True)

    # Punch-through block: (N, R) with R = M*B.
    rflat = sub_pts.reshape(M * B, 2)
    rvalid = jnp.zeros((M * B,), bool).at[:100].set(True)

    def t_punch(i, poses, rflat):
        rel = geom.inv_apply(
            poses[:, None, :] + i * jnp.float32(1e-30), rflat[None, :, :]
        )
        rr = jnp.linalg.norm(rel, axis=-1)
        ang = jnp.arctan2(rel[..., 1], rel[..., 0])
        approx = (ang - cfg.scan.angle_min) / cfg.scan.angle_increment
        i0 = jnp.clip(jnp.floor(approx).astype(jnp.int32), 0, B - 1)
        r0 = jnp.take_along_axis(state.ranges, i0, axis=1)
        return jnp.sum(rr) + jnp.sum(r0) + jnp.sum(ang)

    t = amortized(t_punch, state.poses, rflat, loop=5)
    print(f"punch-through (N={N}, R={M*B}): {t*1e3:7.2f} ms", flush=True)

    # Dilation of (C, extent, extent).
    g = jnp.zeros((C, extent, extent), jnp.int8)
    from dpg_slam_tpu.dpg.change_detection import _dilate_occupied

    def t_dil(i, g):
        return jnp.sum(
            _dilate_occupied(
                jnp.maximum(g, (i % 2).astype(jnp.int8)), dpg.change_margin_cells
            )
        ).astype(jnp.float32)

    t = amortized(t_dil, g, loop=5)
    print(f"dilate (C={C} grids):   {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
