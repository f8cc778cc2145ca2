"""Benchmark: SLAM keyframe pipeline throughput on TPU vs serial CPU baseline.

Prints ONE JSON line:
  {"metric": "keyframe_pipeline_fps", "value": <tpu keyframes/s>,
   "unit": "keyframes/s", "vs_baseline": <tpu fps / serial-CPU fps>}

The keyframe pipeline is the per-keyframe work of the reference
(updatePoseGraphObsConstraints + optimizeGraph, dpg_slam.cc:255-329):
1 successive + K loop-closure ICP alignments and a full pose-graph solve.
The TPU path runs the jitted batched _keyframe_step; the baseline is the
faithful serial re-execution (dpg_slam_tpu/baselines/serial_cpu.py) of the
same work on one CPU thread — the reference's own execution model
(BASELINE.md: no published numbers; baseline must be measured).
"""

import json
import sys
import time

import numpy as np


def build_session(cfg, n_prime_scans=120):
    """Simulate a sequence and prime an engine with its first scans."""
    from dpg_slam_tpu.engine import DpgSlamEngine
    from dpg_slam_tpu.io import dataset

    world = dataset.make_office_world()
    wps = dataset.office_loop_waypoints()
    seq = dataset.simulate_sequence(
        world, wps, cfg.scan, step=0.25, seed=1,
        odom_noise_transl=0.02, odom_noise_rot=0.008,
    )
    eng = DpgSlamEngine(cfg)
    for t in range(min(n_prime_scans, len(seq.scans))):
        eng.observe_odometry(seq.odometry[t])
        eng.observe_laser(seq.scans[t])
    return eng, seq


def bench_tpu(cfg, eng, seq, n_steps=60):
    """Time n_steps jitted keyframe steps (scan-match + graph solve each)."""
    import jax
    import jax.numpy as jnp

    from dpg_slam_tpu import engine as eng_mod

    scans = jnp.asarray(seq.scans[: n_steps + 1])
    state = eng.state
    # Fixed solve bucket covering the whole timed run (engine picks the
    # same bucket per keyframe; hoisted here to avoid per-step host syncs).
    bucket = eng._solve_bucket(eng.num_nodes() + n_steps + 1)
    method = eng._incremental_method(bucket)  # the solver the engine runs

    def step(state, ranges):
        return eng_mod._keyframe_step(
            cfg, state, ranges, method, solve_bucket=bucket
        )

    # Warmup / compile.
    warm = step(state, scans[0])
    jax.block_until_ready(warm.poses)

    t0 = time.perf_counter()
    s = state
    for i in range(n_steps):
        s = step(s, scans[i % scans.shape[0]])
    jax.block_until_ready(s.poses)
    dt = time.perf_counter() - t0
    return n_steps / dt


def bench_cpu_baseline(cfg, eng, n_steps=10):
    """Time the serial reference-equivalent keyframe on one CPU thread."""
    from dpg_slam_tpu.baselines import serial_cpu

    n = eng.num_nodes()
    clouds = []
    state = eng.state
    cm = np.asarray(state.cloud_mask[:n])
    cl = np.asarray(state.cloud[:n])
    for i in range(n):
        clouds.append(cl[i][cm[i]].astype(np.float64))
    poses = np.asarray(state.poses[:n], np.float64)

    priors = [
        (0, np.zeros(3), np.diag([1 / 0.2, 1 / 0.2, 1 / 0.15]))
    ]
    # Odometry + successive edges for the primed graph (cost model: the
    # solve must carry the full graph, like isam re-adding all factors).
    edges = []
    W = np.diag([1 / 0.6, 1 / 0.6, 1 / 0.6])
    for i in range(1, n):
        c, s = np.cos(poses[i - 1, 2]), np.sin(poses[i - 1, 2])
        R = np.array([[c, s], [-s, c]])
        d = R @ (poses[i, :2] - poses[i - 1, :2])
        edges.append((i - 1, i, np.array([d[0], d[1], poses[i, 2] - poses[i - 1, 2]]), W))

    K = cfg.pose_graph.max_loop_closures_per_node
    icp_params = dict(
        max_iters=cfg.pose_graph.icp_maximum_iterations,
        gate=cfg.pose_graph.icp_max_correspondence_distance,
        epsilon=cfg.pose_graph.icp_maximum_transformation_epsilon,
    )

    t0 = time.perf_counter()
    for k in range(n_steps):
        new_cloud = clouds[(k * 7) % n]
        seed = poses[-1] + np.array([0.5, 0.0, 0.0])
        dist = np.linalg.norm(poses[:, :2] - seed[:2], axis=1)
        cands = np.argsort(dist)[:K].tolist()
        new_poses, edges = serial_cpu.keyframe_step_serial(
            clouds, poses, new_cloud, seed, priors, edges,
            closure_candidates=cands, icp_params=icp_params,
        )
        clouds.append(new_cloud)
        poses = new_poses
    dt = time.perf_counter() - t0
    return n_steps / dt


def main():
    # TPU config at full scan resolution.
    from dpg_slam_tpu.config import (
        CapacityParams, DpgConfig, PoseGraphParams, ScanParams,
    )

    cfg = DpgConfig(
        scan=ScanParams(num_beams=1024),
        pose_graph=PoseGraphParams(
            icp_max_points=256,
            icp_maximum_iterations=30,
            max_loop_closures_per_node=8,
        ),
        capacity=CapacityParams(max_nodes=256, max_edges=2048, max_priors=8),
    )

    eng, seq = build_session(cfg)
    fps_tpu = bench_tpu(cfg, eng, seq)
    fps_cpu = bench_cpu_baseline(cfg, eng)

    print(
        json.dumps(
            {
                "metric": "keyframe_pipeline_fps",
                "value": round(fps_tpu, 2),
                "unit": "keyframes/s",
                "vs_baseline": round(fps_tpu / fps_cpu, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
