"""Native C++ serial baseline vs the numpy re-execution: same keyframe
loop, same semantics — final trajectories must agree (the native path is
what bench.py prefers for the vs_baseline denominator)."""

import numpy as np
import pytest

from dpg_slam_tpu.baselines import serial_cpu
from dpg_slam_tpu.io.logs import native_lib


def _setup(n0=8, p=40, seed=0):
    rng = np.random.default_rng(seed)
    # A loop of noisy wall-like clouds + a pose chain.
    clouds = []
    for i in range(n0):
        base = np.stack(
            [np.linspace(-2, 2, p), np.full(p, 1.5)], axis=1
        ) + rng.normal(0, 0.02, (p, 2))
        clouds.append(base)
    poses = np.zeros((n0, 3))
    poses[:, 0] = np.arange(n0) * 0.9
    priors = [(0, np.zeros(3), np.diag([1 / 0.2, 1 / 0.2, 1 / 0.15]))]
    W = np.diag([1 / 0.6, 1 / 0.6, 1 / 0.6])
    edges = []
    for i in range(1, n0):
        edges.append((i - 1, i, np.array([0.9, 0.0, 0.0]), W))
    return clouds, poses, priors, edges


@pytest.mark.skipif(
    native_lib() is None or not hasattr(native_lib(), "baseline_bench"),
    reason="native library not built",
)
def test_native_baseline_matches_numpy():
    clouds, poses, priors, edges = _setup()
    icp_params = dict(max_iters=30, gate=0.6, epsilon=5e-9)
    K, n_steps = 3, 4
    rng = np.random.default_rng(1)

    # Continuation keyframes: shifted views of the wall with odometry seeds.
    new_clouds = []
    deltas = []
    for k in range(n_steps):
        base = np.stack(
            [np.linspace(-2, 2, 40), np.full(40, 1.5 - 0.05 * k)], axis=1
        ) + rng.normal(0, 0.02, (40, 2))
        new_clouds.append(base)
        deltas.append([0.4 + 0.02 * k, 0.01, 0.02])
    deltas = np.array(deltas)
    W = np.diag([1 / 0.6, 1 / 0.6, 1 / 0.6])

    fps, native_poses = serial_cpu.native_baseline_bench(
        clouds, poses, list(edges), priors[0][2], new_clouds, deltas, W,
        closures_k=K, icp_params=icp_params, return_poses=True,
    )
    assert fps is not None and fps > 0

    # numpy reference loop (bench.bench_cpu_baseline's fallback body).
    np_clouds = [c.astype(np.float64) for c in clouds]
    np_poses = poses.copy()
    np_edges = list(edges)
    for k in range(n_steps):
        prev = np_poses[-1]
        c, s = np.cos(prev[2]), np.sin(prev[2])
        R = np.array([[c, -s], [s, c]])
        seed = np.array(
            [*(prev[:2] + R @ deltas[k][:2]), prev[2] + deltas[k][2]]
        )
        dist = np.linalg.norm(np_poses[:-1, :2] - seed[:2], axis=1)
        cands = np.argsort(dist)[:K].tolist()
        np_edges.append((len(np_poses) - 1, len(np_poses), deltas[k].copy(), W))
        np_poses, np_edges = serial_cpu.keyframe_step_serial(
            np_clouds, np_poses, new_clouds[k], seed, priors, np_edges,
            closure_candidates=cands, icp_params=icp_params,
        )
        np_clouds.append(new_clouds[k])

    assert native_poses.shape == np_poses.shape
    d = np.abs(native_poses - np_poses)
    d[:, 2] = np.abs(np.angle(np.exp(1j * (native_poses[:, 2] - np_poses[:, 2]))))
    assert d.max() < 5e-2, f"max pose deviation {d.max()}"
