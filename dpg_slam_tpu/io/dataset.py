"""Synthetic 2D lidar worlds and sequence simulation.

The reference validates against two rosbag suites (GDC: 4 bags, MIT
reading-room: 10 bags; src/runner/dpg_data_runner_main.cc:95-128) that are
not shipped with the repo. This module provides the equivalent test signal:
segment-map worlds, a vectorized raycaster producing scans with the same
(angle_min, angle_max, num_beams, range_max) geometry, odometry with
configurable drift, and multi-pass variants of the same world with objects
added/removed — the DPG long-term-mapping scenario.

Host-side numpy by design: this is the data generator, not the compute path.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

from dpg_slam_tpu.config import ScanParams


class Sequence(NamedTuple):
    """One session: T timesteps of scan + odometry (+ ground truth)."""

    scans: np.ndarray       # (T, num_beams) float32 ranges
    odometry: np.ndarray    # (T, 3) absolute odometry poses (drifting frame)
    ground_truth: np.ndarray  # (T, 3) true poses in world frame


@dataclasses.dataclass
class SyntheticWorld:
    """A 2D world of line segments."""

    segments: np.ndarray  # (S, 4): x1, y1, x2, y2

    def add_box(self, cx: float, cy: float, w: float, h: float) -> "SyntheticWorld":
        x0, x1 = cx - w / 2, cx + w / 2
        y0, y1 = cy - h / 2, cy + h / 2
        box = np.array(
            [
                [x0, y0, x1, y0],
                [x1, y0, x1, y1],
                [x1, y1, x0, y1],
                [x0, y1, x0, y0],
            ]
        )
        return SyntheticWorld(np.vstack([self.segments, box]))

    def remove_last_box(self) -> "SyntheticWorld":
        return SyntheticWorld(self.segments[:-4])


def make_office_world() -> SyntheticWorld:
    """A 16x12 'office': outer walls + interior partitions + furniture."""
    segs = [
        # outer walls
        [-8, -6, 8, -6], [8, -6, 8, 6], [8, 6, -8, 6], [-8, 6, -8, -6],
        # partitions with door gaps
        [-8, 0, -3, 0], [-1, 0, 3, 0], [5, 0, 8, 0],
        [0, -6, 0, -3], [0, -1, 0, 0],
        # alcove
        [4, 2, 4, 6], [4, 2, 6, 2],
    ]
    w = SyntheticWorld(np.array(segs, dtype=np.float64))
    # Furniture placed clear of the office_loop_waypoints path (a pose
    # inside/adjacent to structure makes the raycaster carve through it).
    w = w.add_box(-5.0, -2.2, 1.2, 0.8)   # desk
    w = w.add_box(7.2, -3.2, 1.0, 1.0)    # cabinet
    return w


def make_reading_room_world() -> SyntheticWorld:
    """A 10x8 single room with a central table cluster — the MIT
    reading-room analog (one room revisited across many short sessions,
    dpg_data_runner_main.cc:116-128). Smaller FOV coverage per scan and
    tighter loops than the office."""
    segs = [
        # outer walls
        [-5, -4, 5, -4], [5, -4, 5, 4], [5, 4, -5, 4], [-5, 4, -5, -4],
        # reading nooks (wall stubs) — tips stay >=0.4 m clear of the
        # waypoint path (a pose on structure makes the raycaster carve
        # through it; see CLAUDE.md lore)
        [-5, 0, -4.0, 0], [5, 0, 3.9, 0],
    ]
    w = SyntheticWorld(np.array(segs, dtype=np.float64))
    w = w.add_box(0.0, 0.0, 1.6, 1.0)      # central table
    w = w.add_box(-3.8, 2.8, 0.8, 0.8)     # shelf
    return w


def reading_room_waypoints() -> np.ndarray:
    """A loop around the central table, clear of all structure."""
    return np.array(
        [
            [-3.5, -2.5], [3.5, -2.5], [3.5, 2.5], [-2.5, 2.5], [-3.5, -2.5],
        ]
    )


def raycast(world: SyntheticWorld, pose: np.ndarray, params: ScanParams) -> np.ndarray:
    """Vectorized lidar raycast from an SE(2) pose (the pose of the LASER,
    not the robot base — compose the extrinsic before calling).

    Returns (num_beams,) ranges clipped to range_max (which marks them
    MAX_RANGE downstream, matching dpg_measurement.h:43-45).
    """
    i = np.arange(params.num_beams)
    angles = params.angle_min + i * params.angle_increment + pose[2]
    ox, oy = pose[0], pose[1]
    dx, dy = np.cos(angles), np.sin(angles)  # (B,)

    x1, y1, x2, y2 = world.segments.T  # (S,)
    ex, ey = x2 - x1, y2 - y1

    # Solve o + t d = p1 + u e for t >= 0, 0 <= u <= 1, per (beam, segment).
    denom = dx[:, None] * (-ey)[None, :] + dy[:, None] * ex[None, :]  # (B, S)
    rx = x1[None, :] - ox
    ry = y1[None, :] - oy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (rx * (-ey)[None, :] + ry * ex[None, :]) / denom
        u = (dx[:, None] * ry - dy[:, None] * rx) / denom
    hit = (np.abs(denom) > 1e-12) & (t > params.range_min) & (u >= 0.0) & (u <= 1.0)
    t = np.where(hit, t, np.inf)
    ranges = t.min(axis=1)
    return np.minimum(ranges, params.range_max).astype(np.float32)


def _interp_trajectory(waypoints: np.ndarray, step: float) -> np.ndarray:
    """Piecewise-linear trajectory through waypoints with heading along
    motion; `step` meters between poses."""
    poses = []
    for a, b in zip(waypoints[:-1], waypoints[1:]):
        d = np.linalg.norm(b - a)
        heading = np.arctan2(b[1] - a[1], b[0] - a[0])
        n = max(int(d / step), 1)
        for k in range(n):
            t = k / n
            p = a + t * (b - a)
            poses.append([p[0], p[1], heading])
    poses.append([waypoints[-1][0], waypoints[-1][1], poses[-1][2]])
    return np.array(poses)


def simulate_sequence(
    world: SyntheticWorld,
    waypoints: np.ndarray,
    params: ScanParams,
    *,
    step: float = 0.25,
    odom_noise_transl: float = 0.004,
    odom_noise_rot: float = 0.002,
    scan_noise: float = 0.01,
    laser_pose_in_bl: tuple[float, float, float] = (0.2, 0.0, 0.0),
    seed: int = 0,
) -> Sequence:
    """Drive through waypoints, producing scans + drifting odometry.

    Scans are raycast from the LASER pose (robot pose composed with
    `laser_pose_in_bl`, default = the reference extrinsic,
    parameters.h:319-339) — the engine undoes this extrinsic when building
    base_link clouds, so simulator and engine must agree on it.

    Odometry drift model: integrate true relative motion corrupted with
    Gaussian noise per step — the standard dead-reckoning error model the
    reference's motion-model sigmas (dpg_slam.cc:227-231) are built for.
    """
    rng = np.random.default_rng(seed)
    gt = _interp_trajectory(np.asarray(waypoints, np.float64), step)
    T = len(gt)

    lx, ly, lth = laser_pose_in_bl

    def laser_pose(robot_pose):
        c, s = np.cos(robot_pose[2]), np.sin(robot_pose[2])
        return np.array(
            [
                robot_pose[0] + c * lx - s * ly,
                robot_pose[1] + s * lx + c * ly,
                robot_pose[2] + lth,
            ]
        )

    def noisy_scan(pose):
        r = raycast(world, laser_pose(pose), params)
        hit = r < params.range_max
        # Noise only on real returns: a no-hit beam reports range_max
        # exactly (the MAX_RANGE convention, dpg_measurement.h:43-45);
        # noising it would fabricate phantom points at ~range_max.
        noisy = np.where(hit, r + rng.normal(0, scan_noise, params.num_beams), r)
        return np.minimum(noisy, params.range_max).astype(np.float32)

    scans = np.stack([noisy_scan(gt[t]) for t in range(T)])

    # Integrate noisy odometry.
    odom = np.zeros((T, 3))
    odom[0] = gt[0]
    for t in range(1, T):
        # true relative motion in previous frame
        c, s = np.cos(gt[t - 1, 2]), np.sin(gt[t - 1, 2])
        d = gt[t, :2] - gt[t - 1, :2]
        rel = np.array(
            [
                c * d[0] + s * d[1],
                -s * d[0] + c * d[1],
                np.angle(np.exp(1j * (gt[t, 2] - gt[t - 1, 2]))),
            ]
        )
        rel[:2] += rng.normal(0, odom_noise_transl, 2)
        rel[2] += rng.normal(0, odom_noise_rot)
        c, s = np.cos(odom[t - 1, 2]), np.sin(odom[t - 1, 2])
        odom[t, 0] = odom[t - 1, 0] + c * rel[0] - s * rel[1]
        odom[t, 1] = odom[t - 1, 1] + s * rel[0] + c * rel[1]
        odom[t, 2] = np.angle(np.exp(1j * (odom[t - 1, 2] + rel[2])))

    return Sequence(
        scans=scans,
        odometry=odom.astype(np.float32),
        ground_truth=gt.astype(np.float32),
    )


def office_loop_waypoints() -> np.ndarray:
    """A loop through the office rooms that revisits its start (loop
    closure opportunity)."""
    return np.array(
        [
            [-6, -4], [-2, -4], [-2, -2], [2, -2], [2, -4], [6, -4],
            [6, -2], [6, 3], [2, 3], [-2, 3], [-6, 3], [-6, -1], [-6, -4],
        ],
        dtype=np.float64,
    )
