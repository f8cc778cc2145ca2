"""Build the committed recorded-stream fixture (datasets/b21_analog/).

The reference validates on MIT B21 reading-room rosbags
(dpg_data_runner_main.cc:116-128) which are not redistributable; this
fixture reproduces their *data shape* so the full recorded-data pipeline
(.bag -> io/rosbag1 -> io/convert -> suite manifest -> runner -> ATE) is
exercised end-to-end on realistic sensor artifacts:

  * 181-beam SICK geometry (+-90 deg FOV, 1 deg increment, 8 m range) —
    the B21's scanner, vs the framework's 1024-beam default;
  * irregular scan stamps (10 Hz nominal with timing jitter) on a
    unix-epoch clock;
  * odometry on its OWN clock and rate (20 Hz), so conversion must
    time-align by interpolation;
  * beam dropouts: contiguous dead arcs (connector shadow) and isolated
    zero/inf returns (specular surfaces) — must sanitize to no-hit, not
    phantom points;
  * ground truth recorded as a second Odometry stream (mocap analog).

Two sessions of the same room with an object swap (the DPG scenario),
written as chunked bz2 ROS1 v2.0 bags by io/rosbag1.write_bag, plus the
suite manifest binding them into a two-pass experiment.

Rebuild: python tools/build_recorded_fixture.py
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from dpg_slam_tpu.config import ScanParams
from dpg_slam_tpu.io import dataset, rosbag1

SICK = ScanParams(
    num_beams=181,
    angle_min=-np.pi / 2,
    angle_max=np.pi / 2,
    range_min=0.05,
    range_max=8.0,
)
EPOCH = 1_300_000_000.0  # unix-like clock (2011, the MIT data era)


def degrade_scans(scans: np.ndarray, rng) -> np.ndarray:
    """Recorded-sensor artifacts: dead arcs + specular zero/inf returns."""
    out = np.asarray(scans, np.float32).copy()
    T, B = out.shape
    for t in range(T):
        if rng.random() < 0.15:  # connector-shadow dead arc
            w = int(rng.integers(5, 26))
            i0 = int(rng.integers(0, B - w))
            out[t, i0 : i0 + w] = 0.0
        spec = rng.random(B) < 0.01  # specular: zero or saturated
        out[t, spec] = np.where(rng.random(spec.sum()) < 0.5, 0.0, np.inf)
    return out


def build_pass(world, wps, seed):
    seq = dataset.simulate_sequence(
        world, wps, SICK, step=0.30, seed=seed,
        odom_noise_transl=0.02, odom_noise_rot=0.008,
    )
    rng = np.random.default_rng(seed + 7)
    T = len(seq.scans)

    # Irregular scan clock: 10 Hz nominal, per-message jitter.
    scan_stamps = EPOCH + np.arange(T) * 0.1 + rng.normal(0, 0.008, T)
    scan_stamps = np.sort(scan_stamps)
    scans = degrade_scans(seq.scans, rng)

    # Odometry on its own 20 Hz clock: interpolate the per-scan odometry
    # onto the finer grid (piecewise linear, wrap-safe via unwrap).
    t_end = scan_stamps[-1] - EPOCH
    odom_stamps = EPOCH + np.arange(0.0, t_end, 0.05) + rng.normal(0, 0.002, 1)
    scan_rel = scan_stamps - EPOCH
    th = np.unwrap(np.asarray(seq.odometry)[:, 2].astype(np.float64))
    odom = np.stack(
        [
            np.interp(odom_stamps - EPOCH, scan_rel, seq.odometry[:, 0]),
            np.interp(odom_stamps - EPOCH, scan_rel, seq.odometry[:, 1]),
            np.interp(odom_stamps - EPOCH, scan_rel, th),
        ],
        axis=1,
    )
    gt_th = np.unwrap(np.asarray(seq.ground_truth)[:, 2].astype(np.float64))
    gt = np.stack(
        [seq.ground_truth[:, 0], seq.ground_truth[:, 1], gt_th], axis=1
    )
    return scan_stamps, scans, odom_stamps, odom, gt


def main():
    out = pathlib.Path(__file__).resolve().parent.parent / "datasets" / "b21_analog"
    out.mkdir(parents=True, exist_ok=True)

    base = dataset.make_reading_room_world()
    wps = dataset.reading_room_waypoints()
    worlds = [base.add_box(2.0, 1.2, 0.6, 0.6), base.add_box(-2.0, 1.0, 0.6, 0.6)]

    for p, world in enumerate(worlds):
        scan_stamps, scans, odom_stamps, odom, gt = build_pass(world, wps, 400 + p)
        bag = out / f"pass{p}.bag"
        rosbag1.write_bag(
            bag, scan_stamps, scans, odom_stamps, odom,
            angle_min=SICK.angle_min, angle_max=SICK.angle_max,
            range_min=SICK.range_min, range_max=SICK.range_max,
            scan_topic="/scan", odom_topic="/odom",
            # Ground truth as a second Odometry stream (mocap analog),
            # stamped on the scan clock.
            gt_stamps=scan_stamps, gt=gt, gt_topic="/ground_truth",
            compression="bz2",
        )
        print(f"wrote {bag} ({bag.stat().st_size/1024:.0f} KiB, "
              f"{len(scans)} scans, {len(odom)} odom)", flush=True)

    manifest = {
        "name": "b21_analog",
        "description": (
            "two-pass recorded-stream fixture: 181-beam SICK geometry, "
            "irregular stamps, dropouts; object swapped between passes "
            "(MIT reading-room data shape, dpg_data_runner_main.cc:116-128)"
        ),
        "sessions": [
            {"log": "pass0.npz", "nominal_rate_hz": 10.0},
            {"log": "pass1.npz", "nominal_rate_hz": 10.0},
        ],
        "scan_overrides": {
            "num_beams": 181,
            "angle_min": float(SICK.angle_min),
            "angle_max": float(SICK.angle_max),
            "range_min": 0.05,
            "range_max": 8.0,
        },
        "pose_graph_overrides": {
            # Sparse-scanner settings (measured on this fixture): a
            # 181-beam scan downsampled 1/5 leaves ~36 ICP points and
            # LOSES to raw odometry (ATE 0.41 vs 0.26 m); keeping every
            # 2nd beam recovers ATE 0.02/0.16 m. Dropout arcs also cut
            # per-pair overlap below the default 0.5 gate, rejecting good
            # constraints - 0.35 keeps them.
            "downsample_icp_points_ratio": 2,
            "icp_max_points": 128,
            "max_loop_closures_per_node": 8,
            "icp_min_overlap": 0.35,
            # Must match the extrinsic the data was recorded with
            # (simulate_sequence laser_pose_in_bl default 0.2, the
            # reference's kLaser* values, parameters.h:319-339).
            "laser_x_in_bl_frame": 0.2,
            "min_angle_between_nodes": 0.3,
        },
        "dpg_overrides": {},
    }
    (out / "suite.json").write_text(json.dumps(manifest, indent=2) + "\n")
    print(f"wrote {out/'suite.json'}", flush=True)


if __name__ == "__main__":
    main()
