"""Multi-session experiment runner — the TPU-native dataset runner + node.

Replaces both reference binaries:
  * dpg_slam node (src/dpg_slam/dpg_slam_main.cc): topic callbacks become a
    plain loop over (odometry, scan) arrays; map/pose publishing becomes
    file export.
  * dpg_data_runner (src/runner/dpg_data_runner_main.cc): rosbag playback
    with a /new_pass + reoptimization_complete handshake becomes sequential
    session replays with a synchronous increment_pass() between them.

Usage:
  python -m dpg_slam_tpu.run --dataset synthetic --passes 2 --out results/
  python -m dpg_slam_tpu.run --logs pass1.npz pass2.dsl --out results/

Prints a JSON summary (per-pass ATE/RPE when ground truth is available,
node/edge counts, wall-clock per stage) and optionally renders the map.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import time

import numpy as np


def build_config(args) -> "DpgConfig":
    from dpg_slam_tpu.config import (
        CapacityParams, DpgConfig, DpgParams, PoseGraphParams, ScanParams,
    )

    if args.config:
        return DpgConfig.from_json(pathlib.Path(args.config).read_text())
    return DpgConfig(
        scan=ScanParams(num_beams=args.num_beams),
        pose_graph=PoseGraphParams(
            icp_max_points=256 if args.num_beams >= 512 else 64,
            max_loop_closures_per_node=8,
        ),
        dpg=DpgParams(
            grid_extent_cells=512,
            occ_grid_resolution=0.1,
            max_submap_nodes=16,
        ),
        capacity=CapacityParams(
            max_nodes=args.max_nodes, max_edges=args.max_nodes * 10, max_priors=16
        ),
    )


def synthetic_passes(cfg, n_passes: int, scenario: str):
    """Simulated multi-pass sessions (GDC/MIT-suite analog)."""
    from dpg_slam_tpu.io import dataset

    base = dataset.make_office_world()
    wps = dataset.office_loop_waypoints()
    seqs = []
    for p in range(n_passes):
        if scenario == "box_change" and n_passes > 1:
            # Pass 0 has a box that later vanishes; final pass adds one.
            if p == 0:
                world = base.add_box(2.0, 1.5, 1.0, 1.0)
            elif p == n_passes - 1:
                world = base.add_box(-3.0, 1.5, 1.0, 1.0)
            else:
                world = base
        else:
            world = base
        seqs.append(
            dataset.simulate_sequence(
                world, wps, cfg.scan, step=0.25, seed=100 + p,
                odom_noise_transl=0.02, odom_noise_rot=0.008,
            )
        )
    return seqs


def run_pass(eng, seq, timer=None):
    """Feed one session through the engine (LaserCallback/OdometryCallback
    loop analog); returns keyframe timestep indices. With a StageTimer,
    records per-scan odometry/laser stage wall-clock."""
    kf = []
    if timer is None:
        for t in range(len(seq.scans)):
            eng.observe_odometry(seq.odometry[t])
            if eng.observe_laser(seq.scans[t]):
                kf.append(t)
        return kf
    for t in range(len(seq.scans)):
        with timer("observe_odometry"):
            eng.observe_odometry(seq.odometry[t])
        with timer("observe_laser"):
            if eng.observe_laser(seq.scans[t]):
                kf.append(t)
    return kf


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="synthetic", choices=["synthetic"])
    parser.add_argument("--suite", default=None,
                        help="named benchmark suite (gdc | mit) or a path to a .json suite manifest binding converted recorded-data logs — the "
                             "runOnGdcRosBags/runOnMitRosBags analog")
    parser.add_argument("--logs", nargs="*", default=None,
                        help="sequence logs (.npz/.dsl), one per pass")
    parser.add_argument("--offline", action="store_true",
                        help="run each pass as ONE compiled program "
                             "(engine.process_sequence) instead of the "
                             "per-scan callback loop")
    parser.add_argument("--scenario", default="box_change",
                        choices=["box_change", "static"])
    parser.add_argument("--passes", type=int, default=2)
    parser.add_argument("--num-beams", type=int, default=1024)
    parser.add_argument("--max-nodes", type=int, default=512)
    parser.add_argument("--config", default=None, help="DpgConfig json file")
    parser.add_argument("--out", default=None, help="output directory")
    parser.add_argument("--render", action="store_true", help="write map PNG")
    parser.add_argument("--save-checkpoint", action="store_true")
    parser.add_argument("--save-logs", action="store_true",
                        help="persist the simulated sequences as .dsl logs")
    parser.add_argument("--profile", action="store_true",
                        help="per-stage wall-clock stats in the summary; "
                             "with --out, also a device trace of the "
                             "pass-boundary reoptimize under <out>/trace")
    args = parser.parse_args(argv)

    from dpg_slam_tpu.engine import DpgSlamEngine
    from dpg_slam_tpu.io import logs as log_io
    from dpg_slam_tpu.utils.metrics import ate_rmse, relative_pose_error, to_anchor_frame

    cfg = build_config(args)

    if args.suite:
        from dpg_slam_tpu.io import suites as suites_mod

        suite = suites_mod.load_suite(args.suite)
        cfg = suites_mod.apply_overrides(cfg, suite)
        seqs = [suites_mod.materialize(s, cfg.scan) for s in suite.sessions]
    elif args.logs:
        seqs = [log_io.load_sequence(p) for p in args.logs]
    else:
        seqs = synthetic_passes(cfg, args.passes, args.scenario)

    eng = DpgSlamEngine(cfg)

    out_dir = pathlib.Path(args.out) if args.out else None
    if out_dir:
        out_dir.mkdir(parents=True, exist_ok=True)

    timer = None
    if args.profile:
        from dpg_slam_tpu.utils.profiling import StageTimer

        timer = StageTimer()

    summary = {"passes": [], "config_beams": cfg.scan.num_beams}
    node_start = 0
    for p, seq in enumerate(seqs):
        t0 = time.perf_counter()
        if args.offline:
            if timer is not None:
                with timer("process_sequence"):
                    kf = list(
                        np.flatnonzero(eng.process_sequence(seq.odometry, seq.scans))
                    )
            else:
                kf = list(
                    np.flatnonzero(eng.process_sequence(seq.odometry, seq.scans))
                )
        else:
            kf = run_pass(eng, seq, timer=timer)
        track_s = time.perf_counter() - t0

        pass_info = {
            "pass": p,
            "scans": len(seq.scans),
            "keyframes": len(kf),
            "track_seconds": round(track_s, 2),
            "track_fps": round(len(seq.scans) / track_s, 1),
        }
        if seq.ground_truth is not None and kf:
            gt = to_anchor_frame(seq.ground_truth[kf])
            traj = eng.trajectory()[node_start:]
            pass_info["ate_m"] = round(ate_rmse(traj, gt), 4)
            pass_info["rpe_m"] = round(relative_pose_error(traj, gt), 4)
        if eng.last_dpg_info is not None:
            pass_info["dpg_coverage"] = round(float(eng.last_dpg_info.coverage), 3)
        summary["passes"].append(pass_info)
        node_start = eng.num_nodes()

        if out_dir and args.save_logs:
            log_io.save_sequence(out_dir / f"pass{p}.dsl", seq)

        if p < len(seqs) - 1:
            t0 = time.perf_counter()
            if timer is not None:
                import contextlib

                trace_ctx = contextlib.nullcontext()
                if out_dir and p == 0:
                    from dpg_slam_tpu.utils.profiling import device_trace

                    trace_ctx = device_trace(str(out_dir / "trace"))
                with trace_ctx, timer("reoptimize"):
                    eng.increment_pass()
            else:
                eng.increment_pass()  # the /new_pass + reoptimize handshake
            summary["passes"][-1]["reoptimize_seconds"] = round(
                time.perf_counter() - t0, 2
            )

    if timer is not None:
        summary["profile"] = timer.summary()
    summary["total_nodes"] = eng.num_nodes()
    summary["total_edges"] = int(eng.state.graph.num_edges)
    layers = eng.map_layers()
    summary["map_layers"] = {k: int(len(v)) for k, v in layers.items()}

    if out_dir:
        np.savez(
            out_dir / "trajectory.npz",
            poses=eng.trajectory(),
            odometry=eng.odom_trajectory(),
        )
        (out_dir / "summary.json").write_text(json.dumps(summary, indent=2))
        if args.render:
            from dpg_slam_tpu import viz

            summary["render"] = viz.render_session(eng, str(out_dir / "map.png"))
        if args.save_checkpoint:
            from dpg_slam_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(out_dir / "checkpoint", eng)
            summary["checkpoint"] = str(out_dir / "checkpoint")

    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
