"""Dataset-suite tests (component #10 of SURVEY.md §2: the dpg_data_runner
multi-session harness, dpg_data_runner_main.cc:65-128)."""

import numpy as np
import pytest

from dpg_slam_tpu.config import CapacityParams, DpgConfig, PoseGraphParams, ScanParams
from dpg_slam_tpu.io import suites


def small_scan():
    return ScanParams(num_beams=128, range_max=10.0)


def test_builtin_suites_shape():
    s = suites.builtin_suites()
    # Reference session counts: GDC 4 bags (:108-111), MIT 10 bags (:117-126).
    assert len(s["gdc"].sessions) == 4
    assert len(s["mit"].sessions) == 10
    with pytest.raises(KeyError):
        suites.load_suite("nope")


def test_overrides_apply():
    cfg = DpgConfig(scan=small_scan())
    suite = suites.load_suite("mit")
    cfg2 = suites.apply_overrides(cfg, suite)
    assert cfg2.pose_graph.maximum_node_dist_across_passes_scan_comparison == 2.0
    # untouched fields survive
    assert cfg2.pose_graph.min_dist_between_nodes == cfg.pose_graph.min_dist_between_nodes


def test_materialize_window_and_stride():
    spec = suites.SessionSpec(
        scenario="office", seed=1, start_s=2.0, duration_s=5.0,
        nominal_rate_hz=10.0, stride=2, step=0.25,
    )
    seq = suites.materialize(spec, small_scan())
    # 5 s at 10 Hz = 50 scans, stride 2 -> 25.
    assert len(seq.scans) == 25
    full = suites.materialize(
        suites.SessionSpec(scenario="office", seed=1, step=0.25), small_scan()
    )
    # Window starts 20 scans in.
    np.testing.assert_allclose(seq.scans[0], full.scans[20])
    np.testing.assert_allclose(seq.scans[1], full.scans[22])


def test_materialize_log_roundtrip(tmp_path):
    from dpg_slam_tpu.io import dataset, logs

    spec0 = suites.SessionSpec(scenario="office", seed=3, step=0.5)
    seq = suites.materialize(spec0, small_scan())
    p = tmp_path / "sess.npz"
    logs.save_sequence(p, seq)
    spec = suites.SessionSpec(log=str(p), stride=3)
    seq2 = suites.materialize(spec, small_scan())
    np.testing.assert_allclose(seq2.scans, seq.scans[::3])


def test_reading_room_scenario_tracks():
    """The second benchmark world (MIT reading-room analog): the engine
    must track a loop around the central table."""
    from dpg_slam_tpu.engine import DpgSlamEngine
    from dpg_slam_tpu.io import dataset
    from dpg_slam_tpu.utils.metrics import ate_rmse, to_anchor_frame

    cfg = DpgConfig(
        scan=ScanParams(num_beams=256, range_max=10.0),
        pose_graph=PoseGraphParams(
            icp_max_points=64, icp_maximum_iterations=30, max_loop_closures_per_node=4
        ),
        capacity=CapacityParams(max_nodes=32, max_edges=256, max_priors=4),
    )
    seq = suites.materialize(
        suites.SessionSpec(
            scenario="reading_room", seed=6, step=0.5,
            odom_noise_transl=0.02, odom_noise_rot=0.008,
        ),
        cfg.scan,
    )
    eng = DpgSlamEngine(cfg)
    kf = eng.process_sequence(seq.odometry, seq.scans, run_dpg=False)
    assert eng.num_nodes() >= 8
    gt = to_anchor_frame(seq.ground_truth[np.flatnonzero(kf)])
    ate = ate_rmse(eng.trajectory(), gt)
    # A small single room barely drifts, so SLAM ~ odometry here; the bar
    # is tracking correctness, not drift correction.
    assert ate < 0.2, f"ATE {ate}"


def test_mini_suite_end_to_end():
    """Two windowed sessions through the engine with a pass boundary —
    the runner's bag -> /new_pass -> bag flow."""
    from dpg_slam_tpu.engine import DpgSlamEngine

    cfg = DpgConfig(
        scan=small_scan(),
        pose_graph=PoseGraphParams(
            icp_max_points=32, icp_maximum_iterations=10, max_loop_closures_per_node=2
        ),
        capacity=CapacityParams(max_nodes=64, max_edges=256, max_priors=4),
    )
    specs = [
        suites.SessionSpec(scenario="office", seed=7, duration_s=4.0, step=0.5),
        suites.SessionSpec(scenario="office", seed=8, duration_s=4.0, step=0.5),
    ]
    eng = DpgSlamEngine(cfg)
    counts = []
    for i, spec in enumerate(specs):
        seq = suites.materialize(spec, cfg.scan)
        eng.process_sequence(seq.odometry, seq.scans, run_dpg=False)
        counts.append(eng.num_nodes())
        if i == 0:
            eng.increment_pass()
    assert counts[0] >= 2 and counts[1] > counts[0]
    assert np.isfinite(eng.trajectory()).all()
