"""Failure-tolerance and crash-resume tests (SURVEY.md §5: the reference
logs errors and continues — non-converged ICP still contributes its
successive factor, dpg_slam.cc:86-89,264-267; degenerate input is skipped,
not fatal. Checkpoint/resume is our addition: the reference loses all
state on a crash)."""

import numpy as np
import pytest

from dpg_slam_tpu.config import CapacityParams, DpgConfig, PoseGraphParams, ScanParams
from dpg_slam_tpu.engine import DpgSlamEngine
from dpg_slam_tpu.io import dataset


def small_config():
    return DpgConfig(
        scan=ScanParams(num_beams=256, range_max=10.0),
        pose_graph=PoseGraphParams(
            icp_max_points=64, icp_maximum_iterations=20, max_loop_closures_per_node=2
        ),
        capacity=CapacityParams(max_nodes=64, max_edges=512, max_priors=8),
    )


@pytest.fixture(scope="module")
def seq():
    cfg = small_config()
    world = dataset.make_office_world()
    wps = dataset.office_loop_waypoints()
    return dataset.simulate_sequence(
        world, wps, cfg.scan, step=0.5, seed=9,
        odom_noise_transl=0.02, odom_noise_rot=0.008,
    )


def test_corrupted_scans_do_not_poison_the_session(seq):
    """NaN/inf/zero scans mid-session must neither crash nor produce
    non-finite poses — the 'log and continue' failure model."""
    cfg = small_config()
    eng = DpgSlamEngine(cfg)
    bad = {10: np.full_like(seq.scans[0], np.nan),
           11: np.full_like(seq.scans[0], np.inf),
           12: np.zeros_like(seq.scans[0])}
    for t in range(40):
        eng.observe_odometry(seq.odometry[t])
        eng.observe_laser(bad.get(t, seq.scans[t]))
    assert eng.num_nodes() >= 5
    assert np.isfinite(eng.trajectory()).all()


def test_all_max_range_scan_node_is_benign(seq):
    """A scan with zero returns (all max-range) creates an empty cloud;
    the successive factor degrades to odometry-only, poses stay finite."""
    cfg = small_config()
    eng = DpgSlamEngine(cfg)
    empty = np.full_like(seq.scans[0], cfg.scan.range_max)
    for t in range(30):
        eng.observe_odometry(seq.odometry[t])
        eng.observe_laser(empty if t in (6, 7) else seq.scans[t])
    assert np.isfinite(eng.trajectory()).all()


def test_checkpoint_resume_continues_identically(seq, tmp_path):
    """Crash-resume: checkpoint mid-session, resume in a NEW engine, feed
    the remaining scans — identical final trajectory to the uninterrupted
    run (the array state is the complete session state)."""
    from dpg_slam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = small_config()
    T = len(seq.scans)
    half = T // 2

    ref = DpgSlamEngine(cfg)
    for t in range(T):
        ref.observe_odometry(seq.odometry[t])
        ref.observe_laser(seq.scans[t])

    a = DpgSlamEngine(cfg)
    for t in range(half):
        a.observe_odometry(seq.odometry[t])
        a.observe_laser(seq.scans[t])
    save_checkpoint(tmp_path / "ck", a)

    b = load_checkpoint(tmp_path / "ck")
    for t in range(half, T):
        b.observe_odometry(seq.odometry[t])
        b.observe_laser(seq.scans[t])

    assert b.num_nodes() == ref.num_nodes()
    np.testing.assert_allclose(b.trajectory(), ref.trajectory(), atol=1e-4)
