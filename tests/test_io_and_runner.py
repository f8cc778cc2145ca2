"""Tests for log IO (native + python paths), checkpointing, viz export,
and the multi-session runner CLI."""

import json
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from dpg_slam_tpu.config import CapacityParams, DpgConfig, DpgParams, PoseGraphParams, ScanParams
from dpg_slam_tpu.engine import DpgSlamEngine
from dpg_slam_tpu.io import dataset, logs
from dpg_slam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def tiny_config():
    return DpgConfig(
        scan=ScanParams(num_beams=128),
        pose_graph=PoseGraphParams(
            icp_max_points=32, icp_maximum_iterations=15, max_loop_closures_per_node=2
        ),
        dpg=DpgParams(grid_extent_cells=128, occ_grid_resolution=0.2, max_submap_nodes=4),
        capacity=CapacityParams(max_nodes=32, max_edges=256, max_priors=4),
    )


@pytest.fixture(scope="module")
def tiny_session():
    cfg = tiny_config()
    world = dataset.make_office_world()
    seq = dataset.simulate_sequence(
        world, dataset.office_loop_waypoints()[:5], cfg.scan, step=0.5, seed=2
    )
    eng = DpgSlamEngine(cfg)
    for t in range(len(seq.scans)):
        eng.observe_odometry(seq.odometry[t])
        eng.observe_laser(seq.scans[t])
    return cfg, eng, seq


@pytest.mark.parametrize("fmt", ["npz", "dsl"])
def test_sequence_roundtrip(tmp_path, tiny_session, fmt):
    _, _, seq = tiny_session
    p = tmp_path / f"seq.{fmt}"
    logs.save_sequence(p, seq)
    back = logs.load_sequence(p)
    np.testing.assert_array_equal(back.scans, seq.scans)
    np.testing.assert_array_equal(back.odometry, seq.odometry)
    np.testing.assert_array_equal(back.ground_truth, seq.ground_truth)


def test_dsl_python_fallback_matches_native(tmp_path, tiny_session):
    """Pure-python and native writers produce byte-identical files."""
    _, _, seq = tiny_session
    if logs.native_lib() is None:
        pytest.skip("native library not built")
    p_native = tmp_path / "native.dsl"
    logs.save_sequence(p_native, seq)
    # Force the python path.
    logs._native_checked = True
    logs._native = None
    try:
        p_py = tmp_path / "python.dsl"
        logs.save_sequence(p_py, seq)
    finally:
        logs._native_checked = False
    assert p_native.read_bytes() == p_py.read_bytes()


def test_dsl_rejects_garbage(tmp_path):
    p = tmp_path / "bad.dsl"
    p.write_bytes(b"not a log file at all....")
    with pytest.raises(IOError):
        logs.load_sequence(p)


def test_checkpoint_roundtrip(tmp_path, tiny_session):
    _, eng, _ = tiny_session
    save_checkpoint(tmp_path / "ckpt", eng)
    eng2 = load_checkpoint(tmp_path / "ckpt")
    assert eng2.num_nodes() == eng.num_nodes()
    np.testing.assert_allclose(eng2.trajectory(), eng.trajectory(), atol=1e-6)
    assert eng2.config == eng.config
    # The restored session must be continuable.
    cfg = eng2.config
    world = dataset.make_office_world()
    seq = dataset.simulate_sequence(
        world, dataset.office_loop_waypoints()[:3], cfg.scan, step=0.5, seed=9
    )
    n0 = eng2.num_nodes()
    for t in range(len(seq.scans)):
        eng2.observe_odometry(seq.odometry[t])
        eng2.observe_laser(seq.scans[t])
    assert eng2.num_nodes() >= n0


def test_viz_render(tmp_path, tiny_session):
    from dpg_slam_tpu import viz

    _, eng, _ = tiny_session
    out = viz.render_session(eng, str(tmp_path / "map.png"))
    assert pathlib.Path(out).stat().st_size > 10_000


def test_runner_cli_end_to_end(tmp_path):
    """The runner CLI over logs written by itself (save -> replay)."""
    from dpg_slam_tpu.run import main

    out1 = tmp_path / "run1"
    rc = main([
        "--num-beams", "128", "--max-nodes", "64", "--passes", "1",
        "--scenario", "static", "--out", str(out1), "--save-logs",
    ])
    assert rc == 0
    summary = json.loads((out1 / "summary.json").read_text())
    assert summary["passes"][0]["keyframes"] > 5
    # Mechanics test at toy resolution (128 beams, ~26 ICP points) —
    # accuracy at real resolution is covered by tests/test_engine.py.
    assert summary["passes"][0]["ate_m"] < 1.5
    assert (out1 / "pass0.dsl").exists()

    # Replay the log through the CLI.
    out2 = tmp_path / "run2"
    rc = main([
        "--logs", str(out1 / "pass0.dsl"),
        "--num-beams", "128", "--max-nodes", "64", "--out", str(out2),
    ])
    assert rc == 0
    s2 = json.loads((out2 / "summary.json").read_text())
    assert s2["passes"][0]["keyframes"] == summary["passes"][0]["keyframes"]
