"""Auxiliary-subsystem tests: engine+mesh integration, occupancy snapshot,
reference-parity configuration, multihost bootstrap no-op, profiling."""

import numpy as np
import pytest

from dpg_slam_tpu.config import (
    CapacityParams, DpgConfig, DpgParams, PoseGraphParams, ScanParams,
)
from dpg_slam_tpu.engine import DpgSlamEngine
from dpg_slam_tpu.io import dataset
from dpg_slam_tpu.parallel import make_mesh
from dpg_slam_tpu.parallel.multihost import initialize_multihost
from dpg_slam_tpu.utils.profiling import StageTimer


def small_cfg():
    return DpgConfig(
        scan=ScanParams(num_beams=256),
        pose_graph=PoseGraphParams(
            icp_max_points=64, icp_maximum_iterations=20, max_loop_closures_per_node=3
        ),
        dpg=DpgParams(grid_extent_cells=256, occ_grid_resolution=0.1, max_submap_nodes=8),
        capacity=CapacityParams(max_nodes=64, max_edges=512, max_priors=8),
    )


def drive(eng, seq):
    kf = []
    for t in range(len(seq.scans)):
        eng.observe_odometry(seq.odometry[t])
        if eng.observe_laser(seq.scans[t]):
            kf.append(t)
    return kf


def test_engine_with_mesh_reoptimize():
    cfg = small_cfg()
    world = dataset.make_office_world()
    seq = dataset.simulate_sequence(
        world, dataset.office_loop_waypoints(), cfg.scan, step=0.5, seed=1
    )
    mesh = make_mesh(8)
    eng = DpgSlamEngine(cfg, mesh=mesh)
    kf = drive(eng, seq)
    eng.increment_pass()  # routes through distributed_reoptimize
    traj = eng.trajectory()
    assert np.isfinite(traj).all()
    assert int(eng.state.graph.num_edges) >= len(kf) - 1


def test_engine_mesh_capacity_validation():
    cfg = small_cfg().replace(
        capacity=CapacityParams(max_nodes=64, max_edges=500, max_priors=8)  # 500 % 8 != 0
    )
    with pytest.raises(ValueError):
        DpgSlamEngine(cfg, mesh=make_mesh(8))


def test_occupancy_snapshot():
    cfg = small_cfg()
    world = dataset.make_office_world()
    seq = dataset.simulate_sequence(
        world, dataset.office_loop_waypoints()[:6], cfg.scan, step=0.5, seed=2
    )
    eng = DpgSlamEngine(cfg)
    drive(eng, seq)
    grid, origin = eng.occupancy_grid(extent=256)
    assert grid.shape == (256, 256)
    assert set(np.unique(grid)).issubset({0, 1, 2})
    assert (grid == 2).sum() > 50      # walls
    assert (grid == 1).sum() > 1000    # carved free space
    # Occupied cells must correspond to map points.
    pts = eng.map_points(subsample=1)
    cells = np.round(pts / cfg.dpg.occ_grid_resolution).astype(int) - np.round(
        origin / cfg.dpg.occ_grid_resolution
    ).astype(int)
    inside = (
        (cells[:, 0] >= 0) & (cells[:, 0] < 256) & (cells[:, 1] >= 0) & (cells[:, 1] < 256)
    )
    hits = grid[cells[inside, 0], cells[inside, 1]]
    assert (hits == 2).mean() > 0.9


def test_reference_parity_mode_runs():
    """A/B parity configuration: fixed ICP covariance + broken-int bin
    ratio + no robust kernel still tracks (SURVEY.md §3.6 toggles)."""
    cfg = small_cfg().replace(
        pose_graph=PoseGraphParams(
            icp_max_points=64,
            icp_maximum_iterations=20,
            max_loop_closures_per_node=3,
            use_fixed_icp_covariance=True,
            robust_delta=None,
        ),
        dpg=DpgParams(
            grid_extent_cells=256, occ_grid_resolution=0.1, max_submap_nodes=8,
            replicate_int_bin_ratio=True,
        ),
    )
    world = dataset.make_office_world()
    seq = dataset.simulate_sequence(
        world, dataset.office_loop_waypoints()[:6], cfg.scan, step=0.5, seed=3
    )
    eng = DpgSlamEngine(cfg)
    kf = drive(eng, seq)
    assert len(kf) >= 5
    eng.increment_pass()
    drive(eng, seq)
    # Broken integer bin ratio: commits require every bin changed, so (as
    # in the reference) nothing gets labeled.
    import dpg_slam_tpu.scan as scan

    labels = np.asarray(eng.state.labels[: eng.num_nodes()])
    assert ((labels == scan.ADDED) | (labels == scan.REMOVED)).sum() == 0


def test_multihost_noop_without_env(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize_multihost() is False


def test_stage_timer():
    t = StageTimer()
    with t("a"):
        pass
    with t("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    t.reset()
    assert t.summary() == {}
