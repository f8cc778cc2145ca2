"""ROS1 .bag on-ramp tests: container round-trip, message decoding,
conversion, and the recorded-fixture end-to-end chain
(bag -> convert -> suite manifest -> runner -> ATE) — the rebuild's
analog of the reference's rosbag validation basis
(dpg_data_runner_main.cc:95-128)."""

import json
import pathlib

import numpy as np
import pytest

from dpg_slam_tpu.io import convert, rosbag1, suites

FIXTURE = pathlib.Path(__file__).resolve().parent.parent / "datasets" / "b21_analog"


def _streams(T=12, B=64, seed=0):
    rng = np.random.default_rng(seed)
    scan_stamps = 100.0 + np.arange(T) * 0.1 + rng.normal(0, 0.005, T)
    scan_stamps = np.sort(scan_stamps)
    scans = rng.uniform(0.5, 7.5, (T, B)).astype(np.float32)
    odom_stamps = 100.0 + np.arange(2 * T) * 0.05
    odom = np.stack(
        [np.linspace(0, 2, 2 * T), np.linspace(0, 1, 2 * T),
         np.linspace(-0.5, 2.8, 2 * T)], axis=1,
    )
    return scan_stamps, scans, odom_stamps, odom


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_write_read_roundtrip(tmp_path, compression):
    scan_stamps, scans, odom_stamps, odom = _streams()
    bag = tmp_path / "rt.bag"
    rosbag1.write_bag(
        bag, scan_stamps, scans, odom_stamps, odom,
        angle_min=-1.5, angle_max=1.5, range_max=8.0,
        compression=compression,
    )
    s_st, s, meta, o_st, o = rosbag1.read_bag_streams(bag)
    np.testing.assert_allclose(s_st, scan_stamps, atol=1e-6)
    np.testing.assert_allclose(s, scans, rtol=1e-6)
    np.testing.assert_allclose(o_st, odom_stamps, atol=1e-6)
    np.testing.assert_allclose(o[:, :2], odom[:, :2], atol=1e-9)
    # theta round-trips through the quaternion, wrap-safe
    np.testing.assert_allclose(
        np.angle(np.exp(1j * (o[:, 2] - odom[:, 2]))), 0.0, atol=1e-9
    )
    assert meta["num_beams"] == 64
    assert meta["angle_min"] == pytest.approx(-1.5)
    assert meta["range_max"] == pytest.approx(8.0)


def test_gt_topic_and_ambiguity(tmp_path):
    scan_stamps, scans, odom_stamps, odom = _streams()
    gt = odom + 0.25
    bag = tmp_path / "gt.bag"
    rosbag1.write_bag(
        bag, scan_stamps, scans, odom_stamps, odom,
        angle_min=-1.5, angle_max=1.5,
        gt_stamps=odom_stamps, gt=gt,
    )
    # Two Odometry topics: implicit selection must refuse...
    with pytest.raises(rosbag1.BagError, match="odometry topic"):
        rosbag1.read_bag_streams(bag)
    # ...explicit or excluded selection works.
    _, _, _, _, o = rosbag1.read_bag_streams(bag, odom_topic="/ground_truth")
    np.testing.assert_allclose(o[:, 0], gt[:, 0], atol=1e-9)
    _, _, _, _, o = rosbag1.read_bag_streams(
        bag, exclude_topics=("/ground_truth",)
    )
    np.testing.assert_allclose(o[:, 0], odom[:, 0], atol=1e-9)


def test_malformed_bags_raise(tmp_path):
    p = tmp_path / "bad.bag"
    p.write_bytes(b"#ROSBAG V1.2\n" + b"x" * 64)
    with pytest.raises(rosbag1.BagError, match="not a ROS1 v2.0"):
        rosbag1.read_bag(p)
    scan_stamps, scans, odom_stamps, odom = _streams(T=4)
    good = tmp_path / "good.bag"
    rosbag1.write_bag(
        good, scan_stamps, scans, odom_stamps, odom,
        angle_min=-1.5, angle_max=1.5, compression="none",
    )
    truncated = tmp_path / "trunc.bag"
    truncated.write_bytes(good.read_bytes()[:-40])
    with pytest.raises(rosbag1.BagError, match="truncated"):
        rosbag1.read_bag(truncated)


def test_convert_bag_keeps_recorded_geometry(tmp_path):
    """num_beams/range_max=None adopt the recorded sensor geometry, and
    dropout artifacts (0.0 / inf ranges) sanitize to no-hit, never to
    phantom points."""
    scan_stamps, scans, odom_stamps, odom = _streams(B=91)
    scans[3, 10:20] = 0.0          # dead arc
    scans[5, 40] = np.inf          # specular
    bag = tmp_path / "geom.bag"
    rosbag1.write_bag(
        bag, scan_stamps, scans, odom_stamps, odom,
        angle_min=-1.2, angle_max=1.2, range_max=6.5,
    )
    seq = convert.convert(bag, None, tmp_path / "geom.npz",
                          num_beams=None, range_max=None)
    assert seq.scans.shape[1] == 91
    assert seq.scans.max() <= 6.5 + 1e-6
    assert np.all(seq.scans[3, 10:20] == pytest.approx(6.5))
    assert seq.scans[5, 40] == pytest.approx(6.5)


def test_suite_manifest_loading(tmp_path):
    manifest = {
        "name": "t",
        "sessions": [{"log": "a.npz", "stride": 2}, {"log": "b.npz"}],
        "scan_overrides": {"num_beams": 91, "angle_min": -1.2, "angle_max": 1.2},
        "pose_graph_overrides": {"icp_max_points": 64},
    }
    mf = tmp_path / "suite.json"
    mf.write_text(json.dumps(manifest))
    suite = suites.load_suite(str(mf))
    assert len(suite.sessions) == 2
    assert suite.sessions[0].stride == 2
    # relative log paths resolve against the manifest directory
    assert suite.sessions[0].log == str(tmp_path / "a.npz")

    from dpg_slam_tpu.config import DpgConfig

    cfg = suites.apply_overrides(DpgConfig(), suite)
    assert cfg.scan.num_beams == 91
    assert cfg.pose_graph.icp_max_points == 64


def test_fixture_end_to_end_ate(tmp_path):
    """The committed b21_analog fixture: .bag -> converter -> manifest
    suite -> engine passes -> ATE. SLAM must beat raw odometry on the
    first pass and keep cross-pass map shape tight (pass 1 carries a
    rigid gauge offset from per-pass origin anchoring + cross-pass
    closures; the aligned ATE is the shape metric)."""
    import dataclasses

    import jax

    from dpg_slam_tpu.config import CapacityParams, DpgConfig, DpgParams, PoseGraphParams
    from dpg_slam_tpu.engine import DpgSlamEngine
    from dpg_slam_tpu.utils.metrics import ate_rmse, to_anchor_frame

    # Convert FROM THE BAGS into the tmp dir (the committed .npz are a
    # convenience copy; this test exercises the converter itself).
    logs = {}
    for p in (0, 1):
        seq = convert.convert(
            FIXTURE / f"pass{p}.bag", None, tmp_path / f"pass{p}.npz",
            num_beams=None, range_max=None, gt_topic="/ground_truth",
        )
        assert seq.ground_truth is not None
        logs[p] = tmp_path / f"pass{p}.npz"
    manifest = json.loads((FIXTURE / "suite.json").read_text())
    manifest["sessions"] = [
        {"log": str(logs[0])}, {"log": str(logs[1])},
    ]
    mf = tmp_path / "suite.json"
    mf.write_text(json.dumps(manifest))

    suite = suites.load_suite(str(mf))
    cfg = DpgConfig(
        dpg=DpgParams(
            grid_extent_cells=256, occ_grid_resolution=0.1,
            max_submap_nodes=16, num_bins_for_change_detection=36,
        ),
        capacity=CapacityParams(max_nodes=128, max_edges=1024, max_priors=8),
    )
    cfg = suites.apply_overrides(cfg, suite)
    assert cfg.scan.num_beams == 181          # recorded geometry flowed through

    seqs = [suites.materialize(s, cfg.scan) for s in suite.sessions]
    eng = DpgSlamEngine(cfg)
    node_start = 0
    ates, aligned, odom_ates = [], [], []
    for p, seq in enumerate(seqs):
        if p:
            eng.increment_pass()
        kf = []
        for t in range(len(seq.scans)):
            eng.observe_odometry(seq.odometry[t])
            if eng.observe_laser(seq.scans[t]):
                kf.append(t)
        gt = to_anchor_frame(seq.ground_truth[kf])
        traj = np.asarray(eng.trajectory()[node_start:])
        ates.append(ate_rmse(traj, gt))
        aligned.append(ate_rmse(traj, gt, align=True))
        odom_ates.append(ate_rmse(to_anchor_frame(seq.odometry[kf]), gt))
        node_start = eng.num_nodes()

    assert ates[0] < 0.10, f"pass-0 ATE {ates[0]:.3f} (odom {odom_ates[0]:.3f})"
    assert ates[0] < 0.5 * odom_ates[0], "SLAM should beat raw odometry"
    assert ates[1] < 0.25, f"pass-1 ATE {ates[1]:.3f}"
    assert aligned[1] < 0.06, f"pass-1 aligned/shape ATE {aligned[1]:.3f}"
