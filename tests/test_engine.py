"""End-to-end engine tests on simulated sequences (SURVEY.md §4: e2e ATE
check on a replayed sequence; BASELINE.json configs 1-3)."""

import numpy as np
import pytest

from dpg_slam_tpu.config import CapacityParams, DpgConfig, PoseGraphParams, ScanParams
from dpg_slam_tpu.engine import DpgSlamEngine
from dpg_slam_tpu.io import dataset
from dpg_slam_tpu.utils.metrics import ate_rmse, to_anchor_frame


def small_config(**pg_overrides):
    return DpgConfig(
        scan=ScanParams(num_beams=256, range_max=10.0),
        pose_graph=PoseGraphParams(
            icp_max_points=64,
            icp_maximum_iterations=30,
            max_loop_closures_per_node=4,
            **pg_overrides,
        ),
        capacity=CapacityParams(max_nodes=64, max_edges=512, max_priors=8),
    )


@pytest.fixture(scope="module")
def office_seq():
    cfg = small_config()
    world = dataset.make_office_world()
    wps = dataset.office_loop_waypoints()
    # Robot-grade odometry drift: SLAM must visibly beat dead reckoning.
    return dataset.simulate_sequence(
        world, wps, cfg.scan, step=0.5, seed=1,
        odom_noise_transl=0.02, odom_noise_rot=0.008,
    )


def run_sequence(eng, seq, stride=1):
    keyframes = []
    for t in range(0, len(seq.scans), stride):
        eng.observe_odometry(seq.odometry[t])
        if eng.observe_laser(seq.scans[t]):
            keyframes.append(t)
    return keyframes


def test_engine_tracks_office_loop(office_seq):
    cfg = small_config()
    eng = DpgSlamEngine(cfg)
    keyframes = run_sequence(eng, office_seq)
    assert eng.num_nodes() == len(keyframes)
    assert eng.num_nodes() >= 10  # ~66 poses at 0.5m spacing, 1m keyframe gate

    # The engine anchors pass 1 at the origin; re-anchor ground truth the
    # same way before comparing.
    traj = eng.trajectory()
    gt = to_anchor_frame(office_seq.ground_truth[keyframes])
    ate = ate_rmse(traj, gt)
    odo_ate = ate_rmse(to_anchor_frame(eng.odom_trajectory()), gt)
    assert ate < 0.25, f"ATE {ate}"
    assert ate <= odo_ate + 0.05, f"SLAM ({ate}) should not be worse than odometry ({odo_ate})"

    # The loop revisits its start: loop-closure (non-successive) edges must
    # actually fire (dpg_slam.cc:273-305 analog).
    g = eng.state.graph
    ei = np.asarray(g.edge_idx[: int(g.num_edges)])
    assert (ei[:, 1] - ei[:, 0] != 1).sum() > 0, "no loop-closure edges were added"


def test_keyframe_gating(office_seq):
    """Keyframes only every >=1 m or >=30 deg (parameters.h:242,254)."""
    cfg = small_config()
    eng = DpgSlamEngine(cfg)
    keyframes = run_sequence(eng, office_seq)
    gt = office_seq.ground_truth
    for a, b in zip(keyframes[:-1], keyframes[1:]):
        d = np.linalg.norm(gt[b, :2] - gt[a, :2])
        dth = abs(np.angle(np.exp(1j * (gt[b, 2] - gt[a, 2]))))
        # Gate uses odometry (noisy), so allow slack.
        assert d > 0.5 or dth > np.pi / 8, (a, b, d, dth)


def test_first_scan_creates_node_at_origin(office_seq):
    cfg = small_config()
    eng = DpgSlamEngine(cfg)
    eng.observe_odometry(office_seq.odometry[0])
    assert eng.observe_laser(office_seq.scans[0])
    assert eng.num_nodes() == 1
    np.testing.assert_allclose(eng.trajectory()[0], 0.0, atol=1e-5)


def test_no_processing_before_odometry(office_seq):
    eng = DpgSlamEngine(small_config())
    assert not eng.observe_laser(office_seq.scans[0])
    assert eng.num_nodes() == 0


def test_pose_query_composes_odometry(office_seq):
    cfg = small_config()
    eng = DpgSlamEngine(cfg)
    eng.observe_odometry(office_seq.odometry[0])
    eng.observe_laser(office_seq.scans[0])
    # Move a little without triggering a keyframe.
    eng.observe_odometry(office_seq.odometry[1])
    pose = eng.pose()
    # Pose should have moved away from the node (un-incorporated odometry).
    moved = np.linalg.norm(
        office_seq.odometry[1][:2] - office_seq.odometry[0][:2]
    )
    assert abs(np.linalg.norm(pose[:2]) - moved) < 0.05


def test_map_points_extraction(office_seq):
    cfg = small_config()
    eng = DpgSlamEngine(cfg)
    run_sequence(eng, office_seq, stride=4)
    pts = eng.map_points()
    assert pts.ndim == 2 and pts.shape[1] == 2
    assert len(pts) > 50
    # Map points live in the anchored SLAM frame (pass start at origin);
    # the office is 16x12 so no point can be farther than its diagonal.
    assert np.all(np.linalg.norm(pts, axis=1) < 21.0)


def test_offline_sequence_matches_online(office_seq):
    """process_sequence (one lax.scan program) must reproduce the online
    observe_odometry/observe_laser loop exactly: same keyframes, same
    graph, same poses."""
    cfg = small_config()
    eng_on = DpgSlamEngine(cfg)
    kfs = run_sequence(eng_on, office_seq)

    eng_off = DpgSlamEngine(cfg)
    kf_mask = eng_off.process_sequence(office_seq.odometry, office_seq.scans)
    assert list(np.flatnonzero(kf_mask)) == kfs
    assert eng_off.num_nodes() == eng_on.num_nodes()
    np.testing.assert_allclose(
        eng_off.trajectory(), eng_on.trajectory(), atol=1e-4
    )
    assert int(eng_off.state.graph.num_edges) == int(eng_on.state.graph.num_edges)


def test_offline_sequence_respects_capacity(office_seq):
    """At node capacity the offline program stops creating keyframes
    instead of corrupting the arrays."""
    from dpg_slam_tpu.config import DpgParams

    cfg = DpgConfig(
        scan=ScanParams(num_beams=256, range_max=10.0),
        pose_graph=PoseGraphParams(
            icp_max_points=64, icp_maximum_iterations=10, max_loop_closures_per_node=2
        ),
        dpg=DpgParams(max_submap_nodes=4, grid_extent_cells=64, occ_grid_resolution=0.2),
        capacity=CapacityParams(max_nodes=8, max_edges=64, max_priors=4),
    )
    eng = DpgSlamEngine(cfg)
    kf_mask = eng.process_sequence(office_seq.odometry, office_seq.scans)
    assert eng.num_nodes() == 8
    assert kf_mask.sum() == 8
    assert np.isfinite(eng.trajectory()).all()


def test_pipelined_sequence_close_to_online(office_seq):
    """The stage-staggered (pipeline-parallel analog) schedule solves one
    keyframe late; after the catch-up solve the trajectory must be close
    to the unpipelined one (seeds differ by at most one solve refinement)."""
    cfg = small_config()
    eng_ref = DpgSlamEngine(cfg)
    eng_ref.process_sequence(office_seq.odometry, office_seq.scans)
    eng_pipe = DpgSlamEngine(cfg)
    kf = eng_pipe.process_sequence(
        office_seq.odometry, office_seq.scans, pipelined=True
    )
    assert kf.sum() == eng_pipe.num_nodes()
    assert eng_pipe.num_nodes() == eng_ref.num_nodes()
    d = np.linalg.norm(
        eng_pipe.trajectory()[:, :2] - eng_ref.trajectory()[:, :2], axis=1
    )
    assert np.max(d) < 0.2, f"max pose deviation {np.max(d)}"


def test_relative_odometry_integration(office_seq):
    """observe_odometry_relative (CobotOdometryCallback analog,
    dpg_slam_main.cc:197-208) integrates robot-frame deltas to the same
    track absolute odometry gives."""
    from dpg_slam_tpu import geom
    import jax.numpy as jnp

    cfg = small_config()
    odom = office_seq.odometry
    eng_abs = DpgSlamEngine(cfg)
    eng_rel = DpgSlamEngine(cfg)
    prev = None
    for t in range(25):
        eng_abs.observe_odometry(odom[t])
        if prev is None:
            eng_rel.observe_odometry_relative(odom[t])  # first: from origin
        else:
            delta = np.asarray(
                geom.between(jnp.asarray(prev), jnp.asarray(odom[t]))
            )
            eng_rel.observe_odometry_relative(delta)
        prev = odom[t]
        eng_abs.observe_laser(office_seq.scans[t])
        eng_rel.observe_laser(office_seq.scans[t])
    # Relative integration starts from the origin; absolute keeps the raw
    # frame. Keyframe decisions and node counts must match (gating is
    # frame-invariant); SLAM trajectories are anchored so they match too.
    assert eng_rel.num_nodes() == eng_abs.num_nodes()
    np.testing.assert_allclose(
        eng_rel.trajectory(), eng_abs.trajectory(), atol=1e-3
    )


def test_second_pass_reoptimize(office_seq):
    """Two passes through the same world: pass 2 re-anchors at origin and
    reoptimize keeps the joint trajectory consistent (BASELINE config 4)."""
    cfg = DpgConfig(
        scan=ScanParams(num_beams=256, range_max=10.0),
        pose_graph=PoseGraphParams(
            icp_max_points=64, icp_maximum_iterations=30, max_loop_closures_per_node=4
        ),
        capacity=CapacityParams(max_nodes=128, max_edges=1024, max_priors=8),
    )
    eng = DpgSlamEngine(cfg)
    run_sequence(eng, office_seq, stride=2)
    n_pass1 = eng.num_nodes()
    eng.increment_pass()
    run_sequence(eng, office_seq, stride=2)
    assert eng.num_nodes() > n_pass1
    traj = eng.trajectory()
    kf_pass2 = traj[n_pass1:]
    # All nodes stay within the (anchored) office extent.
    assert np.all(np.linalg.norm(traj[:, :2], axis=1) < 21.0)
    # Cross-pass consistency: first pass-2 node near the origin prior.
    assert np.linalg.norm(kf_pass2[0, :2]) < 0.5
    # Both passes traverse the same loop: pass-2 keyframes should each have
    # a pass-1 keyframe nearby (trajectory overlay).
    d = np.linalg.norm(
        kf_pass2[:, None, :2] - traj[:n_pass1][None, :, :2], axis=-1
    ).min(axis=1)
    assert np.median(d) < 0.6, f"median cross-pass node distance {np.median(d)}"


def test_reoptimize_valid_host_parity(office_seq):
    """The numpy validity replica used for host-side pair compaction must
    mark exactly the slots the device enumeration marks (engine.
    _reoptimize_valid_host docstring)."""
    from dpg_slam_tpu import engine as eng_mod

    cfg = small_config()
    cfg = cfg.replace(
        capacity=CapacityParams(max_nodes=128, max_edges=1024, max_priors=8)
    )
    eng = DpgSlamEngine(cfg)
    run_sequence(eng, office_seq)
    eng.increment_pass()
    run_sequence(eng, office_seq, stride=2)

    state = eng.state
    dev_valid = np.asarray(eng_mod._reoptimize_pairs(cfg, state)[2])
    node_mask = np.arange(cfg.capacity.max_nodes) < int(state.num_nodes)
    host_valid = eng_mod._reoptimize_valid_host(
        cfg,
        np.asarray(state.poses),
        np.asarray(state.pass_ids),
        node_mask,
    )
    np.testing.assert_array_equal(host_valid, dev_valid)
    assert dev_valid.sum() > 0


def test_reoptimize_compaction_equivalence(office_seq):
    """The compacted reoptimize (live pairs only) must produce the same
    poses and graph as full-coverage compaction (every flat slot swept)."""
    import jax.numpy as jnp

    from dpg_slam_tpu import engine as eng_mod

    cfg = small_config()
    cfg = cfg.replace(
        capacity=CapacityParams(max_nodes=128, max_edges=1024, max_priors=8)
    )
    eng = DpgSlamEngine(cfg)
    run_sequence(eng, office_seq)
    eng.increment_pass()  # runs the compacted path once already
    run_sequence(eng, office_seq, stride=2)

    nb = eng._solve_bucket(int(eng.state.num_nodes))
    node_fields = (
        "poses", "odom_poses", "pass_ids", "node_active",
        "ranges", "labels", "sector_active", "cloud",
        "cloud_mask", "cloud_normals",
    )
    sub = eng.state._replace(
        **{f: getattr(eng.state, f)[:nb] for f in node_fields}
    )
    n_flat = nb * (1 + cfg.pose_graph.max_loop_closures_per_node)
    full_idx = jnp.arange(n_flat, dtype=jnp.int32)
    full_val = jnp.ones((n_flat,), bool)
    ref_state, _ = eng_mod._reoptimize(cfg, sub, full_idx, full_val, "dense")

    cidx, cval, _ = eng._reoptimize_compaction(
        np.asarray(sub.poses[:nb]), np.asarray(sub.pass_ids[:nb]),
        int(eng.state.num_nodes), nb,
    )
    assert int(cval.sum()) < n_flat // 2, "compaction should drop dead slots"
    cmp_state, _ = eng_mod._reoptimize(cfg, sub, cidx, cval, "dense")

    np.testing.assert_allclose(
        np.asarray(cmp_state.poses), np.asarray(ref_state.poses), atol=1e-4
    )
    assert int(cmp_state.graph.num_edges) == int(ref_state.graph.num_edges)


def test_reoptimize_edge_overflow_fails_loudly(office_seq):
    """Reoptimize can enumerate more factor candidates than edge capacity
    (N*(1+K)+N worst case); the count must be clamped on device (no
    zero-information junk slots marked live) and the engine must raise
    instead of silently solving a thinner graph."""
    import jax.numpy as jnp

    from dpg_slam_tpu.engine import _reoptimize
    from dpg_slam_tpu.graph import factor_graph as fg

    cfg = small_config()
    eng = DpgSlamEngine(cfg)
    run_sequence(eng, office_seq)
    assert eng.num_nodes() >= 10

    # Re-home the session state onto a graph with deliberately tiny edge
    # capacity, so the reoptimize candidate set overflows it.
    E_small = 16
    tiny = CapacityParams(
        max_nodes=cfg.capacity.max_nodes, max_edges=E_small, max_priors=8
    )
    small_cfg = cfg.replace(capacity=tiny)
    state = eng.state._replace(graph=fg.empty_graph(8, E_small))

    n_flat = cfg.capacity.max_nodes * (
        1 + cfg.pose_graph.max_loop_closures_per_node
    )
    full_idx = jnp.arange(n_flat, dtype=jnp.int32)
    full_val = jnp.ones((n_flat,), bool)
    new_state, n_cand = _reoptimize(small_cfg, state, full_idx, full_val, "dense")
    assert int(n_cand) > E_small, "test setup failed to overflow"
    # Clamped: the live count never exceeds capacity (junk slots stay dead).
    assert int(new_state.graph.num_edges) == E_small
    assert bool(jnp.all(new_state.graph.edge_mask))

    eng_small = DpgSlamEngine(small_cfg)
    eng_small.state = state._replace(
        pass_number=state.pass_number + 1,
        first_scan_for_pass=jnp.ones((), bool),
    )
    with pytest.raises(RuntimeError, match="factor candidates"):
        eng_small._reoptimize_now(eng_small.state)


def test_parity_ab_fixed_vs_live_covariance(office_seq):
    """Quantitative §3.6.1 A/B: the same noisy session under the
    reference's fixed-diagonal ICP covariance vs the live closed-form
    modes. Documented expectation (config.py, PARITY.md): the live
    covariance lets weakly-constrained closures self-downweight, so its
    ATE must not be worse than fixed mode beyond noise, and every mode
    must track. Numbers recorded in PARITY.md."""
    ates = {}
    for label, overrides in {
        "fixed": dict(use_fixed_icp_covariance=True),
        "gn": dict(icp_covariance_mode="gn"),
        "censi": dict(icp_covariance_mode="censi"),
    }.items():
        cfg = small_config(**overrides)
        eng = DpgSlamEngine(cfg)
        keyframes = run_sequence(eng, office_seq)
        gt = to_anchor_frame(office_seq.ground_truth[keyframes])
        ates[label] = ate_rmse(eng.trajectory(), gt)
    # Every mode tracks.
    for label, ate in ates.items():
        assert ate < 0.25, f"{label} ATE {ate}"
    # Live modes are at least as good as the reference's constant
    # diagonal (allow 10% noise band — they differ by per-edge weights).
    assert ates["gn"] <= ates["fixed"] * 1.10, ates
    assert ates["censi"] <= ates["fixed"] * 1.15, ates


def test_kernel_config_gating(monkeypatch):
    """engine._kernel_config flips use_pallas_icp exactly on real TPU
    backends with kernel-supported configs; RANSAC / point-to-point /
    CPU backends keep the XLA path."""
    import jax

    import dpg_slam_tpu.engine as eng_mod

    eng = DpgSlamEngine(small_config())
    # CPU backend (the test environment): no flip.
    assert eng._kernel_config() is eng.config

    monkeypatch.setattr(
        eng_mod.jax, "default_backend", lambda: "tpu", raising=True
    )
    import dataclasses as dc

    kcfg = eng._kernel_config()
    assert kcfg.pose_graph.use_pallas_icp
    # Everything else unchanged.
    assert dc.replace(kcfg.pose_graph, use_pallas_icp=False) == eng.config.pose_graph

    # Kernel-unsupported configs keep the XLA path even on TPU.

    ransac_cfg = eng.config.replace(
        pose_graph=dc.replace(
            eng.config.pose_graph, icp_use_ransac_rejection=True
        )
    )
    eng_r = DpgSlamEngine(ransac_cfg)
    assert eng_r._kernel_config() is ransac_cfg
    p2p_cfg = eng.config.replace(
        pose_graph=dc.replace(eng.config.pose_graph, icp_point_to_line=False)
    )
    eng_p = DpgSlamEngine(p2p_cfg)
    assert eng_p._kernel_config() is p2p_cfg
    # The historical name stays an alias.
    assert eng._reopt_config().pose_graph.use_pallas_icp
