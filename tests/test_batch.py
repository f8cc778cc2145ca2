"""Session-batched throughput mode (dpg_slam_tpu.batch): host keyframe
schedule parity + batched-vs-sequential state parity."""

import numpy as np
import pytest

from dpg_slam_tpu import batch
from dpg_slam_tpu.config import CapacityParams, DpgConfig, PoseGraphParams, ScanParams
from dpg_slam_tpu.engine import DpgSlamEngine
from dpg_slam_tpu.io import dataset
from dpg_slam_tpu.utils.metrics import ate_rmse, to_anchor_frame


def small_config(**pg_overrides):
    pg = dict(
        icp_max_points=64,
        icp_maximum_iterations=30,
        max_loop_closures_per_node=4,
    )
    pg.update(pg_overrides)
    return DpgConfig(
        scan=ScanParams(num_beams=256, range_max=10.0),
        pose_graph=PoseGraphParams(**pg),
        capacity=CapacityParams(max_nodes=64, max_edges=512, max_priors=8),
    )


def _make_session(cfg, seed):
    world = dataset.make_office_world()
    wps = dataset.office_loop_waypoints()
    return dataset.simulate_sequence(
        world, wps, cfg.scan, step=0.5, seed=seed,
        odom_noise_transl=0.02, odom_noise_rot=0.008,
    )


@pytest.fixture(scope="module")
def sessions():
    cfg = small_config()
    return cfg, [_make_session(cfg, seed) for seed in (1, 2)]


def test_keyframe_schedule_parity(sessions):
    """The host numpy schedule must reproduce the device gate exactly
    (engine._process_sequence's kf_mask)."""
    cfg, seqs = sessions
    for seq in seqs:
        eng = DpgSlamEngine(cfg)
        eng._dpg_enabled = False
        kf_mask = eng.process_sequence(seq.odometry, seq.scans, run_dpg=False)
        host = batch.keyframe_schedule(cfg, seq.odometry)
        np.testing.assert_array_equal(host, np.asarray(kf_mask))


def test_batched_matches_sequential(sessions):
    """Each lane of the batched program must match the engine's offline
    sequential run of the same session (same frontend, same solve)."""
    cfg, seqs = sessions

    # Sequential references: the engine's own offline program, forced to
    # the same static solve bucket the batched run uses.
    refs = []
    kf_counts = []
    for seq in seqs:
        eng = DpgSlamEngine(cfg)
        eng._dpg_enabled = False
        m = batch.keyframe_schedule(cfg, seq.odometry)
        kf_counts.append(int(m.sum()))
        eng.process_sequence(seq.odometry, seq.scans, run_dpg=False)
        refs.append(eng)

    states, counts = batch.process_sessions_batched(
        cfg,
        [(seq.odometry, seq.scans) for seq in seqs],
        solve_bucket=None,
        use_kernel=False,
    )
    assert counts == kf_counts

    for i, eng in enumerate(refs):
        lane = batch.session_state(states, i)
        n = int(lane.num_nodes)
        assert n == eng.num_nodes()
        # Same keyframes, same factor counts.
        assert int(lane.graph.num_edges) == int(eng.state.graph.num_edges)
        assert int(lane.graph.num_priors) == int(eng.state.graph.num_priors)
        # Poses agree: identical per-pair ICP math; the solve runs at a
        # different static bucket/batching so allow small numeric slack.
        np.testing.assert_allclose(
            np.asarray(lane.poses[:n]),
            eng.trajectory(),
            atol=2e-3,
            err_msg=f"lane {i} trajectory diverged from sequential run",
        )


def test_batched_padding_lanes(sessions):
    """A shorter session padded to the longest one must still match its own
    solo batched run (padding steps are fully masked)."""
    cfg, seqs = sessions
    short = (seqs[0].odometry[: len(seqs[0].odometry) // 2], seqs[0].scans[: len(seqs[0].scans) // 2])
    full = (seqs[1].odometry, seqs[1].scans)

    solo_states, solo_counts = batch.process_sessions_batched(
        cfg, [short], use_kernel=False
    )
    # Force the same bucket as the mixed run (which is sized by the longer
    # session) so the comparison isolates padding, not bucket choice.
    mixed_states, mixed_counts = batch.process_sessions_batched(
        cfg, [short, full], use_kernel=False
    )
    assert mixed_counts[0] == solo_counts[0]
    lane = batch.session_state(mixed_states, 0)
    solo = batch.session_state(solo_states, 0)
    n = int(lane.num_nodes)
    assert n == int(solo.num_nodes)
    np.testing.assert_allclose(
        np.asarray(lane.poses[:n]), np.asarray(solo.poses[:n]), atol=2e-3
    )


def test_batched_tracks_accurately(sessions):
    """Batched lanes must actually solve SLAM: ATE per lane comparable to
    the engine's sequential result (well under dead-reckoning error)."""
    cfg, seqs = sessions
    states, counts = batch.process_sessions_batched(
        cfg, [(s.odometry, s.scans) for s in seqs], use_kernel=False
    )
    for i, seq in enumerate(seqs):
        lane = batch.session_state(states, i)
        n = int(lane.num_nodes)
        kf_idx = np.nonzero(batch.keyframe_schedule(cfg, seq.odometry))[0][:n]
        gt = to_anchor_frame(seq.ground_truth[kf_idx])
        ate = ate_rmse(np.asarray(lane.poses[:n]), gt)
        assert ate < 0.25, f"lane {i} ATE {ate}"


def test_batched_solve_stride_accuracy(sessions):
    """Periodic-solve cadence (solve_stride>1): tracking quality must stay
    in the per-keyframe-solve class — the final group's solve covers the
    full graph, so only seeding/candidate quality differs between solves."""
    cfg, seqs = sessions
    base_states, _ = batch.process_sessions_batched(
        cfg, [(s.odometry, s.scans) for s in seqs], use_kernel=False
    )
    stride_states, counts = batch.process_sessions_batched(
        cfg, [(s.odometry, s.scans) for s in seqs], use_kernel=False,
        solve_stride=4,
    )
    for i, seq in enumerate(seqs):
        base = batch.session_state(base_states, i)
        lane = batch.session_state(stride_states, i)
        n = int(lane.num_nodes)
        assert n == int(base.num_nodes) == counts[i]
        kf_idx = np.nonzero(batch.keyframe_schedule(cfg, seq.odometry))[0][:n]
        gt = to_anchor_frame(seq.ground_truth[kf_idx])
        ate_base = ate_rmse(np.asarray(base.poses[:n]), gt)
        ate_stride = ate_rmse(np.asarray(lane.poses[:n]), gt)
        assert ate_stride < 0.25, f"lane {i} stride-4 ATE {ate_stride}"
        assert ate_stride < ate_base * 1.5 + 0.05, (ate_stride, ate_base)


@pytest.fixture(scope="module")
def server_sessions():
    """Server-test sessions: denser clouds (downsample 2 -> ~128 points)
    and mild odometry noise. The server (one jitted step per keyframe)
    and the offline program (one lax.scan) are DIFFERENT compiled
    programs, so f32 reduction orders differ at the mm level per node;
    at the shared fixture's heavy noise that drift can cross a
    successive-pair alias boundary (always-accepted, reference
    semantics) and fork the trajectory — program-identity physics, not
    a serving bug (this host's XLA CPU also splits reductions by
    runtime thread availability, so even one program is not bitwise
    run-stable). Mild noise keeps every pair far from alias boundaries
    so the mechanism comparison is meaningful and the tests
    deterministic-in-outcome."""
    cfg = small_config(downsample_icp_points_ratio=2, icp_max_points=128)
    world = dataset.make_office_world()
    wps = dataset.office_loop_waypoints()
    seqs = [
        dataset.simulate_sequence(
            world, wps, cfg.scan, step=0.5, seed=seed,
            odom_noise_transl=0.003, odom_noise_rot=0.001,
        )
        for seed in (1, 2)
    ]
    return cfg, seqs


def test_server_immediate_matches_offline(server_sessions):
    """BatchedSlamServer mechanics vs the offline program: every lane
    keyframes at exactly its offline schedule's ticks, node and factor
    counts match, and trajectories land in the engine's accuracy class.

    (Historical note: this test once flaked at meters scale — the cause
    was a real async-aliasing race in the server, since fixed: live
    numpy buffers were passed zero-copy into the dispatched step and
    mutated by the next observe(). See BatchedSlamServer._execute.)"""
    cfg, seqs = server_sessions
    T = min(len(s.scans) for s in seqs)
    srv = batch.BatchedSlamServer(
        cfg, n_sessions=2, min_batch_fraction=1e-9, use_kernel=False,
        solve_bucket=cfg.capacity.max_nodes,
    )
    ticks = [[], []]
    for t in range(T):
        newly = srv.observe(
            np.stack([s.odometry[t] for s in seqs]),
            np.stack([s.scans[t] for s in seqs]),
        )
        for i in range(2):
            if newly[i]:
                ticks[i].append(t)
    srv.flush()

    off_states, counts = batch.process_sessions_batched(
        cfg, [(s.odometry[:T], s.scans[:T]) for s in seqs], use_kernel=False,
        solve_bucket=cfg.capacity.max_nodes,
    )
    for i, seq in enumerate(seqs):
        sched = np.nonzero(batch.keyframe_schedule(cfg, seq.odometry[:T]))[0]
        assert ticks[i] == list(sched)
        assert srv.num_nodes(i) == counts[i]
        lane = batch.session_state(off_states, i)
        assert int(srv.states.graph.num_priors[i]) == int(lane.graph.num_priors)
        np.testing.assert_array_equal(
            np.asarray(srv.states.odom_poses[i, : counts[i]]),
            np.asarray(lane.odom_poses[: counts[i]]),
            err_msg=f"lane {i} fed different odometry than the offline run",
        )
        # Closure acceptance may differ by a couple of factors (the
        # server's fused-batch compositions differ from the offline
        # program's), but trajectories must agree closely.
        assert abs(
            int(srv.states.graph.num_edges[i]) - int(lane.graph.num_edges)
        ) <= 4
        np.testing.assert_allclose(
            srv.trajectory(i), np.asarray(lane.poses[: counts[i]]), atol=2e-2,
            err_msg=f"lane {i} server trajectory diverged from offline",
        )


def test_server_bounded_delay_quality(server_sessions):
    """With real batching (wait for half the lanes or max_wait ticks),
    keyframes execute on the freshest gated scan per lane — trajectories
    stay in the same accuracy class as immediate execution."""
    cfg, seqs = server_sessions
    T = min(len(s.scans) for s in seqs)
    srv = batch.BatchedSlamServer(
        cfg, n_sessions=2, min_batch_fraction=1.0, max_wait_calls=4,
        use_kernel=False, solve_bucket=cfg.capacity.max_nodes,
    )
    for t in range(T):
        srv.observe(
            np.stack([s.odometry[t] for s in seqs]),
            np.stack([s.scans[t] for s in seqs]),
        )
    srv.flush()
    assert srv.steps_executed < srv.keyframes_executed  # batching happened
    for i, seq in enumerate(seqs):
        n = srv.num_nodes(i)
        assert n >= 10
        traj = srv.trajectory(i)
        # Compare against ground truth at the executed keyframes'
        # ODOMETRY poses: match each keyframe to the nearest scan tick.
        d = np.linalg.norm(
            seq.odometry[:T, None, :2] - srv.states.odom_poses[i, :n, :2][None], axis=-1
        )
        ticks = np.argmin(d, axis=0)
        gt = to_anchor_frame(seq.ground_truth[ticks])
        ate = ate_rmse(traj, gt)
        assert ate < 0.3, f"lane {i} served ATE {ate}"


# ---------------------------------------------------------------------------
# Multi-pass batched mode (pass handshake + per-keyframe DPG)
# ---------------------------------------------------------------------------

def _dpg_small_config():
    from dpg_slam_tpu.config import DpgParams

    return DpgConfig(
        scan=ScanParams(num_beams=256, range_max=10.0),
        pose_graph=PoseGraphParams(
            icp_max_points=64,
            icp_maximum_iterations=30,
            max_loop_closures_per_node=4,
        ),
        dpg=DpgParams(
            grid_extent_cells=256,
            occ_grid_resolution=0.1,
            max_submap_nodes=16,
            num_bins_for_change_detection=36,
        ),
        capacity=CapacityParams(max_nodes=128, max_edges=1024, max_priors=8),
    )


@pytest.fixture(scope="module")
def multipass_setup():
    """Two lanes, each the test_dpg two-pass change scenario (box removed,
    box added) with distinct noise seeds."""
    cfg = _dpg_small_config()
    base = dataset.make_office_world()
    world1 = base.add_box(2.0, 1.5, 1.0, 1.0)
    world2 = base.add_box(-3.0, 1.5, 1.0, 1.0)
    wps = dataset.office_loop_waypoints()
    lanes = []
    for s in range(2):
        seq1 = dataset.simulate_sequence(
            world1, wps, cfg.scan, step=0.5, seed=3 + 10 * s
        )
        seq2 = dataset.simulate_sequence(
            world2, wps, cfg.scan, step=0.5, seed=4 + 10 * s
        )
        lanes.append([(seq1.odometry, seq1.scans), (seq2.odometry, seq2.scans)])
    return cfg, lanes


def _engine_two_pass(cfg, lane):
    eng = DpgSlamEngine(cfg)
    (o1, s1), (o2, s2) = lane
    eng.process_sequence(o1, s1)
    n1 = eng.num_nodes()
    eng.increment_pass()
    eng.process_sequence(o2, s2)
    return eng, n1


def test_multipass_batched_matches_engine(multipass_setup):
    """process_sessions_multipass (batched tracking + vmapped reoptimize +
    vmapped per-keyframe DPG) must reproduce the engine's two-pass run per
    lane: same node counts, engine-class trajectories, and the same
    change-detection outcome (REMOVED labels on the vanished box, ADDED on
    the appeared one, sector deactivations in the same class)."""
    import jax.numpy as jnp

    from dpg_slam_tpu import scan as scan_mod

    cfg, lanes = multipass_setup
    states, counts = batch.process_sessions_multipass(
        cfg, lanes, use_kernel=False
    )
    for i, lane in enumerate(lanes):
        eng, n1 = _engine_two_pass(cfg, lane)
        lane_state = batch.session_state(states, i)
        n = int(lane_state.num_nodes)
        assert n == eng.num_nodes(), f"lane {i} node count"
        assert counts[i][0] + counts[i][1] == n
        # Trajectory parity class (batched solver schedule differs from the
        # engine's warm per-keyframe solves; reoptimize realigns both).
        d = np.abs(np.asarray(lane_state.poses[:n]) - eng.trajectory())
        assert d[:, :2].max() < 0.05, f"lane {i} trajectory {d[:, :2].max()}"
        # DPG outcomes: labels on pass-0 nodes should mark REMOVED points
        # (vanished box) and pass-1 nodes ADDED points, as the engine does.
        lab_b = np.asarray(lane_state.labels[:n])
        lab_e = np.asarray(eng.state.labels[:n])
        b_removed = int((lab_b == scan_mod.REMOVED).sum())
        e_removed = int((lab_e == scan_mod.REMOVED).sum())
        b_added = int((lab_b == scan_mod.ADDED).sum())
        e_added = int((lab_e == scan_mod.ADDED).sum())
        assert b_removed > 0 and b_added > 0, (
            f"lane {i}: batched DPG found no changes "
            f"(removed={b_removed}, added={b_added})"
        )
        # Same class as the engine (thresholded decisions can flip a few
        # points near gates; require within 2x each way).
        for got, ref, name in (
            (b_removed, e_removed, "removed"),
            (b_added, e_added, "added"),
        ):
            assert ref / 2 <= got <= ref * 2, (
                f"lane {i} {name}: batched {got} vs engine {ref}"
            )
        # Deactivations propagate the same way.
        assert (
            int(np.asarray(lane_state.sector_active[:n]).sum())
            <= int(np.asarray(lane_state.node_active[:n]).sum())
            * lane_state.sector_active.shape[-1]
        )


def test_multipass_capacity_check(multipass_setup):
    cfg, lanes = multipass_setup
    import dataclasses as dc

    tight = dc.replace(cfg, capacity=dc.replace(cfg.capacity, max_nodes=48))
    with pytest.raises(ValueError, match="cumulative keyframes exceed"):
        batch.process_sessions_multipass(tight, lanes, use_kernel=False)
