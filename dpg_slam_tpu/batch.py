"""Session-batched throughput mode: S independent SLAM sessions on one chip.

The reference's execution model is strictly one stream: one ROS process,
one scan at a time (dpg_slam_main.cc:172-185 feeding dpg_slam.cc:122-140).
Its per-keyframe cost is a long serial chain of small operations — the
same shape our single-stream keyframe program has on TPU, where it is
latency-bound, not compute-bound: the chip is mostly idle between the tiny
ICP/solve ops of one keyframe.

This module is the TPU-native answer: process S sessions as ONE compiled
program, vmapped over the session axis, so every step does S keyframes'
worth of work — S× the arithmetic intensity at nearly the same program
latency. Two structural moves make it fast and exact:

1.  **Host keyframe schedule.** The keyframe gate (shouldProcessLaser,
    dpg_slam.cc:577-589) depends ONLY on the odometry stream — never on
    ICP or solve results — so it is precomputed on the host
    (`keyframe_schedule`, a numpy replica of the `_observe_odometry` +
    `_should_process` chain, exactness pinned by
    tests/test_batch.py::test_keyframe_schedule_parity). The device
    program then scans over KEYFRAMES only: no per-scan `lax.cond`, no
    wasted odometry-only steps, and — critically — no both-branch
    execution under vmap (vmapping a per-scan cond would run the full
    keyframe body for every scan of every session).

2.  **Cross-session ICP fusion.** Each keyframe's (1+K)-pair ICP batch is
    assembled per session (engine._keyframe_frontend_pre, vmapped) and
    then FLATTENED to one (S*(1+K))-pair `icp_align` call — on TPU this
    feeds the Pallas ICP kernel S*(1+K)/8 blocks per step instead of
    relying on `vmap`-of-`pallas_call`, and per-block early exit still
    applies. The graph solves run vmapped (batched Cholesky / batched
    dense-matvec PCG over the session axis — exactly the batched-small-
    matrix shape the MXU wants).

Sessions of different lengths are padded to the longest keyframe count;
padding steps compute and are then discarded with a masked state adopt
(the pad fraction is small when sessions are similar lengths, and the
alternative — a cond — would not skip work under vmap anyway).

Measured cost structure on the real chip (round 5, 2026-08-21, S=16,
bucket 128, edge capacity right-sized to 1536): the round-4 limiter —
jax.vmap(fg.solve)'s lock-step while_loop at ~85% of per-keyframe-
cadence step time — is replaced by the lanes-batched unrolled LM
(fg.solve_batched via _batched_solve; "lanes_chol" is the quality
point: CPU-sweep lane ATE 0.0173 m vs the old dense_cg's 0.0248).
Combined with the one-scatter factor insertion and the E=4096→1536
right-sizing (every O(E) operand — factor selects, adopt masks,
assemble one-hots — shrank 2.7x), the stride sweep (staged-array
harness, bench_tpu_batched) moved from 628 kf/s (r4 optimum) to
5,297 / 7,426 / 8,550 kf/s at strides 16/32/64, lane ATE
0.0182/0.0219/0.0335 — stride 32 is the recorded quality-preserving
knee at ~67-72x the serial C++ baseline (stride 64 crosses r4's
0.0301 quality bar and is rejected). S=32 lanes match S=16
per-keyframe (0.67 ms/kf, compute-bound), so S=16 remains the lane
knee; per-lane work, not program latency, is now the cost. At the
stride-32 record the solve share is down to 37% (frontend-only
ablation: 11,719 kf/s vs 7,426 full (7,701 after the lean-adopt
pass below) — r4's stride-1 solve was 85%);
the vmapped frontend chain (prepare-cloud, candidate top-K, fused ICP
kernel, factor packing, adopt masks) at ~0.085 ms/kf is the next
lever.

Semantics: each lane runs the engine's keyframe pipeline (same
frontend; the solve is the lanes-batched LM with the same accept/
damping rules); parity vs engine.process_sequence is pinned by
tests/test_batch.py::test_batched_matches_sequential, and quality by
the lane-ATE checks in the bench and quality sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dpg_slam_tpu import engine as eng_mod
from dpg_slam_tpu.config import DpgConfig
from dpg_slam_tpu.engine import SlamState
from dpg_slam_tpu.graph import factor_graph as fg
from dpg_slam_tpu.ops import icp

__all__ = [
    "keyframe_schedule",
    "pack_sessions",
    "process_sessions_batched",
    "process_sessions_multipass",
    "batched_increment_pass",
    "session_state",
]

# Max lanes per vmapped execute_dpg chunk (see dpg_all in
# _process_sessions_batched). History: the r5 GRID-marching DPG crashed
# the TPU worker at full-width vmap (100s-of-MB march tensors per lane;
# chunk 2 was the containment); the polar redesign shrank per-lane
# memory enough that full width is safe and 5% faster (324 vs 309 kf/s
# multipass, measured).
_DPG_LANE_CHUNK = 8


def keyframe_schedule(cfg: DpgConfig, odometry: np.ndarray) -> np.ndarray:
    """Host (numpy) replica of the keyframe gate chain over one odometry
    stream: which scans the online engine would accept as keyframes.

    Mirrors `_observe_odometry` (dpg_slam.cc:515-526) + `_should_process`
    (shouldProcessLaser, dpg_slam.cc:577-589) exactly: the first scan of a
    pass always processes; afterwards a scan processes when the cumulative
    odometry distance since the last keyframe exceeds min_dist_between_nodes
    or the heading delta since the last keyframe exceeds
    min_angle_between_nodes. The gate never reads ICP/solve results, so
    this host replica is exact (pinned by test_keyframe_schedule_parity).

    Args:
      odometry: (T, 3) absolute odometry pose per scan.

    Returns:
      (T,) bool keyframe mask.
    """
    pg = cfg.pose_graph
    odom = np.asarray(odometry, np.float64)
    T = odom.shape[0]
    mask = np.zeros((T,), bool)
    initialized = False
    odom_at_last = np.zeros(3)
    cum = 0.0
    first = True
    for t in range(T):
        o = odom[t]
        if initialized:
            cum += float(np.hypot(o[0] - odom_at_last_obs[0], o[1] - odom_at_last_obs[1]))
        else:
            odom_at_last = o  # first odom fixes the gating reference frame
            initialized = True
        odom_at_last_obs = o
        ang = abs(np.angle(np.exp(1j * (o[2] - odom_at_last[2]))))
        if first or cum > pg.min_dist_between_nodes or ang > pg.min_angle_between_nodes:
            mask[t] = True
            first = False
            cum = 0.0
            odom_at_last = o
    return mask


def pack_sessions(
    cfg: DpgConfig,
    sessions: list[tuple[np.ndarray, np.ndarray]],
    max_keyframes: int | None = None,
):
    """Compact S sessions' scan streams to their keyframes and pad to a
    common length (time-major, for lax.scan).

    Args:
      sessions: list of (odometry (T_s, 3), scans (T_s, B)) per session.
      max_keyframes: optional cap per session (defaults to node capacity).

    Returns:
      (kf_odom (Km, S, 3) f32, kf_scans (Km, S, B) f32, kf_valid (Km, S)
      bool, counts (S,) int list) — host numpy arrays.
    """
    cap_nodes = cfg.capacity.max_nodes if max_keyframes is None else max_keyframes
    edges_worst = 2 + cfg.pose_graph.max_loop_closures_per_node
    # CONSERVATIVE edge budget: worst-case edge consumption per keyframe
    # (1 successive + K closures + prior slack), not the actual accepted
    # count the engine's live capacity gate checks — so on edge-tight
    # configs batched lanes can truncate EARLIER than the sequential
    # engine would. Warned below when this cap (not node capacity) binds.
    edges_cap = cfg.capacity.max_edges // edges_worst
    cap = min(cap_nodes, edges_cap)
    B = cfg.scan.num_beams
    kf_os, kf_ss, counts = [], [], []
    for si, (odom, scans) in enumerate(sessions):
        odom = np.asarray(odom, np.float32)
        scans = np.asarray(scans, np.float32)
        if scans.shape[1] != B:
            raise ValueError(f"expected (T, {B}) scans, got {scans.shape}")
        m = keyframe_schedule(cfg, odom)
        idx_all = np.nonzero(m)[0]
        if len(idx_all) > cap and edges_cap < cap_nodes:
            import warnings

            warnings.warn(
                f"pack_sessions: session {si} truncated to {cap} keyframes "
                f"by the worst-case edge budget (max_edges // {edges_worst}); "
                "the sequential engine's live gate may have accepted more — "
                "raise capacity.max_edges for exact per-lane parity",
                stacklevel=2,
            )
        idx = idx_all[:cap]
        kf_os.append(odom[idx])
        kf_ss.append(scans[idx])
        counts.append(len(idx))
    Km = max(counts)
    S = len(sessions)
    kf_odom = np.zeros((Km, S, 3), np.float32)
    kf_scans = np.zeros((Km, S, B), np.float32)
    kf_valid = np.zeros((Km, S), bool)
    for s in range(S):
        n = counts[s]
        kf_odom[:n, s] = kf_os[s]
        kf_scans[:n, s] = kf_ss[s]
        kf_valid[:n, s] = True
    return kf_odom, kf_scans, kf_valid, counts


def _batched_solve(
    cfg: DpgConfig,
    states: SlamState,        # leading session axis S
    solve_method: str,        # "lanes_cg" | "lanes_chol" (solve_batched)
    solve_bucket: int | None,
    gn_iterations: int | None = None,
    cg_iterations: int | None = None,
) -> SlamState:
    """The lanes-batched incremental solve (fg.solve_batched) over the
    stacked states — the throughput mode's replacement for
    jax.vmap(engine._keyframe_solve), whose lock-step vmapped while_loop
    was measured at ~85% of a per-keyframe-cadence batched step
    (BASELINE.md). Same warm-start settings as the engine's solve."""
    pg = cfg.pose_graph
    nb = solve_bucket or states.poses.shape[1]
    node_mask = jnp.arange(nb) < states.num_nodes[:, None]
    poses_b, _ = fg.solve_batched.__wrapped__(
        states.poses[:, :nb],
        states.graph,
        node_mask,
        max_iterations=(
            gn_iterations
            if gn_iterations is not None
            else pg.incremental_gn_iterations
        ),
        damping_init=pg.gn_damping_init,
        method="chol" if solve_method == "lanes_chol" else "cg_fixed",
        cg_iterations=(
            cg_iterations if cg_iterations is not None else 12
        ),
        robust_delta=pg.robust_delta,
        gradient_tol=pg.gn_gradient_tol,
        terminate_on_reject=True,
        rel_tol=1e-4,
    )
    poses = jax.lax.dynamic_update_slice(states.poses, poses_b, (0, 0, 0))
    return states._replace(poses=poses)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "solve_method", "solve_bucket", "solve_stride",
        "solve_gn_iterations", "solve_cg_iterations", "run_dpg",
    ),
)
def _process_sessions_batched(
    cfg: DpgConfig,
    states: SlamState,        # pytree with leading session axis S
    kf_odom: jnp.ndarray,     # (Km, S, 3) time-major keyframe odometry
    kf_scans: jnp.ndarray,    # (Km, S, B)
    kf_valid: jnp.ndarray,    # (Km, S) bool (False = padding step)
    solve_method: str,
    solve_bucket: int | None = None,
    solve_stride: int = 1,
    solve_gn_iterations: int | None = None,
    solve_cg_iterations: int | None = None,
    run_dpg: bool = False,
) -> SlamState:
    """One compiled program: lax.scan over keyframe steps, each step
    processing one keyframe for each of S sessions (see module docstring).

    solve_stride: run the graph solve every `stride` keyframes instead of
    every keyframe (the standard production-SLAM cadence split: per-scan
    tracking, periodic optimization). Between solves, new nodes chain on
    odometry-composed estimates exactly like the online engine between
    keyframes; the final group's solve still covers the FULL graph, so
    the returned trajectory is a complete LM solution. Km must divide by
    the stride (pack to a multiple). 1 = the reference's per-keyframe
    optimize semantics.
    """
    observe_odom = eng_mod._observe_odometry.__wrapped__
    K1 = 1 + cfg.pose_graph.max_loop_closures_per_node
    N_cap = states.poses.shape[1]

    def frontend(states, odom, ranges, valid):
        S = odom.shape[0]
        s1 = jax.vmap(lambda s, o: observe_odom(cfg, s, o))(states, odom)
        # Invalid (padding) lanes: point the node-row write index out of
        # bounds so every _write_node scatter DROPS (verified OOB-drop
        # semantics) — the big node arrays then need no adopt select at
        # all (see adopt_frontend).
        s1 = s1._replace(
            num_nodes=jnp.where(valid, s1.num_nodes, N_cap)
        )
        s2, icp_in, tgt_idx, tgt_valid, est_pose, new_idx = jax.vmap(
            lambda s, r: eng_mod._keyframe_frontend_pre(cfg, s, r)
        )(s1, ranges)

        # Cross-session ICP fusion: (S, 1+K, ...) -> (S*(1+K), ...).
        def flat(x):
            return x.reshape((S * K1,) + x.shape[2:])

        res_flat = icp.icp_align(
            flat(icp_in.src), flat(icp_in.src_mask),
            flat(icp_in.tgt), flat(icp_in.tgt_mask),
            flat(icp_in.seeds), cfg.pose_graph,
            tgt_normals=flat(icp_in.tgt_normals),
            gate_multiplier=flat(icp_in.gate),
        )
        res = jax.tree_util.tree_map(
            lambda x: x.reshape((S, K1) + x.shape[1:]), res_flat
        )
        return jax.vmap(
            lambda s, r, ti, tv, ep, ni: eng_mod._keyframe_frontend_post(
                cfg, s, r, ti, tv, ep, ni
            )
        )(s2, res, tgt_idx, tgt_valid, est_pose, new_idx)

    def adopt(valid, new, old):
        v = valid.reshape(valid.shape + (1,) * (new.ndim - 1))
        return jnp.where(v, new, old)

    def adopt_frontend(valid, new, old):
        """Frontend-step state adoption WITHOUT selecting the big node
        arrays: the frontend writes ranges/labels/cloud/... ONLY at row
        num_nodes, and invalid lanes' writes were dropped via the OOB
        index above — so `new` already equals `old` there for invalid
        lanes. Selecting every leaf cost ~40 MB x 3 of traffic per
        step; only the graph + scalars need the mask (invalid lanes'
        garbage factor writes and bookkeeping must be discarded)."""
        def sel(n, o):
            v = valid.reshape(valid.shape + (1,) * (n.ndim - 1))
            return jnp.where(v, n, o)

        return new._replace(
            graph=jax.tree_util.tree_map(sel, new.graph, old.graph),
            num_nodes=sel(new.num_nodes, old.num_nodes),
            prev_odom=sel(new.prev_odom, old.prev_odom),
            odom_at_last_node=sel(new.odom_at_last_node, old.odom_at_last_node),
            cumulative_dist=sel(new.cumulative_dist, old.cumulative_dist),
            odom_initialized=sel(new.odom_initialized, old.odom_initialized),
            first_scan_for_pass=sel(
                new.first_scan_for_pass, old.first_scan_for_pass
            ),
            pass_number=sel(new.pass_number, old.pass_number),
        )

    def solve_all(states):
        if solve_method.startswith("lanes"):
            return _batched_solve(
                cfg, states, solve_method, solve_bucket,
                solve_gn_iterations, solve_cg_iterations,
            )
        return jax.vmap(
            lambda s: eng_mod._keyframe_solve(cfg, s, solve_method, solve_bucket)
        )(states)

    def dpg_all(states, valid):
        # Per-keyframe change detection, vmapped over lanes — the batched
        # analog of the engine running executeDPG on every accepted node
        # once pass >= 1 (dpg_slam.cc:137-139, 865-886). Static flag: a
        # pass-0 phase compiles without any of this.
        #
        # Lanes are processed in chunks of <= _DPG_LANE_CHUNK via lax.map:
        # execute_dpg's rasterization intermediates are 100s of MB per
        # lane, and a full-width vmap at S=8/extent=512 crashed the TPU
        # worker outright (bench round 5). Sequential chunks bound peak
        # memory at chunk x per-lane while keeping each chunk vectorized.
        from dpg_slam_tpu.dpg import change_detection

        S = valid.shape[0]
        chunk = S
        for c in range(min(S, _DPG_LANE_CHUNK), 0, -1):
            if S % c == 0:
                chunk = c
                break

        def run_chunk(st):
            s5, _info = jax.vmap(
                lambda s: change_detection.execute_dpg.__wrapped__(cfg, s)
            )(st)
            return s5

        if chunk == S:
            s5 = run_chunk(states)
        else:
            grouped = jax.tree_util.tree_map(
                lambda x: x.reshape((S // chunk, chunk) + x.shape[1:]), states
            )
            s5g = jax.lax.map(run_chunk, grouped)
            s5 = jax.tree_util.tree_map(
                lambda x: x.reshape((S,) + x.shape[2:]), s5g
            )
        return jax.tree_util.tree_map(
            functools.partial(adopt, valid), s5, states
        )

    if solve_stride == 1:
        def step(states, inp):
            odom, ranges, valid = inp  # (S, 3), (S, B), (S,)
            s3 = frontend(states, odom, ranges, valid)
            # Padding steps: compute happened, the state update is dropped
            # (big node arrays need no select — see adopt_frontend).
            states = adopt_frontend(valid, s3, states)
            s4 = solve_all(states)
            # The solve changes ONLY poses; select just that leaf.
            states = states._replace(poses=adopt(valid, s4.poses, states.poses))
            if run_dpg:
                states = dpg_all(states, valid)
            return states, None

        states, _ = jax.lax.scan(step, states, (kf_odom, kf_scans, kf_valid))
        return states

    Km = kf_odom.shape[0]
    assert Km % solve_stride == 0, (Km, solve_stride)

    def group(states, inp):
        odom_g, ranges_g, valid_g = inp  # (stride, S, ...)
        for k in range(solve_stride):
            s3 = frontend(states, odom_g[k], ranges_g[k], valid_g[k])
            states = adopt_frontend(valid_g[k], s3, states)
            if run_dpg:
                states = dpg_all(states, valid_g[k])
        # One solve per group; a group with zero live keyframes in a lane
        # still solves (idempotent on an already-solved lane). The solve
        # changes ONLY poses.
        solved = solve_all(states)
        any_valid = jnp.any(valid_g, axis=0)  # (S,)
        states = states._replace(
            poses=adopt(any_valid, solved.poses, states.poses)
        )
        return states, None

    def regroup(x):
        return x.reshape((Km // solve_stride, solve_stride) + x.shape[1:])

    states, _ = jax.lax.scan(
        group, states,
        (regroup(kf_odom), regroup(kf_scans), regroup(kf_valid)),
    )
    return states


def _batched_keyframe_step_impl(
    cfg: DpgConfig,
    states: SlamState,        # leading session axis S
    odom: jnp.ndarray,        # (S, 3)
    ranges: jnp.ndarray,      # (S, B)
    valid: jnp.ndarray,       # (S,) lanes executing a keyframe this step
    solve_method: str,
    solve_bucket: int | None = None,
) -> SlamState:
    """ONE batched keyframe step (the scan-body of the offline program as
    a standalone call) — used by the online serving layer via the
    AOT-compiled cache below."""
    observe_odom = eng_mod._observe_odometry.__wrapped__
    K1 = 1 + cfg.pose_graph.max_loop_closures_per_node
    S = odom.shape[0]
    N_cap = states.poses.shape[1]
    s1 = jax.vmap(lambda s, o: observe_odom(cfg, s, o))(states, odom)
    # Non-executing lanes: OOB node-row index drops their array writes
    # (same trick as the offline program's adopt_frontend).
    s1 = s1._replace(num_nodes=jnp.where(valid, s1.num_nodes, N_cap))
    s2, icp_in, tgt_idx, tgt_valid, est_pose, new_idx = jax.vmap(
        lambda s, r: eng_mod._keyframe_frontend_pre(cfg, s, r)
    )(s1, ranges)

    def flat(x):
        return x.reshape((S * K1,) + x.shape[2:])

    res_flat = icp.icp_align(
        flat(icp_in.src), flat(icp_in.src_mask),
        flat(icp_in.tgt), flat(icp_in.tgt_mask),
        flat(icp_in.seeds), cfg.pose_graph,
        tgt_normals=flat(icp_in.tgt_normals),
        gate_multiplier=flat(icp_in.gate),
    )
    res = jax.tree_util.tree_map(
        lambda x: x.reshape((S, K1) + x.shape[1:]), res_flat
    )
    s3 = jax.vmap(
        lambda s, r, ti, tv, ep, ni: eng_mod._keyframe_frontend_post(
            cfg, s, r, ti, tv, ep, ni
        )
    )(s2, res, tgt_idx, tgt_valid, est_pose, new_idx)
    def adopt(new, old):
        v = valid.reshape(valid.shape + (1,) * (new.ndim - 1))
        return jnp.where(v, new, old)

    # Graph + scalars select; big node arrays already correct (OOB drop).
    s3 = s3._replace(
        graph=jax.tree_util.tree_map(adopt, s3.graph, states.graph),
        num_nodes=adopt(s3.num_nodes, states.num_nodes),
        prev_odom=adopt(s3.prev_odom, states.prev_odom),
        odom_at_last_node=adopt(s3.odom_at_last_node, states.odom_at_last_node),
        cumulative_dist=adopt(s3.cumulative_dist, states.cumulative_dist),
        odom_initialized=adopt(s3.odom_initialized, states.odom_initialized),
        first_scan_for_pass=adopt(
            s3.first_scan_for_pass, states.first_scan_for_pass
        ),
        pass_number=adopt(s3.pass_number, states.pass_number),
    )
    if solve_method.startswith("lanes"):
        s4 = _batched_solve(cfg, s3, solve_method, solve_bucket)
    else:
        s4 = jax.vmap(
            lambda s: eng_mod._keyframe_solve(cfg, s, solve_method, solve_bucket)
        )(s3)
    return s3._replace(poses=adopt(s4.poses, s3.poses))


# Per-(config, method, bucket, S) AOT-compiled server step. Same jax
# 0.9.0 defense as engine._dpg_step_fn: once the step's ingredients
# (_keyframe_frontend_pre/post, _keyframe_solve) have been traced under
# lax.scan with several configs in one process, later shared-path jit
# dispatches intermittently mis-marshal lifted consts — observed here as
# RUN-TO-RUN garbage factor measurements in the server (meters-scale,
# non-deterministic across identical processes). AOT lowering+compiling
# pins one executable per signature and bypasses the shared dispatch
# path entirely.
_BATCH_STEP_CACHE: dict = {}


def _batched_keyframe_step(cfg, states, odom, ranges, valid, solve_method,
                           solve_bucket):
    key = (cfg, solve_method, solve_bucket, int(states.poses.shape[0]))
    compiled = _BATCH_STEP_CACHE.get(key)
    if compiled is None:
        fn = jax.jit(
            functools.partial(
                _batched_keyframe_step_impl, cfg,
                solve_method=solve_method, solve_bucket=solve_bucket,
            )
        )
        compiled = fn.lower(states, odom, ranges, valid).compile()
        _BATCH_STEP_CACHE[key] = compiled
    return compiled(states, odom, ranges, valid)


@functools.partial(
    jax.jit, static_argnames=("cfg", "solve_method", "nb")
)
def _batched_reoptimize(
    cfg: DpgConfig,
    states: SlamState,          # leading session axis S
    compact_idx: jnp.ndarray,   # (S, B) per-lane compacted pair indices
    compact_valid: jnp.ndarray, # (S, B)
    solve_method: str,
    nb: int,
):
    """Pass-boundary reoptimize for all lanes as ONE compiled program:
    jax.vmap of the engine's _reoptimize_sliced (bucket slicing, the
    compacted ICP sweep, graph re-pack, cold LM solve). Returns
    (poses (S, N, 3), graph, n_edge_cand (S,))."""
    return jax.vmap(
        lambda s, ci, cv: eng_mod._reoptimize_sliced(
            cfg, s, ci, cv, solve_method, nb
        )
    )(states, compact_idx, compact_valid)


def batched_increment_pass(
    cfg: DpgConfig,
    states: SlamState,
    solve_method: str = "dense",
    use_kernel: bool | None = None,
) -> SlamState:
    """Per-lane increment_pass for the stacked states: the batched analog
    of the runner's pass handshake (dpg_data_runner_main.cc:30-52) —
    every lane's pass-boundary reoptimize runs in one vmapped program,
    then pass bookkeeping resets (pass_number+1, first-scan flag,
    odometry re-anchor) exactly like DpgSlamEngine.increment_pass.

    Host work mirrors the engine's dispatch discipline: ONE device_get
    (num_nodes/poses/pass_ids for all lanes), per-lane host compaction
    padded to a common pair bucket, then ONE compiled program."""
    import dataclasses as dc

    S = states.poses.shape[0]
    num_nodes, poses_h, pass_ids_h = (
        np.asarray(x)
        for x in jax.device_get((states.num_nodes, states.poses, states.pass_ids))
    )
    nb = 64
    n_max = int(num_nodes.max())
    while nb < n_max:
        nb *= 2
    nb = min(nb, cfg.capacity.max_nodes)

    idxs, vals, lives = [], [], []
    for s in range(S):
        idx, val, n_live = eng_mod._reoptimize_compaction_host(
            cfg, poses_h[s, :nb], pass_ids_h[s, :nb], int(num_nodes[s]), nb
        )
        idxs.append(idx)
        vals.append(val)
        lives.append(n_live)
    B = max(x.shape[0] for x in idxs)
    ci = np.zeros((S, B), np.int32)
    cv = np.zeros((S, B), bool)
    for s in range(S):
        ci[s, : idxs[s].shape[0]] = idxs[s]
        cv[s, : vals[s].shape[0]] = vals[s]

    run_cfg = cfg
    pg = cfg.pose_graph
    kernel_ok = pg.icp_point_to_line and not pg.icp_use_ransac_rejection
    if use_kernel is None:
        use_kernel = jax.default_backend() in ("tpu", "axon") and kernel_ok
    if use_kernel and kernel_ok and not pg.use_pallas_icp:
        run_cfg = dc.replace(cfg, pose_graph=dc.replace(pg, use_pallas_icp=True))

    new_poses, new_graph, n_edge_cand = _batched_reoptimize(
        run_cfg, states, jnp.asarray(ci), jnp.asarray(cv), solve_method, nb
    )
    # Loud overflow check (engine._check_edge_overflow semantics), with
    # the engine's host-side bound to avoid a device sync when provable.
    E = cfg.capacity.max_edges
    for s in range(S):
        if int(num_nodes[s]) - 1 + lives[s] > E and int(n_edge_cand[s]) > E:
            raise RuntimeError(
                f"lane {s}: reoptimize produced {int(n_edge_cand[s])} factor "
                f"candidates but edge capacity is {E}"
            )
    return states._replace(
        poses=new_poses,
        graph=new_graph,
        pass_number=states.pass_number + 1,
        first_scan_for_pass=jnp.ones((S,), bool),
        odom_initialized=jnp.zeros((S,), bool),
        cumulative_dist=jnp.zeros((S,)),
    )


def process_sessions_multipass(
    cfg: DpgConfig,
    lane_passes: list[list[tuple[np.ndarray, np.ndarray]]],
    solve_bucket: int | None = None,
    solve_method: str | None = None,
    use_kernel: bool | None = None,
    solve_stride: int = 1,
    solve_gn_iterations: int | None = None,
    solve_cg_iterations: int | None = None,
    run_dpg: bool = True,
) -> tuple[SlamState, list[list[int]]]:
    """Multi-pass DPG-SLAM over S batched lanes: the full reference
    execution model (track -> pass handshake: reoptimize -> track with
    executeDPG per keyframe, dpg_data_runner_main.cc:30-52 +
    dpg_slam.cc:122-140) as a sequence of batched compiled programs —
    one tracking program per pass (with the per-keyframe vmapped DPG
    step on pass >= 1 when run_dpg) and one vmapped reoptimize program
    per pass boundary.

    Args:
      lane_passes: per lane, the list of (odometry, scans) streams — one
        per pass. Every lane must have the same pass count.

    Returns (stacked SlamState, per-lane per-pass keyframe counts).
    """
    import dataclasses as dc

    n_passes = {len(p) for p in lane_passes}
    if len(n_passes) != 1:
        raise ValueError(f"all lanes need the same pass count, got {n_passes}")
    P = n_passes.pop()
    S = len(lane_passes)

    states = _stack_states(cfg, S)
    pg = cfg.pose_graph
    kernel_ok = pg.icp_point_to_line and not pg.icp_use_ransac_rejection
    if use_kernel is None:
        use_kernel = jax.default_backend() in ("tpu", "axon") and kernel_ok
    run_cfg = cfg
    if use_kernel and kernel_ok and not pg.use_pallas_icp:
        run_cfg = dc.replace(cfg, pose_graph=dc.replace(pg, use_pallas_icp=True))

    # Engine-equivalent reoptimize solver choice (DpgSlamEngine.solve_method).
    reopt_method = "dense" if cfg.capacity.max_nodes <= 1024 else "cg"

    counts: list[list[int]] = [[] for _ in range(S)]
    for p in range(P):
        sessions = [lane_passes[s][p] for s in range(S)]
        kf_odom, kf_scans, kf_valid, pcounts = pack_sessions(cfg, sessions)
        if solve_stride > 1:
            pad = (-kf_odom.shape[0]) % solve_stride
            if pad:
                kf_odom = np.concatenate(
                    [kf_odom, np.zeros((pad,) + kf_odom.shape[1:], kf_odom.dtype)])
                kf_scans = np.concatenate(
                    [kf_scans, np.zeros((pad,) + kf_scans.shape[1:], kf_scans.dtype)])
                kf_valid = np.concatenate(
                    [kf_valid, np.zeros((pad,) + kf_valid.shape[1:], bool)])
        for s in range(S):
            counts[s].append(pcounts[s])
            total = sum(counts[s])
            if total > cfg.capacity.max_nodes:
                # The batched path has no per-step capacity gate (the
                # offline engine saturates; the online engine raises) —
                # overflowing writes would clamp-corrupt the last node row.
                raise ValueError(
                    f"lane {s}: {total} cumulative keyframes exceed node "
                    f"capacity {cfg.capacity.max_nodes}; raise "
                    "CapacityParams.max_nodes or shorten the passes"
                )
        bucket = solve_bucket
        if bucket is None:
            need = max(
                sum(counts[s][k] for k in range(p + 1)) for s in range(S)
            )
            b = 64
            while b < need + 1:
                b *= 2
            bucket = min(b, cfg.capacity.max_nodes)
        method = solve_method or _solve_choice(cfg, bucket)
        states = _process_sessions_batched(
            run_cfg, states, jnp.asarray(kf_odom), jnp.asarray(kf_scans),
            jnp.asarray(kf_valid), method, bucket, solve_stride,
            solve_gn_iterations, solve_cg_iterations,
            run_dpg and p >= 1,
        )
        if p < P - 1:
            states = batched_increment_pass(
                cfg, states, solve_method=reopt_method, use_kernel=use_kernel
            )
    return states, counts


class BatchedSlamServer:
    """Online multi-stream serving: S concurrent SLAM sessions on one chip.

    The offline batched mode precomputes each stream's keyframe schedule;
    a server cannot (scans arrive live). Here the keyframe gate runs on
    the HOST per lane (the same numpy replica `keyframe_schedule` uses —
    it depends only on odometry), and gated scans are BUFFERED as each
    lane's pending keyframe. The batched device step executes when enough
    lanes are pending (``min_batch_fraction``) or any pending lane has
    waited ``max_wait_calls`` observe() calls — the classic bounded-delay
    serving batcher: latency bounded by max_wait, throughput from running
    the step with as many live lanes as possible.

    Non-pending lanes ride along masked (their state update is dropped),
    so each lane executes exactly its own keyframe schedule regardless of
    the batching policy; only efficiency depends on it. Lane outputs are
    the same per-keyframe frontend/solve as the engine's, in the same
    accuracy class — but not bitwise composition-invariant: the fused ICP
    batch's whole-batch iteration count perturbs non-converged pairs near
    acceptance thresholds (deterministic given a batch composition;
    pinned by tests/test_batch.py's server tests).

    Usage:
      srv = BatchedSlamServer(cfg, n_sessions=16)
      for odom, scans in zip(odom_stream, scan_stream):  # (S,3), (S,B)
          srv.observe(odom, scans)
      srv.flush()
      traj = srv.trajectory(i)
    """

    def __init__(
        self,
        config: DpgConfig,
        n_sessions: int,
        min_batch_fraction: float = 0.5,
        max_wait_calls: int = 8,
        solve_bucket: int | None = None,
        solve_method: str | None = None,
        use_kernel: bool | None = None,
    ):
        import dataclasses as dc

        self.config = config
        self.S = n_sessions
        self.min_batch = max(1, int(np.ceil(min_batch_fraction * n_sessions)))
        self.max_wait = max_wait_calls
        self.states = _stack_states(config, n_sessions)
        self.bucket = solve_bucket or config.capacity.max_nodes
        self.method = solve_method or _solve_choice(config, self.bucket)
        pg = config.pose_graph
        kernel_ok = pg.icp_point_to_line and not pg.icp_use_ransac_rejection
        if use_kernel is None:
            use_kernel = jax.default_backend() in ("tpu", "axon") and kernel_ok
        self._run_cfg = config
        if use_kernel and kernel_ok and not pg.use_pallas_icp:
            self._run_cfg = dc.replace(
                config, pose_graph=dc.replace(pg, use_pallas_icp=True)
            )
        B = config.scan.num_beams
        # Host gate state per lane (keyframe_schedule's recurrence).
        self._initialized = np.zeros(n_sessions, bool)
        self._first = np.ones(n_sessions, bool)
        self._odom_at_last = np.zeros((n_sessions, 3))
        self._prev_odom = np.zeros((n_sessions, 3))
        self._cum = np.zeros(n_sessions)
        # Pending keyframe buffers.
        self._pend_odom = np.zeros((n_sessions, 3), np.float32)
        self._pend_scan = np.zeros((n_sessions, B), np.float32)
        self._pend = np.zeros(n_sessions, bool)
        self._pend_age = np.zeros(n_sessions, np.int64)
        # Gate-distance snapshot at buffering time: distance traveled
        # between a keyframe's buffering tick and its (possibly delayed)
        # execution must count toward the NEXT keyframe's distance gate,
        # exactly as the offline schedule's immediate reset would have it.
        self._pend_cum = np.zeros(n_sessions)
        self.steps_executed = 0
        self.keyframes_executed = 0
        # Per-execution wait ages (ticks each executed keyframe spent
        # buffered) — the serving latency distribution the bench records.
        self.wait_hist: list = []

    def _gate(self, odom: np.ndarray) -> np.ndarray:
        """Vectorized host keyframe gate update for one (S, 3) odom tick."""
        pg = self.config.pose_graph
        init = self._initialized
        moved = np.hypot(
            odom[:, 0] - self._prev_odom[:, 0], odom[:, 1] - self._prev_odom[:, 1]
        )
        self._cum = np.where(init, self._cum + moved, self._cum)
        self._odom_at_last = np.where(init[:, None], self._odom_at_last, odom)
        self._initialized = np.ones_like(init)
        self._prev_odom = odom.copy()
        ang = np.abs(np.angle(np.exp(1j * (odom[:, 2] - self._odom_at_last[:, 2]))))
        gate = self._first | (self._cum > pg.min_dist_between_nodes) | (
            ang > pg.min_angle_between_nodes
        )
        return gate

    def _execute(self) -> None:
        valid = self._pend.copy()
        if not valid.any():
            return
        self.wait_hist.append(self._pend_age[valid].copy())
        # SNAPSHOT the pending buffers (hard-won): jnp.asarray of a numpy
        # array is ZERO-COPY on the CPU backend, and the compiled step is
        # dispatched asynchronously — passing the live self._pend_* buffers
        # let the next observe()'s in-place host mutation race the device
        # read, producing intermittent meters-scale garbage keyframes
        # (~40% of runs, load-dependent). The copies are owned by jax for
        # the call's lifetime and never mutated.
        self.states = _batched_keyframe_step(
            self._run_cfg,
            self.states,
            jnp.asarray(self._pend_odom.copy()),
            jnp.asarray(self._pend_scan.copy()),
            jnp.asarray(valid),
            self.method,
            self.bucket,
        )
        # Keyframe bookkeeping for executed lanes (matches _write_node).
        # _cum rebases to the distance accumulated SINCE the buffered
        # keyframe's tick (snapshot taken at buffering), so a delayed
        # execution does not silently drop travel toward the next gate.
        self._first[valid] = False
        self._cum[valid] = np.maximum(self._cum[valid] - self._pend_cum[valid], 0.0)
        self._pend_cum[valid] = 0.0
        self._odom_at_last[valid] = self._pend_odom[valid]
        self._pend[:] = False
        self._pend_age[:] = 0
        self.steps_executed += 1
        self.keyframes_executed += int(valid.sum())

    def observe(self, odom_batch, scans_batch) -> np.ndarray:
        """One tick of all S streams: (S, 3) absolute odometry + (S, B)
        scans. Returns the (S,) bool mask of lanes whose scan was accepted
        as a keyframe (buffered; executed now or within max_wait calls)."""
        odom = np.asarray(odom_batch, np.float64).reshape(self.S, 3)
        scans = np.asarray(scans_batch, np.float32)
        gate = self._gate(odom)
        newly = gate & ~self._pend
        # A lane gating again before its buffered keyframe executed keeps
        # the NEWEST scan (the buffered one is superseded).
        self._pend_odom[gate] = odom[gate].astype(np.float32)
        self._pend_scan[gate] = scans[gate]
        self._pend_cum[gate] = self._cum[gate]
        self._pend |= gate
        self._pend_age[self._pend] += 1
        if int(self._pend.sum()) >= self.min_batch or (
            self._pend.any() and int(self._pend_age.max()) >= self.max_wait
        ):
            self._execute()
        return newly

    def flush(self) -> None:
        """Execute any buffered keyframes immediately."""
        self._execute()

    def num_nodes(self, i: int) -> int:
        return int(self.states.num_nodes[i])

    def trajectory(self, i: int) -> np.ndarray:
        n = self.num_nodes(i)
        return np.asarray(self.states.poses[i, :n])


def _stack_states(cfg: DpgConfig, n_sessions: int) -> SlamState:
    """S fresh session states stacked along a leading axis."""
    one = eng_mod._init_state(cfg)
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x[None], n_sessions, axis=0), one
    )


def session_state(states: SlamState, i: int) -> SlamState:
    """Extract lane i of a stacked SlamState."""
    return jax.tree_util.tree_map(lambda x: x[i], states)


def _solve_choice(cfg: DpgConfig, bucket: int) -> str:
    """Default batched-solver choice: the lanes-batched fixed-iteration
    LM (fg.solve_batched) — "lanes_chol" at small buckets where the
    batched XLA Cholesky is exact-engine-parity cheap, "lanes_cg" above.
    At very large static capacities fall back to the engine's
    block-sparse CG under vmap (the O(N*E) dense assemble is the
    documented cliff, engine.__init__). The r4-era vmapped-while_loop
    path remains reachable via explicit "dense"/"dense_cg"."""
    if cfg.capacity.max_nodes > 1024:
        return "cg"
    return "lanes_chol" if bucket <= 128 else "lanes_cg"


def process_sessions_batched(
    cfg: DpgConfig,
    sessions: list[tuple[np.ndarray, np.ndarray]],
    solve_bucket: int | None = None,
    solve_method: str | None = None,
    use_kernel: bool | None = None,
    solve_stride: int = 1,
    solve_gn_iterations: int | None = None,
    solve_cg_iterations: int | None = None,
) -> tuple[SlamState, list[int]]:
    """Run S independent sessions through the batched keyframe program.

    Args:
      sessions: list of (odometry (T_s, 3), scans (T_s, B)) streams.
      solve_bucket: static node bucket for the per-keyframe solve
        (defaults to the smallest engine bucket covering the longest
        session's keyframe count).
      solve_method: "lanes_chol"/"lanes_cg" (the lanes-batched LM,
        fg.solve_batched — the default via _solve_choice) or
        "dense"/"dense_cg"/"cg" (the engine solver under jax.vmap — the
        r4-era lock-step path, kept for A/B).
      solve_gn_iterations / solve_cg_iterations: lanes-solver iteration
        caps (default: cfg incremental_gn_iterations / 12). The bench
        pins lane ATE at its chosen values.
      use_kernel: force the Pallas ICP path on/off (default: the engine's
        backend-based choice — kernel on real TPU, XLA elsewhere).
      solve_stride: graph-solve cadence in keyframes (1 = every keyframe,
        the reference's semantics; >1 = periodic optimization with
        odometry-chained tracking between solves — the final solve still
        covers the full graph).

    Returns:
      (stacked SlamState with leading axis S, per-session keyframe counts).
    """
    import dataclasses as dc

    kf_odom, kf_scans, kf_valid, counts = pack_sessions(cfg, sessions)
    if solve_stride > 1:
        pad = (-kf_odom.shape[0]) % solve_stride
        if pad:
            kf_odom = np.concatenate(
                [kf_odom, np.zeros((pad,) + kf_odom.shape[1:], kf_odom.dtype)]
            )
            kf_scans = np.concatenate(
                [kf_scans, np.zeros((pad,) + kf_scans.shape[1:], kf_scans.dtype)]
            )
            kf_valid = np.concatenate(
                [kf_valid, np.zeros((pad,) + kf_valid.shape[1:], bool)]
            )
    bucket = solve_bucket
    if bucket is None:
        b = 64
        while b < max(counts) + 1:
            b *= 2
        bucket = min(b, cfg.capacity.max_nodes)
    method = solve_method or _solve_choice(cfg, bucket)

    run_cfg = cfg
    pg = cfg.pose_graph
    kernel_ok = pg.icp_point_to_line and not pg.icp_use_ransac_rejection
    if use_kernel is None:
        use_kernel = (
            jax.default_backend() in ("tpu", "axon") and kernel_ok
        )
    if use_kernel and kernel_ok and not pg.use_pallas_icp:
        run_cfg = dc.replace(cfg, pose_graph=dc.replace(pg, use_pallas_icp=True))

    states = _stack_states(cfg, len(sessions))
    states = _process_sessions_batched(
        run_cfg, states, jnp.asarray(kf_odom), jnp.asarray(kf_scans),
        jnp.asarray(kf_valid), method, bucket, solve_stride,
        solve_gn_iterations, solve_cg_iterations,
    )
    return states, counts
