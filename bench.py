"""Benchmark: pass-boundary reoptimize throughput on TPU vs native C++ serial.

Prints ONE JSON line:
  {"metric": "pass_reoptimize_pairs_per_s", "value": <live ICP pairs / tpu s>,
   "unit": "icp_pairs/s", "vs_baseline": <serial-C++ seconds / tpu seconds>}

Reoptimize is the reference system's dominant operation (SURVEY.md §3.4:
the serial O(N^2) ICP re-alignment at every pass boundary,
dpg_slam.cc:35-120 — "the most expensive op in the system"; the dataset
runner BLOCKS playback on its completion). The TPU path runs the whole
job as batched fixed-shape programs (_reoptimize: all successive +
loop-closure pairs as chunked ICP batches, one LM solve); the baseline is
the same job re-executed serially in compiled C++
(native/serial_baseline.cc::baseline_reoptimize) on one CPU thread — the
reference's own execution model (BASELINE.md: no published numbers;
baseline must be measured). Both sides run the same session state, the
same candidate rule, and the same ICP/solve tolerances.

The per-keyframe online pipeline (1+K ICPs + incremental solve per scan)
is benchmarked by bench_keyframe() below; being a tiny-matrix
latency race it is reported in the README, not as the headline.
"""

import json
import sys
import time

import numpy as np


def build_session(cfg, n_prime_scans=100):
    """Simulate a sequence and prime an engine with its first scans.

    The scans AFTER the primed prefix are the benchmark workload: real
    never-seen scans with odometry-quality seeds, so both the TPU path
    and the serial baseline do genuine registration work per keyframe
    (a recycled already-aligned cloud lets an early-exiting serial ICP
    converge in 1-2 iterations, which measures nothing).
    """
    from dpg_slam_tpu.engine import DpgSlamEngine
    from dpg_slam_tpu.io import dataset

    world = dataset.make_office_world()
    wps = dataset.office_loop_waypoints()
    seq = dataset.simulate_sequence(
        world, wps, cfg.scan, step=0.25, seed=1,
        odom_noise_transl=0.02, odom_noise_rot=0.008,
    )
    eng = DpgSlamEngine(cfg)
    for t in range(min(n_prime_scans, len(seq.scans))):
        eng.observe_odometry(seq.odometry[t])
        eng.observe_laser(seq.scans[t])
    return eng, seq, n_prime_scans


def bench_tpu(cfg, eng, seq, t_start, n_steps=60):
    """Time n_steps jitted keyframe steps (scan-match + graph solve each)
    on the never-seen continuation scans, with odometry fed between
    keyframes exactly like the online driver."""
    import jax
    import jax.numpy as jnp

    from dpg_slam_tpu import engine as eng_mod

    scans = jnp.asarray(seq.scans[t_start : t_start + n_steps])
    odom = jnp.asarray(seq.odometry[t_start : t_start + n_steps])
    n_steps = int(scans.shape[0])
    state = eng.state
    # Fixed solve bucket covering the whole timed run (engine picks the
    # same bucket per keyframe; hoisted here to avoid per-step host syncs).
    bucket = eng._solve_bucket(eng.num_nodes() + n_steps + 1)
    method = eng._incremental_method(bucket)  # the solver the engine runs
    kcfg = eng._kernel_config()  # Pallas ICP frontend on real TPU

    def step(state, odom_pose, ranges):
        state = eng_mod._observe_odometry(kcfg, state, odom_pose)
        return eng_mod._keyframe_step(
            kcfg, state, ranges, method, solve_bucket=bucket
        )

    # Warmup / compile (on a copy of the state; do not consume a scan).
    warm = step(state, odom[0], scans[0])
    jax.block_until_ready(warm.poses)

    t0 = time.perf_counter()
    s = state
    for i in range(n_steps):
        s = step(s, odom[i], scans[i])
    jax.block_until_ready(s.poses)
    dt = time.perf_counter() - t0
    return n_steps / dt


def bench_tpu_offline(cfg, eng, seq, t_start, n_steps=60):
    """The same continuation keyframes as ONE compiled program (lax.scan
    over the scan stream — engine.process_sequence's execution form, the
    TPU-native analog of the reference's rosbag playback). The per-step
    python loop above measures the shared-chip relay's ~7-25 ms dispatch
    RTT as much as the device; this measures the device."""
    import jax
    import jax.numpy as jnp

    from dpg_slam_tpu import engine as eng_mod

    scans = jnp.asarray(seq.scans[t_start : t_start + n_steps])
    odom = jnp.asarray(seq.odometry[t_start : t_start + n_steps])
    n_steps = int(scans.shape[0])
    bucket = eng._solve_bucket(eng.num_nodes() + n_steps + 1)
    method = eng._incremental_method(bucket)
    kcfg = eng._kernel_config()  # Pallas ICP frontend on real TPU

    @jax.jit
    def run(state, odom, scans):
        def body(s, x):
            o, r = x
            s = eng_mod._observe_odometry(kcfg, s, o)
            s = eng_mod._keyframe_step(kcfg, s, r, method, solve_bucket=bucket)
            return s, 0
        s, _ = jax.lax.scan(body, state, (odom, scans))
        return s

    warm = run(eng.state, odom, scans)
    jax.block_until_ready(warm.poses)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = run(eng.state, odom, scans)
        jax.block_until_ready(s.poses)
        best = min(best, time.perf_counter() - t0)
        time.sleep(0.05)
    return n_steps / best


def _host_cloud(cfg, ranges):
    """The engine's exact scan->downsampled-cloud path, as a host array."""
    import jax.numpy as jnp

    from dpg_slam_tpu import engine as eng_mod

    _, pts, mask, _ = eng_mod._prepare_cloud(cfg, jnp.asarray(ranges, jnp.float32))
    return np.asarray(pts)[np.asarray(mask)].astype(np.float64)


def bench_cpu_baseline(cfg, eng, seq, t_start, n_steps=10):
    """Time the serial reference-equivalent keyframe on one CPU thread,
    on the SAME never-seen continuation scans and odometry seeds the TPU
    path processes (both sides do real registration work per keyframe)."""
    from dpg_slam_tpu.baselines import serial_cpu

    n = eng.num_nodes()
    clouds = []
    state = eng.state
    cm = np.asarray(state.cloud_mask[:n])
    cl = np.asarray(state.cloud[:n])
    for i in range(n):
        clouds.append(cl[i][cm[i]].astype(np.float64))
    poses = np.asarray(state.poses[:n], np.float64)

    priors = [
        (0, np.zeros(3), np.diag([1 / 0.2, 1 / 0.2, 1 / 0.15]))
    ]
    # Odometry + successive edges for the primed graph (cost model: the
    # solve must carry the full graph, like isam re-adding all factors).
    edges = []
    W = np.diag([1 / 0.6, 1 / 0.6, 1 / 0.6])
    for i in range(1, n):
        c, s = np.cos(poses[i - 1, 2]), np.sin(poses[i - 1, 2])
        R = np.array([[c, s], [-s, c]])
        d = R @ (poses[i, :2] - poses[i - 1, :2])
        edges.append((i - 1, i, np.array([d[0], d[1], poses[i, 2] - poses[i - 1, 2]]), W))

    # The continuation workload: real scans, odometry-displacement seeds.
    new_clouds = [
        _host_cloud(cfg, seq.scans[t]) for t in range(t_start, t_start + n_steps)
    ]
    odom = seq.odometry
    deltas = []
    for t in range(t_start, t_start + n_steps):
        a, b = odom[t - 1], odom[t]
        c, s = np.cos(a[2]), np.sin(a[2])
        R = np.array([[c, s], [-s, c]])
        dxy = R @ (b[:2] - a[:2])
        deltas.append([dxy[0], dxy[1], np.angle(np.exp(1j * (b[2] - a[2])))])
    deltas = np.array(deltas)

    K = cfg.pose_graph.max_loop_closures_per_node
    icp_params = dict(
        max_iters=cfg.pose_graph.icp_maximum_iterations,
        gate=cfg.pose_graph.icp_max_correspondence_distance,
        epsilon=cfg.pose_graph.icp_maximum_transformation_epsilon,
    )

    # Prefer the native C++ re-execution (native/serial_baseline.cc):
    # measuring the speedup against compiled single-thread C++ rather
    # than numpy dispatch overhead. Falls back to the numpy loop below.
    native = serial_cpu.native_baseline_bench(
        clouds, poses, list(edges), priors[0][2], new_clouds, deltas, W,
        closures_k=K, icp_params=icp_params,
    )
    if native is not None and native[0]:
        return native[0]

    t0 = time.perf_counter()
    for k in range(n_steps):
        new_cloud = new_clouds[k]
        prev = poses[-1]
        c, s = np.cos(prev[2]), np.sin(prev[2])
        R = np.array([[c, -s], [s, c]])
        seed = np.array(
            [*(prev[:2] + R @ deltas[k][:2]), prev[2] + deltas[k][2]]
        )
        dist = np.linalg.norm(poses[:-1, :2] - seed[:2], axis=1)
        cands = np.argsort(dist)[:K].tolist()
        edges.append((len(poses) - 1, len(poses), deltas[k].copy(), W))
        new_poses, edges = serial_cpu.keyframe_step_serial(
            clouds, poses, new_cloud, seed, priors, edges,
            closure_candidates=cands, icp_params=icp_params,
        )
        clouds.append(new_cloud)
        poses = new_poses
    dt = time.perf_counter() - t0
    return n_steps / dt


def build_two_pass_session(cfg, laps=3):
    """Two full passes of the office loop, LAPS traversals each (pass
    boundary WITHOUT running reoptimize during setup — that is the thing
    being measured). Multiple laps per pass give the reoptimize job the
    reference's real session scale (GDC bags are several-hundred-meter
    drives, dpg_data_runner_main.cc:95-114): ~123 keyframes/pass, every
    node with a full top-K closure candidate set."""
    import jax.numpy as jnp
    import numpy as np_

    from dpg_slam_tpu.engine import DpgSlamEngine
    from dpg_slam_tpu.io import dataset

    world = dataset.make_office_world()
    wps = dataset.office_loop_waypoints()
    wps = np_.vstack([wps] + [wps[1:]] * (laps - 1))  # closed loop, tiled
    eng = DpgSlamEngine(cfg)
    eng._dpg_enabled = False
    for p in range(2):
        seq = dataset.simulate_sequence(
            world, wps, cfg.scan, step=0.5, seed=1 + p,
            odom_noise_transl=0.02, odom_noise_rot=0.008,
        )
        eng.process_sequence(seq.odometry, seq.scans, run_dpg=False)
        if p == 0:
            eng.state = eng.state._replace(
                pass_number=eng.state.pass_number + 1,
                first_scan_for_pass=jnp.ones((), bool),
                odom_initialized=jnp.zeros((), bool),
            )
    return eng


def bench_reoptimize(cfg, eng, repeats=10):
    """Steady-state seconds for the batched reoptimize, through the same
    path the engine runs at a pass boundary (live-node bucket, compacted
    Pallas ICP sweep on TPU, ONE host read + ONE compiled program).
    Best-of-N with small sleeps. The number includes the shared-chip
    relay's dispatch round trips — the honest end-to-end latency on THIS
    deployment. For the relay-independent device time see
    bench_reoptimize_device."""
    import jax

    state = eng.state
    out = eng._reoptimize_now(state)  # compile
    jax.block_until_ready(out.poses)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = eng._reoptimize_now(state)
        jax.block_until_ready(out.poses)
        best = min(best, time.perf_counter() - t0)
        time.sleep(0.05)
    return best


def bench_reoptimize_device(cfg, eng, loop=20, repeats=5):
    """Relay-independent device seconds per reoptimize: chain `loop` full
    reoptimize programs (the exact _reoptimize_sliced computation the
    engine dispatches, same bucket / compaction / solver) inside ONE
    compiled fori_loop dispatch and amortize. The poses input is perturbed
    by i*1e-30 each iteration — bitwise a no-op in f32, but it makes the
    body depend on the loop index so XLA's loop-invariant code motion
    cannot hoist the work out of the loop. The result is forced to host
    with float(): through the relay, block_until_ready on small outputs
    returns before device completion (measured; see bench_schur_kernel).

    This replaces a canary-RTT-subtraction estimate that round 3 briefly
    shipped: modeling the relay round trips and subtracting them went
    NEGATIVE during a contention episode (the dispatch does not serialize
    two full canary RTTs). Amortizing the RTT over an on-device loop
    measures the device instead of modeling the relay."""
    import jax
    import jax.numpy as jnp

    from dpg_slam_tpu import engine as eng_mod

    state = eng.state
    num_nodes, poses_h, pass_ids_h = (
        np.asarray(x)
        for x in jax.device_get((state.num_nodes, state.poses, state.pass_ids))
    )
    n_nodes = int(num_nodes)
    nb = eng._solve_bucket(n_nodes)
    compact_idx, compact_valid, _ = eng._reoptimize_compaction(
        poses_h[:nb], pass_ids_h[:nb], n_nodes, nb
    )
    rcfg = eng._reopt_config()
    method = eng.solve_method

    @jax.jit
    def looped(state, ci, cv):
        def body(i, acc):
            s = state._replace(
                poses=state.poses + jnp.float32(i) * jnp.float32(1e-30)
            )
            poses, _, _ = eng_mod._reoptimize_sliced(rcfg, s, ci, cv, method, nb)
            return acc + jnp.sum(poses) * jnp.float32(1e-6)
        return jax.lax.fori_loop(0, loop, body, jnp.float32(0.0))

    ci = jnp.asarray(compact_idx)
    cv = jnp.asarray(compact_valid)
    float(looped(state, ci, cv))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(looped(state, ci, cv))
        best = min(best, time.perf_counter() - t0)
        time.sleep(0.03)
    return best / loop


def bench_dpg(cfg, eng, loop=20, repeats=5, n_steps=56):
    """DPG change detection on the chip — the reference's defining layer
    (executeDPG, dpg_slam.cc:865-886, runs on every accepted node once
    pass >= 1), previously absent from every throughput number.

    Returns (dpg_step_ms, kf_s_nodpg, kf_s_dpg, kf_count):
      * dpg_step_ms: device-amortized ms per execute_dpg program on the
        two-pass session state (same fori-loop technique as
        bench_reoptimize_device — the poses perturbation defeats LICM,
        the float() forces completion through the relay).
      * kf_s_nodpg / kf_s_dpg: offline (one-program) continuation
        keyframes/s on the SAME pass-1 state and scan stream, without /
        with the per-keyframe DPG step — the honest with-DPG single-
        stream number (the reference always pays executeDPG in pass 1).
    """
    import jax
    import jax.numpy as jnp

    from dpg_slam_tpu import engine as eng_mod
    from dpg_slam_tpu.io import dataset

    state = eng.state

    # --- (a) device-amortized execute_dpg -------------------------------
    dcfg = eng.config

    @jax.jit
    def looped(state):
        def body(i, acc):
            # Perturb poses AND ranges: with poses alone, the ranges-
            # derived half of the program (beam selection, endpoint
            # clouds, polar tables) is loop-invariant and XLA hoists it —
            # a round-5 run under-reported the step 4.5x (5.2 vs 23 ms).
            eps = jnp.float32(i) * jnp.float32(1e-30)
            s = state._replace(
                poses=state.poses + eps, ranges=state.ranges + eps
            )
            from dpg_slam_tpu.dpg import change_detection

            s2, info = change_detection.execute_dpg.__wrapped__(dcfg, s)
            return acc + info.coverage * jnp.float32(1e-3) + jnp.sum(
                s2.poses
            ) * jnp.float32(1e-9) + jnp.sum(s2.sector_active) * jnp.float32(1e-9)
        return jax.lax.fori_loop(0, loop, body, jnp.float32(0.0))

    float(looped(state))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(looped(state))
        best = min(best, time.perf_counter() - t0)
        time.sleep(0.03)
    dpg_step_ms = best / loop * 1e3

    # --- (b) offline continuation with/without DPG ----------------------
    world = dataset.make_office_world()
    wps = dataset.office_loop_waypoints()
    seq = dataset.simulate_sequence(
        world, wps, cfg.scan, step=0.5, seed=9,
        odom_noise_transl=0.02, odom_noise_rot=0.008,
    )
    scans = jnp.asarray(seq.scans[:n_steps])
    odom = jnp.asarray(seq.odometry[:n_steps])
    # Fresh odometry stream: re-anchor the gate reference (sensor
    # reacquire); the pass number stays 1 so DPG runs per keyframe.
    state0 = state._replace(odom_initialized=jnp.zeros((), bool))
    bucket = eng._solve_bucket(eng.num_nodes() + n_steps // 2 + 2)
    method = eng._incremental_method(bucket)
    kcfg = eng._kernel_config()

    results = {}
    for run_dpg in (False, True):
        out = eng_mod._process_sequence(
            kcfg, state0, odom, scans, method,
            run_dpg=run_dpg, solve_bucket=bucket,
        )
        jax.block_until_ready(out[0].poses)  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = eng_mod._process_sequence(
                kcfg, state0, odom, scans, method,
                run_dpg=run_dpg, solve_bucket=bucket,
            )
            jax.block_until_ready(out[0].poses)
            best = min(best, time.perf_counter() - t0)
            time.sleep(0.05)
        kf_count = int(jnp.sum(out[1]))
        results[run_dpg] = kf_count / best
    return dpg_step_ms, results[False], results[True], kf_count


def bench_reoptimize_cpu(cfg, eng):
    """The same reoptimize job, serial native C++. Returns (s, n_pairs)."""
    from dpg_slam_tpu.baselines import serial_cpu

    n = eng.num_nodes()
    state = eng.state
    cm = np.asarray(state.cloud_mask[:n])
    cl = np.asarray(state.cloud[:n])
    clouds = [cl[i][cm[i]].astype(np.float64) for i in range(n)]
    pg = cfg.pose_graph
    res = serial_cpu.native_baseline_reoptimize(
        clouds,
        np.asarray(state.poses[:n], np.float64),
        np.asarray(state.odom_poses[:n], np.float64),
        np.asarray(state.pass_ids[:n], np.int32),
        np.diag([1 / pg.new_pass_x_std_dev, 1 / pg.new_pass_y_std_dev,
                 1 / pg.new_pass_theta_std_dev]),
        np.diag([1 / 0.6, 1 / 0.6, 1 / 0.6]),
        radius_within=pg.maximum_node_dist_within_pass_scan_comparison,
        radius_cross=pg.maximum_node_dist_across_passes_scan_comparison,
        min_gap=pg.min_loop_closure_node_gap,
        closures_k=pg.max_loop_closures_per_node,
        icp_params=dict(
            max_iters=pg.icp_maximum_iterations,
            gate=pg.icp_max_correspondence_distance,
            epsilon=pg.icp_maximum_transformation_epsilon,
        ),
        gn_iters=pg.gn_max_iterations,
    )
    if res is None:
        raise RuntimeError("native baseline library not built (make -C native)")
    seconds, pairs, _ = res
    return seconds, pairs


def bench_pallas_parity(cfg, eng, n_pairs=64):
    """Max XLA-vs-Pallas ICP transform deviation ON THE REAL TPU.

    test_icp_pallas pins parity in interpret mode on CPU; this exercises
    the actual Mosaic compile on successive-node pairs from the bench
    session and records the worst-case transform delta (x, y, theta sup
    norm) so bf16/kernel regressions show up in the bench artifact.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dpg_slam_tpu import geom
    from dpg_slam_tpu.ops import icp as icp_mod

    state = eng.state
    n = min(eng.num_nodes(), n_pairs + 1)
    idx_s = jnp.arange(1, n)
    idx_t = idx_s - 1
    src, sm = state.cloud[idx_s], state.cloud_mask[idx_s]
    tgt, tm = state.cloud[idx_t], state.cloud_mask[idx_t]
    seed = geom.between(state.poses[idx_t], state.poses[idx_s])
    outs = {}
    for use_pallas in (False, True):
        pg = dataclasses.replace(
            cfg.pose_graph, use_pallas_icp=use_pallas, icp_point_to_line=True
        )
        res = icp_mod.icp_align(
            src, sm, tgt, tm, seed, pg,
            gate_multiplier=jnp.ones((int(n - 1),), jnp.float32),
        )
        outs[use_pallas] = np.asarray(jax.block_until_ready(res.transform))
    dev = np.abs(outs[True] - outs[False])
    dev[:, 2] = np.abs(np.angle(np.exp(1j * (outs[True][:, 2] - outs[False][:, 2]))))
    # Max + median: the per-pair deviation is BIMODAL (measured,
    # tools/parity_jump_study.py) — p50 is bitwise-class (~5e-10) while a
    # 1-2 pair tail sits at 1e-5..4e-4 where the two paths' float
    # rounding makes an early-exit rule (step epsilon / error-delta /
    # anneal schedule) fire at different iteration counts, leaving one
    # near-converged GN step of difference. A max-only statistic samples
    # that tail, which is why BENCH_r03->r04 "jumped" 65x (plus the
    # regenerated session fixture, 37c93cf); the median distinguishes a
    # real kernel regression (p50 drifts) from tail sampling.
    pd = dev.max(axis=1)
    return float(pd.max()), float(np.median(pd))


def bench_keyframe(cfg=None):
    """Secondary metric: online per-keyframe latency (keyframes/s), TPU vs
    the serial C++ keyframe loop, on never-seen continuation scans.

    Prefers the committed fixture (bench_assets/keyframe, built by
    tools/build_bench_assets.py) so the TPU process never pays the
    session-priming cost; falls back to building in-process.
    """
    import pathlib

    cfg = cfg or _bench_config()
    fix = pathlib.Path(__file__).resolve().parent / "bench_assets" / "keyframe"
    if (fix / "config.json").exists() and (
        (fix / "config.json").read_text() == cfg.to_json()
    ):
        from dpg_slam_tpu.utils.checkpoint import load_checkpoint

        eng = load_checkpoint(fix)
        cont = np.load(fix / "continuation.npz")

        class _Seq:
            scans = cont["scans"]
            odometry = cont["odometry"]

        seq, t_start = _Seq(), int(cont["t_start"])
        # The continuation arrays are stored from t_start onward.
        seq.scans = np.concatenate(
            [np.zeros((t_start,) + seq.scans.shape[1:], seq.scans.dtype), seq.scans]
        )
        seq.odometry = np.concatenate(
            [np.zeros((t_start, 3), seq.odometry.dtype), seq.odometry]
        )
        # bench_cpu_baseline reads odometry[t_start-1] for the first delta.
        seq.odometry[t_start - 1] = cont["odom_prev"]
    else:
        eng, seq, t_start = build_session(cfg)
    fps_tpu = bench_tpu(cfg, eng, seq, t_start)
    fps_off = bench_tpu_offline(cfg, eng, seq, t_start)
    fps_cpu = bench_cpu_baseline(cfg, eng, seq, t_start)
    return fps_tpu, fps_off, fps_cpu


def bench_kernel_smoke():
    """Driver-runnable Mosaic regression gate (cheap, runs FIRST): compile
    the jt ICP kernel and the blocked SPD kernel at production-shape tiles
    on the real chip and check ~1e-5-scale parity against the XLA paths.
    Returns (ok: bool, icp_dev: float, spd_dev: float). A kernel
    regression (new jax pin, Mosaic layout change) then fails the bench
    loudly at the start instead of surfacing as a bench-day surprise."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dpg_slam_tpu.config import PoseGraphParams
    from dpg_slam_tpu.ops import icp as icp_mod
    from dpg_slam_tpu.ops.schur_pallas import spd_solve_pallas

    rng = np.random.default_rng(42)
    # --- ICP kernel at the production tile (8 pairs x 256 points).
    # Target: an L-shaped corner (both axes constrained).
    B, P = 8, 256
    base = PoseGraphParams(icp_max_points=P, icp_maximum_iterations=20)
    half = P // 2
    wall_x = np.stack([np.linspace(-2, 2, half), np.full(half, 1.5)], axis=1)
    wall_y = np.stack([np.full(P - half, -2.0), np.linspace(-1.5, 1.5, P - half)], axis=1)
    corner = np.concatenate([wall_x, wall_y], axis=0)
    tgt = np.stack([corner + rng.normal(0, 0.01, (P, 2)) for _ in range(B)])
    seeds = rng.uniform(-0.15, 0.15, (B, 3)).astype(np.float32)
    from dpg_slam_tpu import geom
    src = np.asarray(geom.inv_apply(jnp.asarray(seeds)[:, None, :], jnp.asarray(tgt)))
    mask = jnp.ones((B, P), bool)
    outs = {}
    for pallas in (False, True):
        pg = dataclasses.replace(base, use_pallas_icp=pallas)
        res = icp_mod.icp_align(
            jnp.asarray(src, jnp.float32), mask,
            jnp.asarray(tgt, jnp.float32), mask,
            jnp.zeros((B, 3), jnp.float32), pg,
            gate_multiplier=jnp.ones((B,), jnp.float32),
        )
        outs[pallas] = np.asarray(jax.block_until_ready(res.transform))
    icp_dev = float(np.abs(outs[True] - outs[False]).max())

    # --- blocked SPD kernel at a production-shape tile (384 = 128-node
    # bucket x 3 dof; rhs 128-lane padded).
    n = 384
    A = rng.normal(size=(n, n))
    H = jnp.asarray(A @ A.T / n + 3.0 * np.eye(n), jnp.float32)
    Bm = jnp.asarray(rng.normal(size=(n, 128)), jnp.float32)
    Xk = jax.block_until_ready(spd_solve_pallas(H, Bm, blocked=True))
    import jax.scipy.linalg as jsl
    Xx = jax.block_until_ready(
        jax.jit(lambda H, B: jsl.cho_solve(jsl.cho_factor(H, lower=True), B))(H, Bm)
    )
    spd_dev = float(jnp.max(jnp.abs(Xk - Xx)))
    # Tightened round 5 (VERDICT r4 #3): the smoke tile is fixed and
    # well-conditioned — measured devs are 2.6e-06 (icp) / 7.7e-07 (spd),
    # so 10x headroom still catches a real kernel/lowering regression.
    # (The bench-session parity phase keeps the looser tail bound: ITS
    # max statistic includes early-exit iteration divergence, ~5e-4.)
    ok = bool(icp_dev < 3e-5 and spd_dev < 1e-4)
    return ok, icp_dev, spd_dev


def build_batched_sessions(cfg, n_sessions=16, laps=3, step=0.25, seed0=11):
    """S independent simulated sessions (distinct odometry/sensor noise
    seeds) over the office world — the multi-robot / multi-stream
    workload for the session-batched throughput mode."""
    from dpg_slam_tpu.io import dataset

    world = dataset.make_office_world()
    wps = dataset.office_loop_waypoints()
    wps = np.vstack([wps] + [wps[1:]] * (laps - 1))
    sessions, gts = [], []
    for i in range(n_sessions):
        seq = dataset.simulate_sequence(
            world, wps, cfg.scan, step=step, seed=seed0 + i,
            odom_noise_transl=0.02, odom_noise_rot=0.008,
        )
        sessions.append((seq.odometry, seq.scans))
        gts.append(seq.ground_truth)
    return sessions, gts


def bench_tpu_batched(cfg, sessions, gts=None, solve_method=None, repeats=3,
                      solve_stride=1, solve_gn_iterations=None,
                      solve_cg_iterations=None):
    """Aggregate keyframes/s of the session-batched program (batch.py):
    S sessions processed start-to-finish as ONE compiled program on the
    chip. Returns (kf_per_s, total_keyframes, n_sessions, seconds,
    mean_lane_ate) — the mean per-lane ATE (vs ground truth, when given)
    proves the throughput mode does full-quality SLAM, not a degraded
    fast path."""
    import jax
    import jax.numpy as jnp

    from dpg_slam_tpu import batch

    kf_odom, kf_scans, kf_valid, counts = batch.pack_sessions(cfg, sessions)
    if solve_stride > 1:
        pad = (-kf_odom.shape[0]) % solve_stride
        if pad:
            kf_odom = np.concatenate(
                [kf_odom, np.zeros((pad,) + kf_odom.shape[1:], kf_odom.dtype)])
            kf_scans = np.concatenate(
                [kf_scans, np.zeros((pad,) + kf_scans.shape[1:], kf_scans.dtype)])
            kf_valid = np.concatenate(
                [kf_valid, np.zeros((pad,) + kf_valid.shape[1:], bool)])
    bucket = 64
    while bucket < max(counts) + 1:
        bucket *= 2
    bucket = min(bucket, cfg.capacity.max_nodes)
    method = solve_method or batch._solve_choice(cfg, bucket)
    run_cfg = cfg
    import dataclasses as dc
    pg = cfg.pose_graph
    if jax.default_backend() in ("tpu", "axon") and not pg.use_pallas_icp:
        run_cfg = dc.replace(cfg, pose_graph=dc.replace(pg, use_pallas_icp=True))

    states0 = batch._stack_states(cfg, len(sessions))
    ko = jnp.asarray(kf_odom)
    ks = jnp.asarray(kf_scans)
    kv = jnp.asarray(kf_valid)
    st = batch._process_sessions_batched(
        run_cfg, states0, ko, ks, kv, method, bucket, solve_stride,
        solve_gn_iterations, solve_cg_iterations,
    )
    float(jnp.sum(st.poses))  # force through the relay
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        st = batch._process_sessions_batched(
            run_cfg, states0, ko, ks, kv, method, bucket, solve_stride,
            solve_gn_iterations, solve_cg_iterations,
        )
        float(jnp.sum(st.poses))
        best = min(best, time.perf_counter() - t0)
        time.sleep(0.05)
    total = int(sum(counts))
    mean_ate = float("nan")
    if gts is not None:
        from dpg_slam_tpu import batch as batch_mod
        from dpg_slam_tpu.utils.metrics import ate_rmse, to_anchor_frame

        ates = []
        for i, (odom, _scans) in enumerate(sessions):
            lane = batch_mod.session_state(st, i)
            n = int(lane.num_nodes)
            kf_idx = np.nonzero(batch_mod.keyframe_schedule(cfg, odom))[0][:n]
            gt = to_anchor_frame(gts[i][kf_idx])
            ates.append(ate_rmse(np.asarray(lane.poses[:n]), gt))
        mean_ate = float(np.mean(ates))
    return total / best, total, len(sessions), best, mean_ate


def bench_server(cfg, sessions, t_max=300):
    """BatchedSlamServer latency/throughput trade on the chip: stream all
    S sessions tick-by-tick through the online serving layer at several
    (min_batch_fraction, max_wait_calls) policies; record aggregate
    keyframes/s (includes the relay dispatch RTT — the honest serving
    deployment cost) and the p50/p95 keyframe buffering wait in ticks.
    """
    from dpg_slam_tpu.batch import BatchedSlamServer

    S = len(sessions)
    T = min(t_max, min(len(s[0]) for s in sessions))
    odo = np.stack([s[0][:T] for s in sessions], axis=1)   # (T, S, 3)
    scn = np.stack([s[1][:T] for s in sessions], axis=1)   # (T, S, B)

    # Warm/compile once (the AOT step cache is shared across policies).
    warm = BatchedSlamServer(cfg, n_sessions=S)
    for t in range(min(T, 40)):
        warm.observe(odo[t], scn[t])
    warm.flush()

    import jax

    rows = []
    for frac, wait in ((1.0, 8), (0.5, 8), (0.25, 2)):
        srv = BatchedSlamServer(
            cfg, n_sessions=S, min_batch_fraction=frac, max_wait_calls=wait
        )
        t0 = time.perf_counter()
        for t in range(T):
            srv.observe(odo[t], scn[t])
        srv.flush()
        # The server's step dispatches are ASYNC (by design — the host
        # gate runs ahead); block on the final state or dt measures only
        # enqueue (a round-5 run recorded a fantasy 14.8k kf/s this way).
        jax.block_until_ready(srv.states.poses)
        dt = time.perf_counter() - t0
        waits = (
            np.concatenate(srv.wait_hist) if srv.wait_hist else np.zeros(1)
        )
        rows.append({
            "min_batch_fraction": frac,
            "max_wait_calls": wait,
            "kf_per_s": round(srv.keyframes_executed / dt, 1),
            "device_steps": srv.steps_executed,
            "keyframes": srv.keyframes_executed,
            "p50_wait_ticks": float(np.percentile(waits, 50)),
            "p95_wait_ticks": float(np.percentile(waits, 95)),
        })
    return rows


def build_multipass_sessions(cfg, n_sessions=8, laps=2, step=0.25, seed0=31):
    """S two-pass lane workloads over the office world with a box change
    between passes (the change-detection scenario), for the multipass
    batched mode."""
    from dpg_slam_tpu.io import dataset

    base = dataset.make_office_world()
    world1 = base.add_box(2.0, 1.5, 1.0, 1.0)       # vanishes in pass 2
    world2 = base.add_box(-3.0, 1.5, 1.0, 1.0)      # appears in pass 2
    wps = dataset.office_loop_waypoints()
    wps = np.vstack([wps] + [wps[1:]] * (laps - 1))
    lanes, gts = [], []
    for i in range(n_sessions):
        seq1 = dataset.simulate_sequence(
            world1, wps, cfg.scan, step=step, seed=seed0 + 2 * i,
            odom_noise_transl=0.02, odom_noise_rot=0.008,
        )
        seq2 = dataset.simulate_sequence(
            world2, wps, cfg.scan, step=step, seed=seed0 + 2 * i + 1,
            odom_noise_transl=0.02, odom_noise_rot=0.008,
        )
        lanes.append([(seq1.odometry, seq1.scans), (seq2.odometry, seq2.scans)])
        gts.append((seq1.ground_truth, seq2.ground_truth))
    return lanes, gts


def bench_tpu_multipass(cfg, lanes, gts=None, repeats=2, solve_stride=4,
                        solve_gn_iterations=None):
    """Aggregate keyframes/s of the FULL multipass DPG-SLAM batched mode
    (batch.process_sessions_multipass): S lanes x 2 passes including the
    vmapped pass-boundary reoptimize and the per-keyframe vmapped DPG
    step on pass 1 — the reference's complete execution model, nothing
    excluded. Returns (kf_per_s, total_kf, seconds, mean_lane_ate,
    changes_found)."""
    import jax
    import jax.numpy as jnp

    from dpg_slam_tpu import batch, scan as scan_mod

    st, counts = batch.process_sessions_multipass(
        cfg, lanes, solve_stride=solve_stride,
        solve_gn_iterations=solve_gn_iterations,
    )
    float(jnp.sum(st.poses))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        st, counts = batch.process_sessions_multipass(
            cfg, lanes, solve_stride=solve_stride,
            solve_gn_iterations=solve_gn_iterations,
        )
        float(jnp.sum(st.poses))
        best = min(best, time.perf_counter() - t0)
        time.sleep(0.05)
    total = int(sum(sum(c) for c in counts))
    mean_ate = float("nan")
    changes = 0
    labels = np.asarray(st.labels)
    for i in range(len(lanes)):
        lane = batch.session_state(st, i)
        n = int(lane.num_nodes)
        changes += int((labels[i, :n] == scan_mod.ADDED).sum() > 0) + int(
            (labels[i, :n] == scan_mod.REMOVED).sum() > 0
        )
    if gts is not None:
        from dpg_slam_tpu.utils.metrics import ate_rmse, to_anchor_frame

        ates = []
        for i, lane_passes in enumerate(lanes):
            lane = batch.session_state(st, i)
            k0, k1 = counts[i]
            kf0 = np.nonzero(batch.keyframe_schedule(cfg, lane_passes[0][0]))[0][:k0]
            kf1 = np.nonzero(batch.keyframe_schedule(cfg, lane_passes[1][0]))[0][:k1]
            p = np.asarray(lane.poses[: k0 + k1])
            ates.append(ate_rmse(p[:k0], to_anchor_frame(gts[i][0][kf0])))
            ates.append(ate_rmse(p[k0:], to_anchor_frame(gts[i][1][kf1])))
        mean_ate = float(np.mean(ates))
    return total / best, total, best, mean_ate, changes


def bench_cpu_scratch(cfg, session):
    """Serial native C++ baseline on the SAME from-scratch session
    workload a batched lane processes: keyframe stream from scan 0, K
    nearest closure candidates per keyframe, full GN solve per keyframe.
    Returns keyframes/s (single thread)."""
    from dpg_slam_tpu import batch
    from dpg_slam_tpu.baselines import serial_cpu

    odom, scans = session
    m = batch.keyframe_schedule(cfg, odom)
    idx = np.nonzero(m)[0]
    clouds = [_host_cloud(cfg, scans[t]) for t in idx]
    kf_odom = np.asarray(odom, np.float64)[idx]
    deltas = []
    for k in range(1, len(idx)):
        a, b = kf_odom[k - 1], kf_odom[k]
        c, s = np.cos(a[2]), np.sin(a[2])
        R = np.array([[c, s], [-s, c]])
        dxy = R @ (b[:2] - a[:2])
        deltas.append([dxy[0], dxy[1], np.angle(np.exp(1j * (b[2] - a[2])))])
    pg = cfg.pose_graph
    res = serial_cpu.native_baseline_bench(
        clouds[:1],
        np.zeros((1, 3)),
        [],
        np.diag([1 / 0.2, 1 / 0.2, 1 / 0.15]),
        clouds[1:],
        np.asarray(deltas),
        np.diag([1 / 0.6, 1 / 0.6, 1 / 0.6]),
        closures_k=pg.max_loop_closures_per_node,
        icp_params=dict(
            max_iters=pg.icp_maximum_iterations,
            gate=pg.icp_max_correspondence_distance,
            epsilon=pg.icp_maximum_transformation_epsilon,
        ),
    )
    if res is None or not res[0]:
        raise RuntimeError("native baseline library not built (make -C native)")
    return res[0]


def bench_schur_kernel(n=768, m=385, n_live=600, repeats=6, loop=50):
    """Execute the compiled Pallas Schur elimination kernel
    (ops/schur_pallas.spd_solve_pallas, panel-blocked) at production
    sizes on the real chip, check parity against XLA
    cho_factor/cho_solve on-device, and time blocked / unblocked / XLA.
    n = 3*interior-slot cap, m = 3*sep_cap + 1 — the shapes
    distributed_reoptimize feeds it (parallel/schur.py).

    Timing is an on-device fori_loop of `loop` data-dependent solves per
    dispatch, and the result is forced to host with float(): one solve is
    ~1 ms while the shared-chip relay's dispatch RTT is ~10-25 ms, and
    block_until_ready on small outputs does NOT reliably wait for device
    completion through the relay (measured: a 50-solve loop "completed"
    in 0.1 ms until the value was actually fetched).

    Returns (kernel_ms, unblocked_ms, xla_ms, max_dev, max_dev_unblocked)
    — per-solve milliseconds.
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import cho_factor, cho_solve

    from dpg_slam_tpu.ops.schur_pallas import spd_solve_pallas

    rng = np.random.default_rng(0)
    A = rng.normal(0, 1, (n_live, n_live))
    H = np.eye(n, dtype=np.float64)
    H[:n_live, :n_live] = A @ A.T / n_live + 3.0 * np.eye(n_live)
    B = rng.normal(0, 1, (n, m))
    Hj = jnp.asarray(H, jnp.float32)
    Bj = jnp.asarray(B, jnp.float32)

    def xla_solve(H, B):
        return cho_solve(cho_factor(H, lower=True), B)

    blocked = functools.partial(spd_solve_pallas, blocked=True)
    unblocked = functools.partial(spd_solve_pallas, blocked=False)

    Xk = jax.block_until_ready(blocked(Hj, Bj))  # Mosaic compile
    Xu = jax.block_until_ready(unblocked(Hj, Bj))
    Xx = jax.block_until_ready(jax.jit(xla_solve)(Hj, Bj))
    dev = float(jnp.max(jnp.abs(Xk - Xx)))
    dev_u = float(jnp.max(jnp.abs(Xu - Xx)))

    def looped(solver):
        @jax.jit
        def f(H, B, s):
            def body(i, Bc):
                X = solver(H + jnp.float32(1e-6) * i, Bc)
                return B + X * jnp.float32(1e-4)
            return jnp.sum(jax.lax.fori_loop(0, loop, body, B * s))
        return f

    def best_of(solver):
        f = looped(solver)
        float(f(Hj, Bj, jnp.float32(1.0)))  # compile + warm
        best = float("inf")
        for k in range(repeats):
            s = jnp.float32(1.0 + 0.01 * k)
            t0 = time.perf_counter()
            float(f(Hj, Bj, s))
            best = min(best, time.perf_counter() - t0)
            time.sleep(0.03)
        return best / loop

    return (
        best_of(blocked) * 1e3,
        best_of(unblocked) * 1e3,
        best_of(xla_solve) * 1e3,
        dev,
        dev_u,
    )


def _bench_config():
    from dpg_slam_tpu.config import (
        CapacityParams, DpgConfig, PoseGraphParams, ScanParams,
    )

    return DpgConfig(
        scan=ScanParams(num_beams=1024),
        pose_graph=PoseGraphParams(
            icp_max_points=256,
            icp_maximum_iterations=30,
            max_loop_closures_per_node=8,
        ),
        # 2 passes x 3 laps ~ 246 keyframes; reoptimize candidates
        # ~ N*(1+K) + N = 2460 worst case -> 4096 edge capacity.
        capacity=CapacityParams(max_nodes=256, max_edges=4096, max_priors=8),
    )


# Session-batched throughput-mode configuration of record (see main()):
# updated per measured sweep; the CPU quality sweep must clear ~0.03 m
# lane ATE before a config lands here.
BATCHED_SESSIONS = 16
BATCHED_METHOD = "lanes_chol"
BATCHED_STRIDE = 32
BATCHED_GN = 5
BATCHED_CG = 24
BATCHED_MAX_EDGES = 1536
# The multipass (DPG) mode keeps a tighter solve cadence: the vmapped
# change-detection step diffs grids at the CURRENT pose estimates, and
# at stride 16 up to 15 keyframes of odometry-chained drift would feed
# the diff (the engine solves before every DPG step). Stride 4 bounds
# that staleness at ~1 m of travel; lane ATE + change detections are
# recorded in the artifact either way.
MULTIPASS_STRIDE = 4


def _note(msg, t0):
    print(f"[bench +{time.perf_counter() - t0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _build_session_on_cpu(t0):
    """Load the committed two-pass session fixture, or build it in a CPU
    subprocess and hand the state across via checkpoint.

    The setup (2 passes x 3 laps of simulated tracking) is NOT the thing
    being measured; the committed fixture (bench_assets/session, built by
    tools/build_bench_assets.py, config-guarded) makes the bench start at
    the measurement. Fallback path: building over the TPU remote-compile
    relay costs 10+ minutes of compile round-trips (measured 2026-08:
    >590 s vs 35 s on host CPU), so a CPU subprocess is required — the
    platform choice is per-process (the axon sitecustomize force-registers
    the TPU platform); the checkpoint hop also guarantees the TPU process
    compiles its reoptimize program from clean, device-local state.
    """
    import os
    import pathlib
    import subprocess
    import tempfile

    fix = pathlib.Path(__file__).resolve().parent / "bench_assets" / "session"
    if (fix / "config.json").exists() and (
        (fix / "config.json").read_text() == _bench_config().to_json()
    ):
        from dpg_slam_tpu.utils.checkpoint import load_checkpoint

        eng = load_checkpoint(fix)
        eng._dpg_enabled = False
        _note("loaded committed session fixture", t0)
        return eng

    ckpt = tempfile.mkdtemp(prefix="bench_session_")
    repo = str(pathlib.Path(__file__).resolve().parent)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "import bench\n"
        "from dpg_slam_tpu.utils.checkpoint import save_checkpoint\n"
        "eng = bench.build_two_pass_session(bench._bench_config())\n"
        f"save_checkpoint({ckpt!r}, eng)\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run(
        [sys.executable, "-c", code], check=True, env=env, cwd=repo
    )
    from dpg_slam_tpu.utils.checkpoint import load_checkpoint

    eng = load_checkpoint(ckpt)
    eng._dpg_enabled = False
    return eng


def _phase(name, t0, fn, default):
    """Run one bench phase; on failure note it and return `default` so the
    artifact still prints (the shared-chip relay has multi-ten-minute
    wedge episodes — a flaky phase must not cost the whole bench)."""
    try:
        return fn()
    except Exception as e:  # noqa: BLE001 — degrade, don't die
        _note(f"PHASE FAILED {name}: {type(e).__name__}: {str(e)[:160]}", t0)
        return default


def main():
    t0 = time.perf_counter()
    cfg = _bench_config()
    nan = float("nan")
    _note("mosaic kernel smoke test", t0)
    smoke_ok, smoke_icp, smoke_spd = _phase(
        "kernel_smoke", t0, lambda: bench_kernel_smoke(), (False, nan, nan)
    )
    _note(
        f"kernel smoke ok={smoke_ok} (icp dev {smoke_icp:.1e}, "
        f"spd dev {smoke_spd:.1e}); acquiring two-pass session", t0,
    )
    eng = _build_session_on_cpu(t0)
    _note(f"session ready ({eng.num_nodes()} nodes); timing TPU reoptimize", t0)
    tpu_s = _phase("reoptimize", t0, lambda: bench_reoptimize(cfg, eng), nan)
    _note(f"tpu reoptimize best={tpu_s:.4f}s; device-amortized loop", t0)
    tpu_dev_s = _phase(
        "reoptimize_device", t0, lambda: bench_reoptimize_device(cfg, eng), nan
    )
    _note(
        f"device-amortized reoptimize {tpu_dev_s*1e3:.2f} ms/solve; "
        "timing serial C++ baseline",
        t0,
    )
    cpu_s, pairs = _phase(
        "reoptimize_cpu", t0, lambda: bench_reoptimize_cpu(cfg, eng), (nan, 0)
    )
    _note(f"cpu baseline {cpu_s:.2f}s / {pairs} pairs; pallas parity check", t0)
    pallas_dev, pallas_p50 = _phase(
        "pallas_parity", t0, lambda: bench_pallas_parity(cfg, eng), (nan, nan)
    )
    _note(
        f"pallas transform deviation max {pallas_dev:.2e} p50 "
        f"{pallas_p50:.2e}; dpg bench", t0,
    )
    dpg_ms, kf_p1, kf_p1_dpg, dpg_kf = _phase(
        "dpg", t0, lambda: bench_dpg(cfg, eng), (nan, nan, nan, 0)
    )
    _note(
        f"dpg step {dpg_ms:.2f} ms; pass-1 offline kf/s "
        f"{kf_p1:.1f} -> {kf_p1_dpg:.1f} with DPG ({dpg_kf} kf); "
        "keyframe bench", t0,
    )
    kf_tpu, kf_off, kf_cpu = _phase(
        "keyframe", t0, lambda: bench_keyframe(cfg), (nan, nan, nan)
    )
    _note(
        f"keyframes/s tpu={kf_tpu:.1f} offline={kf_off:.1f} "
        f"cpu={kf_cpu:.1f}; batched-session throughput", t0,
    )
    # Session-batched phases run at a RIGHT-SIZED edge capacity: the
    # batched lanes never run the pass-boundary reoptimize (whose ~2460
    # factor candidates size the engine config's 4096), and their live
    # edge count tops out ~720 (measured, tools/tpu_batch_experiments2).
    # Provisioning the fixed-shape program to its workload is the
    # TPU-first design rule; every O(E) operand (factor selects, adopt
    # masks, assemble one-hots) shrinks 2.7x. Overflow raises loudly.
    import dataclasses as _dc

    bcfg = _dc.replace(
        cfg, capacity=_dc.replace(cfg.capacity, max_edges=BATCHED_MAX_EDGES)
    )
    sessions, gts = build_batched_sessions(bcfg, n_sessions=BATCHED_SESSIONS)

    def _batched():
        # Measured configuration (round 5, tools/tpu_batch_experiments2 +
        # tools/lanes_quality_sweep): the lanes-batched LM solver
        # (fg.solve_batched) at the periodic-solve cadence; the final
        # solve covers the full graph, and the CPU quality sweep put this
        # config's lane ATE in the engine's class BEFORE it was timed.
        return bench_tpu_batched(
            bcfg, sessions, gts,
            solve_method=BATCHED_METHOD, solve_stride=BATCHED_STRIDE,
            solve_gn_iterations=BATCHED_GN,
            solve_cg_iterations=BATCHED_CG,
        )

    kf_batched, kfb_total, kfb_sessions, kfb_secs, kfb_ate = _phase(
        "batched", t0, _batched, (nan, 0, len(sessions), nan, nan)
    )
    kf_cpu_scratch = _phase(
        "cpu_scratch", t0, lambda: bench_cpu_scratch(cfg, sessions[0]), nan
    )
    _note(
        f"batched {kfb_sessions} sessions: {kf_batched:.1f} kf/s aggregate "
        f"({kfb_total} kf in {kfb_secs:.2f}s, mean lane ATE {kfb_ate:.3f} m) "
        f"vs cpu-scratch {kf_cpu_scratch:.1f} kf/s; server sweep", t0,
    )
    server_rows = _phase(
        "server", t0, lambda: bench_server(bcfg, sessions[:16]), []
    )
    for r in server_rows:
        _note(
            f"server frac={r['min_batch_fraction']} wait={r['max_wait_calls']}: "
            f"{r['kf_per_s']} kf/s, wait p50/p95 "
            f"{r['p50_wait_ticks']:.0f}/{r['p95_wait_ticks']:.0f} ticks", t0,
        )
    sk_ms, sku_ms, sx_ms, sk_dev, sku_dev = _phase(
        "schur_kernel", t0, lambda: bench_schur_kernel(),
        (nan, nan, nan, nan, nan),
    )
    _note(
        f"schur kernel blocked {sk_ms:.2f} ms / unblocked {sku_ms:.2f} ms "
        f"vs xla {sx_ms:.2f} ms (dev {sk_dev:.1e}/{sku_dev:.1e}); "
        "multipass batched (full DPG-SLAM) LAST", t0,
    )

    def _sane(obj):
        """NaN/inf -> null so the artifact stays strict JSON even when a
        phase failed (json.dumps would emit bare NaN otherwise)."""
        import math

        if isinstance(obj, dict):
            return {k: _sane(v) for k, v in obj.items()}
        if isinstance(obj, float) and not math.isfinite(obj):
            return None
        return obj

    def emit(kf_mp=float("nan"), mp_total=0, mp_ate=float("nan"),
             mp_changes=0):
        """Print the artifact JSON line. Called TWICE: a preliminary line
        before the (long-compiling) multipass phase and the final line
        after it — the driver parses the LAST JSON line on stdout, so a
        bench killed mid-multipass still leaves a complete artifact for
        every earlier phase (a 570 s timeout ate exactly this in a
        round-5 validation run)."""
        print(json.dumps(
            _sane({
                "metric": "pass_reoptimize_pairs_per_s",
                "value": round(pairs / tpu_s, 1),
                "unit": "icp_pairs/s",
                "vs_baseline": round(cpu_s / tpu_s, 2),
                # The raw numbers above include the shared-chip relay's
                # per-dispatch round trips, which have multi-hour ~25 ms
                # contention episodes; the device pair amortizes the RTT
                # over an on-device loop of full reoptimize programs —
                # the relay-independent cost of the work itself
                # (bench_reoptimize_device).
                "pairs_per_s_device": round(pairs / tpu_dev_s, 1),
                "vs_baseline_device": round(cpu_s / tpu_dev_s, 2),
                # Significant digits, not decimal places: 2.7e-07 must
                # not flatten to 0.0 (the artifact is a parity regression
                # gate; magnitude matters).
                "pallas_transform_max_dev": float(f"{pallas_dev:.3e}"),
                # p50 is the regression statistic: the max samples a
                # 1-2-pair early-exit iteration-divergence tail (bounded
                # ~5e-4; see bench_pallas_parity + BASELINE.md), while
                # p50 drifting off ~1e-9 means the kernel itself changed.
                "pallas_transform_p50_dev": float(f"{pallas_p50:.3e}"),
                # DPG change detection on-chip (bench_dpg): amortized ms
                # per execute_dpg program, and the offline pass-1
                # continuation throughput without/with the per-keyframe
                # DPG step (the reference's pass>=1 execution model).
                "dpg_step_ms": round(dpg_ms, 3),
                "keyframes_per_s_offline_p1": round(kf_p1, 1),
                "keyframes_per_s_offline_p1_dpg": round(kf_p1_dpg, 1),
                # Secondary online metric (the per-keyframe pipeline).
                # keyframes_per_s is a python-loop of dispatches: on the
                # shared-chip relay it measures the ~7-25 ms dispatch RTT
                # as much as the device. keyframes_per_s_offline is the
                # same keyframes as ONE lax.scan program (the dataset-
                # runner execution form); keyframe_vs_baseline compares
                # that against the serial C++ per-keyframe loop.
                "keyframes_per_s": round(kf_tpu, 1),
                "keyframes_per_s_offline": round(kf_off, 1),
                "keyframe_vs_baseline": round(kf_off / kf_cpu, 2),
                "keyframe_online_vs_baseline": round(kf_tpu / kf_cpu, 2),
                # Session-batched throughput mode (batch.py): S independent
                # sessions as ONE compiled program; aggregate keyframes/s
                # across the chip vs the serial C++ baseline running the
                # SAME from-scratch session workload on one CPU thread.
                "keyframes_per_s_batched": round(kf_batched, 1),
                "batched_sessions": kfb_sessions,
                "batched_total_keyframes": kfb_total,
                "batched_solve_stride": BATCHED_STRIDE,
                "batched_solve_method": BATCHED_METHOD,
                "batched_solve_gn": BATCHED_GN,
                "batched_max_edges": BATCHED_MAX_EDGES,
                "batched_mean_lane_ate_m": round(kfb_ate, 4),
                # Online serving layer (bench_server): policy sweep rows.
                "server_sweep": server_rows,
                # FULL-model batched throughput (bench_tpu_multipass):
                # S=8 two-pass lanes with the vmapped pass-boundary
                # reoptimize AND the per-keyframe DPG step on pass 1 —
                # nothing the reference's execution model runs is
                # excluded from this number.
                "keyframes_per_s_multipass_dpg": round(kf_mp, 1),
                "multipass_total_keyframes": mp_total,
                "multipass_mean_pass_ate_m": round(mp_ate, 4),
                "multipass_lane_change_detections": mp_changes,
                "multipass_solve_stride": MULTIPASS_STRIDE,
                "cpu_scratch_keyframes_per_s": round(kf_cpu_scratch, 1),
                "keyframe_batched_vs_baseline": round(
                    kf_batched / kf_cpu_scratch, 2
                ),
                # Mosaic kernel regression gate (bench_kernel_smoke).
                "kernel_smoke_ok": smoke_ok,
                "kernel_smoke_icp_dev": float(f"{smoke_icp:.3e}"),
                "kernel_smoke_spd_dev": float(f"{smoke_spd:.3e}"),
                # Compiled (Mosaic) Pallas Schur elimination vs XLA
                # cho_factor/cho_solve at production sizes, on-device.
                "schur_kernel_ms": round(sk_ms, 2),
                "schur_kernel_unblocked_ms": round(sku_ms, 2),
                "schur_xla_ms": round(sx_ms, 2),
                "schur_kernel_dev": float(f"{sk_dev:.3e}"),
            })
        ), flush=True)

    emit()  # preliminary artifact (all phases except multipass)
    _note("multipass batched (full DPG-SLAM)", t0)
    # Full-model batched throughput: tracking + pass-boundary reoptimize +
    # per-keyframe DPG, S=8 two-pass lanes. Right-sized provisioning:
    # edge capacity covers the ~1300 reoptimize candidates of a 2-lap
    # pass pair; the DPG window/submap match the office-world extent.
    mcfg = _dc.replace(
        cfg,
        capacity=_dc.replace(cfg.capacity, max_edges=2048),
        dpg=_dc.replace(
            cfg.dpg, grid_extent_cells=512, max_submap_nodes=16
        ),
    )
    mp_lanes, mp_gts = build_multipass_sessions(mcfg, n_sessions=8, laps=2)
    kf_mp, mp_total, mp_secs, mp_ate, mp_changes = _phase(
        "multipass", t0,
        lambda: bench_tpu_multipass(
            mcfg, mp_lanes, mp_gts, solve_stride=MULTIPASS_STRIDE,
            solve_gn_iterations=BATCHED_GN,
        ),
        (nan, 0, nan, nan, 0),
    )
    _note(
        f"multipass batched 8 lanes x 2 passes: {kf_mp:.1f} kf/s "
        f"({mp_total} kf in {mp_secs:.2f}s, mean pass ATE {mp_ate:.3f} m, "
        f"{mp_changes}/16 lane-change detections)", t0,
    )
    emit(kf_mp, mp_total, mp_ate, mp_changes)


if __name__ == "__main__":
    sys.exit(main())
