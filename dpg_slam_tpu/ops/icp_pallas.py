"""Pallas TPU kernel for batched point-to-line ICP.

The jax-level ICP (ops/icp.py) materializes (B, P, P) distance/match
tensors in HBM between iterations; at reoptimize scale (thousands of
pairs) that traffic dominates. This kernel runs the ENTIRE iteration loop
for a block of pairs per grid program with every intermediate in VMEM:

  * inputs per block: x/y-split point planes (G, P) — the point axis is
    the 128-wide lane dimension, the G=8 pair sub-batch is the sublane
    dimension (matching the f32 (8, 128) tile);
  * only ONE (G, P, P) tensor (the squared-distance matrix) is ever
    materialized per iteration (G=8, P=256: 2 MB); all other P^2-sized
    work is fused into the passes that read it;
  * per-pair scalars are (G, 1) columns; the damped 3x3 Gauss-Newton
    solve is a closed-form cofactor inverse on them;
  * per-pair convergence freezing and coarse-to-fine gate annealing match
    ops/icp.py semantics exactly.

Pass-count discipline (~9 P^2-element sweeps per iteration vs ~20 in the
v1 kernel):

  * validity is folded into the COORDINATES (masked source points sit at
    -1e4, masked targets at +1e4, so every masked distance is >= ~1e7 —
    far beyond any gate) instead of a (G, P, P) `where(invalid)` pass;
  * the match matrix is computed in one fused pass
    ((d2<=rowmin)&(d2<=colmin)&(d2<=gate)) and consumed immediately by
    the correspondence-average reductions;
  * averages divide by the match count at (G, P) size, not (G, P, P)
    (algebraically identical to ops/icp.py's row-normalized form);
  * the nearest-neighbor distance reuses rowmin (no second min sweep).

REDUCTION-AXIS discipline (the dominant term — measured on the 1721-pair
reoptimize sweep, KBENCH_r03.json): the kernel is op-issue bound on its
reductions, not VMEM-bandwidth bound. Six of the seven P^2 reductions
per iteration (row-min, match count, the four correspondence averages)
are per-SOURCE-point; in a source-major (G, Pi, Pj) layout each lowers
to a depth-7 lane fold per vreg, ~4x the cost of an elementwise sweep.
The production layout is therefore target-major (G, Pj, Pi) ("jt"): the
same six reductions become cross-vreg adds plus a depth-3 sublane fold,
and only the reciprocal col-min pays the lane path. Measured: 16.8
us/block-iter source-major -> 2.3 us/block-iter target-major (7.4x,
bit-identical outputs on device). Variants evaluated and rejected on
the same sweep (all within noise or worse): bf16 match-matrix storage
(16.7 — traffic is not the bound), defeating d2 CSE via recompute
(16.9), MXU dot_general for the five reductions (20.4 — f32-precision
matmul passes cost more than the lane folds they replace). The
loop-invariant (G, P) -> (G, P, 1) relayouts of the target planes are
hoisted out of the while body; inside the body they sent the Mosaic
compile pathological (>9 min, never returned).

Per-block (G=8) early exit remains; callers maximize it by sorting
compacted pair lists so fast-converging (well-seeded successive) pairs
share blocks (engine._reoptimize_now).

Semantics parity with ops/icp.py is pinned by tests/test_icp_pallas.py
(interpret mode on CPU); the real Mosaic path is exercised on TPU by
bench.py, which also records the XLA-vs-Pallas transform deviation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpg_slam_tpu.config import PoseGraphParams

__all__ = ["icp_align_pallas"]

_BIG = 1e12
_G = 8  # pairs per grid program (f32 sublane tile)
# Masked points are parked at +/- this coordinate (see module docstring):
# worst-case masked distance (1e4 - trajectory extent)^2 ~ 1e7 is far
# beyond any achievable gate^2 (~ (0.6 * multiplier)^2), so gating alone
# excludes them — no (G, P, P) validity tensor needed.
_MASK_COORD = 1e4


def _finish_iteration(
    it, carry, mx, my, qx, qy, qnx, qny, wf, nn_d2,
    *, sm, gate_mult, anneal_iters, epsilon, damping,
    error_delta_rel_tol=0.0,
):
    """Shared per-iteration tail (all kernel variants): point-to-line
    residuals, (G, 1) normal-equation reductions over the point axis,
    damped cofactor 3x3 solve, step application, convergence freeze."""
    ptx, pty, pth, active = carry[0], carry[1], carry[2], carry[3]

    ex = mx - qx
    ey = my - qy
    r = qnx * ex + qny * ey
    # d(R p)/dθ = (-(Rp)_y, (Rp)_x) with Rp = moved - t.
    drx = -(my - pty)
    dry = mx - ptx
    nd = qnx * drx + qny * dry

    nH00 = jnp.sum(wf * qnx * qnx, axis=1, keepdims=True)  # (G, 1)
    nH01 = jnp.sum(wf * qnx * qny, axis=1, keepdims=True)
    nH02 = jnp.sum(wf * qnx * nd, axis=1, keepdims=True)
    nH11 = jnp.sum(wf * qny * qny, axis=1, keepdims=True)
    nH12 = jnp.sum(wf * qny * nd, axis=1, keepdims=True)
    nH22 = jnp.sum(wf * nd * nd, axis=1, keepdims=True)
    g0 = jnp.sum(wf * qnx * r, axis=1, keepdims=True)
    g1 = jnp.sum(wf * qny * r, axis=1, keepdims=True)
    g2 = jnp.sum(wf * nd * r, axis=1, keepdims=True)

    n_corr_f = jnp.sum(wf, axis=1, keepdims=True)          # (G, 1)
    new_fitness = jnp.sum(wf * nn_d2, axis=1, keepdims=True) / jnp.maximum(
        n_corr_f, 1.0
    )

    # Trace-relative damping (see ops/icp.py rationale).
    tr = (nH00 + nH11 + nH22) / 3.0
    lam = damping * jnp.maximum(tr, 1e-12)
    a00 = nH00 + lam
    a11 = nH11 + lam
    a22 = nH22 + lam
    a01, a02, a12 = nH01, nH02, nH12
    # Cofactor inverse of the symmetric damped 3x3, per pair.
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    solvable = (n_corr_f >= 3.0) & (jnp.abs(det) > 1e-20)
    inv_det = jnp.where(solvable, 1.0 / jnp.where(solvable, det, 1.0), 0.0)
    d0 = (c00 * g0 + c01 * g1 + c02 * g2) * inv_det
    d1 = (c01 * g0 + c11 * g1 + c12 * g2) * inv_det
    d2_ = (c02 * g0 + c12 * g1 + c22 * g2) * inv_det

    # `active` is carried as float 0/1 — an (G, 1) i1 vector in the
    # loop carry fails Mosaic's scf.for legalization.
    stepx = -d0 * active
    stepy = -d1 * active
    stept = -d2_ * active
    new_tx = ptx + stepx
    new_ty = pty + stepy
    new_th = pth + stept
    new_th = new_th - 2.0 * jnp.pi * jnp.round(new_th / (2.0 * jnp.pi))

    step_sq = stepx * stepx + stepy * stepy + stept * stept
    moving = (active > 0.5) & (step_sq > epsilon)
    if error_delta_rel_tol > 0.0:
        # Error-delta exit (config icp_error_delta_rel_tol; matches
        # ops/icp.py): freeze pairs whose fitness stopped improving even
        # while their step norm oscillates above the PCL epsilon. The
        # initial fitness carry is _BIG, so iteration 0 never stalls.
        fitness_prev = carry[11]
        stalled = jnp.abs(fitness_prev - new_fitness) <= (
            error_delta_rel_tol * jnp.maximum(new_fitness, 1e-12)
        )
        moving = moving & ~stalled
    # Held through the last still-coarse iteration so exit stats are
    # always at the fine gate (matches ops/icp.py).
    annealing = (gate_mult > 1.0) & (it < anneal_iters)
    still = (moving | annealing).astype(jnp.float32)

    return (
        new_tx, new_ty, new_th, still,
        a00, a01, a02, a11, a12, a22,
        n_corr_f, new_fitness,
    )


def _kernel(
    src_x_ref,     # (G, P)  masked source points parked at -_MASK_COORD
    src_y_ref,     # (G, P)
    tgt_x_ref,     # (G, P)  masked target points parked at +_MASK_COORD
    tgt_y_ref,     # (G, P)
    nrm_x_ref,     # (G, P)
    nrm_y_ref,     # (G, P)
    smask_ref,     # (G, P) float 0/1
    seed_ref,      # (G, 4)  [tx, ty, th, gate_multiplier]
    out_ref,       # (G, 24) [tx, ty, th, ncorr, fitness, H00,H01,H02,H11,H12,H22,
                   #          iters, c_n, su_x, su_y, htt, q_tt, srv1, srv2, p_tt, 0...]
    *,
    P: int,
    max_iterations: int,
    anneal_iters: int,
    max_corr: float,
    reciprocal: bool,
    epsilon: float,
    damping: float,
    censi: bool,
    error_delta_rel_tol: float = 0.0,
    variant: str = "jt",
):
    G = _G
    sx = src_x_ref[:, :]
    sy = src_y_ref[:, :]
    tx = tgt_x_ref[:, :]
    ty = tgt_y_ref[:, :]
    nx = nrm_x_ref[:, :]
    ny = nrm_y_ref[:, :]
    sm = smask_ref[:, :]
    gate_mult = seed_ref[:, 3:4]                       # (G, 1)

    if variant == "jt":
        # Target-major loop invariants hoisted out of the iteration body:
        # (G, P) -> (G, P, 1) moves the point axis from lanes to sublanes
        # (a relayout); doing it once keeps the while body relayout-free.
        txT = tx[:, :, None]                           # (G, Pj, 1)
        tyT = ty[:, :, None]
        nxT = nx[:, :, None]
        nyT = ny[:, :, None]

    def body(it, carry):
        ptx, pty, pth, active, H00, H01, H02, H11, H12, H22, ncorr, fitness = carry
        c = jnp.cos(pth)                               # (G, 1)
        s = jnp.sin(pth)
        mx = c * sx - s * sy + ptx                     # (G, P)
        my = s * sx + c * sy + pty

        if variant == "jt":
            # Target-major (G, Pj, Pi) layout: every per-source reduction
            # (row-min, count, the four correspondence averages — 6 of the
            # 7 P^2 reductions per iteration) reduces over axis=1, which
            # lowers to cross-vreg adds + a depth-3 sublane fold instead
            # of a depth-7 lane fold per vreg. Only the (reciprocal)
            # per-target col-min pays the lane-reduction path.
            prog = jnp.maximum(0.0, 1.0 - it / anneal_iters)
            mult = 1.0 + (gate_mult - 1.0) * prog      # (G, 1)
            gate_sq = (max_corr * mult) ** 2
            dx = mx[:, None, :] - txT                  # (G, Pj, Pi)
            dy = my[:, None, :] - tyT
            d2 = dx * dx + dy * dy
            rowmin = jnp.min(d2, axis=1, keepdims=True)   # (G, 1, Pi)
            match = (d2 <= rowmin) & (d2 <= gate_sq[:, :, None])
            if reciprocal:
                colmin = jnp.min(d2, axis=2, keepdims=True)  # (G, Pj, 1)
                match = match & (d2 <= colmin)
            mf = match.astype(jnp.float32)
            row_cnt = jnp.sum(mf, axis=1)              # (G, Pi)
            w = (row_cnt > 0.0) & (sm > 0.5)
            wf = w.astype(jnp.float32)
            inv_cnt = 1.0 / jnp.maximum(row_cnt, 1.0)
            qx = jnp.sum(mf * txT, axis=1) * inv_cnt   # (G, Pi)
            qy = jnp.sum(mf * tyT, axis=1) * inv_cnt
            qnx = jnp.sum(mf * nxT, axis=1) * inv_cnt
            qny = jnp.sum(mf * nyT, axis=1) * inv_cnt
            return _finish_iteration(
                it, carry, mx, my, qx, qy, qnx, qny, wf, rowmin[:, 0, :],
                sm=sm, gate_mult=gate_mult,
                anneal_iters=anneal_iters, epsilon=epsilon, damping=damping,
                error_delta_rel_tol=error_delta_rel_tol,
            )

        dx = mx[:, :, None] - tx[:, None, :]           # (G, P, P)
        dy = my[:, :, None] - ty[:, None, :]
        d2 = dx * dx + dy * dy

        rowmin = jnp.min(d2, axis=2, keepdims=True)    # (G, P, 1)

        prog = jnp.maximum(0.0, 1.0 - it / anneal_iters)
        mult = 1.0 + (gate_mult - 1.0) * prog          # (G, 1)
        gate_sq = (max_corr * mult) ** 2

        # One fused P^2 pass: row-min AND (reciprocal) col-min AND gate.
        match = (d2 <= rowmin) & (d2 <= gate_sq[:, :, None])
        if reciprocal:
            colmin = jnp.min(d2, axis=1, keepdims=True)
            match = match & (d2 <= colmin)
        mf = match.astype(jnp.float32)

        row_cnt = jnp.sum(mf, axis=2, dtype=jnp.float32)   # (G, P)
        w = (row_cnt > 0.0) & (sm > 0.5)
        wf = w.astype(jnp.float32)
        # Correspondence averages: reduce with mf, normalize at (G, P)
        # (identical to the row-normalized matmul in ops/icp.py).
        inv_cnt = 1.0 / jnp.maximum(row_cnt, 1.0)
        qx = jnp.sum(mf * tx[:, None, :], axis=2) * inv_cnt   # (G, P)
        qy = jnp.sum(mf * ty[:, None, :], axis=2) * inv_cnt
        qnx = jnp.sum(mf * nx[:, None, :], axis=2) * inv_cnt
        qny = jnp.sum(mf * ny[:, None, :], axis=2) * inv_cnt

        return _finish_iteration(
            it, carry, mx, my, qx, qy, qnx, qny, wf, rowmin[:, :, 0],
            sm=sm, gate_mult=gate_mult,
            anneal_iters=anneal_iters, epsilon=epsilon, damping=damping,
            error_delta_rel_tol=error_delta_rel_tol,
        )

    ones = jnp.ones((G, 1), jnp.float32)
    zeros = jnp.zeros((G, 1), jnp.float32)
    init = (
        seed_ref[:, 0:1],
        seed_ref[:, 1:2],
        seed_ref[:, 2:3],
        ones,  # active flag as float 0/1 (see loop body note)
        ones, zeros, zeros, ones, zeros, ones,
        zeros, ones * _BIG,
    )

    # Early exit once every pair in the block has frozen (annealing pairs
    # are held active through their schedule, matching ops/icp.py).
    def cond(carry):
        it, state = carry
        return (it < max_iterations) & (jnp.max(state[3]) > 0.5)

    def wbody(carry):
        it, state = carry
        return it + 1.0, body(it, state)

    fin_it, (ftx, fty, fth, _, H00, H01, H02, H11, H12, H22, ncorr, fitness) = (
        jax.lax.while_loop(cond, wbody, (jnp.zeros((), jnp.float32), init))
    )

    if censi:
        # Censi sandwich accumulators at the FINAL transform, fine gate —
        # one extra P^2 pass total (not per iteration), keeping the
        # (G, P, P) work VMEM-resident instead of re-materializing it as
        # an XLA post-pass (the traffic this kernel exists to avoid).
        # Matches ops.icp.censi_covariance's reductions exactly; the 3x3
        # sandwich assembly happens outside the kernel (O(B) scalar work).
        c = jnp.cos(fth)
        s = jnp.sin(fth)
        mx = c * sx - s * sy + ftx
        my = s * sx + c * sy + fty
        if variant == "jt":
            # Same target-major layout as the iteration loop (see body).
            dx = mx[:, None, :] - tx[:, :, None]       # (G, Pj, Pi)
            dy = my[:, None, :] - ty[:, :, None]
            d2 = dx * dx + dy * dy
            rowmin = jnp.min(d2, axis=1, keepdims=True)
            match = (d2 <= rowmin) & (d2 <= max_corr * max_corr)
            if reciprocal:
                colmin = jnp.min(d2, axis=2, keepdims=True)
                match = match & (d2 <= colmin)
            mf = match.astype(jnp.float32)
            row_cnt = jnp.sum(mf, axis=1)              # (G, Pi)
            wf = ((row_cnt > 0.0) & (sm > 0.5)).astype(jnp.float32)
            inv_cnt = 1.0 / jnp.maximum(row_cnt, 1.0)
            qx = jnp.sum(mf * tx[:, :, None], axis=1) * inv_cnt
            qy = jnp.sum(mf * ty[:, :, None], axis=1) * inv_cnt
        else:
            dx = mx[:, :, None] - tx[:, None, :]
            dy = my[:, :, None] - ty[:, None, :]
            d2 = dx * dx + dy * dy
            rowmin = jnp.min(d2, axis=2, keepdims=True)
            match = (d2 <= rowmin) & (d2 <= max_corr * max_corr)
            if reciprocal:
                colmin = jnp.min(d2, axis=1, keepdims=True)
                match = match & (d2 <= colmin)
            mf = match.astype(jnp.float32)
            row_cnt = jnp.sum(mf, axis=2)
            wf = ((row_cnt > 0.0) & (sm > 0.5)).astype(jnp.float32)
            inv_cnt = 1.0 / jnp.maximum(row_cnt, 1.0)
            qx = jnp.sum(mf * tx[:, None, :], axis=2) * inv_cnt
            qy = jnp.sum(mf * ty[:, None, :], axis=2) * inv_cnt
        rx = (mx - qx) * wf                       # residual r (weighted)
        ry = (my - qy) * wf
        rpx = mx - ftx                            # R p
        rpy = my - fty
        ux = -rpy * wf                            # u = R' p (weighted)
        uy = rpx * wf
        c_n = jnp.sum(wf, axis=1, keepdims=True)
        su_x = jnp.sum(ux, axis=1, keepdims=True)
        su_y = jnp.sum(uy, axis=1, keepdims=True)
        uu = ux * ux + uy * uy
        htt = jnp.sum(uu - rx * rpx - ry * rpy, axis=1, keepdims=True)
        q_tt = jnp.sum(uu, axis=1, keepdims=True)
        v1 = c * ux + s * uy - s * rx + c * ry    # R^T u + R'^T r
        v2 = -s * ux + c * uy - c * rx - s * ry
        rv1 = c * v1 - s * v2
        rv2 = s * v1 + c * v2
        srv1 = jnp.sum(rv1, axis=1, keepdims=True)
        srv2 = jnp.sum(rv2, axis=1, keepdims=True)
        p_tt = jnp.sum(v1 * v1 + v2 * v2, axis=1, keepdims=True)
    else:
        c_n = su_x = su_y = htt = q_tt = srv1 = srv2 = p_tt = zeros

    out_ref[:, :] = jnp.concatenate(
        [ftx, fty, fth, ncorr, fitness, H00, H01, H02, H11, H12, H22,
         jnp.full((G, 1), fin_it, jnp.float32),
         c_n, su_x, su_y, htt, q_tt, srv1, srv2, p_tt,
         zeros, zeros, zeros, zeros],
        axis=1,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iterations", "max_corr", "reciprocal", "epsilon", "censi",
        "error_delta_rel_tol", "anneal_iters_cfg", "interpret", "variant",
    ),
)
def _run_kernel(
    planes, seeds,
    *, max_iterations, max_corr, reciprocal, epsilon, censi, interpret,
    error_delta_rel_tol=0.0, anneal_iters_cfg=None, variant="jt",
):
    B, P = planes[0].shape
    assert B % _G == 0
    anneal_iters = (
        max(1, min(anneal_iters_cfg, max_iterations))
        if anneal_iters_cfg is not None
        else max(1, (2 * max_iterations) // 3)
    )
    kernel = functools.partial(
        _kernel,
        P=P,
        max_iterations=max_iterations,
        anneal_iters=anneal_iters,
        max_corr=max_corr,
        reciprocal=reciprocal,
        epsilon=epsilon,
        damping=1e-3,
        censi=censi,
        error_delta_rel_tol=error_delta_rel_tol,
        variant=variant,
    )
    plane_spec = pl.BlockSpec((_G, P), lambda b: (b, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // _G,),
        in_specs=[plane_spec] * 7
        + [pl.BlockSpec((_G, 4), lambda b: (b, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_G, 24), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 24), jnp.float32),
        interpret=interpret,
    )(*planes, seeds)


def icp_align_pallas(
    src: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    init_guess: jnp.ndarray,
    params: PoseGraphParams,
    tgt_normals: jnp.ndarray | None = None,
    gate_multiplier: jnp.ndarray | None = None,
    min_correspondences: int = 10,
    fitness_threshold: float = 0.25,
    min_overlap: float | None = None,
    sensor_noise_std: float | None = None,
    interpret: bool = False,
):
    """Pallas-kernel ICP with the icp.icp_align interface (point-to-line,
    the production mode). Returns an ops.icp.ICPResult.

    The pair count is padded up to a multiple of 8 internally.
    """
    from dpg_slam_tpu.ops import icp as icp_mod

    if not params.icp_point_to_line:
        raise ValueError("the Pallas kernel implements point-to-line ICP only")
    if tgt_normals is None:
        tgt_normals = icp_mod.estimate_normals(tgt, tgt_mask)
    if min_overlap is None:
        min_overlap = params.icp_min_overlap
    if sensor_noise_std is None:
        sensor_noise_std = params.icp_sensor_noise_std
    if gate_multiplier is None:
        gate_multiplier = jnp.full(
            (src.shape[0],), params.icp_coarse_gate_multiplier, jnp.float32
        )

    B0 = src.shape[0]
    pad = (-B0) % _G
    if pad:
        def padb(x):
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
            )
        src, tgt, tgt_normals = padb(src), padb(tgt), padb(tgt_normals)
        src_mask, tgt_mask = padb(src_mask), padb(tgt_mask)
        init_guess, gate_multiplier = padb(init_guess), padb(gate_multiplier)

    # Validity folded into coordinates (see module docstring): masked
    # source points park at -_MASK_COORD, masked targets at +_MASK_COORD,
    # so every masked pairing is gated out by distance alone.
    planes = (
        jnp.where(src_mask, src[..., 0], -_MASK_COORD).astype(jnp.float32),
        jnp.where(src_mask, src[..., 1], -_MASK_COORD).astype(jnp.float32),
        jnp.where(tgt_mask, tgt[..., 0], _MASK_COORD).astype(jnp.float32),
        jnp.where(tgt_mask, tgt[..., 1], _MASK_COORD).astype(jnp.float32),
        tgt_normals[..., 0].astype(jnp.float32),
        tgt_normals[..., 1].astype(jnp.float32),
        src_mask.astype(jnp.float32),
    )
    seeds = jnp.concatenate(
        [init_guess.astype(jnp.float32), gate_multiplier[:, None]], axis=-1
    )

    censi_mode = (
        not params.use_fixed_icp_covariance
        and getattr(params, "icp_covariance_mode", "gn") == "censi"
    )
    out = _run_kernel(
        planes, seeds,
        max_iterations=params.icp_maximum_iterations,
        max_corr=params.icp_max_correspondence_distance,
        reciprocal=params.icp_use_reciprocal_correspondences,
        epsilon=params.icp_maximum_transformation_epsilon,
        censi=censi_mode,
        error_delta_rel_tol=getattr(params, "icp_error_delta_rel_tol", 0.0),
        anneal_iters_cfg=getattr(params, "icp_anneal_iters", None),
        interpret=interpret,
    )[:B0]
    init_guess = init_guess[:B0]
    gate_multiplier = gate_multiplier[:B0]
    src_mask = src_mask[:B0]

    transform = out[:, 0:3]
    ncorr = out[:, 3].astype(jnp.int32)
    fitness = out[:, 4]
    H = jnp.stack(
        [
            jnp.stack([out[:, 5], out[:, 6], out[:, 7]], axis=-1),
            jnp.stack([out[:, 6], out[:, 8], out[:, 9]], axis=-1),
            jnp.stack([out[:, 7], out[:, 9], out[:, 10]], axis=-1),
        ],
        axis=-2,
    )

    n_src_valid = jnp.sum(src_mask, axis=-1).astype(jnp.float32)
    overlap = ncorr.astype(jnp.float32) / jnp.maximum(n_src_valid, 1.0)
    deviation = jnp.linalg.norm(transform[:, 0:2] - init_guess[:, 0:2], axis=-1)
    deviation_budget = gate_multiplier * params.icp_max_correspondence_distance
    converged = (
        (ncorr >= min_correspondences)
        & (fitness <= fitness_threshold)
        & (overlap >= min_overlap)
        & (deviation <= deviation_budget)
    )

    fallback = jnp.diag(
        jnp.array(
            [params.laser_x_variance, params.laser_y_variance, params.laser_theta_variance],
            jnp.float32,
        )
    )
    if params.use_fixed_icp_covariance:
        cov = jnp.broadcast_to(fallback, H.shape)
    elif censi_mode:
        # Full closed-form sandwich from KERNEL-RESIDENT accumulators
        # (one extra in-VMEM P^2 pass at the final transform; see
        # _kernel) — no (B, P, P) XLA re-materialization. The 3x3
        # assembly below mirrors ops.icp.censi_covariance exactly
        # (cov_func_point_to_point.h:530-556 analog).
        from dpg_slam_tpu import geom as geom_mod

        c_n = out[:, 12]
        su_x, su_y = out[:, 13], out[:, 14]
        htt, q_tt = out[:, 15], out[:, 16]
        srv1, srv2, p_tt = out[:, 17], out[:, 18], out[:, 19]
        zero = jnp.zeros_like(c_n)

        def sym3(d0, d1, a, b, tt):
            return jnp.stack(
                [
                    jnp.stack([d0, zero, a], axis=-1),
                    jnp.stack([zero, d1, b], axis=-1),
                    jnp.stack([a, b, tt], axis=-1),
                ],
                axis=-2,
            )

        Hc = 2.0 * sym3(c_n, c_n, su_x, su_y, htt)
        Sq = 4.0 * sym3(c_n, c_n, su_x, su_y, q_tt)
        Sp = 4.0 * sym3(c_n, c_n, srv1, srv2, p_tt)
        S = (sensor_noise_std**2) * (Sp + Sq)
        ok = c_n >= 3.0
        eye = jnp.eye(3, dtype=Hc.dtype)
        Hinv = geom_mod.inv_sym3(jnp.where(ok[:, None, None], Hc, eye[None]))
        cov = jnp.einsum("bij,bjk,bkl->bil", Hinv, S, Hinv)
        cov = jnp.where(ok[:, None, None], cov, (1e6 * eye)[None])
        floor = jnp.diag(
            jnp.array(
                [
                    params.icp_cov_floor_transl**2,
                    params.icp_cov_floor_transl**2,
                    params.icp_cov_floor_rot**2,
                ],
                jnp.float32,
            )
        )
        cov = cov + floor[None]
        cov = jnp.where(converged[:, None, None], cov, fallback[None])
    else:
        from dpg_slam_tpu import geom as geom_mod

        eye = jnp.eye(3, dtype=H.dtype)
        safe_H = jnp.where(converged[:, None, None], H, eye[None])
        cov = 2.0 * (sensor_noise_std**2) * geom_mod.inv_sym3(safe_H)
        floor = jnp.diag(
            jnp.array(
                [
                    params.icp_cov_floor_transl**2,
                    params.icp_cov_floor_transl**2,
                    params.icp_cov_floor_rot**2,
                ],
                jnp.float32,
            )
        )
        cov = cov + floor[None]
        cov = jnp.where(converged[:, None, None], cov, fallback[None])

    return icp_mod.ICPResult(
        transform=transform,
        converged=converged,
        num_correspondences=ncorr,
        fitness=fitness,
        overlap=overlap,
        covariance=cov,
    )
