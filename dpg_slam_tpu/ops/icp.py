"""Batched 2D ICP with closed-form covariance — the TPU replacement for
PCL IterativeClosestPoint + the vendored icp_cov covariance.

Reference behavior being replaced (cited for parity checks):
  - pcl::IterativeClosestPoint::align with odometry seed, max-correspondence
    gating, reciprocal correspondences      (dpg_slam.cc:387-416)
  - per-pair serial execution of every successive-scan and loop-closure
    alignment                               (dpg_slam.cc:262-304, :41-108)
  - calculate_ICP_COV, whose 540-line Hessian is dead code and which
    actually returns diag(laser_x_var, laser_y_var, laser_theta_var)
    (src/icp_cov/cov_func_point_to_point.h:560-575)

TPU-first design
----------------
Everything is batched over a leading pair axis B and fixed-shape:

  * Correspondence search is a (B, P, P) squared-distance matrix computed
    as ``|s|^2 + |t|^2 - 2 s·t^T`` — the cross term is a batched matmul
    that tiles onto the MXU. P = config icp_max_points (default 256, a
    multiple of the 128 lane width).
  * Each iteration fixes correspondences and takes one damped Gauss-Newton
    step on the 3-dof pose, accumulating a 3x3 normal system per pair on
    the VPU. Point-to-line (scan normals) or point-to-point residuals.
  * The iteration loop is a ``lax.scan`` with per-pair convergence masks:
    converged pairs stop moving but stay in the batch (no dynamic shapes).
  * Invalid/padded points, out-of-gate pairs, and non-reciprocal matches
    are handled with weights, never with compaction.

Covariance: either the reference's fixed diagonal (parity mode, default),
or the Gauss-Newton estimate ``2 sigma_z^2 H^-1`` from the final normal
system — the usable core of the Censi closed form the reference left dead.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dpg_slam_tpu import geom
from dpg_slam_tpu.config import PoseGraphParams

__all__ = [
    "ICPResult",
    "censi_covariance",
    "estimate_normals",
    "icp_align",
    "icp_align_single",
]

_BIG = 1e12


class ICPResult(NamedTuple):
    """Batched ICP outputs.

    transform: (B, 3) pose of the source frame in the target frame (the
      BetweenFactor measurement, matching runIcp's output convention at
      dpg_slam.cc:433-439).
    converged: (B,) bool — alignment accepted (matches + fitness + overlap).
    num_correspondences: (B,) int32 matched pairs in the final iteration.
    fitness: (B,) float32 mean squared correspondence distance (PCL
      getFitnessScore analog, dpg_slam.cc:443).
    overlap: (B,) float32 matched fraction of valid source points — the
      gate that rejects low-overlap pairs whose ICP optimum is biased.
    covariance: (B, 3, 3) observation covariance for the factor.
    """

    transform: jnp.ndarray
    converged: jnp.ndarray
    num_correspondences: jnp.ndarray
    fitness: jnp.ndarray
    overlap: jnp.ndarray
    covariance: jnp.ndarray


def estimate_normals(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-point 2D normals from scan neighbor structure.

    For an ordered lidar scan, the local surface tangent at point i is
    approximated by p[i+1] - p[i-1]; the normal is its perpendicular.
    Points whose neighbors are invalid fall back to the radial direction
    (still a usable projection direction for point-to-line residuals).

    Args:
      points: (..., P, 2) ordered scan points.
      mask: (..., P) validity.

    Returns:
      (..., P, 2) unit normals (zeros where the point itself is invalid).
    """
    nxt = jnp.roll(points, -1, axis=-2)
    prv = jnp.roll(points, 1, axis=-2)
    nxt_ok = jnp.roll(mask, -1, axis=-1)
    prv_ok = jnp.roll(mask, 1, axis=-1)

    # Tangent: two-sided where both neighbors valid, one-sided otherwise.
    both = nxt_ok & prv_ok
    tangent = jnp.where(
        both[..., None],
        nxt - prv,
        jnp.where(
            nxt_ok[..., None],
            nxt - points,
            jnp.where(prv_ok[..., None], points - prv, points),
        ),
    )
    normal = jnp.stack([-tangent[..., 1], tangent[..., 0]], axis=-1)
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    # Degenerate (no valid neighbors): radial fallback = normalized point.
    radial = points / jnp.maximum(jnp.linalg.norm(points, axis=-1, keepdims=True), 1e-6)
    unit = jnp.where(norm > 1e-6, normal / jnp.maximum(norm, 1e-6), radial)
    return jnp.where(mask[..., None], unit, 0.0)


def censi_covariance(
    src: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    transform: jnp.ndarray,
    *,
    max_correspondence_distance: float,
    reciprocal: bool,
    src_noise_std: float,
    tgt_noise_std: float,
) -> jnp.ndarray:
    """Full Censi closed-form ICP covariance (batched, point-to-point).

    The sandwich the reference's icp_cov computes and then discards
    (cov_func_point_to_point.h:45-283 builds d2J/dx2, :307-530 builds the
    6x6n d2J/dZdX block per correspondence, :530-556 assembles
    ``H^-1 (d2J/dZdX) Sigma_z (d2J/dZdX)^T H^-1``, and :560-575 throws it
    away for a constant diagonal). Here it is the 2D/SE(2) analog,
    evaluated at the final ICP transform on point-to-point
    correspondences (the reference's residual form), vectorized over all
    correspondences of all B pairs at once instead of the reference's
    200-correspondence serial cap (:307).

    For J(x, z) = sum_i ||R(theta) p_i + t - q_i||^2 with measurement
    vector z = (p_1..p_n, q_1..q_n):

      H        = d2J/dx2   (3x3, including the second-order residual
                 terms the reference keeps: d2J/dtheta2 picks up
                 r_i . R'' p_i)
      B_p,i    = d2J/(dx dp_i) = 2 [R ; u_i^T R + r_i^T R']   (3x2)
      B_q,i    = d2J/(dx dq_i) = -2 [I ; u_i^T]               (3x2)
      cov      = H^-1 (sum_i sp^2 B_p,i B_p,i^T + sq^2 B_q,i B_q,i^T) H^-1

    with u_i = R' p_i, r_i = R p_i + t - q_i. For iid noise on the
    TARGET cloud only and zero residuals this reduces exactly to
    ``2 sigma^2 H_gn^-1`` (the GN mode); noise on both clouds doubles it;
    anisotropic correspondence geometry (nonzero residuals, uneven
    point leverage) is where the extra d2J/dZdX structure differs from
    plain GN — tested in test_icp.py.

    Args:
      src/src_mask/tgt/tgt_mask: as icp_align.
      transform: (B, 3) final ICP pose of src in tgt frame.
      max_correspondence_distance: fine gate (multiplier 1).
      reciprocal: mutual-NN correspondences, matching the ICP run.
      src_noise_std / tgt_noise_std: per-point iid noise sigmas for the
        two clouds (Sigma_z = diag(sp^2 I_2n, sq^2 I_2n)).

    Returns:
      (B, 3, 3) covariance (zeros-safe: pairs with < 3 matches return a
      large isotropic covariance rather than NaN).
    """
    moved = geom.apply(transform[:, None, :], src)  # (B, P, 2)
    d2 = _pairwise_sqdist(moved, tgt)
    d2 = jnp.where(src_mask[:, :, None], d2, _BIG)
    d2 = jnp.where(tgt_mask[:, None, :], d2, _BIG)
    rowmin = jnp.min(d2, axis=-1, keepdims=True)
    M = d2 <= rowmin
    if reciprocal:
        colmin = jnp.min(d2, axis=-2, keepdims=True)
        M = M & (d2 <= colmin)
    M = M & (d2 <= max_correspondence_distance**2)
    Mf = M.astype(jnp.float32)
    row_cnt = jnp.sum(Mf, axis=-1)
    w = src_mask & (row_cnt > 0)
    wf = w.astype(jnp.float32)
    Mn = Mf / jnp.maximum(row_cnt, 1.0)[..., None]
    q = jnp.einsum("bpq,bqc->bpc", Mn, tgt, preferred_element_type=jnp.float32)

    r = (moved - q) * wf[..., None]                      # residuals (B, P, 2)
    rp = moved - transform[:, None, 0:2]                 # R p_i       (B, P, 2)
    u = jnp.stack([-rp[..., 1], rp[..., 0]], axis=-1)    # R' p_i      (B, P, 2)
    u = u * wf[..., None]

    n_corr = jnp.sum(wf, axis=-1)                        # (B,)
    c = jnp.cos(transform[:, 2])
    s = jnp.sin(transform[:, 2])

    # H = d2J/dx2, with the reference's second-order residual term:
    # d2J/dtheta2 = 2 sum (u.u + r . R'' p), R'' = -R so r . R''p = -r.rp.
    su = jnp.sum(u, axis=-2)                             # (B, 2)
    htt = jnp.sum(jnp.sum(u * u, axis=-1) - jnp.sum(r * rp, axis=-1), axis=-1)
    zero = jnp.zeros_like(n_corr)
    H = 2.0 * jnp.stack(
        [
            jnp.stack([n_corr, zero, su[:, 0]], axis=-1),
            jnp.stack([zero, n_corr, su[:, 1]], axis=-1),
            jnp.stack([su[:, 0], su[:, 1], htt], axis=-1),
        ],
        axis=-2,
    )

    # Sandwich middle S = sum_i sp^2 Bp Bp^T + sq^2 Bq Bq^T, accumulated
    # as weighted sums over P (every term is a (B,P) elementwise product).
    sp2 = src_noise_std**2
    sq2 = tgt_noise_std**2
    # Bq,i = -2 [I; u^T]:  Bq Bq^T = 4 [[1,0,ux],[0,1,uy],[ux,uy,u.u]]
    q_tt = jnp.sum(jnp.sum(u * u, axis=-1), axis=-1)
    Sq = 4.0 * jnp.stack(
        [
            jnp.stack([n_corr, zero, su[:, 0]], axis=-1),
            jnp.stack([zero, n_corr, su[:, 1]], axis=-1),
            jnp.stack([su[:, 0], su[:, 1], q_tt], axis=-1),
        ],
        axis=-2,
    )
    # Bp,i = 2 [R; v^T] with v = R^T u + R'^T r (2-vector per point):
    # Bp Bp^T = 4 [[I, R v],[ (Rv)^T, v.v ]].
    # R^T u components and R'^T r components, written out (R=[[c,-s],[s,c]],
    # R'=[[-s,-c],[c,-s]]):
    cb = c[:, None]
    sb = s[:, None]
    v1 = cb * u[..., 0] + sb * u[..., 1] - sb * r[..., 0] + cb * r[..., 1]
    v2 = -sb * u[..., 0] + cb * u[..., 1] - cb * r[..., 0] - sb * r[..., 1]
    rv1 = cb * v1 - sb * v2   # (R v)_x per point
    rv2 = sb * v1 + cb * v2   # (R v)_y
    p_tt = jnp.sum(v1 * v1 + v2 * v2, axis=-1)
    srv1 = jnp.sum(rv1, axis=-1)
    srv2 = jnp.sum(rv2, axis=-1)
    Sp = 4.0 * jnp.stack(
        [
            jnp.stack([n_corr, zero, srv1], axis=-1),
            jnp.stack([zero, n_corr, srv2], axis=-1),
            jnp.stack([srv1, srv2, p_tt], axis=-1),
        ],
        axis=-2,
    )
    S = sp2 * Sp + sq2 * Sq

    ok = n_corr >= 3.0
    eye = jnp.eye(3, dtype=H.dtype)
    Hinv = geom.inv_sym3(jnp.where(ok[:, None, None], H, eye[None]))
    cov = jnp.einsum("bij,bjk,bkl->bil", Hinv, S, Hinv)
    big = 1e6 * eye
    return jnp.where(ok[:, None, None], cov, big[None])


def _pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(B, P, 2), (B, Q, 2) -> (B, P, Q) squared distances.

    The cross term is the only O(P*Q) compute; expressed as a batched
    matmul so XLA places it on the MXU.
    """
    cross = jnp.einsum("bpc,bqc->bpq", a, b, preferred_element_type=jnp.float32)
    a2 = jnp.sum(a * a, axis=-1)[:, :, None]
    b2 = jnp.sum(b * b, axis=-1)[:, None, :]
    return a2 + b2 - 2.0 * cross


class _IterState(NamedTuple):
    transform: jnp.ndarray     # (B, 3)
    active: jnp.ndarray        # (B,) still iterating
    hessian: jnp.ndarray       # (B, 3, 3) last normal-equation matrix
    num_corr: jnp.ndarray      # (B,)
    fitness: jnp.ndarray       # (B,)


def _icp_iteration(
    state: _IterState,
    src: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    tgt_normals: jnp.ndarray,
    *,
    max_corr_sq: jnp.ndarray,
    reciprocal: bool,
    point_to_line: bool,
    epsilon: float,
    damping: float,
    ransac_samples: int = 0,
    ransac_threshold: float = 0.05,
    iter_idx: jnp.ndarray | None = None,
    error_delta_rel_tol: float = 0.0,
) -> _IterState:
    B, P, _ = src.shape
    moved = geom.apply(state.transform[:, None, :], src)  # (B, P, 2)

    d2 = _pairwise_sqdist(moved, tgt)  # (B, P, Pt)
    # Invalidate padded rows/cols.
    d2 = jnp.where(src_mask[:, :, None], d2, _BIG)
    d2 = jnp.where(tgt_mask[:, None, :], d2, _BIG)

    # Correspondences as a one-hot MATCH MATRIX instead of argmin+gather:
    # M[i, j] = (j is i's row-min) [& (i is j's col-min) for reciprocal
    # mutual-NN, PCL setUseReciprocalCorrespondences, dpg_slam.cc:412]
    # & gate. Matched targets/normals are then recovered with matmuls
    # (q = M_norm @ tgt), which tile onto the MXU — no dynamic gathers.
    rowmin = jnp.min(d2, axis=-1, keepdims=True)          # (B, P, 1)
    nn_d2 = rowmin[..., 0]
    M = d2 <= rowmin
    if reciprocal:
        colmin = jnp.min(d2, axis=-2, keepdims=True)      # (B, 1, Pt)
        M = M & (d2 <= colmin)
    M = M & (d2 <= max_corr_sq[:, None, None])
    Mf = M.astype(jnp.float32)
    row_cnt = jnp.sum(Mf, axis=-1)                        # (B, P)
    w = src_mask & (row_cnt > 0)
    Mn = Mf / jnp.maximum(row_cnt, 1.0)[..., None]        # row-normalized

    q = jnp.einsum("bpq,bqc->bpc", Mn, tgt, preferred_element_type=jnp.float32)
    n = jnp.einsum(
        "bpq,bqc->bpc", Mn, tgt_normals, preferred_element_type=jnp.float32
    )

    if ransac_samples > 0:
        # PCL-analog RANSAC correspondence rejection (setRANSACIterations,
        # dpg_slam.cc:413; threshold = PCL's 0.05 m default): per pair,
        # fit `ransac_samples` candidate rigid transforms from 2-point
        # minimal correspondence samples, score them by inlier count
        # under the rejection threshold, and drop correspondences that
        # are outliers to the best model. Mask-friendly and batched —
        # every sample is evaluated against every correspondence as
        # (B, S, P) elementwise work, no per-sample loop.
        key = jax.random.fold_in(
            jax.random.PRNGKey(17),
            jnp.asarray(0 if iter_idx is None else iter_idx, jnp.int32),
        )
        # PER-PAIR sample indices (B, S, 2): sharing one index set across
        # the batch correlates rejection decisions between pairs (and a
        # sample that is degenerate for one pair is degenerate for all).
        idx = jax.random.randint(key, (B, ransac_samples, 2), 0, P)
        take = lambda pts, k: jnp.take_along_axis(
            pts, idx[..., k][..., None], axis=1
        )                                                 # (B, S, 2)
        a1 = take(moved, 0)
        b1 = take(q, 0)
        a2 = take(moved, 1)
        b2 = take(q, 1)
        va = a2 - a1
        vb = b2 - b1
        sample_ok = (
            jnp.take_along_axis(w, idx[..., 0], axis=1)
            & jnp.take_along_axis(w, idx[..., 1], axis=1)
            & (jnp.sum(va * va, axis=-1) > 1e-6)
            & (jnp.sum(vb * vb, axis=-1) > 1e-6)
        )                                                  # (B, S)
        ang = jnp.arctan2(vb[..., 1], vb[..., 0]) - jnp.arctan2(
            va[..., 1], va[..., 0]
        )
        cs, sn = jnp.cos(ang), jnp.sin(ang)
        tx = b1[..., 0] - (cs * a1[..., 0] - sn * a1[..., 1])
        ty = b1[..., 1] - (sn * a1[..., 0] + cs * a1[..., 1])
        # Residual of every correspondence under every candidate model.
        rx = (
            cs[..., None] * moved[:, None, :, 0]
            - sn[..., None] * moved[:, None, :, 1]
            + tx[..., None]
            - q[:, None, :, 0]
        )
        ry = (
            sn[..., None] * moved[:, None, :, 0]
            + cs[..., None] * moved[:, None, :, 1]
            + ty[..., None]
            - q[:, None, :, 1]
        )
        inlier = (rx * rx + ry * ry <= ransac_threshold**2) & w[:, None, :]
        count = jnp.where(sample_ok, jnp.sum(inlier, axis=-1), -1)  # (B, S)
        best = jnp.argmax(count, axis=-1)
        best_inliers = jnp.take_along_axis(
            inlier, best[:, None, None], axis=1
        )[:, 0, :]                                         # (B, P)
        best_count = jnp.take_along_axis(count, best[:, None], axis=1)[:, 0]
        # Only trust a model supported by >= 3 inliers; otherwise keep all.
        keep = jnp.where((best_count >= 3)[:, None], best_inliers, True)
        w = w & keep

    wf = w.astype(jnp.float32)

    err = moved - q  # (B, P, 2)

    # Rotation derivative applied to source points: d(R p)/dθ = [-(Rp)_y, (Rp)_x]
    rp = moved - state.transform[:, None, 0:2]
    drot = jnp.stack([-rp[..., 1], rp[..., 0]], axis=-1)  # (B, P, 2)

    if point_to_line:
        # Residual r = n·(moved - q); Jacobian row J = [n_x, n_y, n·drot].
        r = jnp.sum(n * err, axis=-1)                                  # (B, P)
        J = jnp.concatenate(
            [n, jnp.sum(n * drot, axis=-1, keepdims=True)], axis=-1
        )                                                              # (B, P, 3)
        H = jnp.einsum("bpi,bpj->bij", J * wf[..., None], J)
        g = jnp.einsum("bpi,bp->bi", J * wf[..., None], r)
    else:
        # Two residual rows per point: r = moved - q,
        # J_x = [1, 0, drot_x], J_y = [0, 1, drot_y].
        ones = jnp.broadcast_to(wf, (B, P))
        Hxx = jnp.sum(ones, axis=-1)
        Hxt = jnp.sum(wf * drot[..., 0], axis=-1)
        Hyt = jnp.sum(wf * drot[..., 1], axis=-1)
        Htt = jnp.sum(wf * jnp.sum(drot * drot, axis=-1), axis=-1)
        zero = jnp.zeros_like(Hxx)
        H = jnp.stack(
            [
                jnp.stack([Hxx, zero, Hxt], axis=-1),
                jnp.stack([zero, Hxx, Hyt], axis=-1),
                jnp.stack([Hxt, Hyt, Htt], axis=-1),
            ],
            axis=-2,
        )
        gx = jnp.sum(wf * err[..., 0], axis=-1)
        gy = jnp.sum(wf * err[..., 1], axis=-1)
        gt = jnp.sum(wf * jnp.sum(drot * err, axis=-1), axis=-1)
        g = jnp.stack([gx, gy, gt], axis=-1)

    num_corr = jnp.sum(w, axis=-1).astype(jnp.int32)
    fitness = jnp.sum(wf * nn_d2, axis=-1) / jnp.maximum(
        num_corr.astype(jnp.float32), 1.0
    )

    # Damped solve. Damping is RELATIVE to trace(H): in degenerate geometry
    # (e.g. a corridor, where the along-axis direction is unconstrained for
    # point-to-line residuals) an absolute epsilon lets GN take meter-scale
    # steps along the null space driven by noise; trace-relative damping
    # pins unconstrained directions to the (odometry) seed instead.
    eye = jnp.eye(3, dtype=H.dtype)
    tr = (H[:, 0, 0] + H[:, 1, 1] + H[:, 2, 2]) / 3.0
    lam = damping * jnp.maximum(tr, 1e-12)
    Hd = H + lam[:, None, None] * eye[None]
    solvable = num_corr >= 3
    # Closed-form symmetric 3x3 solve: batched lax.linalg solve is a
    # latency-bound loop on TPU; the cofactor inverse is pure VPU.
    Hinv = geom.inv_sym3(jnp.where(solvable[:, None, None], Hd, eye[None]))
    delta = jnp.einsum("bij,bj->bi", Hinv, g)
    delta = jnp.where(solvable[:, None], delta, 0.0)

    step = jnp.where(state.active[:, None], -delta, 0.0)
    new_t = state.transform + step
    new_t = new_t.at[:, 2].set(geom.wrap_angle(new_t[:, 2]))

    still = state.active & (jnp.sum(step * step, axis=-1) > epsilon)
    if error_delta_rel_tol > 0.0:
        # Error-delta exit (config icp_error_delta_rel_tol): freeze pairs
        # whose fitness stopped improving, even if their step norm still
        # exceeds the PCL epsilon (oscillation at the optimum). The
        # isfinite guard skips the first iteration (fitness starts at inf).
        stalled = jnp.isfinite(state.fitness) & (
            jnp.abs(state.fitness - fitness)
            <= error_delta_rel_tol * jnp.maximum(fitness, 1e-12)
        )
        still = still & ~stalled
    return _IterState(new_t, still, Hd, num_corr, fitness)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iterations",
        "max_correspondence_distance",
        "reciprocal",
        "point_to_line",
        "epsilon",
        "ransac_iterations",
        "ransac_threshold",
        "error_delta_rel_tol",
        "anneal_iters_cfg",
        "fixed_covariance",
        "covariance_mode",
        "sigmas",
        "sensor_noise_std",
        "cov_floor_transl",
        "cov_floor_rot",
        "min_correspondences",
        "fitness_threshold",
        "min_overlap",
    ),
)
def _icp_align_impl(
    src: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    tgt_normals: jnp.ndarray,
    init_guess: jnp.ndarray,
    gate_multiplier: jnp.ndarray,
    *,
    max_iterations: int,
    max_correspondence_distance: float,
    reciprocal: bool,
    point_to_line: bool,
    epsilon: float,
    ransac_iterations: int,
    ransac_threshold: float,
    error_delta_rel_tol: float,
    anneal_iters_cfg: int | None,
    fixed_covariance: bool,
    covariance_mode: str,
    sigmas: tuple[float, float, float],
    sensor_noise_std: float,
    cov_floor_transl: float,
    cov_floor_rot: float,
    min_correspondences: int,
    fitness_threshold: float,
    min_overlap: float,
) -> ICPResult:
    B = src.shape[0]
    state = _IterState(
        transform=init_guess,
        active=jnp.ones((B,), dtype=bool),
        hessian=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        num_corr=jnp.zeros((B,), dtype=jnp.int32),
        fitness=jnp.full((B,), jnp.inf, dtype=jnp.float32),
    )

    # Coarse-to-fine correspondence gating, PER PAIR: the fixed 0.6 m gate
    # (parameters.h:173) rejects the true correspondences outright when the
    # seed error exceeds it (drifted loop-closure seeds), so pairs with
    # gate_multiplier > 1 start wide and anneal linearly down to the fine
    # gate over the first 2/3 of iterations. Well-seeded pairs (successive
    # scans) should pass multiplier 1.0 — a wide gate admits wrong far
    # matches that drag degenerate (corridor) geometry off a perfect seed.
    # Acceptance (overlap/fitness) is judged on the final, fine gate.
    anneal_iters = (
        max(1, min(anneal_iters_cfg, max_iterations))
        if anneal_iters_cfg is not None
        else max(1, (2 * max_iterations) // 3)
    )

    def cond(carry):
        state, it = carry
        # Early exit once every pair has frozen (annealing pairs are held
        # active through their schedule, so this can only trip after it).
        return (it < max_iterations) & jnp.any(state.active)

    def body(carry):
        state, it = carry
        progress = jnp.maximum(0.0, 1.0 - it / anneal_iters)
        mult = 1.0 + (gate_multiplier - 1.0) * progress          # (B,)
        gate_sq = (max_correspondence_distance * mult) ** 2
        state = _icp_iteration(
            state,
            src,
            src_mask,
            tgt,
            tgt_mask,
            tgt_normals,
            max_corr_sq=gate_sq,
            reciprocal=reciprocal,
            point_to_line=point_to_line,
            epsilon=epsilon,
            damping=1e-3,
            ransac_samples=ransac_iterations,
            ransac_threshold=ransac_threshold,
            iter_idx=it,
            error_delta_rel_tol=error_delta_rel_tol,
        )
        # No convergence freezing while any annealing is still in
        # progress — a coarse-gate local optimum is not convergence.
        # Held through it == anneal_iters - 1 (the last still-coarse
        # iteration) so the first iteration where an annealed pair may
        # freeze runs at the FINE gate: the early-exit below then always
        # reports num_corr/fitness/overlap at multiplier 1, preserving
        # the acceptance-at-fine-gate invariant.
        annealing = (gate_multiplier > 1.0) & (it < anneal_iters)
        state = state._replace(active=state.active | annealing)
        return state, it + 1.0

    state, _ = jax.lax.while_loop(
        cond, body, (state, jnp.zeros((), jnp.float32))
    )

    n_src_valid = jnp.sum(src_mask, axis=-1).astype(jnp.float32)
    overlap = state.num_corr.astype(jnp.float32) / jnp.maximum(n_src_valid, 1.0)
    # Seed-deviation gate: ICP is a local refiner — a result that moved
    # farther from its seed than the (coarse) correspondence gate could
    # ever justify has jumped to an aliased optimum (parallel-wall
    # symmetry). Budget scales with the pair's gate multiplier.
    deviation = jnp.linalg.norm(
        state.transform[:, 0:2] - init_guess[:, 0:2], axis=-1
    )
    deviation_budget = gate_multiplier * max_correspondence_distance
    converged = (
        (state.num_corr >= min_correspondences)
        & (state.fitness <= fitness_threshold)
        & (overlap >= min_overlap)
        & (deviation <= deviation_budget)
    )

    if fixed_covariance:
        # Reference parity: calculate_ICP_COV's actual output is a constant
        # diagonal (cov_func_point_to_point.h:572-575).
        cov = jnp.broadcast_to(jnp.diag(jnp.array(sigmas, dtype=jnp.float32)), (B, 3, 3))
    else:
        if covariance_mode == "censi":
            # Full closed-form sandwich at the final transform (both
            # clouds noisy; see censi_covariance).
            cov = censi_covariance(
                src,
                src_mask,
                tgt,
                tgt_mask,
                state.transform,
                max_correspondence_distance=max_correspondence_distance,
                reciprocal=reciprocal,
                src_noise_std=sensor_noise_std,
                tgt_noise_std=sensor_noise_std,
            )
        else:
            # Gauss-Newton covariance from the final normal system:
            # cov = 2 sigma_z^2 H^-1 — the usable core of the Censi closed
            # form. Either mode adds a floor for correspondence bias the
            # per-point noise model cannot see (sampling aliasing, normal
            # estimation error).
            eye3 = jnp.eye(3, dtype=state.hessian.dtype)
            safe_H = jnp.where(converged[:, None, None], state.hessian, eye3[None])
            cov = 2.0 * (sensor_noise_std**2) * geom.inv_sym3(safe_H)
        floor = jnp.diag(
            jnp.array(
                [cov_floor_transl**2, cov_floor_transl**2, cov_floor_rot**2],
                jnp.float32,
            )
        )
        cov = cov + floor[None]
        fallback = jnp.diag(jnp.array(sigmas, dtype=jnp.float32))
        cov = jnp.where(converged[:, None, None], cov, fallback[None])

    return ICPResult(
        transform=state.transform,
        converged=converged,
        num_correspondences=state.num_corr,
        fitness=state.fitness,
        overlap=overlap,
        covariance=cov,
    )


def icp_align(
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
) -> ICPResult:
    """Align a batch of source clouds onto target clouds.

    Args:
      src: (B, P, 2) source points (the newer node's scan in its own frame —
        PCL setInputSource, dpg_slam.cc:404).
      src_mask: (B, P) bool validity (padding + max-range masking).
      tgt: (B, P, 2) target points (the older node's scan — setInputTarget).
      tgt_mask: (B, P) bool.
      init_guess: (B, 3) initial pose of src frame in tgt frame (the odometry
        seed, dpg_slam.cc:364-378).
      params: pose-graph config (ICP section).
      tgt_normals: optional precomputed (B, P, 2) target normals; computed
        from scan ordering when omitted.
      min_correspondences / fitness_threshold: acceptance gate standing in
        for PCL hasConverged + RANSAC outlier rejection — a deliberate,
        documented deviation (the reference accepts nearly everything;
        SURVEY.md §3.6).
      sensor_noise_std: per-point noise used by the GN covariance mode.

    Returns:
      ICPResult with (B, ...) leaves.
    """
    if tgt_normals is None:
        tgt_normals = estimate_normals(tgt, tgt_mask)
    if sensor_noise_std is None:
        sensor_noise_std = params.icp_sensor_noise_std
    if min_overlap is None:
        min_overlap = params.icp_min_overlap
    if gate_multiplier is None:
        # Default: every pair gets the configured coarse-to-fine schedule.
        # Callers that mix well-seeded pairs (successive scans: pass 1.0)
        # with drifted-seed pairs (loop closures) should pass per-pair values.
        gate_multiplier = jnp.full(
            (src.shape[0],), params.icp_coarse_gate_multiplier, jnp.float32
        )
    if params.use_pallas_icp and params.icp_point_to_line:
        from dpg_slam_tpu.ops.icp_pallas import icp_align_pallas

        return icp_align_pallas(
            src, src_mask, tgt, tgt_mask, init_guess, params,
            tgt_normals=tgt_normals,
            gate_multiplier=gate_multiplier,
            min_correspondences=min_correspondences,
            fitness_threshold=fitness_threshold,
            min_overlap=min_overlap,
            sensor_noise_std=sensor_noise_std,
        )
    return _icp_align_impl(
        src,
        src_mask,
        tgt,
        tgt_mask,
        tgt_normals,
        init_guess,
        gate_multiplier,
        max_iterations=params.icp_maximum_iterations,
        max_correspondence_distance=params.icp_max_correspondence_distance,
        reciprocal=params.icp_use_reciprocal_correspondences,
        point_to_line=params.icp_point_to_line,
        epsilon=params.icp_maximum_transformation_epsilon,
        ransac_iterations=(
            params.ransac_iterations if params.icp_use_ransac_rejection else 0
        ),
        ransac_threshold=params.ransac_outlier_rejection_threshold,
        error_delta_rel_tol=getattr(params, "icp_error_delta_rel_tol", 0.0),
        anneal_iters_cfg=getattr(params, "icp_anneal_iters", None),
        fixed_covariance=params.use_fixed_icp_covariance,
        covariance_mode=getattr(params, "icp_covariance_mode", "gn"),
        sigmas=(
            params.laser_x_variance,
            params.laser_y_variance,
            params.laser_theta_variance,
        ),
        sensor_noise_std=sensor_noise_std,
        cov_floor_transl=params.icp_cov_floor_transl,
        cov_floor_rot=params.icp_cov_floor_rot,
        min_correspondences=min_correspondences,
        fitness_threshold=fitness_threshold,
        min_overlap=min_overlap,
    )


def icp_align_single(
    src: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    init_guess: jnp.ndarray,
    params: PoseGraphParams,
    **kwargs,
) -> ICPResult:
    """Single-pair convenience wrapper (adds/removes the batch axis)."""
    if kwargs.get("tgt_normals") is not None:
        kwargs["tgt_normals"] = kwargs["tgt_normals"][None]
    if kwargs.get("gate_multiplier") is not None:
        kwargs["gate_multiplier"] = jnp.atleast_1d(
            jnp.asarray(kwargs["gate_multiplier"], jnp.float32)
        )
    res = icp_align(
        src[None],
        src_mask[None],
        tgt[None],
        tgt_mask[None],
        init_guess[None],
        params,
        **kwargs,
    )
    return ICPResult(*[leaf[0] for leaf in res])
