"""SE(2) pose-graph optimization as batched array programs.

Replaces the reference's GTSAM usage — NonlinearFactorGraph of
PriorFactor<Pose2>/BetweenFactor<Pose2> solved by iSAM2
(dpg_slam.cc:21-22,49,73,183,237,316-338) — with fixed-capacity factor
arrays and a damped Gauss-Newton (Levenberg-Marquardt) solver.

The reference's iSAM2 usage re-adds every factor on every update
(graph_ is never cleared; SURVEY.md §3.6.2), silently over-weighting old
constraints — i.e. its *effective* behavior is closer to a repeated batch
solve than to true incremental smoothing. We therefore implement honest
batch GN/LM over the full graph (the semantics the reference intended),
re-run per keyframe. On TPU a full batched solve of a few-thousand-node
graph is cheaper than the reference's single iSAM2 update.

Design:
  * A FactorGraph is a pytree of fixed-capacity arrays + live-count masks,
    so the whole solve jits with static shapes while the graph grows online.
  * Residuals/Jacobians for all factors are evaluated in one vectorized
    sweep (no per-factor objects).
  * Normal equations: block-sparse scatter into an (N, 3, 3) diagonal +
    per-edge off-diagonal blocks. Two solve paths:
      - dense Cholesky on the assembled (3N, 3N) system (fast to ~1k nodes)
      - preconditioned CG with edge-gather matvecs (O(E) memory, scales)
  * LM damping with accept/reject steps inside a lax.scan (masked, fixed
    iteration count — compiler-friendly control flow).

Noise models: factors carry sqrt-information matrices (3, 3); diagonal
sigmas from the reference's noise models (dpg_slam.cc:45-48,69-70,233-234)
become diag(1/sigma).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dpg_slam_tpu import geom

__all__ = [
    "FactorGraph",
    "empty_graph",
    "add_prior",
    "add_between",
    "residuals",
    "total_error",
    "solve",
    "SolveStats",
]


class FactorGraph(NamedTuple):
    """Fixed-capacity factor arrays (a jax pytree).

    Node poses live *outside* the graph (the engine owns them); the graph
    holds only factors. Capacities are static; ``num_priors``/``num_edges``
    are traced scalars; slots >= count are masked out.
    """

    # Priors (PriorFactor<Pose2> analog)
    prior_idx: jnp.ndarray        # (P,) int32 node index
    prior_val: jnp.ndarray        # (P, 3) prior pose
    prior_sqrt_info: jnp.ndarray  # (P, 3, 3) whitening matrix
    num_priors: jnp.ndarray       # () int32

    # Between factors (BetweenFactor<Pose2> analog)
    edge_idx: jnp.ndarray         # (E, 2) int32 [from, to]
    edge_meas: jnp.ndarray        # (E, 3) measured relative pose (to in from's frame)
    edge_sqrt_info: jnp.ndarray   # (E, 3, 3)
    num_edges: jnp.ndarray        # () int32

    @property
    def prior_mask(self) -> jnp.ndarray:
        return jnp.arange(self.prior_idx.shape[0]) < self.num_priors

    @property
    def edge_mask(self) -> jnp.ndarray:
        return jnp.arange(self.edge_idx.shape[0]) < self.num_edges


class SolveStats(NamedTuple):
    initial_error: jnp.ndarray   # ()
    final_error: jnp.ndarray     # ()
    iterations: jnp.ndarray      # () accepted LM steps


def empty_graph(max_priors: int, max_edges: int) -> FactorGraph:
    return FactorGraph(
        prior_idx=jnp.zeros((max_priors,), jnp.int32),
        prior_val=jnp.zeros((max_priors, 3), jnp.float32),
        prior_sqrt_info=jnp.zeros((max_priors, 3, 3), jnp.float32),
        num_priors=jnp.zeros((), jnp.int32),
        edge_idx=jnp.zeros((max_edges, 2), jnp.int32),
        edge_meas=jnp.zeros((max_edges, 3), jnp.float32),
        edge_sqrt_info=jnp.zeros((max_edges, 3, 3), jnp.float32),
        num_edges=jnp.zeros((), jnp.int32),
    )


def sqrt_info_from_sigmas(sigmas: jnp.ndarray) -> jnp.ndarray:
    """Diagonal sqrt-information from per-axis standard deviations
    (noiseModel::Diagonal::Sigmas analog)."""
    return jnp.diag(1.0 / sigmas) if sigmas.ndim == 1 else jax.vmap(jnp.diag)(1.0 / sigmas)


def sqrt_info_from_covariance(cov: jnp.ndarray) -> jnp.ndarray:
    """Whitening matrix R with R^T R = cov^-1 (noiseModel::Gaussian::
    Covariance analog, dpg_slam.cc:335): the inverse Cholesky factor,
    R = L^-1 (then R^T R = L^-T L^-1 = cov^-1).

    Closed form for the 3x3 SE(2) case instead of lax.linalg cholesky +
    triangular solve: batched tiny-matrix linalg primitives are
    latency-bound sequential loops on TPU (~10 ms for a few thousand
    3x3s), while this is a handful of elementwise VPU ops. Batched over
    any leading axes.
    """
    a11 = jnp.maximum(cov[..., 0, 0], 1e-18)
    a21 = cov[..., 1, 0]
    a31 = cov[..., 2, 0]
    a22 = cov[..., 1, 1]
    a32 = cov[..., 2, 1]
    a33 = cov[..., 2, 2]
    l11 = jnp.sqrt(a11)
    l21 = a21 / l11
    l31 = a31 / l11
    l22 = jnp.sqrt(jnp.maximum(a22 - l21 * l21, 1e-18))
    l32 = (a32 - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(a33 - l31 * l31 - l32 * l32, 1e-18))
    m11 = 1.0 / l11
    m22 = 1.0 / l22
    m33 = 1.0 / l33
    m21 = -l21 * m11 * m22
    m31 = (l21 * l32 - l22 * l31) * m11 * m22 * m33
    m32 = -l32 * m22 * m33
    zero = jnp.zeros_like(m11)
    return jnp.stack(
        [
            jnp.stack([m11, zero, zero], axis=-1),
            jnp.stack([m21, m22, zero], axis=-1),
            jnp.stack([m31, m32, m33], axis=-1),
        ],
        axis=-2,
    )


def add_prior(
    g: FactorGraph, node: jnp.ndarray, value: jnp.ndarray, sqrt_info: jnp.ndarray
) -> FactorGraph:
    """Append a prior factor (traced-index scatter; capacity must not be
    exceeded — the engine checks counts on the host)."""
    i = g.num_priors
    return g._replace(
        prior_idx=g.prior_idx.at[i].set(node.astype(jnp.int32)),
        prior_val=g.prior_val.at[i].set(value),
        prior_sqrt_info=g.prior_sqrt_info.at[i].set(sqrt_info),
        num_priors=g.num_priors + 1,
    )


def add_between_batch(
    g: FactorGraph,
    from_idx: jnp.ndarray,    # (M,) int32
    to_idx: jnp.ndarray,      # (M,) int32
    meas: jnp.ndarray,        # (M, 3)
    sqrt_info: jnp.ndarray,   # (M, 3, 3)
    valid: jnp.ndarray,       # (M,) bool — invalid rows consume no slot
) -> FactorGraph:
    """Append M between factors in ONE scatter per factor array —
    identical semantics (slot packing, count) to M sequential
    `add_between(..., valid=...)` calls, whose lax.scan form cost ~3
    full-edge-array selects per factor (27 medium ops per keyframe at
    K=8; a measured slice of the latency-bound frontend chain)."""
    valid = jnp.asarray(valid)
    vi = valid.astype(jnp.int32)
    off = jnp.cumsum(vi) - vi  # exclusive prefix: k-th kept row's offset
    E = g.edge_idx.shape[0]
    slots = jnp.where(valid, g.num_edges + off, E)  # E = dropped
    pair = jnp.stack([from_idx, to_idx], axis=-1).astype(jnp.int32)
    return g._replace(
        edge_idx=g.edge_idx.at[slots].set(pair, mode="drop"),
        edge_meas=g.edge_meas.at[slots].set(meas, mode="drop"),
        edge_sqrt_info=g.edge_sqrt_info.at[slots].set(sqrt_info, mode="drop"),
        num_edges=g.num_edges + jnp.sum(vi),
    )


def add_between(
    g: FactorGraph,
    from_node: jnp.ndarray,
    to_node: jnp.ndarray,
    meas: jnp.ndarray,
    sqrt_info: jnp.ndarray,
    valid: jnp.ndarray | bool = True,
) -> FactorGraph:
    """Append a between factor. With ``valid=False`` the slot is not
    consumed (enables fixed-shape conditional insertion of loop closures)."""
    i = g.num_edges
    valid = jnp.asarray(valid)
    new_idx = g.edge_idx.at[i].set(
        jnp.stack([from_node, to_node]).astype(jnp.int32)
    )
    new_meas = g.edge_meas.at[i].set(meas)
    new_info = g.edge_sqrt_info.at[i].set(sqrt_info)
    return g._replace(
        edge_idx=jnp.where(valid, new_idx, g.edge_idx),
        edge_meas=jnp.where(valid, new_meas, g.edge_meas),
        edge_sqrt_info=jnp.where(valid, new_info, g.edge_sqrt_info),
        num_edges=g.num_edges + valid.astype(jnp.int32),
    )


# --------------------------------------------------------------------------
# Residuals and Jacobians
# --------------------------------------------------------------------------

def _between_residual_jac(poses: jnp.ndarray, g: FactorGraph):
    """Vectorized residual + analytic Jacobians for all between factors.

    Residual: r = pred - meas with pred = between(x_i, x_j) (the relative
    pose of j in i's frame), angle wrapped — the Pose2 BetweenFactor error
    up to the tangent-space chart.

    Returns (r, Ji, Jj): (E, 3), (E, 3, 3), (E, 3, 3) — whitened.
    """
    xi = poses[g.edge_idx[:, 0]]  # (E, 3)
    xj = poses[g.edge_idx[:, 1]]
    c = jnp.cos(xi[:, 2])
    s = jnp.sin(xi[:, 2])
    dx = xj[:, 0] - xi[:, 0]
    dy = xj[:, 1] - xi[:, 1]
    # pred_xy = R(-theta_i) [dx, dy]
    px = c * dx + s * dy
    py = -s * dx + c * dy
    pth = geom.wrap_angle(xj[:, 2] - xi[:, 2])
    pred = jnp.stack([px, py, pth], axis=-1)
    r = pred - g.edge_meas
    r = r.at[:, 2].set(geom.wrap_angle(r[:, 2]))

    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    # d pred_xy / d xi_xy = -R(-theta_i); d pred_xy / d theta_i = dR(-th)/dth d
    Ji = jnp.stack(
        [
            jnp.stack([-c, -s, -s * dx + c * dy], axis=-1),
            jnp.stack([s, -c, -c * dx - s * dy], axis=-1),
            jnp.stack([zeros, zeros, -ones], axis=-1),
        ],
        axis=-2,
    )  # (E, 3, 3)
    Jj = jnp.stack(
        [
            jnp.stack([c, s, zeros], axis=-1),
            jnp.stack([-s, c, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    W = g.edge_sqrt_info  # (E, 3, 3)
    return (
        jnp.einsum("eab,eb->ea", W, r),
        jnp.einsum("eab,ebc->eac", W, Ji),
        jnp.einsum("eab,ebc->eac", W, Jj),
    )


def _prior_residual_jac(poses: jnp.ndarray, g: FactorGraph):
    """Whitened residual + Jacobian for priors: r = x - prior (θ wrapped)."""
    x = poses[g.prior_idx]
    r = x - g.prior_val
    r = r.at[:, 2].set(geom.wrap_angle(r[:, 2]))
    W = g.prior_sqrt_info
    J = jnp.broadcast_to(jnp.eye(3, dtype=poses.dtype), W.shape)
    return jnp.einsum("pab,pb->pa", W, r), jnp.einsum("pab,pbc->pac", W, J)


def residuals(poses: jnp.ndarray, g: FactorGraph) -> jnp.ndarray:
    """All whitened residuals stacked: (P*3 + E*3,) with masked slots zero."""
    pr, _ = _prior_residual_jac(poses, g)
    er, _, _ = _between_residual_jac(poses, g)
    pr = jnp.where(g.prior_mask[:, None], pr, 0.0)
    er = jnp.where(g.edge_mask[:, None], er, 0.0)
    return jnp.concatenate([pr.reshape(-1), er.reshape(-1)])


def _huber_weight(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight per factor from the whitened residual norm: 1 inside the
    delta band, delta/||r|| outside (Huber). (E,) from (E, 3)."""
    nrm = jnp.linalg.norm(r, axis=-1)
    return jnp.where(nrm <= delta, 1.0, delta / jnp.maximum(nrm, 1e-12))


def _huber_loss(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Summed Huber loss over factors (rows of whitened residuals)."""
    nrm = jnp.linalg.norm(r, axis=-1)
    quad = 0.5 * nrm * nrm
    lin = delta * nrm - 0.5 * delta * delta
    return jnp.sum(jnp.where(nrm <= delta, quad, lin))


def total_error(
    poses: jnp.ndarray, g: FactorGraph, robust_delta: float | None = None
) -> jnp.ndarray:
    """Total graph error (GTSAM graph.error analog). With robust_delta set,
    between-factors use the Huber loss (priors stay quadratic) — outlier
    loop closures contribute linearly instead of quadratically."""
    pr, _ = _prior_residual_jac(poses, g)
    er, _, _ = _between_residual_jac(poses, g)
    pr = jnp.where(g.prior_mask[:, None], pr, 0.0)
    er = jnp.where(g.edge_mask[:, None], er, 0.0)
    prior_err = 0.5 * jnp.sum(pr * pr)
    if robust_delta is None:
        return prior_err + 0.5 * jnp.sum(er * er)
    return prior_err + _huber_loss(er, robust_delta)


# --------------------------------------------------------------------------
# Normal equations
# --------------------------------------------------------------------------

class _NormalEq(NamedTuple):
    diag: jnp.ndarray      # (N, 3, 3) diagonal blocks of H
    off: jnp.ndarray       # (E, 3, 3) off-diagonal block for (i, j) per edge
    rhs: jnp.ndarray       # (N, 3) gradient  (g = J^T r)


def _assemble(
    poses: jnp.ndarray,
    g: FactorGraph,
    node_mask: jnp.ndarray,
    robust_delta: float | None = None,
) -> tuple[_NormalEq, jnp.ndarray]:
    """Build the normal equations AND the total (robust) error in one
    residual sweep — the LM loop needs both every iteration, and the
    residual/Jacobian evaluation is the shared cost."""
    N = poses.shape[0]
    pr, pJ = _prior_residual_jac(poses, g)
    er, Ji, Jj = _between_residual_jac(poses, g)

    pm = g.prior_mask.astype(poses.dtype)
    em = g.edge_mask.astype(poses.dtype)

    # Total error on the raw (mask-zeroed, un-IRLS-scaled) residuals —
    # identical to total_error(poses, g, robust_delta).
    pr_m = pr * pm[:, None]
    er_m = er * em[:, None]
    prior_err = 0.5 * jnp.sum(pr_m * pr_m)
    if robust_delta is None:
        err = prior_err + 0.5 * jnp.sum(er_m * er_m)
    else:
        err = prior_err + _huber_loss(er_m, robust_delta)

    if robust_delta is not None:
        # IRLS: scale each between-factor's residual and Jacobians by
        # sqrt(huber weight) so the normal equations realize the robust loss.
        sw = jnp.sqrt(_huber_weight(er, robust_delta))
        em = em * sw
    pJ = pJ * pm[:, None, None]
    pr = pr * pm[:, None]
    Ji = Ji * em[:, None, None]
    Jj = Jj * em[:, None, None]
    er = er * em[:, None]

    # Per-factor normal-equation contributions, then node reduction as
    # one-hot (N, P/E) matmul contractions — the TPU-native scatter: a
    # handful of MXU passes instead of serialized scatter-adds (measured
    # ~5x on the warm keyframe assemble; same trick as the ICP
    # correspondence reduction). Masked factor slots contribute exact
    # zeros (pJ/Ji/Jj/pr/er are mask-zeroed above), so arbitrary padding
    # indices are harmless.
    #
    # CAPACITY BOUND: the one-hot operands are O(N*E) floats (default
    # 512x8192 ~ 16 MB; _dense_H's 3-operand contraction peaks at the
    # same scale). The per-keyframe path slices ONLY the node bucket —
    # factor arrays stay at full edge capacity (slicing them to
    # eb = nb*(2+K) was measured 95x SLOWER on the real chip and
    # reverted in d898ced; see engine._keyframe_solve's NOTE). Right-size
    # cfg.capacity.max_edges to the workload instead. Callers assembling
    # at much larger static capacities (max_nodes >> 1k) should use
    # method="cg" (block-sparse matvec, no dense H) — the engine does
    # this automatically.
    i_idx = g.edge_idx[:, 0]
    j_idx = g.edge_idx[:, 1]
    ar = jnp.arange(N)
    oh_p = (g.prior_idx[None, :] == ar[:, None]).astype(poses.dtype)  # (N,P)
    oh_i = (i_idx[None, :] == ar[:, None]).astype(poses.dtype)        # (N,E)
    oh_j = (j_idx[None, :] == ar[:, None]).astype(poses.dtype)        # (N,E)

    diag_p = jnp.einsum("pba,pbc->pac", pJ, pJ)
    diag_i = jnp.einsum("eba,ebc->eac", Ji, Ji)
    diag_j = jnp.einsum("eba,ebc->eac", Jj, Jj)
    diag = (
        jnp.einsum("np,pac->nac", oh_p, diag_p)
        + jnp.einsum("ne,eac->nac", oh_i, diag_i)
        + jnp.einsum("ne,eac->nac", oh_j, diag_j)
    )
    off = jnp.einsum("eba,ebc->eac", Ji, Jj)  # H_ij block
    rhs = (
        jnp.einsum("np,pa->na", oh_p, jnp.einsum("pba,pb->pa", pJ, pr))
        + jnp.einsum("ne,ea->na", oh_i, jnp.einsum("eba,eb->ea", Ji, er))
        + jnp.einsum("ne,ea->na", oh_j, jnp.einsum("eba,eb->ea", Jj, er))
    )

    # Inactive node slots: identity diagonal, zero gradient -> zero update.
    eye = jnp.eye(3, dtype=poses.dtype)
    diag = jnp.where(node_mask[:, None, None], diag, eye[None])
    rhs = jnp.where(node_mask[:, None], rhs, 0.0)
    return _NormalEq(diag, off, rhs), err


def _matvec(eq: _NormalEq, g: FactorGraph, v: jnp.ndarray) -> jnp.ndarray:
    """H v with H given in block form — O(E) gather/scatter, no dense H."""
    out = jnp.einsum("nab,nb->na", eq.diag, v)
    i_idx = g.edge_idx[:, 0]
    j_idx = g.edge_idx[:, 1]
    em = g.edge_mask.astype(v.dtype)[:, None]
    vj = v[j_idx]
    vi = v[i_idx]
    out = out.at[i_idx].add(em * jnp.einsum("eab,eb->ea", eq.off, vj))
    out = out.at[j_idx].add(em * jnp.einsum("eba,eb->ea", eq.off, vi))
    return out


def _dense_solve(eq: _NormalEq, g: FactorGraph, damping: jnp.ndarray) -> jnp.ndarray:
    """Assemble (3N, 3N) and Cholesky-solve. Fine to ~1k nodes."""
    N = eq.diag.shape[0]
    Hf = _dense_H(eq, g, damping)
    rhs = eq.rhs.reshape(3 * N)
    L, low = jax.scipy.linalg.cho_factor(Hf)
    delta = jax.scipy.linalg.cho_solve((L, low), rhs)
    return delta.reshape(N, 3)


def _dense_pallas_solve(
    eq: _NormalEq, g: FactorGraph, damping: jnp.ndarray
) -> jnp.ndarray:
    """_dense_solve with the fused panel-blocked Pallas SPD kernel
    (ops/schur_pallas.spd_solve_pallas) in place of XLA's
    cho_factor/cho_solve: one kernel, matrix + factor resident in VMEM
    across factorization and both triangular solves. 3N is always a
    multiple of 64 here (node buckets are powers of two >= 64), so the
    blocked path always engages. Non-TPU backends evaluate the same
    algorithm as plain XLA ops (interpret)."""
    N = eq.diag.shape[0]
    from dpg_slam_tpu.ops.schur_pallas import spd_solve_pallas

    Hf = _dense_H(eq, g, damping)
    # RHS padded to a full 128-lane tile: a (3N, 1) operand leaves Mosaic
    # with degenerate lane tiles; the extra zero columns are free.
    rhs = jnp.zeros((3 * N, 128), Hf.dtype).at[:, 0].set(eq.rhs.reshape(3 * N))
    interpret = jax.default_backend() not in ("tpu", "axon")
    delta = spd_solve_pallas(Hf, rhs, interpret=interpret)[:, 0]
    return delta.reshape(N, 3)


def _dense_H(eq: _NormalEq, g: FactorGraph, damping: jnp.ndarray) -> jnp.ndarray:
    """Assemble the damped (3N, 3N) normal matrix from block form, with the
    off-diagonal edge blocks placed by one-hot matmul contractions instead
    of 2-D scatter-adds (MXU passes; see _assemble)."""
    N = eq.diag.shape[0]
    i_idx = g.edge_idx[:, 0]
    j_idx = g.edge_idx[:, 1]
    em = g.edge_mask.astype(eq.diag.dtype)[:, None, None]
    offm = em * eq.off
    ar = jnp.arange(N)
    oh_i = (i_idx[None, :] == ar[:, None]).astype(eq.diag.dtype)  # (N,E)
    oh_j = (j_idx[None, :] == ar[:, None]).astype(eq.diag.dtype)  # (N,E)
    diagd = eq.diag + damping * jnp.eye(3, dtype=eq.diag.dtype)
    H = (
        jnp.einsum("nm,nab->nmab", jnp.eye(N, dtype=eq.diag.dtype), diagd)
        + jnp.einsum("ne,eab,me->nmab", oh_i, offm, oh_j)
        + jnp.einsum("ne,eba,me->nmab", oh_j, offm, oh_i)
    )
    return H.transpose(0, 2, 1, 3).reshape(3 * N, 3 * N)


def _dense_cg_solve(
    eq: _NormalEq,
    g: FactorGraph,
    damping: jnp.ndarray,
    iters: int,
    rel_tol: float = 1e-6,
) -> jnp.ndarray:
    """Block-Jacobi preconditioned CG with a DENSE (3N, 3N) matvec.

    On TPU a dense matvec is bandwidth-bound (~the matrix size / HBM BW
    per iteration) while Cholesky is latency-bound in its sequential
    panel factorization — at N=512 nodes one factorization costs ~5 ms
    vs ~2 ms for a converged CG run. Preferred for LARGE warm-started
    incremental solves; cold/reoptimize solves keep the factorization.
    """
    Hf = _dense_H(eq, g, damping)
    Minv = geom.inv_sym3(
        eq.diag + damping * jnp.eye(3, dtype=eq.diag.dtype)
    )  # (N, 3, 3) block-Jacobi

    def precond(v):
        return jnp.einsum("nab,nb->na", Minv, v.reshape(-1, 3)).reshape(-1)

    b = eq.rhs.reshape(-1)
    b2 = jnp.sum(b * b)
    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)

    def cond(carry):
        _, r, _, _, it = carry
        return (it < iters) & (jnp.sum(r * r) > rel_tol * rel_tol * b2)

    def body(carry):
        x, r, p, rz, it = carry
        Ap = Hf @ p
        denom = jnp.sum(p * Ap)
        alpha = jnp.where(denom > 1e-20, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(rz > 1e-20, rz_new / rz, 0.0)
        p = z + beta * p
        return (x, r, p, rz_new, it + 1)

    x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x, r, p, rz, jnp.zeros((), jnp.int32))
    )
    return x.reshape(-1, 3)


def _cg_solve(
    eq: _NormalEq,
    g: FactorGraph,
    damping: jnp.ndarray,
    iters: int,
) -> jnp.ndarray:
    """Block-Jacobi preconditioned CG on the block-sparse normal equations.

    O(E) per matvec; this is also the single-chip form of the distributed
    solver (parallel/ shards the same matvec over a mesh).
    """
    eye = jnp.eye(3, dtype=eq.diag.dtype)
    diag_d = eq.diag + damping * eye[None]
    eqd = _NormalEq(diag_d, eq.off, eq.rhs)
    Minv = geom.inv_sym3(diag_d)  # block-Jacobi preconditioner

    def mv(v):
        return _matvec(eqd, g, v)

    def precond(v):
        return jnp.einsum("nab,nb->na", Minv, v)

    b = eq.rhs
    x = jnp.zeros_like(b)
    r = b - mv(x)
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = mv(p)
        denom = jnp.sum(p * Ap)
        alpha = jnp.where(denom > 1e-20, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(rz > 1e-20, rz_new / rz, 0.0)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None, length=iters)
    return x


# --------------------------------------------------------------------------
# LM driver
# --------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iterations",
        "method",
        "cg_iterations",
        "robust_delta",
        "gradient_tol",
        "terminate_on_reject",
        "rel_tol",
    ),
)
def solve(
    poses: jnp.ndarray,
    g: FactorGraph,
    node_mask: jnp.ndarray,
    *,
    max_iterations: int = 20,
    damping_init: float = 1e-4,
    method: str = "dense",
    cg_iterations: int = 64,
    robust_delta: float | None = None,
    gradient_tol: float = 0.0,
    terminate_on_reject: bool = False,
    rel_tol: float = 1e-6,
) -> tuple[jnp.ndarray, SolveStats]:
    """Levenberg-Marquardt over the pose graph.

    Replaces isam_->update + calculateEstimate (dpg_slam.cc:316-329) with a
    batch solve. While_loop with early termination; each iteration does ONE
    residual/Jacobian sweep (the assemble also yields the step's error) and
    one linear solve.

    Args:
      poses: (N, 3) initial estimates (capacity-sized; masked slots ignored).
      g: factor graph.
      node_mask: (N,) bool — live nodes.
      method: "dense" (XLA Cholesky), "dense_pallas" (the fused
        panel-blocked Pallas SPD kernel — factorization + both triangular
        solves VMEM-resident), "dense_cg" (dense-matvec PCG — cheaper
        than a factorization above ~256 nodes for warm-started solves),
        or "cg" (block-sparse gather/scatter PCG, O(E) memory).
      gradient_tol: skip/stop when the max-abs whitened gradient falls below
        this (0 disables). Makes re-solving an already-converged graph
        (a warm-started keyframe update with near-consistent new factors)
        nearly free.
      terminate_on_reject: stop on the first rejected step instead of
        retrying with raised damping. Correct for warm-started incremental
        solves (a rejection there means "already at the optimum"); keep
        False for cold solves where LM's damping retries do real work.

    Returns:
      (optimized poses, SolveStats).
    """
    eq0, err0 = _assemble(poses, g, node_mask, robust_delta)
    gnorm0 = jnp.max(jnp.abs(eq0.rhs))

    def cond(carry):
        _, _, _, _, gnorm, _, it, done = carry
        # INVARIANT: after an accepted step that is `done` (or at the last
        # iteration) eq/gnorm are deliberately left STALE (the step body
        # skips relinearization when the loop cannot continue). That is
        # safe only because `done`/`it` are tested BEFORE `gnorm` here and
        # nothing reads eq/gnorm after loop exit. If gnorm is ever
        # surfaced (e.g. in SolveStats) recompute it from the final
        # poses first.
        return (it < max_iterations) & ~done & (gnorm > gradient_tol)

    def step(carry):
        poses, damping, err, eq, gnorm, accepted, it, done = carry
        if method == "dense":
            delta = _dense_solve(eq, g, damping)
        elif method == "dense_pallas":
            delta = _dense_pallas_solve(eq, g, damping)
        elif method == "dense_cg":
            delta = _dense_cg_solve(eq, g, damping, cg_iterations)
        else:
            delta = _cg_solve(eq, g, damping, cg_iterations)
        new_poses = poses - delta
        new_poses = new_poses.at[:, 2].set(geom.wrap_angle(new_poses[:, 2]))
        # Accept/reject needs only the error — a residual sweep, not the
        # full Jacobian/normal-equation assembly (identical value: see
        # _assemble's error computation).
        new_err = total_error(new_poses, g, robust_delta)
        accept = new_err < err
        improvement = (err - new_err) / jnp.maximum(err, 1e-12)
        if terminate_on_reject:
            # Stop on tiny-accept OR reject — but give a FIRST-step
            # rejection one damping retry: it can mean the near-GN step
            # overshot in the nonlinear region (fresh large-residual loop
            # closure) rather than "already at the optimum". One retry
            # bounds the already-consistent warm case at two
            # factorizations instead of max_iterations.
            done = (improvement < rel_tol) & (accept | (accepted > 0) | (it >= 1))
        else:
            done = accept & (improvement < rel_tol)
        poses = jnp.where(accept, new_poses, poses)
        err = jnp.where(accept, new_err, err)
        # Re-linearize (Jacobians + normal equations) ONLY when the step
        # was accepted and the loop continues: a rejected step retries
        # from the SAME eq with raised damping, and a converged (done)
        # step never uses eq again. The dominant warm-keyframe path —
        # already-at-optimum, reject/reject — then pays residual sweeps
        # instead of full assemblies.
        def _relinearize(_):
            new_eq, _ = _assemble(new_poses, g, node_mask, robust_delta)
            return new_eq, jnp.max(jnp.abs(new_eq.rhs))

        eq, gnorm = jax.lax.cond(
            accept & ~done & (it + 1 < max_iterations),
            _relinearize, lambda _: (eq, gnorm), None,
        )
        damping = jnp.where(accept, damping * 0.5, damping * 4.0)
        damping = jnp.clip(damping, 1e-9, 1e6)
        return (poses, damping, err, eq, gnorm, accepted + accept.astype(jnp.int32), it + 1, done)

    init = (
        poses,
        jnp.asarray(damping_init, poses.dtype),
        err0,
        eq0,
        gnorm0,
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), bool),
    )
    poses, _, err, _, _, accepted, _, _ = jax.lax.while_loop(cond, step, init)
    return poses, SolveStats(initial_error=err0, final_error=err, iterations=accepted)


# --------------------------------------------------------------------------
# Natively-batched LM (the session-batched throughput mode's solver)
# --------------------------------------------------------------------------

def _dense_cg_fixed(
    eq: _NormalEq,
    g: FactorGraph,
    damping: jnp.ndarray,   # (...,) per-problem damping (broadcast over nodes)
    iters: int,
) -> jnp.ndarray:
    """Block-Jacobi preconditioned CG with a dense matvec, FIXED iteration
    count (lax.scan, no convergence test). Batched over arbitrary leading
    axes of eq/g/damping — the solver shape the lanes-batched LM wants:
    deterministic cost, no lock-step worst-lane effect, and every matvec
    is one batched (S, 3N, 3N) @ (S, 3N) contraction on the MXU.

    Warm-started incremental solves converge in a handful of iterations
    under the block-Jacobi preconditioner; callers pick `iters` (the
    batched mode exposes it as a tuning knob and pins lane ATE in its
    tests/bench)."""
    Hf = _dense_H_b(eq, g, damping)
    d = damping[..., None, None, None]
    Minv = geom.inv_sym3(
        eq.diag + d * jnp.eye(3, dtype=eq.diag.dtype)
    )

    def precond(v):  # v: (..., N, 3)
        return jnp.einsum("...nab,...nb->...na", Minv, v)

    b = eq.rhs
    N3 = b.shape[-2] * 3

    def mv(v):
        out = jnp.einsum(
            "...ij,...j->...i", Hf, v.reshape(v.shape[:-2] + (N3,))
        )
        return out.reshape(v.shape)

    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = jnp.sum(r * z, axis=(-2, -1))

    def body(carry, _):
        x, r, p, rz = carry
        Ap = mv(p)
        denom = jnp.sum(p * Ap, axis=(-2, -1))
        alpha = jnp.where(denom > 1e-20, rz / denom, 0.0)[..., None, None]
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z, axis=(-2, -1))
        beta = jnp.where(rz > 1e-20, rz_new / rz, 0.0)[..., None, None]
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None, length=iters)
    return x


def _dense_H_b(eq: _NormalEq, g: FactorGraph, damping: jnp.ndarray) -> jnp.ndarray:
    """_dense_H batched over leading axes (damping per problem)."""
    N = eq.diag.shape[-3]
    i_idx = g.edge_idx[..., 0]
    j_idx = g.edge_idx[..., 1]
    em = (
        (jnp.arange(g.edge_idx.shape[-2]) < g.num_edges[..., None])
        .astype(eq.diag.dtype)[..., None, None]
    )
    offm = em * eq.off
    ar = jnp.arange(N)
    oh_i = (i_idx[..., None, :] == ar[:, None]).astype(eq.diag.dtype)
    oh_j = (j_idx[..., None, :] == ar[:, None]).astype(eq.diag.dtype)
    d = damping[..., None, None, None]
    diagd = eq.diag + d * jnp.eye(3, dtype=eq.diag.dtype)
    H = (
        jnp.einsum("nm,...nab->...nmab", jnp.eye(N, dtype=eq.diag.dtype), diagd)
        + jnp.einsum("...ne,...eab,...me->...nmab", oh_i, offm, oh_j)
        + jnp.einsum("...ne,...eba,...me->...nmab", oh_j, offm, oh_i)
    )
    H = jnp.swapaxes(H, -3, -2)
    return H.reshape(H.shape[:-4] + (3 * N, 3 * N))


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iterations", "method", "cg_iterations", "robust_delta",
        "gradient_tol", "terminate_on_reject", "rel_tol",
    ),
)
def solve_batched(
    poses: jnp.ndarray,       # (S, N, 3)
    g: FactorGraph,           # leaves with leading (S,)
    node_mask: jnp.ndarray,   # (S, N)
    *,
    max_iterations: int = 5,
    damping_init: float = 1e-4,
    method: str = "cg_fixed",
    cg_iterations: int = 8,
    robust_delta: float | None = None,
    gradient_tol: float = 0.0,
    terminate_on_reject: bool = False,
    rel_tol: float = 1e-6,
) -> tuple[jnp.ndarray, SolveStats]:
    """LM over S independent pose graphs as ONE lane-batched program —
    the solver the session-batched throughput mode runs per keyframe.

    `jax.vmap(solve)` compiles to a LOCK-STEP while_loop (every lane
    iterates until the worst lane is done, and the relinearize `cond`
    executes both branches under vmap), measured at ~85% of a batched
    step at the per-keyframe cadence. This implementation restructures
    the same LM semantics into a statically-unrolled loop with per-lane
    accept/damping/done state, built on two cost moves:

    1.  ONE `_assemble` per iteration, double-duty: the relinearization
        of the candidate poses also yields their error, which IS the
        accept/reject test — no separate `total_error` sweep, no
        both-branch relinearize. A rejected lane keeps its previous
        (eq, err) via a cheap tree-select (assembling at unchanged poses
        would reproduce them identically).
    2.  A fixed-iteration batched-PCG linear solve (`cg_fixed`,
        deterministic cost, every op a wide (S, ...) contraction), or
        batched XLA Cholesky (`chol`) for exact engine-dense parity.

    Per-lane update rules (accept test, damping x0.5/x4, rel_tol done
    logic, terminate_on_reject's first-step retry, gradient_tol skip)
    replicate `solve`'s — a done lane's poses freeze exactly as if its
    while_loop had exited. Reference anchor: the per-keyframe
    isam_->update this scales out (dpg_slam.cc:316-329)."""
    eq, err = jax.vmap(lambda p, gg, m: _assemble(p, gg, m, robust_delta))(
        poses, g, node_mask
    )
    gnorm = jnp.max(jnp.abs(eq.rhs), axis=(-2, -1))          # (S,)
    S = poses.shape[0]
    damping = jnp.full((S,), damping_init, poses.dtype)
    done = gnorm <= gradient_tol if gradient_tol > 0.0 else jnp.zeros((S,), bool)
    accepted = jnp.zeros((S,), jnp.int32)
    err0 = err

    def tree_sel(mask, a, b):
        return jax.tree_util.tree_map(
            lambda x, y: jnp.where(
                mask.reshape(mask.shape + (1,) * (x.ndim - 1)), x, y
            ),
            a, b,
        )

    for it in range(max_iterations):
        if method == "chol":
            delta = jax.vmap(_dense_solve)(eq, g, damping)
        else:
            delta = _dense_cg_fixed(eq, g, damping, cg_iterations)
        cand = poses - delta
        cand = cand.at[..., 2].set(geom.wrap_angle(cand[..., 2]))
        # Relinearize-at-candidate = accept test + next iteration's eq.
        eq_c, err_c = jax.vmap(
            lambda p, gg, m: _assemble(p, gg, m, robust_delta)
        )(cand, g, node_mask)
        accept = (err_c < err) & ~done
        improvement = (err - err_c) / jnp.maximum(err, 1e-12)
        if terminate_on_reject:
            new_done = (improvement < rel_tol) & (
                accept | (accepted > 0) | (it >= 1)
            )
        else:
            new_done = accept & (improvement < rel_tol)
        poses = jnp.where(accept[:, None, None], cand, poses)
        err = jnp.where(accept, err_c, err)
        eq = tree_sel(accept, eq_c, eq)
        if gradient_tol > 0.0:
            gnorm_c = jnp.max(jnp.abs(eq_c.rhs), axis=(-2, -1))
            new_done = new_done | (accept & (gnorm_c <= gradient_tol))
        damping_next = jnp.where(accept, damping * 0.5, damping * 4.0)
        damping = jnp.where(done, damping, jnp.clip(damping_next, 1e-9, 1e6))
        accepted = accepted + (accept & ~done).astype(jnp.int32)
        done = done | new_done
    return poses, SolveStats(
        initial_error=err0, final_error=err, iterations=accepted
    )
