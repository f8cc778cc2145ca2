"""Distributed pose-graph solve by submap Schur-complement elimination.

The structural answer to the reference's O(N^2) growth in trajectory
length (SURVEY.md §5 'long-context' analog): partition the trajectory into
S contiguous submaps (one per device), eliminate each submap's INTERIOR
nodes locally with a dense Cholesky, reduce onto the small SEPARATOR
system (block boundaries + loop-closure endpoints), psum the reduced
system over the mesh, solve it replicated, and back-substitute interiors
locally. Per GN iteration the only communication is the psum of the
(3*SEP_CAP)^2 reduced system — separator poses are the boundary state
exchanged between devices, exactly the 'context parallelism over the
graph' design from SURVEY.md §7.

Factor routing (all arrays replicated — a pose graph's factors are tiny
next to the elimination): each factor is processed by exactly one shard:
  * edge with >=1 interior endpoint -> the shard owning that interior
    node (couples its interior with the separator set);
  * edge with both endpoints separators -> the shard owning endpoint i's
    block (contributes straight to the reduced system);
  * priors likewise.

Static shapes: S shards of C = N/S interior slots; SEP_CAP separator
capacity. `separator_count` is returned so callers can verify the cap
held (overflowing separators are dropped from the reduced system —
choose SEP_CAP generously: boundaries (2S) + 2x expected closures).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dpg_slam_tpu import geom
from dpg_slam_tpu.graph import factor_graph as fg
from dpg_slam_tpu.parallel.mesh import PAIR_AXIS

__all__ = ["schur_solve"]


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "sep_cap", "max_iterations", "damping", "robust_delta",
        "rel_tol", "pallas_elimination", "pallas_interpret",
    ),
)
def schur_solve(
    mesh: Mesh,
    poses: jnp.ndarray,           # (N, 3) replicated
    node_mask: jnp.ndarray,       # (N,)
    prior_idx: jnp.ndarray,       # (Pr,)
    prior_val: jnp.ndarray,       # (Pr, 3)
    prior_sqrt_info: jnp.ndarray, # (Pr, 3, 3)
    prior_mask: jnp.ndarray,      # (Pr,)
    edge_idx: jnp.ndarray,        # (E, 2)
    edge_meas: jnp.ndarray,       # (E, 3)
    edge_sqrt_info: jnp.ndarray,  # (E, 3, 3)
    edge_mask: jnp.ndarray,       # (E,)
    block_assign: jnp.ndarray | None = None,  # (N,) int32 node -> shard
    *,
    sep_cap: int = 64,
    max_iterations: int = 10,
    damping: float = 1e-4,
    robust_delta: float | None = None,
    rel_tol: float = 0.0,
    pallas_elimination: bool = False,
    pallas_interpret: bool = False,
):
    """Levenberg-Marquardt with per-iteration distributed Schur elimination.

    Semantics parity with the single-chip solver (graph/factor_graph.solve,
    the replacement for dpg_slam.cc:316-329): between-factors get Huber
    IRLS weighting when ``robust_delta`` is set (outlier closures — the
    exact case reoptimize exists for — contribute linearly instead of
    quadratically), steps are accepted/rejected against the robust total
    error with adaptive damping, and the loop stops early when an accepted
    step improves the error by less than ``rel_tol`` (0 keeps the fixed
    iteration count). The error bookkeeping is replicated arithmetic on
    already-psum'd quantities, so every shard takes identical branches.

    Args (beyond the factor arrays):
      block_assign: optional (N,) node->shard assignment. Default is the
        contiguous trajectory split (node i -> shard i // (N/S)); a SPATIAL
        assignment (co-located nodes from different passes/laps on one
        shard, see parallel.partition.spatial_blocks) keeps loop closures
        intra-shard, which is what bounds the separator set on multi-pass
        sessions. Each shard must be assigned at most N/S nodes (overflow
        slots are dropped from that GN iteration's update).
      robust_delta: Huber threshold on whitened between-factor residual
        norms (None = pure quadratic GN; reference optimizer behavior).
      rel_tol: relative-improvement convergence stop for accepted steps.
      pallas_elimination: run the per-shard interior elimination (Cholesky
        + triangular solves) as the fused Pallas kernel
        (ops/schur_pallas.py) instead of jax.scipy cho_factor/cho_solve.
      pallas_interpret: interpreter mode for the kernel (CPU tests).

    Returns (poses, separator_count, lm_iterations). N must be divisible
    by the mesh size.
    """
    S = mesh.devices.size
    N = poses.shape[0]
    assert N % S == 0, f"node capacity {N} must divide by mesh size {S}"
    C = N // S

    idx = jnp.arange(N)
    if block_assign is None:
        block = idx // C                               # (N,) owning shard
        int_rank = idx - block * C                     # slot within shard
        slot_map = idx.reshape(S, C)                   # shard, slot -> node
    else:
        block = block_assign.astype(jnp.int32)
        same = block[None, :] == block[:, None]        # (N, N)
        lower = jnp.tril(jnp.ones((N, N), bool), k=-1)
        int_rank = jnp.sum(same & lower, axis=1).astype(jnp.int32)
        slot_map = jnp.full((S, C + 1), N, jnp.int32)
        slot_map = slot_map.at[block, jnp.minimum(int_rank, C)].set(
            idx.astype(jnp.int32), mode="drop"
        )[:, :C]                                       # shard, slot -> node (N = empty)

    # --- separator classification (replicated): endpoints of cross-block
    # edges. Block-internal chains stay interior.
    ei = edge_idx[:, 0]
    ej = edge_idx[:, 1]
    cross = edge_mask & (block[ei] != block[ej])
    is_sep = jnp.zeros((N,), bool)
    is_sep = is_sep.at[jnp.where(cross, ei, N)].set(True, mode="drop")
    is_sep = is_sep.at[jnp.where(cross, ej, N)].set(True, mode="drop")
    is_sep = is_sep & node_mask

    sep_pos = jnp.cumsum(is_sep.astype(jnp.int32)) - 1  # (N,)
    sep_count = jnp.sum(is_sep).astype(jnp.int32)
    sep_ok = is_sep & (sep_pos < sep_cap)
    # node -> separator slot (sep_cap = invalid)
    sep_slot = jnp.where(sep_ok, sep_pos, sep_cap)

    # Factor routing (replicated decisions).
    int_i = edge_mask & ~is_sep[ei]
    int_j = edge_mask & ~is_sep[ej]
    edge_owner = jnp.where(
        int_i, block[ei], jnp.where(int_j, block[ej], block[ei])
    )
    prior_owner = block[prior_idx]

    three_c = 3 * (C + 1)     # +1 padding row for dropped scatters
    three_s = 3 * (sep_cap + 1)

    # Everything replicated that the per-shard body needs is passed as an
    # EXPLICIT shard_map argument (spec P()) — closure-capturing arrays
    # whose inputs carry concrete mesh shardings breaks the Manual mesh
    # context (e.g. when the caller device_put the factor arrays).
    ctx_in = dict(
        prior_idx=prior_idx, prior_val=prior_val,
        prior_sqrt_info=prior_sqrt_info, prior_mask=prior_mask,
        edge_idx=edge_idx, edge_meas=edge_meas,
        edge_sqrt_info=edge_sqrt_info, edge_mask=edge_mask,
        edge_owner=edge_owner, prior_owner=prior_owner,
        block=block, int_rank=int_rank, is_sep=is_sep,
        sep_slot=sep_slot, sep_ok=sep_ok, node_mask=node_mask,
        slot_map=slot_map,
    )

    def shard_fn(poses_rep, shard_ids, ctx):
        s = shard_ids[0]
        prior_idx = ctx["prior_idx"]
        prior_val = ctx["prior_val"]
        prior_sqrt_info = ctx["prior_sqrt_info"]
        prior_mask = ctx["prior_mask"]
        edge_idx = ctx["edge_idx"]
        edge_meas = ctx["edge_meas"]
        edge_sqrt_info = ctx["edge_sqrt_info"]
        edge_mask = ctx["edge_mask"]
        edge_owner = ctx["edge_owner"]
        prior_owner = ctx["prior_owner"]
        block = ctx["block"]
        int_rank = ctx["int_rank"]
        is_sep = ctx["is_sep"]
        sep_slot = ctx["sep_slot"]
        sep_ok = ctx["sep_ok"]
        node_mask = ctx["node_mask"]
        slot_map = ctx["slot_map"]
        ei = edge_idx[:, 0]
        ej = edge_idx[:, 1]

        g_all = fg.FactorGraph(
            prior_idx=prior_idx,
            prior_val=prior_val,
            prior_sqrt_info=prior_sqrt_info,
            num_priors=jnp.sum(prior_mask).astype(jnp.int32),
            edge_idx=edge_idx,
            edge_meas=edge_meas,
            edge_sqrt_info=edge_sqrt_info,
            num_edges=jnp.sum(edge_mask).astype(jnp.int32),
        )

        def robust_error(poses):
            """Total (robust) graph error — replicated residual-only sweep,
            identical on every shard (same bookkeeping as the single-chip
            fg.total_error)."""
            er, _, _ = fg._between_residual_jac(poses, g_all)
            pr, _ = fg._prior_residual_jac(poses, g_all)
            er = er * edge_mask.astype(poses.dtype)[:, None]
            pr = pr * prior_mask.astype(poses.dtype)[:, None]
            perr = 0.5 * jnp.sum(pr * pr)
            if robust_delta is None:
                return perr + 0.5 * jnp.sum(er * er)
            return perr + fg._huber_loss(er, robust_delta)

        def gn_step(poses, damping):
            # --- residuals/Jacobians for ALL factors (cheap, replicated).
            er, Ji, Jj = fg._between_residual_jac(poses, g_all)
            pr, pJ = fg._prior_residual_jac(poses, g_all)

            # Robust total error at the linearization point (replicated;
            # masked slots zeroed exactly like fg._assemble).
            er_m = er * edge_mask.astype(poses.dtype)[:, None]
            pr_m = pr * prior_mask.astype(poses.dtype)[:, None]
            perr = 0.5 * jnp.sum(pr_m * pr_m)
            if robust_delta is None:
                err_lin = perr + 0.5 * jnp.sum(er_m * er_m)
            else:
                err_lin = perr + fg._huber_loss(er_m, robust_delta)

            mine_e = (edge_owner == s) & edge_mask
            mine_p = (prior_owner == s) & prior_mask
            em = mine_e.astype(poses.dtype)
            if robust_delta is not None:
                # Huber IRLS (single-chip fg._assemble parity): scale each
                # between-factor's residual/Jacobians by sqrt(weight) so
                # the normal equations realize the robust loss. Weights
                # come from the FULL whitened residual (owner-independent,
                # so every shard agrees on each factor's weight).
                em = em * jnp.sqrt(fg._huber_weight(er, robust_delta))
            pm = mine_p.astype(poses.dtype)
            Ji = Ji * em[:, None, None]
            Jj = Jj * em[:, None, None]
            er = er * em[:, None]
            pJ = pJ * pm[:, None, None]
            pr = pr * pm[:, None]

            # --- local slot maps: interior slot (0..C-1) within this shard.
            def int_slot(n):
                ok = (
                    (block[n] == s)
                    & ~is_sep[n]
                    & node_mask[n]
                    & (int_rank[n] < C)
                )
                return jnp.where(ok, int_rank[n], C)

            li, lj = int_slot(ei), int_slot(ej)
            si_, sj_ = sep_slot[ei], sep_slot[ej]
            lp = int_slot(prior_idx)
            sp = sep_slot[prior_idx]

            A_ii = jnp.zeros((C + 1, C + 1, 3, 3), poses.dtype)
            A_is = jnp.zeros((C + 1, sep_cap + 1, 3, 3), poses.dtype)
            A_ss = jnp.zeros((sep_cap + 1, sep_cap + 1, 3, 3), poses.dtype)
            b_i = jnp.zeros((C + 1, 3), poses.dtype)
            b_s = jnp.zeros((sep_cap + 1, 3), poses.dtype)

            def add_blocks(A_ii, A_is, A_ss, b_i, b_s, Ja, Jb, r, a_int, a_sep, b_int, b_sep):
                """Accumulate J_a^T J_b products for one factor's two
                endpoints (a, b), each either interior (slot) or separator."""
                Hab = jnp.einsum("eba,ebc->eac", Ja, Jb)
                Haa = jnp.einsum("eba,ebc->eac", Ja, Ja)
                Hbb = jnp.einsum("eba,ebc->eac", Jb, Jb)
                ga = jnp.einsum("eba,eb->ea", Ja, r)
                gb = jnp.einsum("eba,eb->ea", Jb, r)
                # a-a
                A_ii = A_ii.at[a_int, a_int].add(Haa, mode="drop")
                A_ss = A_ss.at[a_sep, a_sep].add(Haa, mode="drop")
                # b-b
                A_ii = A_ii.at[b_int, b_int].add(Hbb, mode="drop")
                A_ss = A_ss.at[b_sep, b_sep].add(Hbb, mode="drop")
                # a-b coupling: interior-interior, interior-sep, sep-sep
                A_ii = A_ii.at[a_int, b_int].add(Hab, mode="drop")
                A_ii = A_ii.at[b_int, a_int].add(
                    jnp.swapaxes(Hab, -1, -2), mode="drop"
                )
                A_is = A_is.at[a_int, b_sep].add(Hab, mode="drop")
                A_is = A_is.at[b_int, a_sep].add(
                    jnp.swapaxes(Hab, -1, -2), mode="drop"
                )
                A_ss = A_ss.at[a_sep, b_sep].add(Hab, mode="drop")
                A_ss = A_ss.at[b_sep, a_sep].add(
                    jnp.swapaxes(Hab, -1, -2), mode="drop"
                )
                b_i = b_i.at[a_int].add(ga, mode="drop")
                b_s = b_s.at[a_sep].add(ga, mode="drop")
                b_i = b_i.at[b_int].add(gb, mode="drop")
                b_s = b_s.at[b_sep].add(gb, mode="drop")
                return A_ii, A_is, A_ss, b_i, b_s

            # The slot arrays use capacity indices as invalid markers; an
            # endpoint is EITHER interior or separator, so exactly one of
            # the two scatters lands.
            A_ii, A_is, A_ss, b_i, b_s = add_blocks(
                A_ii, A_is, A_ss, b_i, b_s, Ji, Jj, er, li, si_, lj, sj_
            )
            pz = jnp.full_like(lp, C)      # priors touch a single endpoint:
            pzs = jnp.full_like(sp, sep_cap)  # route the other to padding
            A_ii, A_is, A_ss, b_i, b_s = add_blocks(
                A_ii, A_is, A_ss, b_i, b_s, pJ, jnp.zeros_like(pJ), pr,
                lp, sp, pz, pzs,
            )

            # Drop padding rows/cols, flatten to matrices.
            Hii = A_ii[:C, :C].transpose(0, 2, 1, 3).reshape(3 * C, 3 * C)
            His = A_is[:C, :sep_cap].transpose(0, 2, 1, 3).reshape(3 * C, 3 * sep_cap)
            Hss = A_ss[:sep_cap, :sep_cap].transpose(0, 2, 1, 3).reshape(
                3 * sep_cap, 3 * sep_cap
            )
            gi = b_i[:C].reshape(3 * C)
            gs = b_s[:sep_cap].reshape(3 * sep_cap)

            # Inactive interior slots -> identity rows (zero update).
            my_nodes = jnp.minimum(slot_map[s], N - 1)        # (C,)
            my_valid = slot_map[s] < N
            int_valid = jnp.repeat(
                my_valid & node_mask[my_nodes] & ~is_sep[my_nodes], 3
            )
            Hii = jnp.where(
                int_valid[:, None] & int_valid[None, :], Hii, 0.0
            )
            Hii = Hii + jnp.diag(jnp.where(int_valid, damping, 1.0))
            His = jnp.where(int_valid[:, None], His, 0.0)
            gi = jnp.where(int_valid, gi, 0.0)

            # --- local elimination (the Schur kernel when requested).
            if pallas_elimination:
                from dpg_slam_tpu.ops.schur_pallas import spd_solve_pallas

                rhs = jnp.concatenate([His, gi[:, None]], axis=1)
                sol = spd_solve_pallas(Hii, rhs, interpret=pallas_interpret)
                W = sol[:, :-1]                               # Hii^-1 His
                u = sol[:, -1]                                # Hii^-1 gi
            else:
                L, low = jax.scipy.linalg.cho_factor(Hii)
                W = jax.scipy.linalg.cho_solve((L, low), His)
                u = jax.scipy.linalg.cho_solve((L, low), gi)
            S_contrib = Hss - His.T @ W
            g_contrib = gs - His.T @ u

            # --- reduced separator system over the mesh (ICI psum).
            S_red = jax.lax.psum(S_contrib, PAIR_AXIS)
            g_red = jax.lax.psum(g_contrib, PAIR_AXIS)

            sep_valid = jnp.zeros((sep_cap,), bool)
            sep_valid = sep_valid.at[jnp.where(sep_ok, sep_slot, sep_cap)].set(
                True, mode="drop"
            )
            sv = jnp.repeat(sep_valid, 3)
            S_red = jnp.where(sv[:, None] & sv[None, :], S_red, 0.0)
            S_red = S_red + jnp.diag(jnp.where(sv, damping, 1.0))
            g_red = jnp.where(sv, g_red, 0.0)

            Ls, lows = jax.scipy.linalg.cho_factor(S_red)
            d_sep = jax.scipy.linalg.cho_solve((Ls, lows), g_red)  # (3*sep_cap,)

            # --- back-substitution of this shard's interiors.
            d_int = u - W @ d_sep                                  # (3C,)

            # --- assemble the global update: each shard contributes its
            # interior deltas; every shard holds the identical separator
            # delta (post-psum), so scale by 1/S and let the psum sum it
            # back to exactly one copy.
            local = jnp.zeros((N, 3), poses.dtype)
            local = local.at[jnp.where(my_valid, my_nodes, N)].set(
                jnp.where(
                    (my_valid & node_mask[my_nodes] & ~is_sep[my_nodes])[:, None],
                    d_int.reshape(C, 3),
                    0.0,
                ),
                mode="drop",
            )
            sep_delta = d_sep.reshape(sep_cap, 3)
            sep_part = (
                jnp.where(
                    sep_ok[:, None],
                    sep_delta[jnp.minimum(sep_slot, sep_cap - 1)],
                    0.0,
                )
                / S
            )
            delta = jax.lax.psum(local + sep_part, PAIR_AXIS)

            new_poses = poses - delta
            new_poses = new_poses.at[:, 2].set(geom.wrap_angle(new_poses[:, 2]))
            return new_poses, err_lin

        # LM driver: accept/reject against the robust total error with
        # adaptive damping, early stop on small accepted improvement.
        # All branch predicates derive from replicated (psum'd) scalars,
        # so every shard iterates in lockstep.
        def cond(carry):
            _, _, it, done = carry
            return (it < max_iterations) & ~done

        def body(carry):
            poses, damping_c, it, done = carry
            cand, err_lin = gn_step(poses, damping_c)
            cand_err = robust_error(cand)
            accept = cand_err < err_lin
            improvement = (err_lin - cand_err) / jnp.maximum(err_lin, 1e-12)
            if rel_tol > 0.0:
                done = accept & (improvement < rel_tol)
            poses = jnp.where(accept, cand, poses)
            damping_c = jnp.clip(
                jnp.where(accept, damping_c * 0.5, damping_c * 4.0), 1e-9, 1e6
            )
            return poses, damping_c, it + 1, done

        poses_out, _, iters, _ = jax.lax.while_loop(
            cond,
            body,
            (
                poses_rep,
                jnp.asarray(damping, poses_rep.dtype),
                jnp.zeros((), jnp.int32),
                jnp.zeros((), bool),
            ),
        )
        return poses_out, iters

    shard_ids = jnp.arange(S, dtype=jnp.int32)
    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(PAIR_AXIS), P()),
        out_specs=(P(), P()),
    )
    poses_out, iters = sharded(poses, shard_ids, ctx_in)
    return poses_out, sep_count, iters
