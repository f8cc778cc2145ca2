"""Distributed ICP and pose-graph solving over a device mesh.

Two parallelism strategies (SURVEY.md §2 'new first-class components'):

1. **Pair parallelism** (`sharded_icp_align`): the batched ICP kernel is
   embarrassingly parallel over the pair axis — shard it with a
   NamedSharding and let pjit place per-pair work on its shard's device.
   This replaces the reference's serial per-pair loops
   (dpg_slam.cc:275-304, :41-108) with mesh-wide batched execution.

2. **Distributed graph solve** (`distributed_solve`): edges (factors) are
   sharded across devices; node poses are replicated (a pose graph has
   ~3 floats/node — tiny next to its edges). Each CG matvec computes its
   local edge contributions and `psum`s over the mesh — the classic
   distributed normal-equations CG, expressed with shard_map so the
   collective rides ICI. Replaces GTSAM iSAM2 (dpg_slam.cc:316-329) at
   multi-chip scale; the single-chip path is graph/factor_graph.solve.

All functions are functional and jit-compatible; they accept a Mesh and
return ordinary arrays (replicated outputs).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from dpg_slam_tpu import geom
from dpg_slam_tpu.config import PoseGraphParams
from dpg_slam_tpu.graph import factor_graph as fg
from dpg_slam_tpu.ops import icp
from dpg_slam_tpu.parallel.mesh import PAIR_AXIS

__all__ = ["sharded_icp_align", "distributed_solve", "distributed_reoptimize"]


def sharded_icp_align(
    mesh: Mesh,
    src: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    init_guess: jnp.ndarray,
    params: PoseGraphParams,
    **kwargs,
) -> icp.ICPResult:
    """Batched ICP with the pair axis sharded across the mesh.

    The pair count must be divisible by the mesh size (pad with masked
    pairs otherwise). Outputs are fully replicated.
    """
    n = mesh.devices.size
    B = src.shape[0]
    if B % n != 0:
        raise ValueError(f"pair count {B} not divisible by mesh size {n}")
    shard = NamedSharding(mesh, P(PAIR_AXIS))
    rep = NamedSharding(mesh, P())

    src = jax.device_put(src, shard)
    src_mask = jax.device_put(src_mask, shard)
    tgt = jax.device_put(tgt, shard)
    tgt_mask = jax.device_put(tgt_mask, shard)
    init_guess = jax.device_put(init_guess, shard)
    if kwargs.get("tgt_normals") is not None:
        kwargs["tgt_normals"] = jax.device_put(kwargs["tgt_normals"], shard)
    if kwargs.get("gate_multiplier") is not None:
        kwargs["gate_multiplier"] = jax.device_put(kwargs["gate_multiplier"], shard)

    res = icp.icp_align(src, src_mask, tgt, tgt_mask, init_guess, params, **kwargs)
    return icp.ICPResult(*[jax.device_put(leaf, rep) for leaf in res])


# ---------------------------------------------------------------------------
# Distributed CG solve over sharded edges
# ---------------------------------------------------------------------------

def _local_normal_contrib(
    poses, edge_idx, edge_meas, edge_sqrt_info, edge_mask, robust_delta=None
):
    """Per-shard between-factor normal-equation pieces: (diag add, off
    blocks, rhs add) from the LOCAL edges only. With robust_delta set,
    factors are Huber-IRLS weighted (fg._assemble parity)."""
    g = fg.FactorGraph(
        prior_idx=jnp.zeros((1,), jnp.int32),
        prior_val=jnp.zeros((1, 3), jnp.float32),
        prior_sqrt_info=jnp.zeros((1, 3, 3), jnp.float32),
        num_priors=jnp.zeros((), jnp.int32),
        edge_idx=edge_idx,
        edge_meas=edge_meas,
        edge_sqrt_info=edge_sqrt_info,
        num_edges=jnp.sum(edge_mask).astype(jnp.int32),
    )
    # Local edges are pre-masked: use the mask directly instead of counts.
    er, Ji, Jj = fg._between_residual_jac(poses, g)
    em = edge_mask.astype(poses.dtype)
    if robust_delta is not None:
        em = em * jnp.sqrt(fg._huber_weight(er, robust_delta))
    Ji = Ji * em[:, None, None]
    Jj = Jj * em[:, None, None]
    er = er * em[:, None]

    N = poses.shape[0]
    diag = jnp.zeros((N, 3, 3), poses.dtype)
    rhs = jnp.zeros((N, 3), poses.dtype)
    i_idx = edge_idx[:, 0]
    j_idx = edge_idx[:, 1]
    diag = diag.at[i_idx].add(jnp.einsum("eba,ebc->eac", Ji, Ji))
    diag = diag.at[j_idx].add(jnp.einsum("eba,ebc->eac", Jj, Jj))
    off = jnp.einsum("eba,ebc->eac", Ji, Jj)
    rhs = rhs.at[i_idx].add(jnp.einsum("eba,eb->ea", Ji, er))
    rhs = rhs.at[j_idx].add(jnp.einsum("eba,eb->ea", Jj, er))
    err = 0.5 * jnp.sum(er * er)
    return diag, off, rhs, err


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "max_iterations", "cg_iterations", "robust_delta", "rel_tol",
    ),
)
def distributed_solve(
    mesh: Mesh,
    poses: jnp.ndarray,          # (N, 3) replicated
    node_mask: jnp.ndarray,      # (N,)
    prior_idx: jnp.ndarray,      # (Pr,) replicated (priors are few)
    prior_val: jnp.ndarray,      # (Pr, 3)
    prior_sqrt_info: jnp.ndarray,  # (Pr, 3, 3)
    prior_mask: jnp.ndarray,     # (Pr,)
    edge_idx: jnp.ndarray,       # (E, 2)  E divisible by mesh size
    edge_meas: jnp.ndarray,      # (E, 3)
    edge_sqrt_info: jnp.ndarray, # (E, 3, 3)
    edge_mask: jnp.ndarray,      # (E,)
    *,
    max_iterations: int = 15,
    cg_iterations: int = 48,
    damping: float = 1e-4,
    robust_delta: float | None = None,
    rel_tol: float = 0.0,
) -> jnp.ndarray:
    """Levenberg-Marquardt with distributed PCG: edges sharded over the
    mesh, poses replicated, per-iteration normal equations psum'd over ICI.

    Single-chip solver semantics parity (graph/factor_graph.solve):
    between-factors are Huber-IRLS weighted when ``robust_delta`` is set,
    steps are accepted/rejected against the robust total error (one extra
    psum'd scalar per iteration) with adaptive damping, and the loop stops
    early once an accepted step improves the error by less than
    ``rel_tol`` (0 = fixed iteration count). Every shard branches on the
    same psum'd scalars, so the mesh iterates in lockstep.

    Returns optimized poses (replicated).
    """
    n = mesh.devices.size
    E = edge_idx.shape[0]
    assert E % n == 0, f"edge capacity {E} must be divisible by mesh size {n}"

    def gn_body(poses_rep, edge_idx_l, edge_meas_l, edge_si_l, edge_mask_l):
        """Runs per-device under shard_map: edge_* are local shards."""

        def robust_edge_error_local(poses):
            """This shard's between-factor contribution to the robust
            total error (psum to get the global value)."""
            g = fg.FactorGraph(
                prior_idx=jnp.zeros((1,), jnp.int32),
                prior_val=jnp.zeros((1, 3), jnp.float32),
                prior_sqrt_info=jnp.zeros((1, 3, 3), jnp.float32),
                num_priors=jnp.zeros((), jnp.int32),
                edge_idx=edge_idx_l,
                edge_meas=edge_meas_l,
                edge_sqrt_info=edge_si_l,
                num_edges=jnp.sum(edge_mask_l).astype(jnp.int32),
            )
            er, _, _ = fg._between_residual_jac(poses, g)
            er = er * edge_mask_l.astype(poses.dtype)[:, None]
            if robust_delta is None:
                return 0.5 * jnp.sum(er * er)
            return fg._huber_loss(er, robust_delta)

        def prior_error(poses):
            """Prior contribution (replicated; NOT psum'd)."""
            pr, _ = fg._prior_residual_jac(
                poses,
                fg.FactorGraph(
                    prior_idx=prior_idx,
                    prior_val=prior_val,
                    prior_sqrt_info=prior_sqrt_info,
                    num_priors=jnp.sum(prior_mask).astype(jnp.int32),
                    edge_idx=jnp.zeros((1, 2), jnp.int32),
                    edge_meas=jnp.zeros((1, 3), jnp.float32),
                    edge_sqrt_info=jnp.zeros((1, 3, 3), jnp.float32),
                    num_edges=jnp.zeros((), jnp.int32),
                ),
            )
            pr = pr * prior_mask.astype(poses.dtype)[:, None]
            return 0.5 * jnp.sum(pr * pr)

        def robust_error(poses):
            return prior_error(poses) + jax.lax.psum(
                robust_edge_error_local(poses), PAIR_AXIS
            )

        def one_gn_step(poses, damping_c):
            diag_l, off_l, rhs_l, err_l = _local_normal_contrib(
                poses, edge_idx_l, edge_meas_l, edge_si_l, edge_mask_l,
                robust_delta=robust_delta,
            )
            # Priors are replicated; fold them in on every device but scale
            # by 1/n so the psum counts them once.
            pr, pJ = fg._prior_residual_jac(
                poses,
                fg.FactorGraph(
                    prior_idx=prior_idx,
                    prior_val=prior_val,
                    prior_sqrt_info=prior_sqrt_info,
                    num_priors=jnp.sum(prior_mask).astype(jnp.int32),
                    edge_idx=jnp.zeros((1, 2), jnp.int32),
                    edge_meas=jnp.zeros((1, 3), jnp.float32),
                    edge_sqrt_info=jnp.zeros((1, 3, 3), jnp.float32),
                    num_edges=jnp.zeros((), jnp.int32),
                ),
            )
            pm = prior_mask.astype(poses.dtype)
            pJ = pJ * pm[:, None, None]
            pr = pr * pm[:, None]
            inv_n = 1.0 / n
            diag_l = diag_l.at[prior_idx].add(
                inv_n * jnp.einsum("pba,pbc->pac", pJ, pJ)
            )
            rhs_l = rhs_l.at[prior_idx].add(
                inv_n * jnp.einsum("pba,pb->pa", pJ, pr)
            )

            # Consensus normal equations over the mesh (ICI psum).
            diag = jax.lax.psum(diag_l, PAIR_AXIS)
            rhs = jax.lax.psum(rhs_l, PAIR_AXIS)

            eye = jnp.eye(3, dtype=poses.dtype)
            diag = jnp.where(node_mask[:, None, None], diag, eye[None])
            rhs = jnp.where(node_mask[:, None], rhs, 0.0)
            diag = diag + damping_c * eye[None]
            Minv = geom.inv_sym3(diag)

            def matvec(v):
                out = jnp.einsum("nab,nb->na", diag, v)
                em = edge_mask_l.astype(v.dtype)[:, None]
                i_idx = edge_idx_l[:, 0]
                j_idx = edge_idx_l[:, 1]
                loc = jnp.zeros_like(v)
                loc = loc.at[i_idx].add(
                    em * jnp.einsum("eab,eb->ea", off_l, v[j_idx])
                )
                loc = loc.at[j_idx].add(
                    em * jnp.einsum("eba,eb->ea", off_l, v[i_idx])
                )
                return out + jax.lax.psum(loc, PAIR_AXIS)

            def precond(v):
                return jnp.einsum("nab,nb->na", Minv, v)

            x = jnp.zeros_like(rhs)
            r = rhs - matvec(x)
            z = precond(r)
            p = r * 0 + z
            rz = jnp.sum(r * z)

            def cg_body_fixed(carry, _):
                x, r, p, rz = carry
                Ap = matvec(p)
                denom = jnp.sum(p * Ap)
                alpha = jnp.where(denom > 1e-20, rz / denom, 0.0)
                x = x + alpha * p
                r = r - alpha * Ap
                z = precond(r)
                rz_new = jnp.sum(r * z)
                beta = jnp.where(rz > 1e-20, rz_new / rz, 0.0)
                p = z + beta * p
                return (x, r, p, rz_new), None

            (x, _, _, _), _ = jax.lax.scan(
                cg_body_fixed, (x, r, p, rz), None, length=cg_iterations
            )
            new_poses = poses - x
            new_poses = new_poses.at[:, 2].set(geom.wrap_angle(new_poses[:, 2]))
            return new_poses

        # LM driver (single-chip fg.solve parity): accept/reject against
        # the robust total error, adaptive damping, early stop. Branch
        # predicates are psum'd scalars — lockstep across the mesh.
        def cond(carry):
            _, _, _, it, done = carry
            return (it < max_iterations) & ~done

        def body(carry):
            poses, err, damping_c, it, done = carry
            cand = one_gn_step(poses, damping_c)
            cand_err = robust_error(cand)
            accept = cand_err < err
            improvement = (err - cand_err) / jnp.maximum(err, 1e-12)
            if rel_tol > 0.0:
                done = accept & (improvement < rel_tol)
            poses = jnp.where(accept, cand, poses)
            err = jnp.where(accept, cand_err, err)
            damping_c = jnp.clip(
                jnp.where(accept, damping_c * 0.5, damping_c * 4.0), 1e-9, 1e6
            )
            return poses, err, damping_c, it + 1, done

        poses_out, _, _, _, _ = jax.lax.while_loop(
            cond,
            body,
            (
                poses_rep,
                robust_error(poses_rep),
                jnp.asarray(damping, poses_rep.dtype),
                jnp.zeros((), jnp.int32),
                jnp.zeros((), bool),
            ),
        )
        return poses_out

    sharded = shard_map(
        gn_body,
        mesh=mesh,
        in_specs=(P(), P(PAIR_AXIS), P(PAIR_AXIS), P(PAIR_AXIS), P(PAIR_AXIS)),
        out_specs=P(),
    )
    return sharded(poses, edge_idx, edge_meas, edge_sqrt_info, edge_mask)


def distributed_reoptimize(
    mesh: Mesh, cfg, state, solver: str = "auto",
    pallas_elimination: bool = False,
):
    """Multi-chip pass-boundary reoptimize (the most expensive operation in
    the system — the reference's serial O(N^2) loop, dpg_slam.cc:35-120):

      1. the LIVE successive + loop-closure ICP pairs (host-compacted to
         ~25-30% of the flat N*(1+K) enumeration, exactly like the
         single-chip path, engine._reoptimize_compaction; padded to a
         mesh-divisible pair count), pair-axis sharded over the mesh
         (pure data parallelism, no communication per pair);
      2. factor rebuild on replicated arrays;
      3. distributed solve with work sharded over the mesh, carrying the
         single-chip solver's semantics (Huber IRLS via
         config.robust_delta, LM accept/reject, rel_tol stop). ``solver``:
         * "schur" — submap Schur elimination (parallel/schur.py) over a
           SPATIAL node partition (parallel/partition.py), ONE psum of the
           reduced separator system per GN iteration. The interior
           elimination defaults to XLA cho_factor/cho_solve — measured
           faster than the fused Pallas kernel at production sizes
           (BENCH_r03: ~23 vs ~30 ms at n=768; the unblocked kernel's
           3n sequential steps dominate). pallas_elimination=True routes
           it through ops/schur_pallas.py (interpreter on non-TPU).
         * "cg" — edge-sharded distributed PCG (one psum per CG matvec;
           communication-heavier but separator-free).
         * "auto" — Schur when every shard gets >= 4 interior node slots
           (N % mesh == 0 and N/mesh >= 4), else CG. If the separator set
           overflows its cap, falls back to CG and warns.

    Returns an updated SlamState (poses + rebuilt graph).
    """
    import logging

    import numpy as np

    from dpg_slam_tpu import engine as eng_mod

    pg = cfg.pose_graph
    n = mesh.devices.size
    N = state.poses.shape[0]
    K = pg.max_loop_closures_per_node

    pairs = eng_mod._reoptimize_pairs(cfg, state)
    flat_src, flat_tgt, flat_valid, seeds, flat_gate = pairs
    n_flat = flat_src.shape[0]

    # Host-side live-pair compaction (engine._reoptimize_valid_host): the
    # flat enumeration is ~70-75% dead padding, and the mesh would ICP all
    # of it. Compact to the live pairs (successive-first for kernel-block
    # early exit), padded to a kernel-block- AND mesh-divisible count.
    num_nodes, poses_h, pass_ids_h = (
        np.asarray(x)
        for x in jax.device_get((state.num_nodes, state.poses, state.pass_ids))
    )
    node_mask_h = np.arange(N) < int(num_nodes)
    valid_h = eng_mod._reoptimize_valid_host(cfg, poses_h, pass_ids_h, node_mask_h)
    live = np.nonzero(valid_h)[0]
    is_succ = (live % (1 + K)) == 0
    order = np.concatenate([live[is_succ], live[~is_succ]])
    # Kernel-block- AND mesh-divisible padding unit: lcm(64, n). Doubling
    # 64 would never terminate for mesh sizes with odd prime factors
    # (n=3, 6, ...).
    blk = 64 * n // math.gcd(64, n)
    B = max(blk, -(-len(order) // blk) * blk)
    compact_idx = np.zeros((B,), np.int32)
    compact_idx[: len(order)] = order
    compact_valid = np.zeros((B,), bool)
    compact_valid[: len(order)] = True
    logging.getLogger("dpg_slam_tpu.parallel").info(
        "distributed_reoptimize: compacted ICP sweep %d live pairs "
        "(padded %d) of %d flat slots", len(order), B, n_flat,
    )
    ci = jnp.asarray(compact_idx)
    cval = jnp.asarray(compact_valid) & flat_valid[ci]

    res_c = sharded_icp_align(
        mesh,
        state.cloud[flat_src[ci]],
        state.cloud_mask[flat_src[ci]] & cval[:, None],
        state.cloud[flat_tgt[ci]],
        state.cloud_mask[flat_tgt[ci]] & cval[:, None],
        seeds[ci],
        pg,
        tgt_normals=state.cloud_normals[flat_tgt[ci]],
        gate_multiplier=flat_gate[ci],
    )

    # Scatter compacted results back to flat order (engine._reoptimize
    # fallbacks: seed transform, not converged, parity covariance).
    scatter_to = jnp.where(cval, ci, n_flat)
    transforms = seeds.at[scatter_to].set(res_c.transform, mode="drop")
    converged = (
        jnp.zeros((n_flat,), bool).at[scatter_to].set(res_c.converged, mode="drop")
    )
    fallback_cov = jnp.broadcast_to(
        jnp.diag(
            jnp.asarray(
                [pg.laser_x_variance, pg.laser_y_variance, pg.laser_theta_variance],
                jnp.float32,
            )
        ),
        (n_flat, 3, 3),
    )
    covs = fallback_cov.at[scatter_to].set(res_c.covariance, mode="drop")

    graph, n_edge_cand = eng_mod._reoptimize_pack_graph(
        cfg, state, flat_src, flat_tgt, flat_valid,
        transforms, converged, covs,
    )
    E = graph.edge_idx.shape[0]
    if int(n_edge_cand) > E:
        raise RuntimeError(
            f"reoptimize produced {int(n_edge_cand)} factor candidates but "
            f"edge capacity is {E}; raise CapacityParams.max_edges"
        )

    use_schur = solver == "schur" or (
        solver == "auto" and N % n == 0 and N // n >= 4
    )
    if use_schur:
        from dpg_slam_tpu.parallel.partition import spatial_blocks
        from dpg_slam_tpu.parallel.schur import schur_solve

        assign = spatial_blocks(
            np.asarray(state.poses[:, :2]), np.asarray(state.node_mask), n
        )
        # Separator capacity: boundary crossings scale with shards x
        # traversals, not N — but small graphs have proportionally more
        # boundary, so small N gets the full-capacity (degenerate but
        # correct) reduced system and large N gets half.
        sep_cap = N if N <= 128 else max(128, -(-N // 2 // 8) * 8)
        poses, sep_count, _ = schur_solve(
            mesh,
            state.poses,
            state.node_mask,
            graph.prior_idx,
            graph.prior_val,
            graph.prior_sqrt_info,
            graph.prior_mask,
            graph.edge_idx,
            graph.edge_meas,
            graph.edge_sqrt_info,
            graph.edge_mask,
            jnp.asarray(assign),
            sep_cap=sep_cap,
            max_iterations=min(pg.gn_max_iterations, pg.gtsam_max_iterations),
            robust_delta=pg.robust_delta,
            rel_tol=pg.gn_tol,
            pallas_elimination=pallas_elimination,
            pallas_interpret=jax.default_backend() not in ("tpu", "axon"),
        )
        if int(sep_count) > sep_cap:
            logging.getLogger("dpg_slam_tpu.parallel").warning(
                "schur separator overflow (%d > cap %d); falling back to "
                "edge-sharded CG", int(sep_count), sep_cap,
            )
            use_schur = False
    if not use_schur:
        poses = distributed_solve(
            mesh,
            state.poses,
            state.node_mask,
            graph.prior_idx,
            graph.prior_val,
            graph.prior_sqrt_info,
            graph.prior_mask,
            graph.edge_idx,
            graph.edge_meas,
            graph.edge_sqrt_info,
            graph.edge_mask,
            max_iterations=min(pg.gn_max_iterations, pg.gtsam_max_iterations),
            robust_delta=pg.robust_delta,
            rel_tol=pg.gn_tol,
        )
    return state._replace(poses=poses, graph=graph)
