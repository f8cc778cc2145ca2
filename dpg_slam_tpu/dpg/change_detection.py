"""DPG change detection — executeDPG as one jitted array program.

Replaces the reference pipeline (dpg_slam.cc:865-911 and callees):

  computeLocalSubMap (cc:591-620)
    -> per-chain-node occupancy grids + greedy submap cover (cc:622-701)
  detectAndLabelChangesForCurrentPoseChain (cc:714-743)
    -> cell diffs: node OCCUPIED vs submap FREE => ADDED candidates,
       node FREE vs submap OCCUPIED => REMOVED candidates (cc:745-780)
    -> angular-bin score gate per chain node (cc:782-830)
  updateNodesAndSectorStatus (cc:888-911)
    -> sector deactivation via DpgNode::deactivateIntersectingSectors
       (dpg_node.cc:28-96), node deactivation below min active fraction
  getActiveAndDynamicMapPoints (cc:832-863) -> map_layers()

TPU-first design: all of the above operates on dense world-anchored grid
windows (ops/raster.py) and fixed-shape (C, B) / (M, B) point masks —
no hash maps, no per-point objects, one jitted program per DPG step.

Documented deviations from the reference (SURVEY.md §3.6):
  * NOT_YET_LABELED points rasterize like STATIC ones. The reference
    excludes them (dpg_slam.cc:983-984), which makes change detection a
    no-op on fresh, never-labeled nodes — clearly unintended (their TODO
    at dpg_slam.cc:192 asks whether to pre-label first-pass points STATIC).
  * The submap is the union (max-combine) of ALL active prior-pass nodes
    within the proximity radius, capped at the M nearest, instead of the
    reference's greedy cover loop (cc:646-695) — the greedy loop with
    coverage threshold 1.0 nearly always exhausts the same set, serially.
  * Bin-score ratio uses real division; the reference's integer division
    (cc:823) makes its 0.2 threshold unreachable (commit requires every
    bin changed). `replicate_int_bin_ratio=True` restores that behavior.
  * Removed-point labels go to the node that OWNS the point; the reference
    indexes nodes by point id (cc:739), a crash/corruption bug.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dpg_slam_tpu import geom, scan
from dpg_slam_tpu.config import DpgConfig
from dpg_slam_tpu.ops import raster

__all__ = ["execute_dpg", "map_layers", "DpgStepInfo"]


def _dilate_occupied(grid: jnp.ndarray, margin: int) -> jnp.ndarray:
    """(..., H, W) int8 grid -> bool mask of cells within `margin` cells of
    an OCCUPIED cell (max-pool dilation). Used as a change-detection veto:
    a point adjacent to mapped structure is a discretization/noise artifact
    of that structure, not an appeared/vanished object."""
    occ = (grid == raster.OCCUPIED).astype(jnp.int8)
    if margin <= 0:
        return occ.astype(bool)
    k = 2 * margin + 1
    batched = occ.ndim == 3
    x = occ if batched else occ[None]
    # Separable max-pool: two 1-D passes (2k taps) instead of one k*k
    # window. Both passes run along the SUBLANE axis with a transpose in
    # between — a lane-axis reduce_window measured 5x the sublane one
    # (2.0 vs 0.4 ms at 7 grids x 1024^2), and the transposes are plain
    # bandwidth.
    def pool_rows(t):
        return jax.lax.reduce_window(
            t, np.int8(0), jax.lax.max,
            window_dimensions=(1, k, 1), window_strides=(1, 1, 1),
            padding="SAME",
        )

    out = pool_rows(x)
    out = jnp.swapaxes(pool_rows(jnp.swapaxes(out, 1, 2)), 1, 2)
    return (out if batched else out[0]).astype(bool)


def _coverage_growth_select(
    cfg: DpgConfig,
    state,
    contrib_ok: jnp.ndarray,
    score: jnp.ndarray,
    chain_lidar: jnp.ndarray,
    chain_pts_map: jnp.ndarray,
    chain_ranges: jnp.ndarray,
    chain_occ: jnp.ndarray,
    chain_incl: jnp.ndarray,
    origin: jnp.ndarray,
):
    """Coverage-driven submap contributor selection — the reference's
    getSubMapCoveringCurrPoseChain semantics (dpg_slam.cc:622-701):
    accumulate contributors until chain-cell coverage reaches
    current_pose_graph_coverage_threshold, bounded by max_submap_nodes.

    The reference walks candidates serially, re-rasterizing and
    re-measuring coverage after each addition; here the candidate pool
    (max_submap_candidates nearest in-radius nodes) is rasterized ONCE
    on a coarsened grid (coverage_coarse_factor) and a fixed-length
    greedy max-cover loop picks, each step, the candidate with the
    largest marginal chain-coverage gain — stopping (by picking nothing)
    once the threshold is met. Unlike M-nearest, a redundant cluster of
    close nodes cannot crowd complementary farther ones out of the
    submap.

    Returns (contrib_idx (M,), contrib_valid (M,)).
    """
    dpg = cfg.dpg
    M = dpg.max_submap_nodes
    P_pool = max(dpg.max_submap_candidates, M)
    f = dpg.coverage_coarse_factor
    extent = dpg.grid_extent_cells
    res = dpg.occ_grid_resolution
    c_extent = max(1, extent // f)
    c_res = res * f
    c_march = max(1, int(round(cfg.scan.range_max / res)) // f)

    _, pool_idx = jax.lax.top_k(-score, P_pool)                # (P_pool,)
    pool_valid = jnp.take(contrib_ok, pool_idx)

    # Chain coverage target on the coarse grid (selection only; the info
    # coverage diagnostic stays full-resolution).
    chain_grids_c = raster.rasterize_scans(
        chain_lidar, chain_pts_map, chain_ranges, chain_occ, chain_incl,
        origin, c_extent, c_res, c_march,
    )
    chain_known_c = jnp.max(chain_grids_c, axis=0) > raster.UNKNOWN
    total = jnp.maximum(jnp.sum(chain_known_c), 1)

    pool_poses = state.poses[pool_idx]
    pool_lidar = _lidar_poses(cfg, pool_poses)
    pool_ranges = state.ranges[pool_idx]
    pool_pts = geom.apply(
        pool_lidar[:, None, :], scan.points_in_laser_frame(pool_ranges, cfg.scan)
    )
    pool_incl, pool_occ = _beam_select(
        cfg, state.labels[pool_idx], state.sector_active[pool_idx]
    )
    pool_incl = pool_incl & pool_valid[:, None]
    pool_occ = pool_occ & pool_valid[:, None]
    pool_grids_c = raster.rasterize_scans(
        pool_lidar, pool_pts, pool_ranges, pool_occ, pool_incl,
        origin, c_extent, c_res, c_march,
    )                                                          # (P_pool, h, w)
    pool_known = (pool_grids_c > raster.UNKNOWN) & chain_known_c[None]

    threshold = dpg.current_pose_graph_coverage_threshold

    def body(i, carry):
        covered, picked, sel = carry
        gains = jnp.sum(pool_known & ~covered[None], axis=(1, 2))
        gains = jnp.where(pool_valid & ~picked, gains, -1)
        best = jnp.argmax(gains)
        cov_now = jnp.sum(covered) / total
        take = (gains[best] > 0) & (cov_now < threshold)
        picked = picked.at[best].set(picked[best] | take)
        covered = covered | (pool_known[best] & take)
        sel = sel.at[i].set(jnp.where(take, best, -1))
        return covered, picked, sel

    covered, _, sel = jax.lax.fori_loop(
        0, M, body,
        (
            jnp.zeros_like(chain_known_c),
            jnp.zeros((P_pool,), bool),
            jnp.full((M,), -1, jnp.int32),
        ),
    )
    contrib_idx = jnp.take(pool_idx, jnp.maximum(sel, 0))
    contrib_valid = sel >= 0
    return contrib_idx, contrib_valid


class DpgStepInfo(NamedTuple):
    """Diagnostics from one DPG step (observability; reference logs these
    via ROS_INFO at dpg_slam.cc:859-875)."""

    num_added: jnp.ndarray        # () int32 newly labeled ADDED points
    num_removed: jnp.ndarray      # () int32 newly labeled REMOVED points
    coverage: jnp.ndarray         # () float32 chain-cell coverage by submap
    num_contributors: jnp.ndarray # () int32 submap nodes used


def _lidar_poses(cfg: DpgConfig, poses: jnp.ndarray) -> jnp.ndarray:
    pg = cfg.pose_graph
    # np (not jnp): config constants must embed as HLO literals, not
    # lifted jaxpr consts (jax 0.9 drops lifted consts in some dispatch
    # paths after mixed-config cond/scan traces).
    laser = np.array(
        [pg.laser_x_in_bl_frame, pg.laser_y_in_bl_frame, pg.laser_orientation_rel_bl_frame],
        np.float32,
    )
    return geom.compose(poses, jnp.broadcast_to(jnp.asarray(laser), poses.shape))


# Fixed-capacity compaction of committed REMOVED points before the
# (nodes x points) sector punch-through (see execute_dpg step 6): the
# full M*B enumeration is ~97% invalid on real steps, and the punch
# block's (N, M*B) gather chain measured 90 ms-class on chip. Overflowing
# points (> cap committed in ONE step) are dropped that step; their
# sectors are re-punched on subsequent keyframes' DPG steps (labels
# persist), so the effect self-heals.
_PUNCH_MAX_POINTS = 1024


def _gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(G, B) table, (G, Q) int32 -> (G, Q) table[g, idx[g, q]], computed
    as TWO-LEVEL ONE-HOT einsums instead of take_along_axis: at these
    shapes XLA's TPU gather lowers to a kCustom serialized path measured
    at ~0.02M lookups/ms (the two beam-table gathers in _polar_free_at
    were 8.5 ms EACH — 17 of the DPG step's 23 ms, jax profiler trace);
    the factored one-hot contraction is a pair of small MXU/VPU einsums.
    Falls back to take_along_axis when B doesn't factor."""
    G, B = table.shape
    L = 32
    if B % L:
        return jnp.take_along_axis(table, idx, axis=1)
    H = B // L
    t2 = table.reshape(G, H, L)
    hi = idx // L
    lo = idx - hi * L
    oh_hi = (hi[..., None] == jnp.arange(H)).astype(table.dtype)   # (G,Q,H)
    oh_lo = (lo[..., None] == jnp.arange(L)).astype(table.dtype)   # (G,Q,L)
    tmp = jnp.einsum("gqh,ghl->gql", oh_hi, t2)
    return jnp.einsum("gql,gql->gq", oh_lo, tmp)


def _polar_free_at(
    cfg: DpgConfig,
    lidar_poses: jnp.ndarray,   # (G, 3) lidar pose per source scan
    ranges: jnp.ndarray,        # (G, B)
    beam_mask: jnp.ndarray,     # (G, B) beams that march free space
    points: jnp.ndarray,        # (Q, 2) map-frame query points
    slack: float,
) -> jnp.ndarray:
    """(G, Q) bool: query point lies inside scan g's marched free space.

    The POLAR form of the FREE-ray rasterization: a point is free when
    its bearing's nearest beam is selected and its range is short of that
    beam's return by `slack`. Replaces dense-grid FREE lookups — the ray
    march's G*B*S scatter (6.5M updates, 30+ ms serialized on chip) and
    the (G, H*W) warp gather (equally slow) — with (G, Q) arithmetic and
    a (G, Q) beam gather at query-point counts (~10^5, sub-ms).

    vs the marched grid: the march marks cells along each ray polyline,
    so a point read FREE exactly when a ray passed through its CELL. The
    equivalent test therefore evaluates at the point's CELL CENTER with
    BOTH conditions: along-track (range short of the beam's return by
    `slack`) and cross-track (the ray line passes within half a cell of
    the center). Without the cross-track gate the full wedge between
    beams reads free and oblique surfaces generate REMOVED false
    positives at every angular gap (measured: 23% box-localization
    precision vs the grid path's 60% on the test_dpg scenario);
    evaluating at the raw point instead of its cell center loses true
    positives the marched cell would have caught (48% vs 60%).
    """
    res = cfg.dpg.occ_grid_resolution
    points = jnp.round(points / res) * res  # cell centers (march semantics)
    rel = geom.inv_apply(lidar_poses[:, None, :], points[None, :, :])
    r = jnp.linalg.norm(rel, axis=-1)                        # (G, Q)
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    amin = cfg.scan.angle_min
    inc = cfg.scan.angle_increment
    B = ranges.shape[1]
    b = jnp.round((ang - amin) / inc).astype(jnp.int32)
    infov = (b >= 0) & (b <= B - 1)
    bc = jnp.clip(b, 0, B - 1)
    rg = _gather_rows(ranges, bc)
    mk = _gather_rows(beam_mask.astype(jnp.float32), bc) > 0.5
    # Cross-track: distance from the point to the beam's ray line.
    dphi = ang - (amin + bc.astype(ang.dtype) * inc)
    cross_ok = jnp.abs(dphi) * r <= 0.5 * res + 1e-6
    return infov & mk & cross_ok & (r <= rg - slack)


def _beam_select(cfg: DpgConfig, labels: jnp.ndarray, sector_active: jnp.ndarray):
    """Reference beam-inclusion rule (dpg_slam.cc:977-1008), include flags at
    their defaults (include_inactive=F, include_added=T, include_static=T;
    dpg_slam.h:52-53) and NOT_YET_LABELED treated as STATIC (see module
    docstring).

    Returns (included, occupied): beams that march free rays, and beams
    whose endpoint marks an OCCUPIED cell.
    """
    sec = scan.sector_ids(cfg.scan, cfg.dpg.num_sectors)
    beam_sector_active = jnp.take(sector_active, sec, axis=-1)  # (..., B)
    label_ok = (
        (labels == scan.MAX_RANGE)
        | (labels == scan.STATIC)
        | (labels == scan.NOT_YET_LABELED)
        | (labels == scan.ADDED)
        | (labels == scan.REMOVED)
    )
    included = beam_sector_active & label_ok
    occupied = included & (labels != scan.MAX_RANGE)
    return included, occupied


@functools.partial(jax.jit, static_argnames=("cfg",))
def execute_dpg(cfg: DpgConfig, state):
    """Run change detection for the current pose chain; returns updated
    SlamState (labels, sector_active, node_active) — executeDPG analog."""
    from dpg_slam_tpu.engine import SlamState  # cycle-free at call time

    assert isinstance(state, SlamState)
    dpg = cfg.dpg
    C = dpg.current_pose_chain_len
    M = dpg.max_submap_nodes
    extent = dpg.grid_extent_cells
    res = dpg.occ_grid_resolution
    B = cfg.scan.num_beams
    N = state.poses.shape[0]

    idx = jnp.arange(N)
    node_mask = state.node_mask

    # ---- 1. Current pose chain: last <=C nodes of the current pass
    # (computeLocalSubMap, dpg_slam.cc:594-603).
    chain_offsets = jnp.arange(C)
    chain_idx = state.num_nodes - 1 - chain_offsets            # (C,) newest first
    chain_valid = (chain_idx >= 0) & (
        jnp.take(state.pass_ids, jnp.maximum(chain_idx, 0)) == state.pass_number
    )
    chain_idx = jnp.maximum(chain_idx, 0)

    chain_poses = state.poses[chain_idx]                       # (C, 3)
    chain_lidar = _lidar_poses(cfg, chain_poses)
    chain_ranges = state.ranges[chain_idx]
    chain_labels = state.labels[chain_idx]
    chain_sector_act = state.sector_active[chain_idx]

    # Window anchored at the chain centroid.
    centroid = jnp.sum(
        jnp.where(chain_valid[:, None], chain_poses[:, 0:2], 0.0), axis=0
    ) / jnp.maximum(jnp.sum(chain_valid), 1)
    origin = centroid - 0.5 * extent * res

    pts_laser = scan.points_in_laser_frame(chain_ranges, cfg.scan)  # (C, B, 2)
    chain_pts_map = geom.apply(chain_lidar[:, None, :], pts_laser)

    chain_incl, chain_occ = _beam_select(cfg, chain_labels, chain_sector_act)
    chain_incl = chain_incl & chain_valid[:, None]
    chain_occ = chain_occ & chain_valid[:, None]
    # (chain grids are rasterized AFTER the local re-registration in 2b.)

    # ---- 2. Submap contributors: active nodes of PRIOR passes within the
    # proximity radius of any chain node (cc:646-668). Two selection
    # modes: M nearest (default), or the reference's coverage-driven
    # greedy accumulation (cc:622-701) under submap_coverage_growth.
    prior_pass = node_mask & (state.pass_ids != state.pass_number) & state.node_active
    d_chain = jnp.linalg.norm(
        state.poses[:, None, 0:2] - chain_poses[None, :, 0:2], axis=-1
    )                                                          # (N, C)
    d_chain = jnp.where(chain_valid[None, :], d_chain, jnp.inf)
    near = jnp.min(d_chain, axis=1) <= dpg.distance_threshold_for_local_submap_nodes
    contrib_ok = prior_pass & near
    score = jnp.where(contrib_ok, jnp.min(d_chain, axis=1), jnp.inf)
    if dpg.submap_coverage_growth:
        contrib_idx, contrib_valid = _coverage_growth_select(
            cfg, state, contrib_ok, score,
            chain_lidar, chain_pts_map, chain_ranges, chain_occ, chain_incl,
            origin,
        )
    else:
        _, contrib_idx = jax.lax.top_k(-score, M)              # (M,)
        contrib_valid = jnp.take(contrib_ok, contrib_idx)

    sub_poses = state.poses[contrib_idx]
    sub_lidar = _lidar_poses(cfg, sub_poses)
    sub_ranges = state.ranges[contrib_idx]
    sub_labels = state.labels[contrib_idx]
    sub_sector_act = state.sector_active[contrib_idx]

    sub_pts_map = geom.apply(
        sub_lidar[:, None, :], scan.points_in_laser_frame(sub_ranges, cfg.scan)
    )                                                          # (M, B, 2)
    sub_incl, sub_occ = _beam_select(cfg, sub_labels, sub_sector_act)
    sub_incl = sub_incl & contrib_valid[:, None]
    sub_occ = sub_occ & contrib_valid[:, None]

    # ---- 2b. Local cross-pass re-registration: align each chain scan to
    # the submap's occupied points and diff with the REFINED poses (graph
    # poses are untouched). Residual registration error of 1-2 grid cells
    # is the dominant false-change source.
    if dpg.local_registration:
        import dataclasses as _dc

        from dpg_slam_tpu.ops import icp as icp_mod

        # The refinement starts from the SOLVED pose and is accepted only
        # within 6 cells (below) — a 12-iteration budget converges it;
        # the full tracking budget (30) made this call the with-DPG
        # path's dominant cost (~24 of ~28 ms/keyframe, bench round 5).
        reg_pg = _dc.replace(
            cfg.pose_graph,
            icp_maximum_iterations=min(
                12, cfg.pose_graph.icp_maximum_iterations
            ),
        )
        T = dpg.local_reg_max_points
        flat_pts = sub_pts_map.reshape(M * B, 2)
        flat_ok = sub_occ.reshape(M * B)
        stride = max(1, (M * B) // T)
        tgt_pts = flat_pts[::stride][:T]
        tgt_ok = flat_ok[::stride][:T]
        pad_t = T - tgt_pts.shape[0]
        if pad_t:
            tgt_pts = jnp.concatenate([tgt_pts, jnp.zeros((pad_t, 2))], axis=0)
            tgt_ok = jnp.concatenate([tgt_ok, jnp.zeros((pad_t,), bool)], axis=0)

        reg = icp_mod.icp_align(
            state.cloud[chain_idx],
            state.cloud_mask[chain_idx] & chain_valid[:, None],
            jnp.broadcast_to(tgt_pts[None], (C, T, 2)),
            jnp.broadcast_to(tgt_ok[None], (C, T)),
            chain_poses,
            reg_pg,
            gate_multiplier=jnp.ones((C,), jnp.float32),
        )
        # Accept only small refinements — the pose should move by at most
        # a few grid cells; larger jumps mean the scan-to-map ICP latched
        # onto something else.
        shift = jnp.linalg.norm(reg.transform[:, 0:2] - chain_poses[:, 0:2], axis=-1)
        ok = reg.converged & (shift <= 6.0 * res)
        chain_poses = jnp.where(ok[:, None], reg.transform, chain_poses)
        chain_lidar = _lidar_poses(cfg, chain_poses)
        chain_pts_map = geom.apply(chain_lidar[:, None, :], pts_laser)

    # OCCUPIED structure keeps dense cell grids (endpoint-only scatter,
    # G*B ~ 32K updates — cheap); the FREE layer is never materialized:
    # every FREE lookup below is the polar point test (_polar_free_at).
    # The dense march (rasterize_scans) measured 72 ms/step at production
    # shapes — pure serialized-scatter cost — and remains only in the
    # visualization/snapshot paths.
    chain_occ_grids = raster.rasterize_endpoints(
        chain_pts_map, chain_occ, origin, extent, res
    )                                                          # (C, H, W)
    # ONE grid for the whole submap: per-contributor occupied grids are
    # never consumed individually, and materializing (M, extent^2) just
    # to max-combine was the step's single largest cost (bandwidth on
    # 33.5 MB x ~3 passes — measured 9 ms of the 23 ms step at M=32).
    submap_occ_grid = raster.rasterize_endpoints(
        sub_pts_map.reshape(1, M * B, 2),
        sub_occ.reshape(1, M * B),
        origin, extent, res,
    )[0]                                                       # (H, W)

    # Coverage diagnostic (getSubMapCoveringCurrPoseChain's threshold,
    # cc:690-699), point-sampled: fraction of the chain's included beam
    # endpoints whose position is KNOWN to the submap (inside a
    # contributor's observed wedge or on submap structure). The reference
    # computes this over grid cells; sampling at the chain's own
    # observation points preserves the warning's meaning without the
    # dense FREE layer.
    chain_pts_flat = chain_pts_map.reshape(C * B, 2)
    sub_known_at_chain = jnp.any(
        _polar_free_at(
            cfg, sub_lidar, sub_ranges, sub_incl, chain_pts_flat, -res
        ),
        axis=0,
    ).reshape(C, B)  # slack -res: "observed" reaches through the return
    chain_sampled = (chain_incl | chain_occ) & chain_valid[:, None]
    coverage = jnp.sum(chain_sampled & sub_known_at_chain) / jnp.maximum(
        jnp.sum(chain_sampled), 1
    )

    # ---- 3. Change candidates (detectAndLabelChangesForCurrentNode,
    # cc:745-780), per point instead of per cell:
    # ADDED: chain point lying in submap free space.
    chain_cells = raster.world_to_cell(chain_pts_map, origin, res)   # (C, B, 2)
    chain_inw = raster.in_window(chain_cells, extent)
    ccx = jnp.clip(chain_cells[..., 0], 0, extent - 1)
    ccy = jnp.clip(chain_cells[..., 1], 0, extent - 1)
    # Per-contributor free view of each chain point (polar), and the
    # combined submap verdict: free when some contributor saw through it
    # and NO contributor's structure occupies its cell (the max-combine
    # OCCUPIED-priority rule, cc:931-956).
    free_votes_m = _polar_free_at(
        cfg, sub_lidar, sub_ranges, sub_incl, chain_pts_flat, res
    )                                                                # (M, C*B)
    sub_free_votes = jnp.sum(free_votes_m, axis=0).reshape(C, B)
    sub_occ_at_chain = submap_occ_grid[ccx, ccy] == raster.OCCUPIED  # (C, B)
    # Margin veto: a chain point within `change_margin_cells` of submap
    # structure is a rasterization artifact of that structure (grazing-ray
    # carving through walls), not an appeared object.
    sub_occ_near = _dilate_occupied(submap_occ_grid, dpg.change_margin_cells)
    added_cand = (
        chain_occ
        & chain_inw
        & (sub_free_votes >= jnp.maximum(dpg.min_free_views, 1))
        & ~sub_occ_at_chain
        & ~sub_occ_near[ccx, ccy]
    )

    # REMOVED: submap point lying in a chain node's free space.
    sub_cells = raster.world_to_cell(sub_pts_map, origin, res)       # (M, B, 2)
    sub_inw = raster.in_window(sub_cells, extent)
    scx = jnp.clip(sub_cells[..., 0], 0, extent - 1)
    scy = jnp.clip(sub_cells[..., 1], 0, extent - 1)
    sub_pts_flat = sub_pts_map.reshape(M * B, 2)
    chain_free_at_sub = _polar_free_at(
        cfg, chain_lidar, chain_ranges, chain_incl, sub_pts_flat, res
    ).reshape(C, M, B)
    chain_occ_at_sub = (
        chain_occ_grids[:, scx, scy] == raster.OCCUPIED
    )                                                                # (C, M, B)
    chain_occ_near = _dilate_occupied(chain_occ_grids, dpg.change_margin_cells)
    occ_near_any = jnp.any(chain_occ_near[:, scx, scy], axis=0)      # (M, B)
    removed_cand = (
        sub_occ[None, :, :]
        & sub_inw[None, :, :]
        & chain_free_at_sub
        & ~chain_occ_at_sub
        & ~occ_near_any[None, :, :]
    )                                                                # (C, M, B)

    # Whole-object consistency: a genuinely removed object vanishes as a
    # connected cluster, while occlusion-boundary false positives sit at
    # the edge of structure that is still there. Veto candidates adjacent
    # to PERSISTENT submap occupancy (occupied cells that are themselves
    # not candidates).
    cand_any = jnp.any(removed_cand, axis=0)                         # (M, B)
    cand_cells = jnp.zeros((extent, extent), bool)
    cx = jnp.where(cand_any, scx, extent)
    cy = jnp.where(cand_any, scy, extent)
    cand_cells = cand_cells.at[cx, cy].set(True, mode="drop")
    persistent = (submap_occ_grid == raster.OCCUPIED) & ~cand_cells
    persistent_near = _dilate_occupied(
        jnp.where(persistent, raster.OCCUPIED, raster.UNKNOWN),
        dpg.change_margin_cells,
    )
    removed_cand = removed_cand & ~persistent_near[scx, scy][None, :, :]

    # ---- 4. Angular-bin commit gate per chain node
    # (computeBinScoreAndCommitLabelsForNode, cc:782-830): changed points,
    # binned by bearing in the chain node's lidar frame; commit that node's
    # changes if enough distinct bins changed.
    n_bins = dpg.num_bins_for_change_detection
    amin, amax = cfg.scan.angle_min, cfg.scan.angle_max
    bin_w = (amax - amin) / n_bins

    def bins_for(points_map_flat, valid_flat, lidar_pose):
        rel = geom.inv_apply(lidar_pose, points_map_flat)
        ang = jnp.arctan2(rel[..., 1], rel[..., 0])
        ok = valid_flat & (ang >= amin) & (ang <= amax)
        b = jnp.clip(((ang - amin) / bin_w).astype(jnp.int32), 0, n_bins - 1)
        hist = jnp.zeros((n_bins,), bool).at[jnp.where(ok, b, n_bins)].set(
            True, mode="drop"
        )
        return hist

    def chain_node_bins(c):
        own = bins_for(chain_pts_map[c], added_cand[c], chain_lidar[c])
        rem = bins_for(
            sub_pts_map.reshape(M * B, 2),
            removed_cand[c].reshape(M * B),
            chain_lidar[c],
        )
        return own | rem

    changed_bins = jax.vmap(chain_node_bins)(jnp.arange(C))          # (C, n_bins)
    changed_counts = jnp.sum(changed_bins, axis=1)
    if dpg.replicate_int_bin_ratio:
        # Reference bug cc:823: size_t division — ratio is 0 until ALL bins
        # changed, so the 0.2 threshold means "every bin".
        ratio = (changed_counts // n_bins).astype(jnp.float32)
    else:
        ratio = changed_counts.astype(jnp.float32) / n_bins
    has_changes = (
        jnp.any(added_cand, axis=1) | jnp.any(removed_cand.reshape(C, -1), axis=1)
    )
    commit = (
        chain_valid
        & has_changes
        & (
            (ratio >= dpg.delta_change_threshold)
            | (changed_counts >= dpg.min_changed_bins_for_commit)
        )
    )

    # ---- 5. Commit labels.
    added_commit = added_cand & commit[:, None]                      # (C, B)
    removed_commit = jnp.any(
        removed_cand & commit[:, None, None], axis=0
    )                                                                # (M, B)

    labels = state.labels
    # ADDED on chain nodes' own points (setPointLabel respects MAX_RANGE,
    # dpg_measurement.h:55-59 — guaranteed since added_cand ⊆ occupied).
    chain_rows = jnp.broadcast_to(chain_idx[:, None], (C, B))
    labels = labels.at[
        jnp.where(added_commit, chain_rows, N), jnp.arange(B)[None, :]
    ].set(scan.ADDED, mode="drop")
    # REMOVED on the owning submap nodes' points (reference bug cc:739 fixed).
    sub_rows = jnp.broadcast_to(contrib_idx[:, None], (M, B))
    labels = labels.at[
        jnp.where(removed_commit, sub_rows, N), jnp.arange(B)[None, :]
    ].set(scan.REMOVED, mode="drop")

    # Labeling a point REMOVED also deactivates its sector in its own node
    # (Measurement::setPointLabel, dpg_measurement.h:174-179).
    sec = scan.sector_ids(cfg.scan, dpg.num_sectors)                 # (B,)
    sector_active = state.sector_active
    sec_b = jnp.broadcast_to(sec[None, :], (M, B))
    sector_active = sector_active.at[
        jnp.where(removed_commit, sub_rows, N), sec_b
    ].set(False, mode="drop")

    # ---- 6. Sector/node deactivation against removed points in the FOV
    # (updateNodesAndSectorStatus cc:888-911 + deactivateIntersectingSectors
    # dpg_node.cc:28-96), vectorized over (past nodes x removed points).
    # COMPACTED first: committed REMOVED points are sparse (usually zero,
    # at most an object's worth), while the flat M*B enumeration made the
    # (N, M*B) gather chain below the step's co-dominant cost (90 ms
    # class, tools/profile_dpg). top_k keeps up to _PUNCH_MAX_POINTS
    # committed points; overflow drops are re-punched next step.
    removed_pts = sub_pts_map                                        # (M, B, 2)
    rvalid_full = removed_commit.reshape(M * B)
    R_cap = min(_PUNCH_MAX_POINTS, M * B)
    _, top_idx = jax.lax.top_k(rvalid_full.astype(jnp.int32), R_cap)
    rflat = removed_pts.reshape(M * B, 2)[top_idx]
    rvalid = rvalid_full[top_idx]

    past_nodes = node_mask & (state.pass_ids != state.pass_number)
    all_lidar = _lidar_poses(cfg, state.poses)                       # (N, 3)
    rel = geom.inv_apply(all_lidar[:, None, :], rflat[None, :, :])   # (N, R, 2)
    rr = jnp.linalg.norm(rel, axis=-1)
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    in_fov = (
        rvalid[None, :]
        & past_nodes[:, None]
        & (rr <= cfg.scan.range_max)
        & (ang >= amin)
        & (ang <= amax)
    )
    sector_size = (amax - amin) / dpg.num_sectors
    psec = jnp.clip(((ang - amin) / sector_size).astype(jnp.int32), 0, dpg.num_sectors - 1)
    # FOV range at the point's bearing: conservative min of the two
    # neighboring beams (dpg_node.cc:77-84).
    approx = (ang - amin) / cfg.scan.angle_increment
    i0 = jnp.clip(jnp.floor(approx).astype(jnp.int32), 0, B - 1)
    i1 = jnp.minimum(i0 + 1, B - 1)
    r0 = _gather_rows(state.ranges, i0)
    r1 = _gather_rows(state.ranges, i1)
    fov_range = jnp.minimum(r0, r1)                                  # (N, R)
    # Require clear punch-through: the removed point must be closer than
    # the node's own return by a real margin, not a noise-level tie
    # (dpg_node.cc:88 uses a bare >, which deactivates on equality jitter).
    punch = in_fov & (fov_range > rr + 2.0 * dpg.occ_grid_resolution)
    node_rows = jnp.broadcast_to(idx[:, None], punch.shape)
    sector_active = sector_active.at[
        jnp.where(punch, node_rows, N), psec
    ].set(False, mode="drop")

    # Node deactivation below the active-sector floor (dpg_node.cc:93-95).
    frac_active = jnp.mean(sector_active.astype(jnp.float32), axis=1)
    node_active = state.node_active & jnp.where(
        past_nodes, frac_active >= dpg.minimum_percent_active_sectors, True
    )

    info = DpgStepInfo(
        num_added=jnp.sum(added_commit).astype(jnp.int32),
        num_removed=jnp.sum(removed_commit).astype(jnp.int32),
        coverage=coverage.astype(jnp.float32),
        num_contributors=jnp.sum(contrib_valid).astype(jnp.int32),
    )
    new_state = state._replace(
        labels=labels, sector_active=sector_active, node_active=node_active
    )
    return new_state, info


@functools.partial(jax.jit, static_argnames=("cfg", "extent", "include_inactive"))
def occupancy_snapshot(
    cfg: DpgConfig,
    state,
    center: jnp.ndarray,
    extent: int = 512,
    include_inactive: bool = False,
):
    """Dense occupancy grid of the whole session around `center` — the
    toOccGridMsg analog (dpg_slam.cc:1031-1057): UNKNOWN=0, FREE=1,
    OCCUPIED=2 int8 window plus its world origin.

    Args:
      center: (2,) world position of the window center.
      include_inactive: rasterize deactivated nodes/sectors too (the
        occupancyGrid include_inactive flag, dpg_slam.h:87-97).

    Returns (grid (extent, extent) int8, origin (2,)).
    """
    from dpg_slam_tpu.engine import SlamState

    assert isinstance(state, SlamState)
    res = cfg.dpg.occ_grid_resolution
    origin = center - 0.5 * extent * res
    N = state.poses.shape[0]
    march_steps = int(round(cfg.scan.range_max / res))

    lidar = _lidar_poses(cfg, state.poses)
    pts_map = geom.apply(
        lidar[:, None, :], scan.points_in_laser_frame(state.ranges, cfg.scan)
    )
    if include_inactive:
        sector_act = jnp.ones_like(state.sector_active)
        node_ok = state.node_mask
    else:
        sector_act = state.sector_active
        node_ok = state.node_mask & state.node_active
    incl, occ = _beam_select(cfg, state.labels, sector_act)
    incl = incl & node_ok[:, None]
    occ = occ & node_ok[:, None]

    grids = raster.rasterize_scans(
        lidar, pts_map, state.ranges, occ, incl, origin, extent, res, march_steps
    )
    return jnp.max(grids, axis=0), origin


@functools.partial(jax.jit, static_argnames=("cfg",))
def map_layers(cfg: DpgConfig, state):
    """The four DPG map layers (getActiveAndDynamicMapPoints, cc:832-863).

    Returns dict of (points (N*B, 2), mask (N*B,)) pairs in map frame:
      active_static:  STATIC points of active nodes + active sectors
      active_added:   ADDED points of active nodes + active sectors
      dynamic_added:  ADDED points of all nodes
      dynamic_removed: REMOVED points of all nodes
    NOT_YET_LABELED points are treated as STATIC for the active map (see
    execute_dpg docstring deviation note).
    """
    from dpg_slam_tpu.engine import SlamState

    assert isinstance(state, SlamState)
    N = state.poses.shape[0]
    lidar = _lidar_poses(cfg, state.poses)
    pts_map = geom.apply(
        lidar[:, None, :], scan.points_in_laser_frame(state.ranges, cfg.scan)
    )                                                          # (N, B, 2)
    labels = state.labels
    node_mask = state.node_mask[:, None]

    sec = scan.sector_ids(cfg.scan, cfg.dpg.num_sectors)
    sector_ok = jnp.take_along_axis(
        state.sector_active, jnp.broadcast_to(sec[None, :], labels.shape), axis=1
    )
    active_ok = node_mask & state.node_active[:, None] & sector_ok

    is_static = (labels == scan.STATIC) | (labels == scan.NOT_YET_LABELED)
    is_added = labels == scan.ADDED
    is_removed = labels == scan.REMOVED

    flat = pts_map.reshape(-1, 2)
    return {
        "active_static": (flat, (active_ok & is_static).reshape(-1)),
        "active_added": (flat, (active_ok & is_added).reshape(-1)),
        "dynamic_added": (flat, (node_mask & is_added).reshape(-1)),
        "dynamic_removed": (flat, (node_mask & is_removed).reshape(-1)),
    }
