"""Typed configuration tree for the whole framework.

Replaces the reference's three-tier config (gflags + ROS param server +
hard-coded defaults, src/dpg_slam/parameters.h:14-558) with one frozen
dataclass tree. Every knob keeps the reference's name (modulo snake_case)
and default so an A/B parity run needs no translation table.

Reference default provenance (parameters.h):
  icp_maximum_iterations        :146   transformation epsilon      :159
  max correspondence dist       :173   ransac iterations           :191
  reciprocal correspondences    :201   loop-closure radii          :212,:224
  keyframe gates                :242,:254   pass prior sigmas      :264-274
  motion model coeffs           :279-309    laser extrinsics       :319-339
  laser variances               :374-396    icp downsample ratio   :402
  num sectors :44   pose chain len :57   change threshold :67
  coverage threshold :72   grid resolution :77   min active sectors :82
  submap radius :87   display fraction :22
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Any


@dataclasses.dataclass(frozen=True)
class ScanParams:
    """Fixed-shape scan geometry (replaces per-message fields of
    sensor_msgs/LaserScan consumed at dpg_slam_main.cc:172-185).

    The TPU design requires static shapes: one scan is a fixed
    ``(num_beams,)`` range vector; shorter scans are padded and masked.
    """

    num_beams: int = 1024
    angle_min: float = -2.35619449  # -3π/4, typical Hokuyo FOV
    angle_max: float = 2.35619449
    range_min: float = 0.02
    range_max: float = 10.0

    @property
    def angle_increment(self) -> float:
        # Matches reference: (angle_max - angle_min) / (n - 1), dpg_slam.cc:497.
        return (self.angle_max - self.angle_min) / (self.num_beams - 1.0)


@dataclasses.dataclass(frozen=True)
class PoseGraphParams:
    """Pose-graph frontend/backend tunables (parameters.h:105-407)."""

    # ICP (consumed at dpg_slam.cc:408-412)
    icp_maximum_iterations: int = 60
    # NOTE: reference default is 500 PCL iterations (parameters.h:146) but
    # with an odometry seed PCL converges in far fewer; we run a fixed
    # unrolled count with convergence masking. Parity mode can raise this.
    icp_maximum_transformation_epsilon: float = 5e-9
    icp_max_correspondence_distance: float = 0.6
    ransac_iterations: int = 50
    ransac_outlier_rejection_threshold: float = 0.05  # PCL default (meters)
    icp_use_ransac_rejection: bool = False
    # RANSAC correspondence rejection (icp.setRANSACIterations, dpg_slam.cc
    # :413): when icp_use_ransac_rejection is True, every ICP iteration
    # fits `ransac_iterations` candidate 2-point rigid models per pair and
    # drops correspondences that are outliers to the best one — batched
    # over all pairs and samples (ops.icp). Off by default: this
    # framework's overlap/fitness/seed-deviation acceptance gates + Huber
    # graph robustification subsume PCL's role for it on the benchmark
    # suites; the toggle exists for parity experiments and dynamic scenes.
    icp_use_reciprocal_correspondences: bool = True
    downsample_icp_points_ratio: int = 5  # keep 1 in 5 points (parameters.h:402)
    icp_point_to_line: bool = True        # TPU design: point-to-line ICP
    icp_max_points: int = 256             # padded per-cloud point budget after downsample
    use_pallas_icp: bool = False
    # True routes batched point-to-line ICP through the fused Pallas TPU
    # kernel (ops/icp_pallas.py); False uses the XLA array program. Both
    # produce the same results (tests/test_icp_pallas.py; real-chip
    # deviation recorded per round in BENCH_r*.json). The engine enables
    # it on TPU for the compacted reoptimize sweep; kernel generations on
    # that sweep (tools/kbench, KBENCH_r03.json): v1 ~100 us/block-iter,
    # v2 (fused passes) 16.8, v3 (target-major reduction layout) 2.3.
    icp_coarse_gate_multiplier: float = 3.0
    reoptimize_gate_multiplier: float = 1.0
    # Gate multiplier for REOPTIMIZE loop-closure pairs. Unlike online
    # closures (seeded through accumulated odometry drift), reoptimize
    # seeds come from already-optimized poses, so the coarse-to-fine
    # annealing is unnecessary: 1.0 uses the fine gate from iteration 0
    # and lets converged pairs exit early (~2x reoptimize wall-clock).
    # Raise toward icp_coarse_gate_multiplier for badly-drifted sessions.
    # Coarse-to-fine correspondence gating: iterations start with
    # multiplier * icp_max_correspondence_distance and anneal to 1x over
    # the first 2/3 of iterations, letting ICP recover from seed errors
    # larger than the fine gate (drifted loop-closure seeds). 1.0 disables.
    icp_anneal_iters: int | None = 10
    # Coarse-to-fine gate annealing length in ITERATIONS (None = the
    # legacy 2/3 * max_iterations rule). Annealing HOLDS drifted-seed
    # closure pairs active through the schedule (a coarse-gate optimum is
    # not convergence), so its length is a floor on every closure pair's
    # iteration count — at the 2/3 rule that was 20 of 30 iterations even
    # for instantly-converging pairs, dominating the online frontend's
    # kernel time. 10 iterations anneal the 3x coarse gate to fine in
    # ~0.2-gate steps, preserving the drift-recovery mechanism (suite ATE
    # unchanged; tests) at half the held iterations.
    icp_error_delta_rel_tol: float = 3e-3
    # Additional convergence exit: a pair also freezes when its fitness
    # (mean squared correspondence distance) improved by less than this
    # RELATIVE amount over one iteration. PCL's own exit is the step
    # epsilon alone (parameters.h:159), but at 5e-9 it pins pairs that
    # oscillate at sub-0.1mm steps with long-stalled error: measured on
    # the reoptimize sweep, 25% of kernel blocks sat at the iteration cap
    # (KBENCH_r03 conclusion) while their transforms had stopped
    # improving. At 3e-3 the sweep's block-iteration total drops 27.7%
    # with ZERO acceptance-flag changes and <= 3.1e-3 m transform motion
    # on accepted pairs (KBENCH_r04; rejected junk pairs move more but
    # are dropped by the acceptance gates either way). 0.0 disables
    # (strict PCL-parity exit test).
    icp_min_overlap: float = 0.5
    # Acceptance gate: fraction of valid source points that found a gated,
    # (reciprocal) correspondence. Low-overlap pairs (distant nodes seeing
    # mostly different geometry) produce biased ICP optima; the reference's
    # 5.0 m within-pass closure radius generates many such pairs and PCL
    # accepts them — a documented robustness deviation.

    # Loop closure search (dpg_slam.cc:278-281)
    maximum_node_dist_within_pass_scan_comparison: float = 5.0
    maximum_node_dist_across_passes_scan_comparison: float = 2.0
    max_loop_closures_per_node: int = 8   # TPU design: fixed candidate budget
    min_loop_closure_node_gap: int = 10
    closure_consistency_transl: float = 0.2
    closure_consistency_rot: float = 0.15
    # Pairwise closure voting: each accepted closure implies a correction
    # of the new node's pose; correct closures agree on it (within these
    # tolerances), perceptual-aliasing ones disagree. Only the plurality
    # group is kept. Set transl to None to disable.
    # Same-pass closures only against nodes at least this many keyframes
    # back. The reference closes against every node j < i-1 in radius
    # (dpg_slam.cc:275), so chain-adjacent pairs get redundant "closures"
    # that carry full perceptual-aliasing risk and no new information.
    # Cross-pass candidates are exempt (any gap).

    # Keyframe gating (dpg_slam.cc:577-589)
    min_dist_between_nodes: float = 1.0
    min_angle_between_nodes: float = math.pi / 6.0

    # Per-pass origin prior sigmas (dpg_slam.cc:178-183)
    new_pass_x_std_dev: float = 0.2
    new_pass_y_std_dev: float = 0.2
    new_pass_theta_std_dev: float = 0.15

    # Motion model (dpg_slam.cc:227-231)
    motion_model_transl_error_from_transl: float = 0.4
    motion_model_transl_error_from_rot: float = 0.4
    motion_model_rot_error_from_transl: float = 0.4
    motion_model_rot_error_from_rot: float = 0.4

    # Laser extrinsics: pose of laser in base_link (parameters.h:319-339)
    laser_x_in_bl_frame: float = 0.2
    laser_y_in_bl_frame: float = 0.0
    laser_orientation_rel_bl_frame: float = 0.0

    # Constraint toggles (parameters.h:349-364)
    non_successive_scan_constraints: bool = True
    odometry_constraints: bool = True

    # Observation (ICP) covariance. The reference's Censi-style Hessian
    # computation is dead code and a fixed diagonal is returned
    # (cov_func_point_to_point.h:560-575). We implement the real
    # closed-form covariance but keep the fixed mode for A/B parity.
    laser_x_variance: float = 0.5
    laser_y_variance: float = 0.5
    laser_theta_variance: float = 0.3
    use_fixed_icp_covariance: bool = False
    # False (default) = closed-form GN/Censi covariance from the final ICP
    # normal system — the BASELINE.json north-star behavior. It makes
    # partially-overlapping loop closures self-downweight along their
    # unconstrained (wall-sliding) directions. True = reference parity:
    # the constant diagonal the reference actually returns
    # (cov_func_point_to_point.h:572-575).
    icp_sensor_noise_std: float = 0.02  # per-point noise for the GN covariance
    icp_covariance_mode: str = "gn"
    # Live-covariance flavor when use_fixed_icp_covariance is False:
    #   "gn"    — 2 sigma^2 H^-1 from the final ICP normal system.
    #   "censi" — the full closed-form sandwich H^-1 (d2J/dZdX) Sigma_z
    #             (d2J/dZdX)^T H^-1 the reference's icp_cov builds and
    #             discards (cov_func_point_to_point.h:307-530); see
    #             ops.icp.censi_covariance. Differs from "gn" when the
    #             correspondence geometry is anisotropic / residuals big.
    icp_cov_floor_transl: float = 0.0
    icp_cov_floor_rot: float = 0.0
    # Optional additive covariance floor on the GN/Censi estimate —
    # accounts for correspondence bias (sampling aliasing, normal error)
    # the per-point noise model cannot express. Off by default: it helps
    # ATE under heavy odometry noise with sparse clouds (~0.05 measured
    # best) but shifts cross-pass registration enough to perturb
    # change-detection layers, which are precision-critical.

    # Solver (replaces GTSAM iSAM2, dpg_slam.cc:316-329)
    gtsam_max_iterations: int = 100
    # The reference's GTSAM optimizer iteration cap (parameters.h:235);
    # applied as an upper bound on gn_max_iterations for the full
    # (reoptimize) solve so parity configs lower it the same way.
    gn_max_iterations: int = 20   # full solves (reoptimize)
    incremental_gn_iterations: int = 5
    # Per-keyframe solves are warm-started from the previous optimum, so a
    # few LM steps reach convergence (measured: same final error as 20) —
    # the batch-solve answer to iSAM2's single incremental update.
    gn_damping_init: float = 1e-4
    incremental_cg_iterations: int = 64
    # CG budget for the warm-started per-keyframe solves on the matvec
    # paths ("dense_cg"/"cg"). The session-batched throughput mode is
    # latency-bound on this chain (each CG iteration is ~8 small
    # lane-shared ops); warm solves converge far earlier than 64, so the
    # batched bench config trims it.
    gn_tol: float = 1e-5
    # LM relative-improvement stop for the full (reoptimize) solve,
    # forwarded as graph.solve's rel_tol. 1e-5 matches the reference's own
    # optimizer setting (relativeErrorTol = 1e-5, dpg_slam_main.cc:261 —
    # also GTSAM's NonlinearOptimizerParams default); the earlier 1e-6
    # default was 10x stricter than the system being matched and bought
    # LM tail iterations with no measurable ATE effect.
    gn_gradient_tol: float = 1e-4
    # Skip/stop the LM loop when the max-abs whitened gradient is below
    # this: re-solving an already-consistent graph (common in warm-started
    # keyframe updates) costs one residual sweep instead of a factorization.
    robust_delta: float | None = 2.0
    # Huber threshold on whitened between-factor residuals (None = pure
    # quadratic, the reference/GTSAM behavior). Wrong-basin loop closures
    # then contribute linearly instead of dragging the trajectory.


@dataclasses.dataclass(frozen=True)
class DpgParams:
    """Dynamic-pose-graph tunables (parameters.h:33-88)."""

    num_sectors: int = 5
    current_pose_chain_len: int = 5
    num_bins_for_change_detection: int = 72
    # NOTE: the reference reads this rosparam with NO default and uses it
    # uninitialized (parameters.h:62, dpg_slam.cc:785). We pick 72 bins
    # (5 deg at 360 FOV) as a sane default.
    delta_change_threshold: float = 0.20
    min_changed_bins_for_commit: int = 2
    # Commit a chain node's changes when EITHER the changed-bin ratio
    # clears delta_change_threshold (reference intent, dpg_slam.cc:823-827)
    # OR at least this many distinct bins changed. The ratio alone demands
    # objects subtending >=20% of the FOV; a real box at a few meters spans
    # only a few bins. (The reference's own gate is doubly broken: the bin
    # count is read uninitialized and the ratio uses integer division —
    # SURVEY.md §3.6.4-5 — so there is no working behavior to mirror.)
    current_pose_graph_coverage_threshold: float = 1.0
    occ_grid_resolution: float = 0.05
    minimum_percent_active_sectors: float = 0.5
    distance_threshold_for_local_submap_nodes: float = 5.0
    # TPU design knobs (dense windowed grids replace hash maps):
    grid_extent_cells: int = 1024         # (H, W) of the change-detection window
    max_submap_nodes: int = 32            # M prior-pass nodes in the submap
    submap_coverage_growth: bool = False
    # Submap contributor selection mode. False (default): the M nearest
    # in-radius prior-pass nodes. True: the reference's coverage-driven
    # accumulation (getSubMapCoveringCurrPoseChain, dpg_slam.cc:622-701)
    # — contributors are greedily added in order of marginal chain-cell
    # coverage gain until current_pose_graph_coverage_threshold is met,
    # bounded by max_submap_nodes. Selection scores coverage on a
    # coarsened grid (coverage_coarse_factor) over a candidate pool of
    # the max_submap_candidates nearest nodes; the chosen contributors
    # are then rasterized at full resolution for change detection. The
    # cap-hit warning (engine) fires in either mode.
    max_submap_candidates: int = 64
    coverage_coarse_factor: int = 8
    local_registration: bool = True
    local_reg_max_points: int = 2048
    # Before diffing grids, re-register each chain scan against the
    # submap's point cloud with a scan-to-map ICP and use the refined
    # poses for change detection only (never fed back into the graph).
    # Cell-level diffing at occ_grid_resolution is precision-critical:
    # residual cross-pass registration error of 1-2 cells is the dominant
    # false-change source.
    change_margin_cells: int = 2
    # Veto radius (cells) around mapped OCCUPIED structure inside which
    # points are never labeled ADDED/REMOVED — suppresses grazing-ray
    # carving and discretization false positives at walls.
    min_free_views: int = 2
    # Multi-view consistency: FREE evidence for a change must come from at
    # least this many independent grids (chain nodes for REMOVED, submap
    # contributors for ADDED) — one grazing ray through a wall is not
    # evidence the wall vanished.
    replicate_int_bin_ratio: bool = False
    # True reproduces reference bug dpg_slam.cc:823 (integer division makes
    # the bin-change ratio 0 until all bins changed — commits almost never).


@dataclasses.dataclass(frozen=True)
class VisualizationParams:
    """Map-export thinning (parameters.h:14-28)."""

    display_points_fraction: int = 10


@dataclasses.dataclass(frozen=True)
class CapacityParams:
    """Static array capacities — the TPU answer to dynamic graph growth.

    The reference grows std::vectors per node (dpg_slam.cc:194-195);
    under jit all shapes are static, so the engine preallocates these and
    tracks live counts as scalars. Exceeding a capacity raises on the host.
    """

    max_nodes: int = 512
    max_edges: int = 8192  # >= max_nodes * (2 + max_loop_closures_per_node)
    max_priors: int = 16   # one per pass (dpg_slam.cc:176-183)
    max_passes: int = 16  # increment_pass raises when exhausted


@dataclasses.dataclass(frozen=True)
class DpgConfig:
    """Root config."""

    scan: ScanParams = dataclasses.field(default_factory=ScanParams)
    pose_graph: PoseGraphParams = dataclasses.field(default_factory=PoseGraphParams)
    dpg: DpgParams = dataclasses.field(default_factory=DpgParams)
    viz: VisualizationParams = dataclasses.field(default_factory=VisualizationParams)
    capacity: CapacityParams = dataclasses.field(default_factory=CapacityParams)

    # --- serialization -------------------------------------------------
    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "DpgConfig":
        return cls(
            scan=ScanParams(**d.get("scan", {})),
            pose_graph=PoseGraphParams(**d.get("pose_graph", {})),
            dpg=DpgParams(**d.get("dpg", {})),
            viz=VisualizationParams(**d.get("viz", {})),
            capacity=CapacityParams(**d.get("capacity", {})),
        )

    @classmethod
    def from_json(cls, s: str) -> "DpgConfig":
        return cls.from_dict(json.loads(s))

    def replace(self, **kwargs) -> "DpgConfig":
        return dataclasses.replace(self, **kwargs)
