"""dpg_slam_tpu — a TPU-native dynamic pose-graph SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
DPG-SLAM reference (BharathMasetty/DPG-SLAM): 2D lidar scan-to-scan ICP
with closed-form covariance, loop-closure candidate matching, Gauss-Newton/
Levenberg-Marquardt pose-graph optimization, and multi-pass dynamic-map
change detection (added/removed point labeling, sector/node deactivation)
— all as fixed-shape, batched array programs that compile onto TPU.

Layer map (mirrors reference layers, re-designed TPU-first):
  geom       — SE(2) math        (ref: src/dpg_slam/math_utils.{h,cc})
  scan       — scan data model   (ref: src/dpg_slam/dpg_measurement.h, dpg_node.*)
  config     — typed config tree (ref: src/dpg_slam/parameters.h)
  ops.icp    — batched ICP + covariance (ref: PCL ICP + src/icp_cov/)
  graph      — factor-graph GN/LM solver (ref: GTSAM iSAM2 usage in dpg_slam.cc)
  dpg        — occupancy grids + change detection (ref: dpg_slam.cc:591-1082)
  engine     — online SLAM session driver (ref: DpgSLAM class, dpg_slam.cc)
  parallel   — device-mesh sharded solvers (new; no reference analog)
  io         — dataset loading / synthetic worlds (ref: src/runner/)
"""

import jax as _jax

# Geometry needs real f32 matmuls. TPU's default matmul precision rounds
# inputs to bf16, which corrupts ICP correspondence distances and the
# normal-equation solves enough to diverge multi-pass registration
# (measured: office two-pass ATE 5.5 m vs 0.10 m at f32; CPU reference
# 0.10 m). The hot matmuls here are tiny, so full precision costs ~nothing.
# Respect an explicit user setting, and announce the change once: this
# mutates process-global JAX state, which can alter numerics/perf of
# co-resident JAX code.
if _jax.config.jax_default_matmul_precision is None:
    import logging as _logging

    _jax.config.update("jax_default_matmul_precision", "highest")
    _logging.getLogger("dpg_slam_tpu").info(
        "dpg_slam_tpu: set jax_default_matmul_precision='highest' "
        "process-wide (required for ICP/solver numerics; set it "
        "explicitly before importing dpg_slam_tpu to override)"
    )

from dpg_slam_tpu.config import (
    DpgConfig,
    DpgParams,
    PoseGraphParams,
    ScanParams,
    VisualizationParams,
)
from dpg_slam_tpu import geom, scan

__version__ = "0.1.0"

__all__ = [
    "DpgConfig",
    "DpgParams",
    "PoseGraphParams",
    "ScanParams",
    "VisualizationParams",
    "geom",
    "scan",
]
