"""Scan measurement model — fixed-shape arrays replacing per-point objects.

The reference stores each scan as a vector of heap MeasurementPoint objects
with per-point label + sector (src/dpg_slam/dpg_measurement.h:26-127) and
caches a PCL cloud per node (src/dpg_slam/dpg_node.cc:8-26). Here a scan is
a ``(num_beams,)`` float32 range vector; labels are an int8 vector; sector
membership and cartesian coordinates are derived, vectorized, and batchable
over ``(N, num_beams)`` node stacks. No objects, no caches — XLA fuses the
polar→cartesian math into consumers.

Point labels use the reference enum values (dpg_measurement.h:21):
  STATIC=0, ADDED=1, REMOVED=2, NOT_YET_LABELED=3, MAX_RANGE=4
"""

from __future__ import annotations

import jax.numpy as jnp

from dpg_slam_tpu import geom
from dpg_slam_tpu.config import ScanParams

# Reference enum PointLabel (dpg_measurement.h:21) — same numbering.
STATIC = 0
ADDED = 1
REMOVED = 2
NOT_YET_LABELED = 3
MAX_RANGE = 4

__all__ = [
    "STATIC",
    "ADDED",
    "REMOVED",
    "NOT_YET_LABELED",
    "MAX_RANGE",
    "beam_angles",
    "initial_labels",
    "sector_ids",
    "valid_mask",
    "points_in_laser_frame",
    "points_in_base_link",
    "downsample",
]


def beam_angles(params: ScanParams) -> jnp.ndarray:
    """(num_beams,) beam angles: angle_min + i * angle_increment
    (matches dpg_slam.cc:497,506)."""
    i = jnp.arange(params.num_beams, dtype=jnp.float32)
    return params.angle_min + i * params.angle_increment


def initial_labels(ranges: jnp.ndarray, params: ScanParams) -> jnp.ndarray:
    """Per-point initial labels: MAX_RANGE where range >= range_max
    (dpg_measurement.h:43-45), else NOT_YET_LABELED.

    Also marks non-finite and below-range_min readings MAX_RANGE so they are
    excluded everywhere, like PCL drops NaNs.
    """
    invalid = (
        (ranges >= params.range_max)
        | (ranges < params.range_min)
        | ~jnp.isfinite(ranges)
    )
    return jnp.where(invalid, MAX_RANGE, NOT_YET_LABELED).astype(jnp.int8)


def sector_ids(params: ScanParams, num_sectors: int) -> jnp.ndarray:
    """(num_beams,) int32 sector of each beam: i / (num_beams/num_sectors)
    truncated, matching dpg_slam.cc:501-505 float division + uint8 cast."""
    points_per_sector = params.num_beams / num_sectors
    i = jnp.arange(params.num_beams, dtype=jnp.float32)
    sec = jnp.floor(i / points_per_sector).astype(jnp.int32)
    return jnp.minimum(sec, num_sectors - 1)


def valid_mask(labels: jnp.ndarray) -> jnp.ndarray:
    """Mask of points that exist as geometry (everything but MAX_RANGE),
    mirroring the reference skipping MAX_RANGE points when building clouds
    (dpg_node.cc:15-17)."""
    return labels != MAX_RANGE


def points_in_laser_frame(ranges: jnp.ndarray, params: ScanParams) -> jnp.ndarray:
    """(..., num_beams) ranges -> (..., num_beams, 2) cartesian points in the
    laser frame: r * [cos a, sin a] (dpg_measurement.h:102-104)."""
    a = beam_angles(params)
    return jnp.stack([ranges * jnp.cos(a), ranges * jnp.sin(a)], axis=-1)


def points_in_base_link(
    ranges: jnp.ndarray, params: ScanParams, laser_pose_in_bl: jnp.ndarray
) -> jnp.ndarray:
    """Scan points in the base_link frame: laser extrinsic applied
    (replaces getCachedPointCloudFromNode, dpg_node.cc:8-26).

    laser_pose_in_bl: (3,) pose of the laser in base_link
    (PoseGraphParams.laser_{x,y}_in_bl_frame, laser_orientation_rel_bl_frame).
    """
    pts = points_in_laser_frame(ranges, params)
    return geom.apply(laser_pose_in_bl, pts)


def downsample(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    ratio: int,
    max_points: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Keep every `ratio`-th point (reference downsamplePointCloud,
    dpg_slam.cc:346-360), pad/truncate to a fixed max_points budget.

    Unlike the reference (which compacts the cloud first, so the stride runs
    over *valid* points), we stride over the raw beam axis and carry the
    validity mask — same point density, fixed shapes, no host compaction.

    Args:
      points: (..., B, 2) cartesian points.
      valid:  (..., B) bool.
      ratio:  keep 1 in `ratio` beams.
      max_points: output point budget (pad with zeros / False).

    Returns:
      (points_ds, valid_ds) with shapes (..., max_points, 2) / (..., max_points).
    """
    pts = points[..., ::ratio, :]
    msk = valid[..., ::ratio]
    n = pts.shape[-2]
    if n >= max_points:
        return pts[..., :max_points, :], msk[..., :max_points]
    pad_n = max_points - n
    pad_pts = jnp.zeros(pts.shape[:-2] + (pad_n, 2), dtype=pts.dtype)
    pad_msk = jnp.zeros(msk.shape[:-1] + (pad_n,), dtype=bool)
    return (
        jnp.concatenate([pts, pad_pts], axis=-2),
        jnp.concatenate([msk, pad_msk], axis=-1),
    )
