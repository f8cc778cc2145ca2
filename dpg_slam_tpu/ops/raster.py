"""Occupancy-grid rasterization as dense array ops.

Replaces the reference's sparse hash-map occupancy grids
(occupancyGrid, dpg_slam.h:46-263 / dpg_slam.cc:913-1082) with dense
world-anchored int8 windows:

  UNKNOWN=0 < FREE=1 < OCCUPIED=2

so "occupied beats free" (setFreeCells' guard, dpg_slam.cc:1021-1029) and
grid combination (combineOccupancyGrids, dpg_slam.cc:931-956) both become
elementwise max. Ray-marched free space (getIntermediateFreeCellsInFOV,
dpg_slam.cc:1059-1082) is a fixed-step scatter along each beam.

A grid window is (H, W) int8 anchored at `origin` (world coords of cell
[0, 0]) with `resolution` meters/cell; cell = round(p / res) - round
matches convertToKeyForm (dpg_slam.cc:923-929) up to the window shift.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "UNKNOWN", "FREE", "OCCUPIED", "world_to_cell", "rasterize_scans",
    "rasterize_endpoints",
]

UNKNOWN = np.int8(0)
FREE = np.int8(1)
OCCUPIED = np.int8(2)


def world_to_cell(
    points: jnp.ndarray, origin: jnp.ndarray, resolution: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., 2) world points -> ((..., 2) int32 cell indices, (...,) in-window).

    Cell quantization is round(p/res) in world units (reference
    convertToKeyForm) followed by the window shift, so windows with origins
    that are multiples of `resolution` quantize identically.
    """
    rc = jnp.round(points / resolution).astype(jnp.int32)
    oc = jnp.round(origin / resolution).astype(jnp.int32)
    cells = rc - oc
    return cells


def in_window(cells: jnp.ndarray, extent: int) -> jnp.ndarray:
    return (
        (cells[..., 0] >= 0)
        & (cells[..., 0] < extent)
        & (cells[..., 1] >= 0)
        & (cells[..., 1] < extent)
    )


def rasterize_endpoints(
    points_map: jnp.ndarray,    # (G, B, 2) scan endpoints in map frame
    occupied_mask: jnp.ndarray, # (G, B)
    origin: jnp.ndarray,
    extent: int,
    resolution: float,
) -> jnp.ndarray:
    """OCCUPIED-endpoint-only rasterization: (G, extent, extent) int8 with
    endpoint cells OCCUPIED, everything else UNKNOWN.

    This is the cheap half of rasterize_scans — G*B scatter updates
    (~32K at production shapes) instead of the FREE ray march's G*B*S
    (~6.5M, measured 30+ ms of serialized scatter on the chip). The hot
    change-detection path pairs these occupied grids with the POLAR
    free-space point test (change_detection._polar_free_at), which needs
    no dense FREE layer at all."""
    G, B, _ = points_map.shape
    grid = jnp.zeros((G, extent, extent), jnp.int8)
    end_cells = world_to_cell(points_map, origin, resolution)   # (G, B, 2)
    occ_ok = occupied_mask & in_window(end_cells, extent)
    ox = jnp.where(occ_ok, end_cells[..., 0], extent)
    oy = jnp.where(occ_ok, end_cells[..., 1], extent)
    g_idx = jnp.broadcast_to(jnp.arange(G)[:, None], (G, B))
    return grid.at[g_idx, ox, oy].max(OCCUPIED, mode="drop")


def rasterize_scans(
    laser_poses: jnp.ndarray,   # (G, 3) lidar pose in map frame per grid
    points_map: jnp.ndarray,    # (G, B, 2) scan endpoints in map frame
    ranges: jnp.ndarray,        # (G, B) beam ranges
    occupied_mask: jnp.ndarray, # (G, B) endpoint marks an OCCUPIED cell
    free_ray_mask: jnp.ndarray, # (G, B) beam marches FREE cells
    origin: jnp.ndarray,        # (2,) world position of cell [0, 0]
    extent: int,
    resolution: float,
    march_steps: int,
) -> jnp.ndarray:
    """Rasterize G scans into G dense occupancy windows.

    Mirrors convertLaserRangeToCellKey (dpg_slam.cc:958-1013): every
    selected beam marches FREE cells from the laser toward its endpoint
    (`march_steps` fixed parametric steps over t in [0, 1), matching the
    reference's range/resolution bins), and beams in `occupied_mask`
    additionally mark their endpoint cell OCCUPIED. Scatter is max-combine,
    so OCCUPIED wins over FREE wins over UNKNOWN.

    Returns (G, extent, extent) int8 grids.
    """
    G, B, _ = points_map.shape
    grid = jnp.zeros((G, extent, extent), jnp.int8)

    # --- FREE rays: t in {0, 1/n, ..., (n-1)/n}, point = laser + t*(end-laser)
    t = (jnp.arange(march_steps, dtype=jnp.float32) / march_steps)[None, None, :, None]
    start = laser_poses[:, None, None, 0:2]
    end = points_map[:, :, None, :]
    ray_pts = start + t * (end - start)                       # (G, B, S, 2)
    ray_cells = world_to_cell(ray_pts, origin, resolution)     # (G, B, S, 2)
    ray_ok = free_ray_mask[:, :, None] & in_window(ray_cells, extent)
    # Out-of-window/masked updates are dropped via mode="drop" using an
    # out-of-range index.
    rx = jnp.where(ray_ok, ray_cells[..., 0], extent)
    ry = jnp.where(ray_ok, ray_cells[..., 1], extent)
    g_idx = jnp.broadcast_to(
        jnp.arange(G)[:, None, None], (G, B, march_steps)
    )
    grid = grid.at[g_idx, rx, ry].max(FREE, mode="drop")

    # --- OCCUPIED endpoints
    end_cells = world_to_cell(points_map, origin, resolution)  # (G, B, 2)
    occ_ok = occupied_mask & in_window(end_cells, extent)
    ox = jnp.where(occ_ok, end_cells[..., 0], extent)
    oy = jnp.where(occ_ok, end_cells[..., 1], extent)
    g_idx2 = jnp.broadcast_to(jnp.arange(G)[:, None], (G, B))
    grid = grid.at[g_idx2, ox, oy].max(OCCUPIED, mode="drop")
    return grid
