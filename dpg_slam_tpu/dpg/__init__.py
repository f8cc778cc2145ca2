"""Dynamic pose graph layer: multi-pass change detection and map pruning."""

from dpg_slam_tpu.dpg.change_detection import (
    execute_dpg,
    map_layers,
    occupancy_snapshot,
)

__all__ = ["execute_dpg", "map_layers", "occupancy_snapshot"]
