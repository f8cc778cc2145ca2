"""Dataset layer: synthetic lidar worlds + sequence containers + log IO.

Replaces the reference's rosbag-driven dataset runner (src/runner/
dpg_data_runner_main.cc): instead of `rosbag play` + ROS topic transport,
sequences are plain arrays (scans, odometry, ground truth) produced by a
raycast simulator or loaded from binary logs.
"""

from dpg_slam_tpu.io.dataset import (
    Sequence,
    SyntheticWorld,
    make_office_world,
    simulate_sequence,
)

__all__ = [
    "Sequence",
    "SyntheticWorld",
    "make_office_world",
    "simulate_sequence",
]
