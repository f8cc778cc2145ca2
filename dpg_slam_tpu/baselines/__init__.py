"""Reference-equivalent baselines for benchmarking.

The reference repo publishes no numbers and needs ROS to run
(BASELINE.md), so the baseline is measured from a faithful re-execution
harness: the same per-keyframe work the reference does (serial per-pair
PCL-style ICP + full-graph solve, dpg_slam.cc:255-329), in single-threaded
numpy on the host CPU.
"""
