"""Pose-graph backend: batched SE(2) factor arrays + GN/LM solvers."""

from dpg_slam_tpu.graph.factor_graph import (
    FactorGraph,
    empty_graph,
    add_prior,
    add_between,
    residuals,
    total_error,
    solve,
    SolveStats,
)

__all__ = [
    "FactorGraph",
    "empty_graph",
    "add_prior",
    "add_between",
    "residuals",
    "total_error",
    "solve",
    "SolveStats",
]
