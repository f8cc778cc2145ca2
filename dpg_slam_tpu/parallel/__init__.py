"""Multi-chip execution: device meshes, sharded ICP, distributed solves.

The reference is single-process with no parallelism (SURVEY.md §2); this
layer is new, mandated by the BASELINE.json north star: batch parallelism
over ICP pairs, graph partitioning across devices, and distributed
pose-graph solves with XLA collectives over ICI.
"""

from dpg_slam_tpu.parallel.mesh import make_mesh
from dpg_slam_tpu.parallel.distributed import (
    sharded_icp_align,
    distributed_solve,
    distributed_reoptimize,
)
from dpg_slam_tpu.parallel.schur import schur_solve

__all__ = [
    "make_mesh",
    "sharded_icp_align",
    "distributed_solve",
    "distributed_reoptimize",
    "schur_solve",
]
