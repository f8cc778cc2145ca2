"""Multi-host runtime bootstrap.

The TPU-native answer to a NCCL/MPI backend (SURVEY.md §2, item 4): hosts
join one jax.distributed job; devices across all hosts form the global
mesh; collectives ride ICI within a slice and DCN across hosts — no
hand-written communication layer.

Single-chip/CI environments skip initialization transparently, so the
same runner script works from laptop CPU to a pod slice.
"""

from __future__ import annotations

import os

import jax

__all__ = ["initialize_multihost", "global_mesh"]


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Join (or skip) a multi-host jax.distributed job.

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) or cloud-TPU auto-detection.
    Returns True if a multi-process runtime was initialized.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None

    if coordinator_address is None and num_processes is None:
        # Single-process run (or TPU pod auto-detection is unavailable).
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh():
    """1-D mesh over every device of every participating host."""
    from dpg_slam_tpu.parallel.mesh import make_mesh

    return make_mesh(devices=jax.devices())
