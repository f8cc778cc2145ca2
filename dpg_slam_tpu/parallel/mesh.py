"""Device mesh construction.

The TPU-native communication backend is XLA collectives over ICI/DCN,
reached through `jax.sharding.Mesh` + shard_map/pjit — no NCCL/MPI analog
is written by hand (SURVEY.md §2 parallelism inventory, item 4).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "PAIR_AXIS"]

# Canonical mesh axis names:
#   "pairs" — data parallelism over ICP pair batches (and edge shards in
#             the distributed solver).
PAIR_AXIS = "pairs"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the first `n_devices` local devices (default: all).

    SLAM's dominant parallelism is embarrassingly parallel pair/edge work,
    so a 1-D mesh suffices; 2-D submap x pair meshes can be layered later
    without changing callers (axis names are the contract).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (PAIR_AXIS,))
