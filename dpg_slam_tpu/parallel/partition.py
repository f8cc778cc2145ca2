"""Node->shard partitioning for the distributed Schur solver.

The contiguous trajectory split (node i -> shard i // C) is right for a
single long drive, but on multi-pass/multi-lap sessions (the reference's
real workloads: 4-10 sessions over the same space,
dpg_data_runner_main.cc:95-128) nearly every node has loop closures to
OTHER traversals of the same spot — a contiguous split turns most nodes
into separators and the Schur reduction degenerates.

`spatial_blocks` assigns co-located nodes (across all passes/laps) to the
same shard by sorting live nodes along a Morton (Z-order) curve over
their positions and chunking the order into equal shard-sized groups:
closures become intra-shard, and only trajectory segments crossing a
region boundary contribute separators (~passes x shards, not ~N).

Host-side numpy: partitioning runs once per reoptimize, on scalars the
host already holds.
"""

from __future__ import annotations

import numpy as np

__all__ = ["spatial_blocks", "morton_code"]


def morton_code(qx: np.ndarray, qy: np.ndarray, bits: int = 10) -> np.ndarray:
    """Interleave the low `bits` of qx/qy into a Z-order code."""
    code = np.zeros(qx.shape, np.int64)
    for b in range(bits):
        code |= ((qx >> b) & 1) << (2 * b)
        code |= ((qy >> b) & 1) << (2 * b + 1)
    return code


def spatial_blocks(
    positions: np.ndarray, node_mask: np.ndarray, n_shards: int
) -> np.ndarray:
    """(N,) node->shard assignment, exactly N/n_shards nodes per shard.

    Live nodes are Z-order sorted by position and chunked; dead (padding)
    slots fill the remaining capacity of the trailing shards. Every shard
    receives exactly C = N // n_shards nodes, satisfying schur_solve's
    per-shard interior capacity by construction.
    """
    N = node_mask.shape[0]
    assert N % n_shards == 0, (N, n_shards)
    C = N // n_shards
    live = np.nonzero(node_mask)[0]
    dead = np.nonzero(~node_mask)[0]
    if len(live):
        p = np.asarray(positions[live, :2], np.float64)
        mn = p.min(axis=0)
        ext = max(float(np.ptp(p, axis=0).max()), 1e-6)
        q = np.clip(((p - mn) / ext * 1023.0).astype(np.int64), 0, 1023)
        live = live[np.argsort(morton_code(q[:, 0], q[:, 1]), kind="stable")]
    order = np.concatenate([live, dead])
    assign = np.zeros(N, np.int32)
    assign[order] = (np.arange(N) // C).astype(np.int32)
    return assign
