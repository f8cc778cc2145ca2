"""Hot-path array ops: batched ICP, occupancy rasterization, Schur kernels."""
