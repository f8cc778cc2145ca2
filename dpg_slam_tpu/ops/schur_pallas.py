"""Pallas TPU kernel for the Schur-complement interior elimination.

The distributed pose-graph solver (parallel/schur.py) eliminates each
shard's interior nodes per Gauss-Newton iteration:

    W = Hii^-1 His,   u = Hii^-1 gi,   S -= His^T W,   g -= His^T u

replacing the reference's global iSAM2 solve (dpg_slam.cc:316-329) with
per-submap local work + one psum'd separator system (SURVEY.md §7).

This kernel fuses the ENTIRE local solve — Cholesky factorization of the
damped SPD interior block plus the forward and backward triangular solves
for all right-hand sides — into one Pallas program with every
intermediate in VMEM:

  * the (n, n) interior matrix (n = 3 * interior slots, <= ~768 -> 2.3 MB
    f32) and the (n, m) right-hand-side panel (m = 3 * separator cap + 1)
    stay resident in VMEM across all three phases; XLA's equivalent
    (cho_factor -> cho_solve -> cho_solve) round-trips them through HBM
    between kernels;
  * factorization is unblocked right-looking Cholesky: n fori steps, each
    one masked (n, n) rank-1 VPU update (columns are extracted with
    dynamic slices, masking replaces the triangular loop bounds Pallas
    cannot express);
  * padded/inactive slots carry identity diagonal rows (the caller
    guarantees this), so padding flows through factorization and solves
    as a no-op.

The outer products His^T W that form the reduced separator system are
plain XLA matmuls (MXU) on the kernel's output.

Parity with jax.scipy.linalg.cho_factor/cho_solve is pinned by
tests/test_schur.py (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spd_solve_pallas"]


def _eliminate(A: jnp.ndarray, B: jnp.ndarray, *, n: int, m: int) -> jnp.ndarray:
    """The kernel body as a pure function: masked unblocked Cholesky +
    forward/backward triangular solves. Shared verbatim by the Mosaic
    kernel and the interpreter path (schur_solve on CPU backends), so the
    two are the same algorithm by construction."""
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    rown = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    # --- Cholesky: after step j, column j of A holds L[:, j] (rows >= j).
    def chol_step(j, A):
        dj = jax.lax.dynamic_slice(A, (j, j), (1, 1))         # (1, 1)
        inv = jax.lax.rsqrt(jnp.maximum(dj, 1e-30))
        colj = jax.lax.dynamic_slice(A, (0, j), (n, 1)) * inv  # (n, 1)
        colj = jnp.where(rown >= j, colj, 0.0)
        update = A - colj * colj.reshape(1, n)                # masked rank-1
        return jnp.where(
            col == j, colj, jnp.where((row > j) & (col > j), update, A)
        )

    L = jax.lax.fori_loop(0, n, chol_step, A)

    ldiag = jnp.sum(jnp.where(row == col, L, 0.0), axis=1, keepdims=True)  # (n, 1)
    inv_diag = 1.0 / jnp.maximum(ldiag, 1e-30)

    # --- forward solve L Y = B.
    def fwd_step(j, Y):
        inv_j = jax.lax.dynamic_slice(inv_diag, (j, 0), (1, 1))
        yj = jax.lax.dynamic_slice(Y, (j, 0), (1, m)) * inv_j  # (1, m)
        colj = jax.lax.dynamic_slice(L, (0, j), (n, 1))        # (n, 1)
        return jnp.where(
            rown == j, yj, jnp.where(rown > j, Y - colj * yj, Y)
        )

    Y = jax.lax.fori_loop(0, n, fwd_step, B)

    # --- backward solve L^T X = Y (L^T's column j is L's row j).
    def bwd_step(k, X):
        j = n - 1 - k
        inv_j = jax.lax.dynamic_slice(inv_diag, (j, 0), (1, 1))
        xj = jax.lax.dynamic_slice(X, (j, 0), (1, m)) * inv_j
        rowj = jax.lax.dynamic_slice(L, (j, 0), (1, n)).reshape(n, 1)
        return jnp.where(
            rown == j, xj, jnp.where(rown < j, X - rowj * xj, X)
        )

    return jax.lax.fori_loop(0, n, bwd_step, Y)


def _kernel(h_ref, b_ref, x_ref, *, n: int, m: int):
    x_ref[:, :] = _eliminate(h_ref[:, :], b_ref[:, :], n=n, m=m)


@functools.partial(jax.jit, static_argnames=("interpret", "pallas_interpret"))
def spd_solve_pallas(
    H: jnp.ndarray,
    B: jnp.ndarray,
    *,
    interpret: bool = False,
    pallas_interpret: bool = False,
) -> jnp.ndarray:
    """Solve H X = B for SPD H entirely in VMEM.

    Args:
      H: (n, n) float32 symmetric positive-definite; padded/inactive slots
        must carry identity rows (callers in parallel/schur.py do).
      B: (n, m) float32 right-hand sides.
      interpret: evaluate the kernel body as plain jax ops instead of a
        pallas_call — the same function, so numerics are identical. Used
        on CPU backends and inside shard_map (where interpret-mode
        pallas_call breaks vma tracking).
      pallas_interpret: run pl.pallas_call in interpreter mode (exercises
        the pallas_call plumbing itself on CPU; tests).

    Returns:
      (n, m) X with H @ X == B.
    """
    n, m = B.shape
    assert H.shape == (n, n), (H.shape, B.shape)
    H = H.astype(jnp.float32)
    B = B.astype(jnp.float32)
    if interpret:
        return _eliminate(H, B, n=n, m=m)
    kernel = functools.partial(_kernel, n=n, m=m)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=pallas_interpret,
    )(H, B)
