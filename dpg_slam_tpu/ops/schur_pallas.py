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
    between kernels. Measured (BENCH_r03): at n=768, m=385 the compiled
    kernel runs ~30 ms vs ~23 ms for the XLA path on the real chip —
    the 3n sequential fori steps (each a full-matrix masked pass)
    dominate both, and the unblocked kernel does NOT yet beat XLA's
    blocked Cholesky; a 128-column panel-blocked variant (MXU trailing
    updates) is the known path to a win. distributed_reoptimize keeps
    the XLA solve as its default accordingly;
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
    two are the same algorithm by construction.

    Mosaic constraint (hard-won): dynamic_slice on loop-carried VALUES is
    not lowered for TPU Pallas (only ref indexing is), so every row /
    column / pivot extraction here is expressed as a masked-iota
    reduction or a one-hot dot_general — both lower cleanly and stay
    VMEM-resident.
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    rown = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    coln = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    rowm = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)

    # --- Cholesky: after step j, column j of A holds L[:, j] (rows >= j).
    # The trailing submatrix (rows >= j, cols >= j) stays symmetric at
    # every step, so column j (rows >= j) and row j (cols >= j) are
    # transposes of each other — extracted independently to avoid an
    # in-kernel (n,1)->(1,n) relayout.
    def chol_step(j, A):
        dj = jnp.sum(jnp.where((row == j) & (col == j), A, 0.0))
        inv = jax.lax.rsqrt(jnp.maximum(dj, 1e-30))
        colj = jnp.sum(jnp.where(col == j, A, 0.0), axis=1, keepdims=True) * inv
        colj = jnp.where(rown >= j, colj, 0.0)                 # (n, 1)
        rowj = jnp.sum(jnp.where(row == j, A, 0.0), axis=0, keepdims=True) * inv
        rowj = jnp.where(coln >= j, rowj, 0.0)                 # (1, n)
        update = A - colj * rowj                               # masked rank-1
        return jnp.where(
            col == j, colj, jnp.where((row > j) & (col > j), update, A)
        )

    L = jax.lax.fori_loop(0, n, chol_step, A)

    ldiag = jnp.sum(jnp.where(row == col, L, 0.0), axis=1, keepdims=True)  # (n, 1)
    inv_diag = 1.0 / jnp.maximum(ldiag, 1e-30)

    def _scalar_at(vec_n1, j):
        return jnp.sum(jnp.where(rown == j, vec_n1, 0.0))

    # --- forward solve L Y = B.
    def fwd_step(j, Y):
        inv_j = _scalar_at(inv_diag, j)
        yj = jnp.sum(jnp.where(rowm == j, Y, 0.0), axis=0, keepdims=True) * inv_j
        colj = jnp.sum(jnp.where(col == j, L, 0.0), axis=1, keepdims=True)
        return jnp.where(
            rowm == j, yj, jnp.where(rowm > j, Y - colj * yj, Y)
        )

    Y = jax.lax.fori_loop(0, n, fwd_step, B)

    # --- backward solve L^T X = Y (L^T's column j is L's row j, fetched
    # as a column vector via a one-hot contraction over L's row axis).
    def bwd_step(k, X):
        j = n - 1 - k
        inv_j = _scalar_at(inv_diag, j)
        xj = jnp.sum(jnp.where(rowm == j, X, 0.0), axis=0, keepdims=True) * inv_j
        ej = (rown == j).astype(L.dtype)                       # (n, 1)
        rowj = jax.lax.dot_general(
            L, ej, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # (n, 1) = L^T e_j
        return jnp.where(
            rowm == j, xj, jnp.where(rowm < j, X - rowj * xj, X)
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
